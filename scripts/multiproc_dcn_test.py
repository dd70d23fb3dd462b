#!/usr/bin/env python
"""2-process jax.distributed execution of the DCN model-sharding path.

Round-2 verdict #6: ``multihost.init_distributed`` / the global mesh had
zero executions — the "ready when a second host exists" claim was untested
software.  This script makes it real at the software level on one machine:

  * parent mode (default): computes the single-process reference, spawns
    TWO OS child processes of itself, waits, and byte-compares.
  * child mode (--process-id): forces the CPU backend with 2 virtual
    devices, calls ``multihost.init_distributed`` (the actual
    jax.distributed path, coordinator on localhost), builds a GLOBAL
    (1,1,1,4) mesh whose tp axis spans both processes (the inter-process
    hop standing in for DCN), shards the tiny model with the production
    ``parallel.sharding`` specs, and greedy-generates 16 tokens.  Process 0
    writes the ids.

Reference analogue: ray fan-out in
/root/reference/evaluation/eval_vicuna.py:39-68 (eval-DP only — it has no
cross-process model sharding at all; here the model itself spans the
processes and GSPMD inserts the cross-process collectives).

Run: ``python scripts/multiproc_dcn_test.py`` → prints MATCH/MISMATCH,
exit code 0/1.  tests/test_multiprocess.py wraps it.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

PORT = 47351
NEW_TOKENS = 16
PROMPT = [5, 9, 17, 3, 88, 41, 7, 23, 56, 12]


def _force_cpu(n_devices: int) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from samd_tpu.testing import force_cpu

    force_cpu(n_devices)


def generate(mesh=None):
    """Greedy 1-token-at-a-time decode of the tiny model; with a mesh the
    params/KV are sharded by the production specs and every step runs under
    GSPMD (collectives cross the process boundary on the global mesh)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models import init_params, tiny_config
    from samd_tpu.models.llama import block_decode_mask, forward, prefill_mask

    cfg = tiny_config(vocab_size=128, num_kv_heads=4)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    S = 64
    kv_k, kv_v = init_kv_cache(cfg, 1, S)
    if mesh is not None:
        from samd_tpu.parallel.sharding import (check_shardable, shard_kv,
                                                shard_params)

        check_shardable(cfg, mesh)
        params = shard_params(params, mesh, cfg)
        kv_k, kv_v = shard_kv(kv_k, kv_v, mesh)

    P = 16
    padded = np.zeros(P, np.int32)
    padded[:len(PROMPT)] = PROMPT

    @jax.jit
    def prefill(params, kv_k, kv_v, tokens, true_len):
        logits, _, kv_k, kv_v = forward(
            params, cfg, tokens[None], jnp.arange(P)[None, :], kv_k, kv_v,
            jnp.int32(0), prefill_mask(1, P, S))
        last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1,
                                            axis=0, keepdims=False)
        return kv_k, kv_v, jnp.argmax(last).astype(jnp.int32)

    tri = jnp.ones((1, 1), bool)

    @jax.jit
    def step(params, kv_k, kv_v, tok, pos):
        mask = block_decode_mask(tri, pos, S)
        logits, _, kv_k, kv_v = forward(
            params, cfg, tok[None, None], pos[None, None], kv_k, kv_v,
            pos, mask)
        return kv_k, kv_v, jnp.argmax(logits[0, 0]).astype(jnp.int32)

    def fetch(x):
        # replicated global arrays are not fully addressable across
        # processes; every process holds an identical local copy
        return int(np.asarray(jax.device_get(x.addressable_data(0))))

    kv_k, kv_v, tok = prefill(params, kv_k, kv_v, jnp.asarray(padded),
                              jnp.int32(len(PROMPT)))
    out = [fetch(tok)]
    pos = len(PROMPT)
    for _ in range(NEW_TOKENS - 1):
        kv_k, kv_v, tok = step(params, kv_k, kv_v, jnp.int32(out[-1]),
                               jnp.int32(pos))
        out.append(fetch(tok))
        pos += 1
    return out


def child(pid: int, out_path: str) -> None:
    _force_cpu(2)
    import jax

    from samd_tpu.parallel.multihost import init_distributed

    init_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                     num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()   # 2 local + 2 remote
    from samd_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()          # (1,1,1,4): tp spans both processes
    out = generate(mesh)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(out, f)
    jax.distributed.shutdown()


def parent() -> int:
    _force_cpu(2)
    ref = generate(mesh=None)   # single-process, unsharded

    out_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--process-id", str(i),
         "--out", out_path], env=env) for i in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"child exit codes: {rcs}", file=sys.stderr)
        return 1
    with open(out_path) as f:
        dist = json.load(f)
    ok = dist == ref
    print(f"single-process: {ref}")
    print(f"2-process dcn : {dist}")
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(parent())
    child(args.process_id, args.out)
