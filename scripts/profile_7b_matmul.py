#!/usr/bin/env python
"""Bare-matmul bandwidth at 7B shapes: what does XLA's pre-dequant int8
matmul actually achieve on [M, 4096] x [4096, N]?

Calibrates the 7B forward's roofline (docs/PERFORMANCE.md "7B"): the 1B
analysis quoted ~680 GB/s for its big-matmul loop; if 7B-shaped loops
achieve less, the forward's ~470 GB/s is a matmul-shape property, not a
model-structure inefficiency.

Usage: python scripts/profile_7b_matmul.py [--m 16] [--steps 64]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.ops.quant import QuantizedTensor, qmatmul

    M, K = args.m, args.steps
    rng = jax.random.PRNGKey(0)

    def mk_q(shape):
        q = jax.random.randint(rng, shape, -127, 127, jnp.int8)
        s = jnp.ones((shape[1],), jnp.float32) * 0.01
        return QuantizedTensor(q, s)

    def mk_bf(shape):
        return jax.random.normal(rng, shape, jnp.bfloat16)

    def loop_for(ws, label, bytes_per_iter):
        x0 = jax.random.normal(rng, (M, 4096), jnp.bfloat16)

        @jax.jit
        def loop(ws, x0):
            def body(st):
                x, i = st
                for w in ws:
                    y = qmatmul(x, w)
                    # fold back to [M, 4096] so the loop chains
                    x = y[:, :4096].astype(jnp.bfloat16) * 1e-3 + x
                return x, i + 1

            return jax.lax.while_loop(lambda st: st[1] < K, body,
                                      (x0, jnp.int32(0)))[0]

        out = loop(ws, x0)
        np.asarray(out[:1])
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = loop(ws, x0)
            np.asarray(out[:1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per = best / K
        print(f"{label:42s} {per * 1000:7.3f} ms/iter  "
              f"{bytes_per_iter / per / 1e9:6.1f} GB/s")

    GB = 1
    # one 7B MLP triple: gate/up [4096,11008] + down [11008,4096]
    mlp_q = (mk_q((4096, 11008)), mk_q((4096, 11008)))
    loop_for(mlp_q, "int8 2x[4096,11008]", 2 * 4096 * 11008 * GB)
    mlp_bf = (mk_bf((4096, 11008)), mk_bf((4096, 11008)))
    loop_for(mlp_bf, "bf16 2x[4096,11008]", 2 * 4096 * 11008 * 2)
    # attention projections [4096,4096] x4
    att_q = tuple(mk_q((4096, 4096)) for _ in range(4))
    loop_for(att_q, "int8 4x[4096,4096]", 4 * 4096 * 4096 * GB)
    att_bf = tuple(mk_bf((4096, 4096)) for _ in range(4))
    loop_for(att_bf, "bf16 4x[4096,4096]", 4 * 4096 * 4096 * 2 * GB)
    # a full 7B layer's weight BYTES (the down proj is represented by a
    # third [4096,11008] — same byte count, keeps the chain's in-dim 4096)
    layer = (
        mk_q((4096, 4096)), mk_q((4096, 4096)), mk_q((4096, 4096)),
        mk_q((4096, 4096)), mk_q((4096, 11008)), mk_q((4096, 11008)),
        mk_q((4096, 11008)))
    layer_bytes = 4 * 4096 * 4096 + 3 * 4096 * 11008
    loop_for(layer, "int8 full 7B layer weight set", layer_bytes)
    # 1B-shape calibration (the documented ~680 GB/s loop)
    onex = (mk_q((2048, 5632)), mk_q((2048, 5632)))
    loop_for(onex, "int8 2x[2048,5632] (1B shape)", 2 * 2048 * 5632)


if __name__ == "__main__":
    main()
