#!/usr/bin/env python
"""int4 weight streaming: XLA pre-dequant vs the Pallas kernel.

Times the REAL model forward (models/llama.forward) as K-iteration device
while_loops (one blocking fetch per loop), comparing weight precisions at
identical shapes:

  int8          — QuantizedTensor, pre-dequant qmatmul (the r02 fast path)
  int4-xla      — Int4Tensor via _deq4 (int8-parity HBM traffic: XLA's
                  dot-operand fusion reads each packed byte once per nibble)
  int4-kernel   — Int4Tensor via ops/int4_matmul (int4_impl="kernel"):
                  one DMA per packed byte block, nibbles unpacked
                  in-register — true 0.5 bytes/weight

Usage:
  python scripts/profile_int4.py [--model 1b|7b|13b] [--m 16] [--s 1024]
                                 [--steps 64] [--skip int8,int4-xla,...]

13B note: bf16/int8 13B do not fit one 16 GB chip — run
``--model 13b --skip int8,int4-xla`` (the xla variant materializes nothing
extra at rest but its loop streams int8-parity bytes; it fits, just slow).
Variants are constructed and freed one at a time (an OOM wedges the
tunneled backend — docs/PARITY.md).
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
    ap.add_argument("--model", default="1b", choices=["1b", "7b", "13b"])
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip", default="",
                    help="comma-separated: bf16,int8,int4-xla,int4-kernel")
    ap.add_argument("--blocks", default="512x512",
                    help="int4-kernel tile sweep: comma-separated KxN pairs "
                         "(e.g. 512x512,1024x512,1024x1024)")
    ap.add_argument("--variants", default="v2-sum",
                    help="int4-kernel unpack variants (comma-separated; "
                         "see ops/int4_matmul._KERNELS)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dataclasses import replace

    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models import llama_1b, llama_7b, llama_13b
    from samd_tpu.models.llama import block_decode_mask, forward
    from samd_tpu.ops.quant import init_quantized_llama_params

    cfg0 = {"1b": llama_1b, "7b": llama_7b, "13b": llama_13b}[args.model]()
    M, K, S = args.m, args.steps, args.s
    tri = jnp.tril(jnp.ones((M, M), bool))
    chain_pos = jnp.arange(M, dtype=jnp.int32)

    def proj_bytes(dtype_bytes):
        c = cfg0
        per_layer = (c.hidden_size * (c.num_heads + 2 * c.num_kv_heads)
                     * c.head_dim + c.num_heads * c.head_dim * c.hidden_size
                     + 3 * c.hidden_size * c.intermediate_size)
        head = c.hidden_size * c.vocab_size
        return (c.num_layers * per_layer + head) * dtype_bytes

    def timeit(name, cfg, params):
        kv_k, kv_v = init_kv_cache(cfg, 1, S)
        hist_len0 = jnp.int32(128)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def loop(params, kv_k, kv_v):
            def body(st):
                kv_k, kv_v, tok, i = st
                tokens = jnp.full((M,), tok, jnp.int32)
                s = jnp.arange(S)[None, None, :]
                mask = block_decode_mask(tri, hist_len0, S)
                mask = mask | (s == (hist_len0 + chain_pos)[None, :, None])
                logits, _, kv_k, kv_v = forward(
                    params, cfg, tokens[None], chain_pos[None, :] + hist_len0,
                    kv_k, kv_v, hist_len0, mask)
                tok = jnp.argmax(logits[0, 0]).astype(jnp.int32)
                return kv_k, kv_v, tok, i + 1

            st = jax.lax.while_loop(lambda st: st[3] < K, body,
                                    (kv_k, kv_v, jnp.int32(5), jnp.int32(0)))
            return st[0], st[1], st[2]

        out = loop(params, kv_k, kv_v)
        kv_k, kv_v = out[0], out[1]
        np.asarray(out[2])
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = loop(params, kv_k, kv_v)
            kv_k, kv_v = out[0], out[1]
            np.asarray(out[2])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per = best / K
        return per

    results = {}
    variants = []
    if args.model == "1b" and "bf16" not in skip:
        variants.append(("bf16", cfg0, None, 2.0))
    if "int8" not in skip:
        variants.append(("int8", cfg0, jnp.int8, 1.0))
    if "int4-xla" not in skip:
        variants.append(("int4-xla", cfg0, jnp.int4, 0.5))
    if "int4-kernel" not in skip:
        for kv in args.variants.split(","):
            for pair in args.blocks.split(","):
                bk, bn = (int(v) for v in pair.split("x"))
                variants.append((f"int4-kernel {kv} {bk}x{bn}",
                                 replace(cfg0, int4_impl="kernel",
                                         int4_block_k=bk, int4_block_n=bn,
                                         int4_variant=kv),
                                 jnp.int4, 0.5))

    print(f"model={args.model} M={M} S={S} K={K}")
    for name, cfg, qdtype, wbytes in variants:
        if qdtype is None:
            from samd_tpu.models import init_params
            params = init_params(cfg, jax.random.PRNGKey(0))
        else:
            params = init_quantized_llama_params(cfg, jax.random.PRNGKey(0),
                                                 dtype=qdtype)
        per = timeit(name, cfg, params)
        gbps = proj_bytes(wbytes) / per / 1e9
        results[name] = per
        print(f"{name:14s} {per * 1000:7.3f} ms/step   "
              f"(weight stream {proj_bytes(wbytes) / 1e9:.2f} GB -> "
              f"{gbps:6.1f} GB/s effective)")
        del params

    kernel_times = {k: v for k, v in results.items()
                    if k.startswith("int4-kernel")}
    if "int8" in results and kernel_times:
        best_name = min(kernel_times, key=kernel_times.get)
        print(f"best int4-kernel ({best_name}) / int8 step-time ratio: "
              f"{kernel_times[best_name] / results['int8']:.3f}")


if __name__ == "__main__":
    main()
