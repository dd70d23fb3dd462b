#!/usr/bin/env python
"""int4 kernel unpack-arithmetic variants, microbenched at 7B matmul shapes.

The int4 weight-streaming kernel (ops/int4_matmul.py) is VPU-bound on the
nibble unpack, not DMA-bound (docs/PERFORMANCE.md) — the v1 unpack costs 5
full-width vector ops per packed byte (u8->i32 convert, mask, shift, two
converts to bf16).  Variants measured here:

  v1-shift   the shipped kernel: lo = p & 15, hi = p >> 4 in i32.
  v2-sum     "output-space hi": compute dot(x, lo) and dot(x, p) where
             p = lo + 16*hi exactly (bytes 0..255 are exact in bf16), then
             hi's contribution is (dot_p - dot_lo)/16 on the [R, bn] output
             block — the per-byte work drops to ONE u8 mask + TWO converts,
             and the mask runs on 1-byte lanes (4x the i32 op density).
  v3-himask  lo = p & 15, hi16 = p & 0xF0 (= 16*hi; /16 folds into the
             scale) — trades the shift for a second mask; same op count as
             v1 unless Mosaic lowers masks cheaper than shifts.

All variants share the grid/BlockSpec structure (the DMA stream is
identical); only the in-register arithmetic differs.  The winner is what
ops/int4_matmul.py ships.

Usage: python scripts/profile_int4_kernel.py [--l 32] [--m 16]
                                             [--shape 4096x11008]
                                             [--steps 32] [--blocks 2048x1024]
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
    ap.add_argument("--l", type=int, default=32)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--shape", default="4096x11008")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--blocks", default="2048x1024")
    ap.add_argument("--variants",
                    default="v1-shift,v2-sum,v3-himask,v4-sum16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.ops import int4_matmul as m4

    L, (IN, OUT) = args.l, tuple(int(v) for v in args.shape.split("x"))
    R = args.m
    bk, bn = (int(v) for v in args.blocks.split("x"))
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (L, IN, OUT // 2), 0, 256,
                                dtype=jnp.uint8)
    scale = jnp.full((L, OUT), 1e-3, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (R, IN), jnp.bfloat16)
    stream_gb = L * IN * (OUT // 2) / 1e9

    def bench(variant):
        mm = functools.partial(m4.int4_matmul, block_n=bn, block_k=bk,
                               variant=variant)

        @jax.jit
        def loop(x, packed, scale):
            def body(i, acc):
                y = mm(x, packed, scale, i % L)
                return acc + y[:, :8].astype(jnp.float32)

            return jax.lax.fori_loop(0, args.steps * L, body,
                                     jnp.zeros((R, 8), jnp.float32))

        out = loop(x, packed, scale)
        np.asarray(out)  # block (the tunnel's block_until_ready is a no-op)
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(loop(x, packed, scale))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_pass = best / args.steps   # one pass = all L layers
        gbps = stream_gb / per_pass
        return per_pass, gbps

    # numerical cross-check (small shapes, real device)
    ref = None
    ok = []
    for v in args.variants.split(","):
        try:
            y = m4.int4_matmul(x[:, :512], packed[0, :512, :128],
                               scale[0, :256], block_n=128, block_k=512,
                               variant=v)
            y = np.asarray(y, np.float32)
        except Exception as e:
            print(f"{v}: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})")
            continue
        ok.append(v)
        if ref is None:
            ref = y
        else:
            err = np.max(np.abs(y - ref)) / max(np.max(np.abs(ref)), 1e-9)
            print(f"{v}: max rel delta vs {ok[0]} = {err:.2e}")

    print(f"L={L} {IN}x{OUT} R={R} blocks={bk}x{bn} "
          f"stream {stream_gb:.2f} GB/pass")
    for v in ok:
        per, gbps = bench(v)
        print(f"{v:10s} {per * 1000:7.3f} ms/pass   {gbps:6.1f} GB/s "
              f"effective")


if __name__ == "__main__":
    main()
