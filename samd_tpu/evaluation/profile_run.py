"""Profiling runner: per-phase wall-time breakdown + draft-source stats.

Reference equivalent: /root/reference/evaluation/profile_entry.py +
profile_samd.py (decorator tables enabled after warmup).  Usage:

    python -m samd_tpu.evaluation.profile_run [--xla-trace DIR] [--batch 1]

Runs the synthetic suite on a random-weight model, enables the engine's
PhaseTimer after warmup, and prints the phase table, draft-source histogram
and accept-length-per-source means.  ``--xla-trace`` additionally captures a
jax.profiler trace for TensorBoard/xprof.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--xla-trace", default=None)
    p.add_argument("--mode", default="sam_only",
                   choices=["sam_only", "sam_hybrid"])
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (no TPU grab)")
    p.add_argument("--new-tokens", type=int, default=64)
    args = p.parse_args()

    if args.cpu:
        from samd_tpu.testing import force_cpu

        force_cpu()
    import jax

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import SamdEngine
    from samd_tpu.evaluation import make_questions
    from samd_tpu.models import init_params, llama_1b, tiny_config
    from samd_tpu.profiling import PhaseTimer, xla_trace

    cfg = tiny_config(vocab_size=2048) if args.cpu else llama_1b()
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.3)
    samd_cfg = SamdConfig(draft_source=args.mode)
    engine = SamdEngine(
        cfg, params, samd_cfg,
        make_drafter(samd_cfg, cfg.vocab_size, model_cfg=cfg, params=params),
        max_cache_len=1024, eos_token_id=-1, prefill_buckets=(256,))
    gen = GenerationConfig(max_new_tokens=args.new_tokens, max_cache_len=1024)
    questions = make_questions(cfg.vocab_size, per_task=1, seed=0)

    # warmup (compile) before profiling, like the reference
    engine.generate(questions[0].turns[0], gen)
    engine.profiler = PhaseTimer()
    engine.stats.source_counts.clear()
    engine.stats.accept_by_source.clear()

    ctx = xla_trace(args.xla_trace) if args.xla_trace else contextlib.nullcontext()
    with ctx:
        for q in questions:
            for turn in q.turns:
                engine.generate(turn, gen)

    print("\n== phase breakdown (normalized by device_step) ==")
    for row in engine.profiler.report(normalize_by="device_step"):
        print(f"  {row['phase']:<14} total {row['total_s']:>8.3f}s  "
              f"calls {row['calls']:>5}  mean {row['mean_ms']:>8.3f}ms  "
              f"frac {row['frac']}")
    print("\n== draft sources ==")
    print(json.dumps(engine.stats.source_counts, indent=2))
    print("\n== mean accept length per source ==")
    for src, total in engine.stats.accept_by_source.items():
        print(f"  {src}: {total / engine.stats.source_counts[src]:.2f}")
    print(f"\noverall mean accepted tokens: {engine.stats.mean_accept():.2f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
