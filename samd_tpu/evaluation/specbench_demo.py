"""End-to-end Spec-Bench pipeline execution with trained weights.

The reference's headline artifact is a per-task speedup table produced by
running its eval stack over Spec-Bench (/root/reference/evaluation/
eval_vicuna.py -> answer JSONL -> speed.py -> equal.py; results table
/root/reference/README.md:46-57).  No public checkpoints or Spec-Bench data
exist on the build machines, so this module executes the SAME pipeline —
question file on disk -> load_questions -> run_eval (warmup, multi-turn
threading, fault tolerance) -> answer JSONL -> reorg_answer_file ->
speed.speedup per task -> equal.compare — with the on-machine trained tiny
model (samd_tpu.training) over the synthetic Spec-Bench-shaped suite
(evaluation/synthetic.py).  Every stage the reference runs is run here, on
the real device; only the weights/data are stand-ins (see BASELINE.md for
what still needs real checkpoints).

    python -m samd_tpu.evaluation.specbench_demo [--cpu] [--steps 400]
        [--per-task 2] [--new-tokens 64] [--out-dir DIR] [--json]

Engines evaluated (each vs the block-1 AR speed baseline, with a
matching-block AR oracle for losslessness):

  * ``sam_only`` host engine (exact suffix automata — the reference's
    samd_sam_only entry point, /root/reference/samd_sam_only/);
  * ``fused_sam`` device-loop engine (this repo's flagship).

Prints one row per (engine, task) on stderr and a JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run(steps: int = 400, vocab: int = 64, per_task: int = 2,
        new_tokens: int = 64, seed: int = 0,
        out_dir: str = None) -> dict:
    import numpy as np

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import ArBaseline, SamdEngine
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import tiny_config
    from samd_tpu.sam import build_corpus_sam
    from samd_tpu.training import markov_corpus, train_lm

    from . import equal as equal_mod
    from .runner import load_questions, reorg_answer_file, run_eval
    from .speed import SPEC_BENCH_TASKS, mean_accepted_tokens, speedup
    from .synthetic import make_questions, write_questions

    cfg = tiny_config(vocab_size=vocab)
    # order-1 chain: single-token context carries the transition mass (the
    # natural-text regime; see accept_demo's Token-Recycle order diagnosis)
    corpus = markov_corpus(vocab, 20000, peak=0.9, branch=2, order=1,
                           seed=seed)
    log(f"training target LM ({steps} steps)...")
    params, lm_tail = train_lm(cfg, corpus, steps=steps, batch=16,
                               seq_len=64, seed=seed)
    log(f"  final LM loss {lm_tail[-1]:.3f}")
    static_sam = build_corpus_sam([corpus.tolist()], eos_token=0, topk=8)

    tmp_ctx = None
    if out_dir is None:
        tmp_ctx = tempfile.TemporaryDirectory()
        out_dir = tmp_ctx.name
    os.makedirs(out_dir, exist_ok=True)

    # --- question file on disk (the reference's question.jsonl role) ------
    questions_path = os.path.join(out_dir, "question.jsonl")
    write_questions(
        make_questions(vocab, per_task=per_task, seed=seed + 1,
                       corpus=corpus),
        questions_path)
    questions = load_questions(questions_path)
    log(f"{len(questions)} questions over "
        f"{len({q.category for q in questions})} tasks -> {questions_path}")

    MAX_CACHE = 512
    BUCKETS = (64, 128, 256, 512)
    gen = GenerationConfig(max_new_tokens=new_tokens, max_cache_len=MAX_CACHE)
    M_HOST = 40   # host sam_only verify block (reference-canonical n_predicts)
    fs_cfg = FusedSamConfig()

    def evaluate(name, engine):
        path = os.path.join(out_dir, f"{name}.jsonl")
        stats = run_eval(engine, questions, path, gen_config=gen,
                         warmup=2, model_id=name)
        reorg_answer_file(path)
        log(f"{name}: {stats['tokens_per_s']:.1f} tok/s, "
            f"accept {stats['mean_accepted_tokens']:.2f}, "
            f"errors {stats['errors']}")
        return path, stats

    # --- baseline + oracles (reference inference_baseline.py role) --------
    base_path, base_stats = evaluate(
        "baseline", ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                               eos_token_id=-1, prefill_buckets=BUCKETS,
                               block_size=1))
    oracle_host_path, _ = evaluate(
        f"oracle_block{M_HOST}",
        ArBaseline(cfg, params, max_cache_len=MAX_CACHE, eos_token_id=-1,
                   prefill_buckets=BUCKETS, block_size=M_HOST))
    oracle_fused_path, _ = evaluate(
        f"oracle_block{fs_cfg.block}",
        ArBaseline(cfg, params, max_cache_len=MAX_CACHE, eos_token_id=-1,
                   prefill_buckets=BUCKETS, block_size=fs_cfg.block))

    # --- engines under test ------------------------------------------------
    scfg = SamdConfig(draft_source="sam_only", max_predicts=M_HOST, alpha=4.0)
    sam_path, sam_stats = evaluate(
        "sam_only",
        SamdEngine(cfg, params, scfg,
                   make_drafter(scfg, vocab, static_sam=static_sam),
                   max_cache_len=MAX_CACHE, eos_token_id=-1,
                   prefill_buckets=BUCKETS))
    fused_path, fused_stats = evaluate(
        "fused_sam",
        FusedSamEngine(cfg, params, fs_cfg, corpus=corpus.tolist(),
                       max_cache_len=MAX_CACHE, eos_token_id=-1,
                       prefill_buckets=BUCKETS))

    # --- speed.py + equal.py (the reference's post-processing) ------------
    result = {"lm_loss": round(float(lm_tail[-1]), 4),
              "n_questions": len(questions), "engines": {}}
    for name, path, stats, oracle_path in (
            ("sam_only", sam_path, sam_stats, oracle_host_path),
            ("fused_sam", fused_path, fused_stats, oracle_fused_path)):
        per_task_speedup = speedup(path, base_path)
        eq, mismatches = equal_mod.compare(path, oracle_path)
        row = {
            "speedup": {t: round(per_task_speedup[t], 3)
                        for t in (*SPEC_BENCH_TASKS, "overall")
                        if t in per_task_speedup},
            "mean_accept": round(mean_accepted_tokens(path), 3),
            "tokens_per_s": round(stats["tokens_per_s"], 2),
            "outputs_equal_vs_block_oracle": eq,
            "mismatch_qids": mismatches,
            "errors": stats["errors"],
        }
        result["engines"][name] = row
        tasks = " ".join(f"{t}={row['speedup'][t]:.2f}x"
                         for t in row["speedup"])
        log(f"{name}: {tasks} | accept {row['mean_accept']} | "
            f"equal={eq}{'' if eq else ' qids=' + str(mismatches)}")
    result["baseline_tokens_per_s"] = round(base_stats["tokens_per_s"], 2)

    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--vocab", type=int, default=64)
    p.add_argument("--per-task", type=int, default=2)
    p.add_argument("--new-tokens", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default=None,
                   help="keep the question/answer JSONL files here")
    args = p.parse_args(argv)
    if args.cpu:
        from samd_tpu.testing import force_cpu

        force_cpu()
    out = run(steps=args.steps, vocab=args.vocab, per_task=args.per_task,
              new_tokens=args.new_tokens, seed=args.seed,
              out_dir=args.out_dir)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
