"""Multi-process evaluation fan-out driver.

The reference shards Spec-Bench questions across GPUs with ray
(/root/reference/evaluation/eval_vicuna.py:39-68).  The TPU-native
equivalent is plain OS processes: each worker re-execs this module with
``--worker-id i``, evaluates its round-robin share of the questions
(``parallel.multihost.shard_requests``) into ``<out>.shard{i}``, and the
parent merges the shards into one deduplicated, question_id-sorted answer
file (``runner.reorg_answer_file`` — the reference's resume mechanism).

Usage (synthetic smoke, CPU):

    python -m samd_tpu.evaluation.launch \
        --question-file q.jsonl --out answers.jsonl \
        --num-workers 2 --engine sam_only --cpu

Real checkpoints load via ``--model-dir`` (models.loader.load_llama).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import List, Optional


def build_engine(args):
    """Engine factory shared by workers (and single-process runs)."""
    import jax

    from ..config import SamdConfig
    from ..drafters import make_drafter
    from ..engine import ArBaseline, SamdEngine
    from ..models import init_params, tiny_config

    if args.model_dir:
        from ..models.loader import load_llama

        cfg, params = load_llama(args.model_dir)
    else:
        cfg = tiny_config(vocab_size=args.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)

    buckets = (128, 256, 512, 1024, 2048)
    if args.engine == "ar":
        return ArBaseline(cfg, params, max_cache_len=args.max_cache_len,
                          eos_token_id=args.eos_token_id,
                          prefill_buckets=buckets)
    samd_cfg = SamdConfig(
        draft_source=args.engine, max_predicts=args.max_predicts,
        alpha=args.alpha, len_bias=args.len_bias,
        n_predicts=args.n_predicts, len_threshold=args.len_threshold,
        tree_method=args.tree_method)
    static_sam = None
    if args.sam:
        from ..sam.serialize import load_sam

        static_sam = load_sam(args.sam)
    drafter = make_drafter(samd_cfg, cfg.vocab_size, static_sam=static_sam,
                           model_cfg=cfg, params=params)
    return SamdEngine(cfg, params, samd_cfg, drafter,
                      max_cache_len=args.max_cache_len,
                      eos_token_id=args.eos_token_id,
                      prefill_buckets=buckets)


def run_worker(args) -> dict:
    from ..config import GenerationConfig
    from ..parallel.multihost import shard_requests
    from .runner import load_questions, run_eval

    questions = shard_requests(load_questions(args.question_file),
                               process_id=args.worker_id,
                               num_processes=args.num_workers)
    engine = build_engine(args)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           max_cache_len=args.max_cache_len)
    out_path = (args.out if args.num_workers == 1
                else f"{args.out}.shard{args.worker_id}")
    return run_eval(engine, questions, out_path, gen_config=gen,
                    warmup=args.warmup, model_id=args.model_id)


def merge_shards(out: str, num_workers: int) -> None:
    from .runner import reorg_answer_file

    with open(out, "w") as fout:
        for i in range(num_workers):
            shard = f"{out}.shard{i}"
            with open(shard) as f:
                fout.write(f.read())
            os.remove(shard)
    reorg_answer_file(out)


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--question-file", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-workers", type=int, default=1)
    p.add_argument("--worker-id", type=int, default=None,
                   help="(internal) run as worker i instead of launching")
    p.add_argument("--engine", default="sam_only",
                   choices=["ar", "sam_only", "sam_hybrid"])
    p.add_argument("--model-dir", default=None)
    p.add_argument("--sam", default=None, help="static corpus SAM (.npz)")
    p.add_argument("--vocab-size", type=int, default=256)
    # canonical policy knobs (reference scripts/inference_samd*.sh)
    p.add_argument("--max-predicts", type=int, default=60)
    p.add_argument("--alpha", type=float, default=4.0)
    p.add_argument("--len-bias", type=int, default=5)
    p.add_argument("--n-predicts", type=int, default=40)
    p.add_argument("--len-threshold", type=int, default=5)
    p.add_argument("--tree-method", default="token_recycle",
                   choices=["token_recycle", "eagle", "eagle2"])
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--max-cache-len", type=int, default=512)
    p.add_argument("--eos-token-id", type=int, default=-1)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--model-id", default="samd_tpu")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend in every worker")
    p.add_argument("--retention-check", action="store_true",
                   help="also run single-process on the same questions and "
                        "report per-worker throughput retention "
                        "(BASELINE.md: >=90%% per-chip retention at 2 "
                        "hosts; on N real hosts each worker owns a chip — "
                        "run one worker per host)")
    args = p.parse_args(argv)

    if args.cpu:
        from ..testing import force_cpu

        force_cpu()

    if args.worker_id is not None:
        stats = run_worker(args)
        print(json.dumps(stats))
        return

    if args.num_workers == 1:
        stats = run_worker(argparse.Namespace(**{**vars(args),
                                                "worker_id": 0}))
        print(json.dumps(stats))
        return

    single_stats = None
    if args.retention_check:
        single_stats = run_worker(argparse.Namespace(
            **{**vars(args), "worker_id": 0, "num_workers": 1,
               "out": args.out + ".single"}))
        os.remove(args.out + ".single")

    procs = []
    for i in range(args.num_workers):
        cmd = [sys.executable, "-m", "samd_tpu.evaluation.launch",
               "--worker-id", str(i)]
        for k, v in vars(args).items():
            if k in ("worker_id", "retention_check") or v in (None, False):
                continue
            flag = "--" + k.replace("_", "-")
            cmd += [flag] if v is True else [flag, str(v)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE if args.retention_check else None,
            text=True if args.retention_check else None))
    outs = [q.communicate()[0] for q in procs]
    rcs = [q.returncode for q in procs]
    if any(rcs):
        raise SystemExit(f"worker failures: rcs={rcs}")
    merge_shards(args.out, args.num_workers)
    report = {"merged": args.out, "workers": args.num_workers}
    if args.retention_check:
        # per-worker throughput vs the single-process run on the full set
        worker_stats = [json.loads(o.strip().splitlines()[-1]) for o in outs]
        per_worker = [s["tokens_per_s"] for s in worker_stats]
        base = single_stats["tokens_per_s"]
        report.update({
            "single_process_tokens_per_s": round(base, 2),
            "per_worker_tokens_per_s": [round(t, 2) for t in per_worker],
            "aggregate_tokens_per_s": round(sum(per_worker), 2),
            # BASELINE.md target: each worker (one per host/chip) should
            # retain >=90% of single-process throughput
            "per_worker_retention": [round(t / base, 3) if base else 0.0
                                     for t in per_worker],
        })
    print(json.dumps(report))


if __name__ == "__main__":
    main()
