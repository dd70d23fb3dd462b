"""Trained-weights acceptance demonstration.

Every other benchmark on this machine runs random weights (no checkpoint
access), so accept lengths there only pin engine *mechanics*.  This runner
produces honest accept numbers: it trains a small target LM and an EAGLE
draft net on a peaked Markov corpus (samd_tpu.training), round-trips the
target through the orbax checkpoint path, then measures mean accepted
tokens per verify step for each drafter family — the quantity the
reference's results tables report (e.g. 4.62 mean accepted for EAGLE-2,
/root/reference/README.md:57, BASELINE.md).

    python -m samd_tpu.evaluation.accept_demo [--cpu] [--steps 400]
        [--vocab 64] [--new-tokens 48] [--json]

Prints one row per (drafter, weights) and a JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run(steps: int = 400, vocab: int = 64, new_tokens: int = 48,
        seed: int = 0) -> dict:
    import numpy as np

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import SamdEngine
    from samd_tpu.models import tiny_config
    from samd_tpu.models.checkpoint import load_params, save_params
    from samd_tpu.sam import build_corpus_sam
    from samd_tpu.training import markov_corpus, train_eagle, train_lm

    cfg = tiny_config(vocab_size=vocab)
    corpus = markov_corpus(vocab, 20000, peak=0.9, branch=2, order=2,
                           seed=seed)
    log(f"training target LM ({steps} steps)...")
    params, lm_tail = train_lm(cfg, corpus, steps=steps, batch=16,
                               seq_len=64, seed=seed)
    log(f"  final LM loss {lm_tail[-1]:.3f}")
    log(f"training EAGLE draft net ({steps} steps)...")
    net, eg_tail = train_eagle(cfg, params, corpus, steps=steps, batch=16,
                               seq_len=64, seed=seed)
    log(f"  final distill loss {eg_tail[-1]:.3f}")

    # round-trip the target through the orbax checkpoint path: what serves
    # below is the *restored* copy (models/checkpoint.py end-to-end)
    with tempfile.TemporaryDirectory() as d:
        save_params(d, params, cfg)
        cfg, params = load_params(d)

    static_sam = build_corpus_sam([corpus.tolist()], eos_token=0, topk=8)
    gen = GenerationConfig(max_new_tokens=new_tokens, max_cache_len=256)
    rng = np.random.default_rng(seed + 1)
    prompts = [corpus[s:s + 32].tolist()
               for s in rng.integers(0, len(corpus) - 64, size=4)]

    def measure(scfg: SamdConfig, *, eagle_net=None, sam=None):
        eng = SamdEngine(
            cfg, params, scfg,
            make_drafter(scfg, cfg.vocab_size, static_sam=sam,
                         model_cfg=cfg, params=params,
                         eagle_net_params=eagle_net),
            max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
        tok = steps_n = 0
        for p in prompts:
            o = eng.generate(p, gen)
            tok += o.decode_tokens
            steps_n += o.decode_steps
        return round(tok / max(steps_n, 1), 3), dict(eng.stats.source_counts)

    rows = {}
    # dynamic+static SAM retrieval: the corpus contains the model's
    # near-deterministic continuations, the reference's RAG/summarization
    # regime (BASELINE.md: 2.30 mean accepted for samd_sam_only)
    rows["sam_only_trained"], src = measure(
        SamdConfig(draft_source="sam_only", max_predicts=40, alpha=4.0),
        sam=static_sam)
    log(f"sam_only (trained, corpus SAM): accept {rows['sam_only_trained']}"
        f" sources {src}")
    rows["sam_only_dyn_trained"], _ = measure(
        SamdConfig(draft_source="sam_only", max_predicts=40, alpha=4.0))
    log(f"sam_only (trained, dynamic only): accept "
        f"{rows['sam_only_dyn_trained']}")
    rows["token_recycle_trained"], _ = measure(
        SamdConfig(draft_source="sam_hybrid", tree_method="token_recycle",
                   max_predicts=64, len_threshold=1000))
    log(f"token_recycle (trained): accept {rows['token_recycle_trained']}")

    # --- Token-Recycle order diagnosis (round-2 verdict #5) --------------
    # TR's harvest table is keyed by ONE token (reference token_recycle
    # adapter table, evaluation/model/token_recycle/*), i.e. it drafts from
    # order-1 context.  The demo corpus above is order-2 by design (so
    # retrieval has something to retrieve), which deliberately withholds
    # the information TR drafts from: given only the last token there are
    # ~2 hidden contexts × 2 branches, so the table's top-1 is right only
    # ~half the time — the measured ~1.5 accept is the CORPUS ceiling, not
    # a harvest/tree defect.  The diagnosis row trains the same model on an
    # order-1 corpus (where single-token context carries the mass, as in
    # natural text) and re-measures: TR's accept must then clear the
    # reference's 2.83-class range.
    corpus1 = markov_corpus(vocab, 20000, peak=0.9, branch=2, order=1,
                            seed=seed + 7)
    log(f"training order-1 target LM ({steps} steps)...")
    params1, lm1_tail = train_lm(cfg, corpus1, steps=steps, batch=16,
                                 seq_len=64, seed=seed + 7)
    prompts1 = [corpus1[s:s + 32].tolist()
                for s in rng.integers(0, len(corpus1) - 64, size=4)]

    def measure1(scfg: SamdConfig):
        eng = SamdEngine(
            cfg, params1, scfg,
            make_drafter(scfg, cfg.vocab_size, model_cfg=cfg,
                         params=params1),
            max_cache_len=256, eos_token_id=-1, prefill_buckets=(32,))
        tok = steps_n = 0
        for p in prompts1:
            o = eng.generate(p, gen)
            tok += o.decode_tokens
            steps_n += o.decode_steps
        return round(tok / max(steps_n, 1), 3)

    rows["token_recycle_trained_order1"] = measure1(
        SamdConfig(draft_source="sam_hybrid", tree_method="token_recycle",
                   max_predicts=64, len_threshold=1000))
    log(f"token_recycle (trained, order-1 corpus): accept "
        f"{rows['token_recycle_trained_order1']} "
        f"(order-2 ceiling row: {rows['token_recycle_trained']})")
    rows["eagle2_trained"], _ = measure(
        SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                   max_predicts=64, len_threshold=1000), eagle_net=net)
    log(f"eagle2 (trained net): accept {rows['eagle2_trained']}")
    rows["eagle2_random_net"], _ = measure(
        SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                   max_predicts=64, len_threshold=1000))
    log(f"eagle2 (random net): accept {rows['eagle2_random_net']}")
    # the flagship hybrid: SAM retrieval when the automaton is confident,
    # EAGLE beam otherwise (reference samd/draft.py:52-63)
    rows["sam_eagle2_trained"], src = measure(
        SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                   max_predicts=64, len_threshold=5, len_bias=5),
        eagle_net=net, sam=static_sam)
    log(f"SAM[eagle2] hybrid (trained): accept {rows['sam_eagle2_trained']}"
        f" sources {src}")

    # the same trained net through the BATCHED SAM[EAGLE-2] engine
    # (continuous batching; per-slot draft-net KV) — the serving config's
    # accept must match the single-stream drafter stack's
    from samd_tpu.fused_hybrid import (BatchedFusedHybridEagleEngine,
                                       FusedHybridEagleConfig)

    # same tree shape as the single-stream eagle2 rows (depth 5, topk 8,
    # 63-node selection) so the accepts are apples-to-apples
    beng = BatchedFusedHybridEagleEngine(
        cfg, params,
        FusedHybridEagleConfig(steps_per_call=8, len_threshold=1000),
        net_params=net, batch_size=2, max_cache_len=256, eos_token_id=-1,
        prefill_buckets=(32,))
    for p in prompts:
        beng.add_request(p, gen)
    bres = beng.run()
    tok = sum(r.decode_tokens for r in bres.values())
    stp = sum(r.decode_steps for r in bres.values())
    rows["eagle2_trained_batched"] = round(tok / max(stp, 1), 3)
    log(f"eagle2 (trained net, BATCHED engine B=2): accept "
        f"{rows['eagle2_trained_batched']}")

    return {
        "lm_loss": round(lm_tail[-1], 4),
        "eagle_loss": round(eg_tail[-1], 4),
        "accept": rows,
        "reference_targets": {
            "samd_sam_only_mean_accept": 2.30,
            "samd_token_recycle_mean_accept": 3.03,
            "eagle2_mean_accept": 4.62,
        },
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--vocab", type=int, default=64)
    p.add_argument("--new-tokens", type=int, default=48)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.cpu:
        from samd_tpu.testing import force_cpu

        force_cpu()
    out = run(steps=args.steps, vocab=args.vocab,
              new_tokens=args.new_tokens, seed=args.seed)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
