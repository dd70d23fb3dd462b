#!/usr/bin/env python
"""Headline benchmark: speedup of SAM-Decoding engines over the engine's own
autoregressive baseline, on real TPU hardware.

No public checkpoints exist on this machine, so the flagship model is a
1B-class Llama with seeded random weights (bf16) and the workload is
synthetic: the "overlap" prompts have a static corpus built from the
oracle's own outputs (the summarization/RAG regime where retrieval drafts
dominate), the "fresh" prompts exercise the dynamic-SAM-only cold regime.
These numbers pin engine mechanics (dispatch structure, accept bookkeeping,
losslessness); they are NOT Spec-Bench numbers — real-checkpoint parity runs
need real weights (see docs/PERFORMANCE.md).

Speedup = engine tokens/s ÷ AR tokens/s, same prompts, greedy, bs=1, both
sides timed best-of-2 (the TPU tunnel's per-call latency varies run to run;
greedy outputs are deterministic across repeats).  Losslessness: outputs are
asserted token-identical to an ``ArBaseline(block_size=M)`` oracle compiled
with the same block shape M as the engine under test.

Artifact protocol (evaluation/bench_emit.py): after EVERY section a compact
(<1800 char) headline JSON line is printed to stdout and the full detail is
rewritten to ``bench_detail.json`` — the driver's 2000-char tail capture
always contains the last complete line, and a crash/OOM in section N still
leaves sections 1..N-1 parsed.  Progress goes to stderr.

Wall-clock budget (round-4 post-mortem: BENCH_r04.json died at rc=124 with
the two honesty sections unrun): sections execute in INFORMATION-VALUE
order — AR oracles, flagship, int8/int4, trained-accept + Spec-Bench
pipeline, 7B, serving configs, then the long tail — each with a cost
estimate; when the remaining budget (``SAMD_BENCH_BUDGET_S`` env, default
3000 s, chosen under the driver's ~3600 s ceiling) cannot cover a section's
estimate it is SKIPPED (recorded in ``skipped_sections``) instead of
running the artifact off a cliff.  The final line always carries
``complete: true`` plus the skip list; per-section wall times land in
``detail.section_seconds`` so the estimates stay honest round over round.
"""

import os
import sys
import time
import traceback
from types import SimpleNamespace

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def timed_generate(engine, prompts, gen, repeats=2):
    """Best-of-`repeats` wall time (tunnel latency varies run to run;
    best-of stabilizes the recorded number without changing outputs —
    greedy generation is deterministic across repeats)."""
    best = None
    for _ in range(repeats):
        total_tokens = 0
        total_steps = 0
        outs = []
        t0 = time.perf_counter()
        for p in prompts:
            out = engine.generate(p, gen)
            total_tokens += out.decode_tokens
            total_steps += out.decode_steps
            outs.append(out.output_ids)
        dt = time.perf_counter() - t0
        if best is None or dt < best[3]:
            best = (outs, total_tokens, total_steps, dt)
    return best


def main():
    import gc

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: first-time XLA program loads through the
    # remote-compile tunnel can stall minutes; cache them across runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/samd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from samd_tpu.config import GenerationConfig, SamdConfig
    from samd_tpu.drafters import make_drafter
    from samd_tpu.engine import ArBaseline, SamdEngine
    from samd_tpu.evaluation.bench_emit import BenchEmitter
    from samd_tpu.fused_sam import FusedSamConfig, FusedSamEngine
    from samd_tpu.models import init_params, llama_1b, param_count
    from samd_tpu.sam import build_corpus_sam

    log(f"devices: {jax.devices()}")
    # attention_impl="xla": the fused XLA attention beats the standalone
    # Pallas kernel end-to-end at this scale (per-layer KV transpose +
    # kernel launch overhead exceed the dead-tail savings for a 1B model).
    cfg = llama_1b()
    params = init_params(cfg, jax.random.PRNGKey(0))
    log(f"model: {param_count(params) / 1e9:.2f}B params, dtype={cfg.dtype}")

    MAX_CACHE = 1024
    PROMPT_LEN = 96
    NEW_TOKENS = 128
    N_PROMPTS = 2
    M = 60        # host samd + fused-sam block
    M64 = 64      # fused hybrid / EAGLE block
    gen = GenerationConfig(max_new_tokens=NEW_TOKENS, max_cache_len=MAX_CACHE)
    warm = GenerationConfig(max_new_tokens=8, max_cache_len=MAX_CACHE)
    rng = np.random.default_rng(42)
    prompts = [rng.integers(3, cfg.vocab_size, size=PROMPT_LEN).tolist()
               for _ in range(2 * N_PROMPTS)]
    overlap_prompts, fresh_prompts = prompts[:N_PROMPTS], prompts[N_PROMPTS:]
    all_prompts = overlap_prompts + fresh_prompts
    warm_prompt = prompts[0][:64] + prompts[0][:32]
    detail = {}
    # emits a compact (<1800 char) stdout line + rewrites bench_detail.json
    # after EVERY section: a crash/OOM in section N leaves 1..N-1 parsed
    em = BenchEmitter(detail)

    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=M,
                          alpha=4.0, len_bias=0)
    fscfg = FusedSamConfig(steps_per_call=256, corpus_capacity=4096)
    S = SimpleNamespace()   # cross-section shared state; a section's outputs
    # land on S at its END so downstream deps skip cleanly if it failed

    sections = []

    def section(name, est_s, deps=()):
        def reg(fn):
            sections.append((name, est_s, deps, fn))
            return fn
        return reg

    # ------------------------------------------------------------------
    # 1. AR speed baseline (efficient 1-token steps)
    # ------------------------------------------------------------------
    @section("ar_baseline", 90)
    def sec_ar():
        ar = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                        eos_token_id=-1, prefill_buckets=(128,))
        log("AR warmup/compile...")
        ar.generate(warm_prompt, warm)
        _, ar_tok, ar_steps, ar_dt = timed_generate(ar, all_prompts, gen)
        ar_tps = ar_tok / ar_dt
        log(f"AR: {ar_tok} tokens in {ar_dt:.2f}s = {ar_tps:.1f} tok/s "
            f"({1000 * ar_dt / max(ar_steps, 1):.1f} ms/step)")
        detail["ar_tokens_per_s"] = round(ar_tps, 2)
        detail["ar_ms_per_step"] = round(1000 * ar_dt / max(ar_steps, 1), 2)
        S.ar_tps = ar_tps

    # ------------------------------------------------------------------
    # 2. AR equality oracles (same block kernels as the engines) + corpora
    # ------------------------------------------------------------------
    @section("oracles", 90)
    def sec_oracles():
        oracle = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                            eos_token_id=-1, prefill_buckets=(128,),
                            block_size=M)
        log("oracle (block-60 AR) run...")
        oracle_outs, *_ = timed_generate(oracle, all_prompts, gen, repeats=1)
        oracle64 = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                              eos_token_id=-1, prefill_buckets=(128,),
                              block_size=M64)
        log("oracle (block-64 AR) run...")
        oracle64_outs, *_ = timed_generate(oracle64, all_prompts, gen,
                                           repeats=1)
        # corpora from oracle outputs (overlap regime)
        corpus = [o for o in oracle_outs[:N_PROMPTS]]
        static_sam = build_corpus_sam(corpus, eos_token=0, topk=8)
        log(f"static SAM: {static_sam.num_states} states")
        corpus64 = []
        for o in oracle64_outs[:N_PROMPTS]:
            corpus64 += o + [0]
        S.oracle_outs = oracle_outs
        S.oracle64_outs = oracle64_outs
        S.static_sam = static_sam
        S.corpus64 = corpus64

    # ------------------------------------------------------------------
    # 3. fused SAM-style retrieval engine (flagship serving mode)
    # ------------------------------------------------------------------
    @section("fused_sam", 130, deps=("ar_tps",))
    def sec_fused_sam():
        fs_probe = FusedSamEngine(cfg, params, fscfg, max_cache_len=MAX_CACHE,
                                  eos_token_id=-1, prefill_buckets=(128,))
        fs_probe.generate(prompts[0][:64],
                          GenerationConfig(max_new_tokens=4,
                                           max_cache_len=MAX_CACHE))
        # corpus from the engine's own trajectory on the overlap prompts
        # (same compiled kernel => bitwise-consistent retrieval source)
        fs_oracle = [fs_probe.generate(p, gen).output_ids
                     for p in overlap_prompts]
        fs_corpus = []
        for o in fs_oracle:
            fs_corpus += o + [0]
        fs = FusedSamEngine(cfg, params, fscfg, corpus=fs_corpus,
                            max_cache_len=MAX_CACHE, eos_token_id=-1,
                            prefill_buckets=(128,))
        fs.generate(prompts[0][:64],
                    GenerationConfig(max_new_tokens=4,
                                     max_cache_len=MAX_CACHE))
        fs_outs, fs_tok, fs_steps, fs_dt = timed_generate(fs, all_prompts,
                                                          gen)
        fs_tps = fs_tok / fs_dt
        fs_ms = 1000 * fs_dt / max(fs_steps, 1)
        fs_accept = fs_tok / max(fs_steps, 1)
        fs_equal = sum(int(a == b) for a, b in zip(fs_oracle, fs_outs[:2]))
        log(f"fused-sam: {fs_tps:.1f} tok/s, accept {fs_accept:.2f}, "
            f"{fs_ms:.2f} ms/step, overlap trajectory equal {fs_equal}/2")
        detail.update({
            "fused_sam_tokens_per_s": round(fs_tps, 2),
            "fused_sam_speedup": round(fs_tps / S.ar_tps, 4),
            "fused_sam_mean_accept": round(fs_accept, 3),
            "fused_sam_ms_per_step": round(fs_ms, 3),
            "fused_sam_overlap_trajectory_equal": fs_equal == 2,
        })
        # the headline metric is known from here on; every later emit
        # carries it
        em.value = round(fs_tps / S.ar_tps, 4)
        em.vs_baseline = round(fs_tps / S.ar_tps / 1.84, 4)
        S.fs = fs
        S.fs_oracle = fs_oracle
        S.fs_corpus = fs_corpus
        S.fs_ms = fs_ms
        S.fs_tps = fs_tps

    # ------------------------------------------------------------------
    # 4. INT8 weight-only fused-sam, measured against its own INT8 oracle
    # ------------------------------------------------------------------
    # INT8 matmuls change near-tie argmaxes, so the INT8 engine's trajectory
    # differs from bf16's; a corpus built from bf16 outputs therefore never
    # matches and the accept rate collapses (this was the r01 anomaly: 126.9
    # vs 219.3 tok/s).  Retrieval quality is a property of the corpus, not
    # the dtype — so INT8 is benched like bf16: corpus from its own
    # trajectory, equality vs its own block-AR oracle.
    @section("int8_fused_sam", 130, deps=("fs_ms",))
    def sec_int8():
        from samd_tpu.ops.quant import quantize_llama_params

        qparams = quantize_llama_params(params)
        q_probe = FusedSamEngine(cfg, qparams, fscfg, max_cache_len=MAX_CACHE,
                                 eos_token_id=-1, prefill_buckets=(128,))
        q_probe.generate(prompts[0][:64],
                         GenerationConfig(max_new_tokens=4,
                                          max_cache_len=MAX_CACHE))
        q_oracle = [q_probe.generate(p, gen).output_ids
                    for p in overlap_prompts]
        q_corpus = []
        for o in q_oracle:
            q_corpus += o + [0]
        fsq = FusedSamEngine(cfg, qparams, fscfg, corpus=q_corpus,
                             max_cache_len=MAX_CACHE, eos_token_id=-1,
                             prefill_buckets=(128,))
        fsq.generate(prompts[0][:64],
                     GenerationConfig(max_new_tokens=4,
                                      max_cache_len=MAX_CACHE))
        q_outs, q_tok, q_steps, q_dt = timed_generate(fsq, all_prompts, gen)
        q_tps = q_tok / q_dt
        q_ms = 1000 * q_dt / max(q_steps, 1)
        q_accept = q_tok / max(q_steps, 1)
        q_equal = sum(int(a == b) for a, b in zip(q_oracle, q_outs[:2]))
        log(f"int8 fused-sam (own oracle): {q_tps:.1f} tok/s, "
            f"accept {q_accept:.2f}, {q_ms:.2f} ms/step, "
            f"overlap trajectory equal {q_equal}/2")
        detail.update({
            "int8_fused_sam_tokens_per_s": round(q_tps, 2),
            "int8_fused_sam_mean_accept": round(q_accept, 3),
            "int8_fused_sam_ms_per_step": round(q_ms, 3),
            "int8_fused_sam_overlap_trajectory_equal": q_equal == 2,
            "int8_vs_bf16_step_time_ratio": round(q_ms / S.fs_ms, 3),
        })
        S.qparams = qparams
        S.q_ms = q_ms

    # ------------------------------------------------------------------
    # 5. INT4 weight-only fused-sam (Pallas weight-streaming kernel)
    # ------------------------------------------------------------------
    # Packed nibbles (uint8 bytes, zero-point 8) unpacked in-register by
    # ops/int4_matmul — true 0.5 bytes/weight HBM streaming (the S4-dtype
    # platform block only forbids S4 *arrays*, not packed bytes).  Same
    # own-trajectory methodology as int8: int4 matmuls flip near-tie
    # argmaxes, so corpus + equality come from the int4 engine itself.
    @section("int4_fused_sam", 160, deps=("fs_ms",))
    def sec_int4():
        from dataclasses import replace as _dcr

        from samd_tpu.ops.quant import quantize_llama_params as _qlp

        cfg4 = _dcr(cfg, int4_impl="kernel")
        i4params = _qlp(params, dtype=jnp.int4)
        i4_probe = FusedSamEngine(cfg4, i4params, fscfg,
                                  max_cache_len=MAX_CACHE, eos_token_id=-1,
                                  prefill_buckets=(128,))
        log("int4 fused-sam warmup/compile...")
        i4_probe.generate(prompts[0][:64],
                          GenerationConfig(max_new_tokens=4,
                                           max_cache_len=MAX_CACHE))
        i4_oracle = [i4_probe.generate(p, gen).output_ids
                     for p in overlap_prompts]
        i4_corpus = []
        for o in i4_oracle:
            i4_corpus += o + [0]
        fs4 = FusedSamEngine(cfg4, i4params, fscfg, corpus=i4_corpus,
                             max_cache_len=MAX_CACHE, eos_token_id=-1,
                             prefill_buckets=(128,))
        fs4.generate(prompts[0][:64],
                     GenerationConfig(max_new_tokens=4,
                                      max_cache_len=MAX_CACHE))
        i4_outs, i4_tok, i4_steps, i4_dt = timed_generate(
            fs4, all_prompts, gen)
        i4_tps = i4_tok / i4_dt
        i4_ms = 1000 * i4_dt / max(i4_steps, 1)
        i4_equal = sum(int(a == b) for a, b in zip(i4_oracle, i4_outs[:2]))
        log(f"int4 fused-sam (own oracle): {i4_tps:.1f} tok/s, "
            f"accept {i4_tok / max(i4_steps, 1):.2f}, {i4_ms:.2f} ms/step, "
            f"overlap trajectory equal {i4_equal}/2")
        detail.update({
            "int4_fused_sam_tokens_per_s": round(i4_tps, 2),
            "int4_fused_sam_mean_accept":
                round(i4_tok / max(i4_steps, 1), 3),
            "int4_fused_sam_ms_per_step": round(i4_ms, 3),
            "int4_fused_sam_overlap_trajectory_equal": i4_equal == 2,
            "int4_vs_bf16_step_time_ratio": round(i4_ms / S.fs_ms, 3),
        })
        if hasattr(S, "q_ms"):
            detail["int4_vs_int8_step_time_ratio"] = round(i4_ms / S.q_ms, 3)
        del i4_probe, fs4, i4params

    # ------------------------------------------------------------------
    # 6. trained-weights acceptance (tiny model, honest accept numbers)
    # ------------------------------------------------------------------
    # Every engine row runs random weights (mechanics only).  This trains a
    # tiny target + EAGLE draft net on a peaked Markov corpus ON this TPU
    # and reports real mean-accepted-tokens — the quantity the reference's
    # results tables report (BASELINE.md: 2.30 sam_only / 3.03 TR / 4.62
    # EAGLE-2).  See samd_tpu/evaluation/accept_demo.py.  Moved up from the
    # bench tail (r04 lost it to the wall clock at position 30).
    @section("trained_accept", 350)
    def sec_trained_accept():
        from samd_tpu.evaluation.accept_demo import run as accept_demo_run

        log("trained-weights accept demo (training tiny model + EAGLE "
            "net on-device)...")
        t0 = time.perf_counter()
        demo = accept_demo_run(steps=400, vocab=64, new_tokens=48)
        log(f"accept demo done in {time.perf_counter() - t0:.1f}s: "
            f"{demo['accept']}")
        detail.update({
            "trained_tiny_lm_loss": demo["lm_loss"],
            "trained_accept_sam_only_corpus":
                demo["accept"]["sam_only_trained"],
            "trained_accept_eagle2": demo["accept"]["eagle2_trained"],
            "trained_accept_eagle2_batched":
                demo["accept"].get("eagle2_trained_batched"),
            "trained_accept_eagle2_random_net":
                demo["accept"]["eagle2_random_net"],
            "trained_accept_sam_eagle2_hybrid":
                demo["accept"]["sam_eagle2_trained"],
            # TR harvest drafts from order-1 context; the order-1-corpus
            # row is the apples-to-apples accept (reference 2.83), the
            # order-2 row shows that corpus' information-theoretic ceiling
            # (round-2 verdict #5 diagnosis — see accept_demo.py)
            "trained_accept_token_recycle":
                demo["accept"].get("token_recycle_trained_order1"),
            "trained_accept_token_recycle_order2_ceiling":
                demo["accept"].get("token_recycle_trained"),
            "reference_eagle2_mean_accept": 4.62,
            "reference_token_recycle_mean_accept": 2.83,
        })

    # ------------------------------------------------------------------
    # 7. end-to-end Spec-Bench pipeline (trained tiny model)
    # ------------------------------------------------------------------
    # Runs the COMPLETE reference eval stack on this TPU: question file ->
    # run_eval (warmup/multi-turn/fault-tolerance) -> answer JSONL ->
    # reorg -> speed.py per-task speedups -> equal.py, with the trained
    # tiny model over the synthetic Spec-Bench-shaped suite
    # (samd_tpu/evaluation/specbench_demo.py; reference:
    # evaluation/eval_vicuna.py + speed.py + equal.py).  Moved up (r04
    # lost it at position 31).
    @section("specbench_pipeline", 350)
    def sec_specbench():
        from samd_tpu.evaluation.specbench_demo import run as specbench_run

        log("spec-bench pipeline demo (trained tiny model, full eval "
            "stack)...")
        t0 = time.perf_counter()
        sb = specbench_run(steps=300, vocab=64, per_task=2, new_tokens=64)
        log(f"spec-bench pipeline done in {time.perf_counter() - t0:.1f}s")
        for name, row in sb["engines"].items():
            detail[f"specbench_{name}_task_speedups"] = row["speedup"]
            detail[f"specbench_{name}_mean_accept"] = row["mean_accept"]
            detail[f"specbench_{name}_equal"] = (
                row["outputs_equal_vs_block_oracle"])
            detail[f"specbench_{name}_errors"] = row["errors"]
        detail.update({
            "specbench_sam_only_speedup":
                sb["engines"]["sam_only"]["speedup"].get("overall"),
            "specbench_fused_sam_speedup":
                sb["engines"]["fused_sam"]["speedup"].get("overall"),
            "specbench_equal": all(
                row["outputs_equal_vs_block_oracle"]
                for row in sb["engines"].values()),
        })

    # ------------------------------------------------------------------
    # 8. 7B-class INT8: production scale on ONE chip
    # ------------------------------------------------------------------
    # bf16 7B (13.5 GB) does not fit a 16 GB v5e next to the bench's other
    # engines; int8 weight-only (6.8 GB) does — this is the quantization
    # feature's actual point.  Random weights in direct 1-byte init
    # (ops/quant.init_quantized_llama_params), own-trajectory corpus, own
    # int8 AR baseline as denominator.
    @section("7b_int8", 320)
    def sec_7b_int8():
        from samd_tpu.models import llama_7b
        from samd_tpu.ops.quant import init_quantized_llama_params

        params7 = ar7 = p7 = f7 = None
        try:
            cfg7 = llama_7b()
            params7 = init_quantized_llama_params(cfg7, jax.random.PRNGKey(0))
            # tiny q-slices for the int4 same-base-weights verification
            # (section 9 regenerates the identical int8 values on the host)
            S.int8_7b_checks = {
                name: np.asarray(params7["layers"][name].q[0, :2, :64])
                for name in ("wq", "wk", "wv", "wo",
                             "w_gate", "w_up", "w_down")}
            S.int8_7b_checks["lm_head"] = np.asarray(
                params7["lm_head"].q[:2, :64])
            ar7 = ArBaseline(cfg7, params7, max_cache_len=MAX_CACHE,
                             eos_token_id=-1, prefill_buckets=(128,))
            log("7B int8 AR warmup/compile...")
            ar7.generate(warm_prompt, warm)
            _, a7_tok, a7_steps, a7_dt = timed_generate(ar7, all_prompts,
                                                        gen)
            a7_tps = a7_tok / a7_dt
            log(f"7B int8 AR: {a7_tps:.1f} tok/s "
                f"({1000 * a7_dt / max(a7_steps, 1):.1f} ms/step)")
            # 7B-tuned config (r03 decomposition, scripts/profile_step.py):
            # (a) per-request cache buckets — 7B KV is 16 KB/token (KH=32,
            # D=128), so XLA attention over the dead 1024-column tail costs
            # 2.5-3.8 ms/step; a bucketed cache (smallest >= prompt+budget+
            # block) makes attention scale with REACHABLE length (an
            # attention-window SLICE of the big cache recovered nothing —
            # XLA materializes the copy); (b) M=16 verify block — 7B accept
            # is ~1.9, and the H=4096 step pays ~1.5 ms going M=16 -> 60.
            # Measured: 17.1 -> 12.8 ms/step (116 -> 147 tok/s), accept
            # 1.95 -> 1.88, lossless vs own oracle.  Own-trajectory rule:
            # probe + engine share the knobs.
            fscfg7 = FusedSamConfig(steps_per_call=256, corpus_capacity=4096,
                                    n_predicts=15,
                                    cache_buckets=(256, 384, 512, 768))
            p7 = FusedSamEngine(cfg7, params7, fscfg7,
                                max_cache_len=MAX_CACHE, eos_token_id=-1,
                                prefill_buckets=(128,))
            log("7B int8 fused-sam warmup/compile...")
            p7.generate(warm_prompt, warm)
            o7 = [p7.generate(p, gen).output_ids for p in overlap_prompts]
            c7 = []
            for o in o7:
                c7 += o + [0]
            f7 = FusedSamEngine(cfg7, params7, fscfg7, corpus=c7,
                                max_cache_len=MAX_CACHE, eos_token_id=-1,
                                prefill_buckets=(128,))
            f7.generate(warm_prompt, warm)
            f7_outs, f7_tok, f7_steps, f7_dt = timed_generate(
                f7, all_prompts, gen)
            f7_tps = f7_tok / f7_dt
            f7_equal = sum(int(a == b) for a, b in zip(o7, f7_outs[:2]))
            log(f"7B int8 fused-sam: {f7_tps:.1f} tok/s, accept "
                f"{f7_tok / max(f7_steps, 1):.2f}, "
                f"{1000 * f7_dt / max(f7_steps, 1):.2f} ms/step, "
                f"equal {f7_equal}/2, "
                f"speedup {f7_tps / a7_tps:.2f}x vs own AR")
            detail.update({
                "int8_7b_ar_tokens_per_s": round(a7_tps, 2),
                "int8_7b_fused_sam_tokens_per_s": round(f7_tps, 2),
                "int8_7b_fused_sam_mean_accept":
                    round(f7_tok / max(f7_steps, 1), 3),
                "int8_7b_fused_sam_ms_per_step":
                    round(1000 * f7_dt / max(f7_steps, 1), 3),
                "int8_7b_fused_sam_speedup_vs_own_ar":
                    round(f7_tps / a7_tps, 4),
                "int8_7b_fused_sam_overlap_trajectory_equal": f7_equal == 2,
            })
            # 7B int8 BATCHED serving is measured standalone
            # (scripts/profile_7b_paged.py; docs/PERFORMANCE.md): inside
            # the bench the 6.8 GB int8 tree next to the resident 1B
            # engines leaves no headroom for a 12-slot paged program, and
            # on the tunneled backend an OOM wedges the process.  The int4
            # tree (3.4 GB) DOES fit — section 9 carries the in-bench 7B
            # paged-batched row.
        finally:
            # drop 7B references wherever the section stopped — a
            # half-allocated 7B tree left alive would starve every later
            # section of HBM
            params7 = ar7 = p7 = f7 = None
            gc.collect()

    # ------------------------------------------------------------------
    # 9. 7B-class INT4: the weight-streaming kernel at real scale,
    #    SAME base weights as the int8 row, plus the paged-batched
    #    serving config (VERDICT r4 #2/#4)
    # ------------------------------------------------------------------
    # The 7B decode step is weight-streaming-bound (docs/PERFORMANCE.md "7B
    # step decomposition"); packed int4 (3.4 GB) halves the int8 stream via
    # the Pallas kernel.  The int4 tree is REQUANTIZED FROM THE INT8 ROW'S
    # BASE WEIGHTS (ops/quant.int4_requant_from_int8_init: identical
    # threefry draws regenerated on the host, verified against the device
    # tree's q-slices) so accept/equality/tok-s columns are comparable —
    # r04's fresh random int4 init was a different, degenerate-leaning
    # model.  Own int4 AR denominator + own-trajectory corpus as always.
    @section("7b_int4", 430)
    def sec_7b_int4():
        from dataclasses import replace as _dcr

        from samd_tpu.fused_sam import PagedBatchedFusedSamEngine
        from samd_tpu.models import llama_7b as _l7b
        from samd_tpu.ops.quant import int4_requant_from_int8_init as _rq

        params7q = ar7q = p7q = f7q = pg = pgp = None
        try:
            cfg7q = _dcr(_l7b(), int4_impl="kernel")
            log("7B int4: regenerating the int8 base weights on host + "
                "requantizing to packed int4...")
            t0 = time.perf_counter()
            params7q, base_checks = _rq(cfg7q, jax.random.PRNGKey(0))
            log(f"requant done in {time.perf_counter() - t0:.1f}s")
            if hasattr(S, "int8_7b_checks"):
                match = all(np.array_equal(base_checks[k],
                                           S.int8_7b_checks[k])
                            for k in S.int8_7b_checks)
                detail["int4_7b_base_weights_match_int8_row"] = bool(match)
                log(f"int4 base weights == int8 row's base: {match}")
            ar7q = ArBaseline(cfg7q, params7q, max_cache_len=MAX_CACHE,
                              eos_token_id=-1, prefill_buckets=(128,))
            log("7B int4 AR warmup/compile...")
            ar7q.generate(warm_prompt, warm)
            _, a7q_tok, a7q_steps, a7q_dt = timed_generate(ar7q, all_prompts,
                                                           gen)
            a7q_tps = a7q_tok / a7q_dt
            log(f"7B int4 AR: {a7q_tps:.1f} tok/s "
                f"({1000 * a7q_dt / max(a7q_steps, 1):.1f} ms/step)")
            # same 7B-tuned knobs as the int8 row (cache buckets + M=16)
            fscfg7q = FusedSamConfig(steps_per_call=256,
                                     corpus_capacity=4096, n_predicts=15,
                                     cache_buckets=(256, 384, 512, 768))
            p7q = FusedSamEngine(cfg7q, params7q, fscfg7q,
                                 max_cache_len=MAX_CACHE, eos_token_id=-1,
                                 prefill_buckets=(128,))
            log("7B int4 fused-sam warmup/compile...")
            p7q.generate(warm_prompt, warm)
            o7q = [p7q.generate(p, gen).output_ids for p in overlap_prompts]
            c7q = []
            for o in o7q:
                c7q += o + [0]
            f7q = FusedSamEngine(cfg7q, params7q, fscfg7q, corpus=c7q,
                                 max_cache_len=MAX_CACHE, eos_token_id=-1,
                                 prefill_buckets=(128,))
            f7q.generate(warm_prompt, warm)
            f7q_outs, f7q_tok, f7q_steps, f7q_dt = timed_generate(
                f7q, all_prompts, gen)
            f7q_tps = f7q_tok / f7q_dt
            f7q_equal = sum(int(a == b) for a, b in zip(o7q, f7q_outs[:2]))
            log(f"7B int4 fused-sam: {f7q_tps:.1f} tok/s, accept "
                f"{f7q_tok / max(f7q_steps, 1):.2f}, "
                f"{1000 * f7q_dt / max(f7q_steps, 1):.2f} ms/step, "
                f"equal {f7q_equal}/2, "
                f"speedup {f7q_tps / a7q_tps:.2f}x vs own AR")
            detail.update({
                "int4_7b_ar_tokens_per_s": round(a7q_tps, 2),
                "int4_7b_fused_sam_tokens_per_s": round(f7q_tps, 2),
                "int4_7b_fused_sam_mean_accept":
                    round(f7q_tok / max(f7q_steps, 1), 3),
                "int4_7b_fused_sam_ms_per_step":
                    round(1000 * f7q_dt / max(f7q_steps, 1), 3),
                "int4_7b_fused_sam_speedup_vs_own_ar":
                    round(f7q_tps / a7q_tps, 4),
                "int4_7b_fused_sam_overlap_trajectory_equal": f7q_equal == 2,
            })
            if "int8_7b_fused_sam_ms_per_step" in detail:
                detail["int4_7b_vs_int8_7b_step_time_ratio"] = round(
                    (1000 * f7q_dt / max(f7q_steps, 1))
                    / detail["int8_7b_fused_sam_ms_per_step"], 3)
            del p7q, f7q, ar7q
            p7q = f7q = ar7q = None
            gc.collect()

            # -- 7B int4 PAGED BATCHED: the production serving config on
            # one 16 GB chip (int8 WEIGHTS at this scale are
            # standalone-only: the 6.8 GB tree + pool OOMs next to the
            # resident 1B engines — scripts/profile_7b_paged.py).  B=12,
            # M=16 serving block, int8 KV pages (the production page
            # dtype: 7B KV is 512 KB/token across the 32 layers, so the
            # 52-page bf16 pool alone is 3.4 GB; int8 pages are 0.53x).
            # HBM discipline (r05 dev run: a second live bf16 pool OOMed
            # the chip AND wedged the tunnel for every later section):
            # free the probe before building the timed engine, and guard
            # on the backend's free-memory stats when available.
            pool_bytes = int(52 * 128 * 2 * cfg7q.num_layers
                             * cfg7q.num_kv_heads * cfg7q.head_dim * 1.06)
            try:
                st = jax.local_devices()[0].memory_stats()
                free = st["bytes_limit"] - st["bytes_in_use"]
            except Exception:
                free = None
            if free is not None and free < pool_bytes + (1 << 30):
                log(f"SKIP 7B int4 paged batched: only {free/1e9:.1f} GB "
                    f"free for a {pool_bytes/1e9:.1f} GB page pool")
                return
            pk_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
            mk = lambda corpus=None: PagedBatchedFusedSamEngine(
                cfg7q, params7q, pk_cfg, corpus=corpus, batch_size=12,
                max_cache_len=MAX_CACHE, eos_token_id=-1,
                prefill_buckets=(128,), n_pages=52, page_size=128,
                quantized_kv=True, interpret=False)
            log("7B int4 paged batched (B=12 M=16, int8 pages) "
                "warmup/compile...")
            pgp = mk()
            pgp.add_request(prompts[0][:64],
                            GenerationConfig(max_new_tokens=4,
                                             max_cache_len=MAX_CACHE))
            pgp.run()
            for p in overlap_prompts:
                pgp.add_request(p, gen)
            pg_corpus = []
            for r in pgp.run().values():
                pg_corpus += r.output_ids + [0]
            del pgp
            pgp = None
            gc.collect()
            pg = mk(pg_corpus)
            pg.add_request(prompts[0][:64],
                           GenerationConfig(max_new_tokens=4,
                                            max_cache_len=MAX_CACHE))
            pg.run()
            t0 = time.perf_counter()
            rids = [pg.add_request(p, gen) for p in all_prompts * 6]
            res = pg.run()
            dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in res.values())
            steps = sum(r.decode_steps for r in res.values())
            outs = [res[r].output_ids for r in rids]
            consistent = all(outs[i] == outs[i % len(all_prompts)]
                             for i in range(len(outs)))
            log(f"7B int4 paged batched (B=12 M=16, int8 pages): {tok} "
                f"tokens in {dt:.2f}s = {tok/dt:.1f} tok/s, accept "
                f"{tok/max(steps,1):.2f}, peak pages {pg.peak_pages}/52, "
                f"consistent {consistent}")
            detail.update({
                "int4_7b_paged_batched_tokens_per_s": round(tok / dt, 2),
                "int4_7b_paged_batched_mean_accept":
                    round(tok / max(steps, 1), 3),
                "int4_7b_paged_batched_outputs_consistent": consistent,
                "int4_7b_paged_batched_config":
                    "B=12 M=16 52x128 int8-KV pages",
            })
        finally:
            params7q = ar7q = p7q = f7q = pg = pgp = None
            gc.collect()

    # ------------------------------------------------------------------
    # 9b. 13B-class INT4: the reference's LARGEST Spec-Bench target
    #     (Vicuna-13B, served there on a 48 GB A6000 —
    #     /root/reference/README.md) on ONE 16 GB chip.  bf16 (26 GB) and
    #     int8 (13 GB) cannot fit next to anything; packed int4 (~6.6 GB)
    #     can — the capability row int4 exists for.  Weights requantized
    #     from the int8-style random base (int4_requant_from_int8_init:
    #     a FRESH uniform-nibble int4 init is degenerate-leaning and its
    #     repetitive outputs inflate retrieval accept to ~13 — measured,
    #     the same artifact the r04 verdict flagged at 7B), 7B-style
    #     cache buckets (13B KV is 820 KB/token across 40 layers), own
    #     int4 AR denominator + own-trajectory corpus.
    # ------------------------------------------------------------------
    @section("13b_int4", 420)
    def sec_13b_int4():
        from dataclasses import replace as _dcr

        from samd_tpu.models import llama_13b
        from samd_tpu.ops.quant import int4_requant_from_int8_init as _rq13

        params13 = ar13 = p13 = f13 = None
        try:
            need = 7 * (1 << 30) + 3 * (1 << 30)  # weights + caches/temps
            try:
                st = jax.local_devices()[0].memory_stats()
                free = st["bytes_limit"] - st["bytes_in_use"]
            except Exception:
                free = None
            if free is not None and free < need:
                log(f"SKIP 13B int4: only {free/1e9:.1f} GB free")
                return
            cfg13 = _dcr(llama_13b(), int4_impl="kernel")
            # layer_chunk: a full-tensor randint materializes a u32 bits
            # tensor (11.3 GB for 13B w_gate) — chunked draws bound the
            # transient; no 13B int8 row exists to bitwise-match anyway
            params13, _ = _rq13(cfg13, jax.random.PRNGKey(0), layer_chunk=4)
            ar13 = ArBaseline(cfg13, params13, max_cache_len=MAX_CACHE,
                              eos_token_id=-1, prefill_buckets=(128,))
            log("13B int4 AR warmup/compile...")
            ar13.generate(warm_prompt, warm)
            _, a13_tok, a13_steps, a13_dt = timed_generate(
                ar13, all_prompts, gen)
            a13_tps = a13_tok / a13_dt
            log(f"13B int4 AR: {a13_tps:.1f} tok/s "
                f"({1000 * a13_dt / max(a13_steps, 1):.1f} ms/step)")
            fscfg13 = FusedSamConfig(steps_per_call=256,
                                     corpus_capacity=4096, n_predicts=15,
                                     cache_buckets=(256, 384, 512, 768))
            p13 = FusedSamEngine(cfg13, params13, fscfg13,
                                 max_cache_len=MAX_CACHE, eos_token_id=-1,
                                 prefill_buckets=(128,))
            log("13B int4 fused-sam warmup/compile...")
            p13.generate(warm_prompt, warm)
            o13 = [p13.generate(p, gen).output_ids for p in overlap_prompts]
            c13 = []
            for o in o13:
                c13 += o + [0]
            f13 = FusedSamEngine(cfg13, params13, fscfg13, corpus=c13,
                                 max_cache_len=MAX_CACHE, eos_token_id=-1,
                                 prefill_buckets=(128,))
            f13.generate(warm_prompt, warm)
            f13_outs, f13_tok, f13_steps, f13_dt = timed_generate(
                f13, all_prompts, gen)
            f13_tps = f13_tok / f13_dt
            f13_equal = sum(int(a == b)
                            for a, b in zip(o13, f13_outs[:2]))
            log(f"13B int4 fused-sam: {f13_tps:.1f} tok/s, accept "
                f"{f13_tok / max(f13_steps, 1):.2f}, "
                f"{1000 * f13_dt / max(f13_steps, 1):.2f} ms/step, "
                f"equal {f13_equal}/2, "
                f"speedup {f13_tps / a13_tps:.2f}x vs own AR")
            detail.update({
                "int4_13b_ar_tokens_per_s": round(a13_tps, 2),
                "int4_13b_fused_sam_tokens_per_s": round(f13_tps, 2),
                "int4_13b_fused_sam_mean_accept":
                    round(f13_tok / max(f13_steps, 1), 3),
                "int4_13b_fused_sam_ms_per_step":
                    round(1000 * f13_dt / max(f13_steps, 1), 3),
                "int4_13b_fused_sam_speedup_vs_own_ar":
                    round(f13_tps / a13_tps, 4),
                "int4_13b_fused_sam_overlap_trajectory_equal":
                    f13_equal == 2,
            })
        finally:
            params13 = ar13 = p13 = f13 = None
            gc.collect()

    # ------------------------------------------------------------------
    # 10. TTFT: prefill (96 -> bucket 128) + one decode step + host
    #     overheads; same compiled programs as the flagship row (budget=1
    #     exits the fused loop after one iteration)
    # ------------------------------------------------------------------
    @section("ttft", 40, deps=("fs",))
    def sec_ttft():
        gen1 = GenerationConfig(max_new_tokens=1, max_cache_len=MAX_CACHE)
        S.fs.generate(prompts[0], gen1)
        ttft = min(_timed(lambda: S.fs.generate(prompts[0], gen1))
                   for _ in range(3))
        log(f"flagship TTFT (prefill 96 + 1 step): {1000 * ttft:.2f} ms")
        detail["flagship_ttft_ms"] = round(1000 * ttft, 2)

    # ------------------------------------------------------------------
    # 11. LONG-PROMPT TTFT (VERDICT r4 #7): serving reality includes
    #     2k-token prompts; this pins prefill cost at bucket 2048 for the
    #     flagship single-stream engine AND the paged batched engine
    #     (per-segment page pre-allocation covers the prompt).
    # ------------------------------------------------------------------
    @section("ttft_long_prompt", 280)
    def sec_ttft_long():
        from samd_tpu.fused_sam import PagedBatchedFusedSamEngine

        S_LONG = 4096
        long_prompt = rng.integers(3, cfg.vocab_size, size=2000).tolist()
        gen1 = GenerationConfig(max_new_tokens=1, max_cache_len=S_LONG)
        fsl = FusedSamEngine(cfg, params, fscfg, max_cache_len=S_LONG,
                             eos_token_id=-1, prefill_buckets=(2048,))
        log("long-prompt flagship warmup/compile (prefill bucket 2048, "
            "S=4096)...")
        fsl.generate(long_prompt, gen1)
        ttft = min(_timed(lambda: fsl.generate(long_prompt, gen1))
                   for _ in range(3))
        log(f"flagship TTFT (prefill 2000 + 1 step): {1000 * ttft:.2f} ms")
        detail["flagship_ttft_2k_prompt_ms"] = round(1000 * ttft, 2)
        del fsl

        pk_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
        pgl = PagedBatchedFusedSamEngine(
            cfg, params, pk_cfg, batch_size=4, max_cache_len=S_LONG,
            eos_token_id=-1, prefill_buckets=(2048,), n_pages=80,
            page_size=128, interpret=False)
        log("long-prompt paged batched warmup/compile...")
        pgl.add_request(long_prompt, gen1)
        pgl.run()

        def one():
            rid = pgl.add_request(long_prompt, gen1)
            return pgl.run()[rid]

        ttft_b = min(_timed(one) for _ in range(3))
        log(f"paged batched TTFT (prefill 2000 + 1 segment): "
            f"{1000 * ttft_b:.2f} ms")
        detail["paged_batched_ttft_2k_prompt_ms"] = round(1000 * ttft_b, 2)
        del pgl

    # ------------------------------------------------------------------
    # 12. INT8 batched fused-sam: B=4 + the peak-throughput config
    # ------------------------------------------------------------------
    # (int8 halves the per-step weight streaming that B=4 already shares
    # across slots).  The corpus must come from the *batched int8* engine's
    # own trajectory: its accumulation order differs from the single-stream
    # int8 forward's, so a single-stream corpus misses on near-tie flips
    # and accept collapses to ~1.15 (measured) — the own-trajectory rule
    # applies per compiled program, not just per dtype.
    @section("int8_batched", 280, deps=("qparams",))
    def sec_int8_batched():
        from samd_tpu.fused_sam import BatchedFusedSamEngine

        bq_probe = BatchedFusedSamEngine(
            cfg, S.qparams, fscfg, batch_size=4, max_cache_len=MAX_CACHE,
            eos_token_id=-1, prefill_buckets=(128,))
        bq_probe.add_request(prompts[0][:64],
                             GenerationConfig(max_new_tokens=4,
                                              max_cache_len=MAX_CACHE))
        bq_probe.run()
        for p in overlap_prompts:
            bq_probe.add_request(p, gen)
        bq_corpus = []
        for r in bq_probe.run().values():
            bq_corpus += r.output_ids + [0]
        bq = BatchedFusedSamEngine(cfg, S.qparams, fscfg, corpus=bq_corpus,
                                   batch_size=4, max_cache_len=MAX_CACHE,
                                   eos_token_id=-1, prefill_buckets=(128,))
        bq.add_request(prompts[0][:64],
                       GenerationConfig(max_new_tokens=4,
                                        max_cache_len=MAX_CACHE))
        bq.run()
        t0 = time.perf_counter()
        for p in all_prompts * 2:
            bq.add_request(p, gen)
        bq_res = bq.run()
        bq_dt = time.perf_counter() - t0
        bq_tok = sum(r.decode_tokens for r in bq_res.values())
        bq_steps = sum(r.decode_steps for r in bq_res.values())
        bq_tps = bq_tok / bq_dt
        log(f"int8 batched fused-sam (B=4): {bq_tok} tokens in {bq_dt:.2f}s "
            f"= {bq_tps:.1f} tok/s, accept {bq_tok/max(bq_steps,1):.2f}")
        detail["int8_batched_fused_sam_tokens_per_s"] = round(bq_tps, 2)
        detail["int8_batched_fused_sam_mean_accept"] = round(
            bq_tok / max(bq_steps, 1), 3)

        # peak-throughput config: B=12 with a SHORT verify block (M=16).
        # Block size is a batch-dependent knob: single-stream decode is
        # memory-bound (extra verify rows ride the weight streaming for
        # free -> M=60), but at B>=8 the B·M-row forward is compute-bound,
        # so wasted rows cost linearly — the block sweep measured
        # M=60: 649 tok/s, M=16: 1022 (B=8) / 1092 (B=12); B=16 saturates.
        # Own-trajectory corpus again: a different compiled program than
        # B=4, so the B=4 corpus may miss on near-tie flips.
        peak_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
        b8_probe = BatchedFusedSamEngine(
            cfg, S.qparams, peak_cfg, batch_size=12, max_cache_len=MAX_CACHE,
            eos_token_id=-1, prefill_buckets=(128,))
        b8_probe.add_request(prompts[0][:64],
                             GenerationConfig(max_new_tokens=4,
                                              max_cache_len=MAX_CACHE))
        b8_probe.run()
        for p in overlap_prompts:
            b8_probe.add_request(p, gen)
        b8_corpus = []
        for r in b8_probe.run().values():
            b8_corpus += r.output_ids + [0]
        b8 = BatchedFusedSamEngine(cfg, S.qparams, peak_cfg,
                                   corpus=b8_corpus, batch_size=12,
                                   max_cache_len=MAX_CACHE, eos_token_id=-1,
                                   prefill_buckets=(128,))
        b8.add_request(prompts[0][:64],
                       GenerationConfig(max_new_tokens=4,
                                        max_cache_len=MAX_CACHE))
        b8.run()
        t0 = time.perf_counter()
        for p in all_prompts * 6:
            b8.add_request(p, gen)
        b8_res = b8.run()
        b8_dt = time.perf_counter() - t0
        b8_tok = sum(r.decode_tokens for r in b8_res.values())
        b8_steps = sum(r.decode_steps for r in b8_res.values())
        b8_tps = b8_tok / b8_dt
        log(f"int8 batched fused-sam (B=12 M=16, peak): {b8_tok} tokens in "
            f"{b8_dt:.2f}s = {b8_tps:.1f} tok/s, "
            f"accept {b8_tok/max(b8_steps,1):.2f}")
        detail["int8_batched_peak_tokens_per_s"] = round(b8_tps, 2)
        detail["int8_batched_peak_config"] = "B=12 M=16"
        detail["int8_batched_peak_mean_accept"] = round(
            b8_tok / max(b8_steps, 1), 3)
        S.b8_tps = b8_tps

    # ------------------------------------------------------------------
    # 13. INT4 batched fused-sam at 1B (VERDICT r4 #2: int4 composed with
    #     continuous batching), same peak config as the int8 B=12 row.
    # ------------------------------------------------------------------
    @section("int4_batched_1b", 200)
    def sec_int4_batched():
        from dataclasses import replace as _dcr

        from samd_tpu.fused_sam import BatchedFusedSamEngine
        from samd_tpu.ops.quant import quantize_llama_params as _qlp

        cfg4 = _dcr(cfg, int4_impl="kernel")
        i4params = _qlp(params, dtype=jnp.int4)
        peak_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
        mk = lambda corpus=None: BatchedFusedSamEngine(
            cfg4, i4params, peak_cfg, corpus=corpus, batch_size=12,
            max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(128,))
        log("int4 batched fused-sam (B=12 M=16) warmup/compile...")
        probe = mk()
        probe.add_request(prompts[0][:64],
                          GenerationConfig(max_new_tokens=4,
                                           max_cache_len=MAX_CACHE))
        probe.run()
        for p in overlap_prompts:
            probe.add_request(p, gen)
        corp = []
        for r in probe.run().values():
            corp += r.output_ids + [0]
        eng = mk(corp)
        eng.add_request(prompts[0][:64],
                        GenerationConfig(max_new_tokens=4,
                                         max_cache_len=MAX_CACHE))
        eng.run()
        t0 = time.perf_counter()
        for p in all_prompts * 6:
            eng.add_request(p, gen)
        res = eng.run()
        dt = time.perf_counter() - t0
        tok = sum(r.decode_tokens for r in res.values())
        steps = sum(r.decode_steps for r in res.values())
        log(f"int4 batched fused-sam (B=12 M=16): {tok} tokens in "
            f"{dt:.2f}s = {tok/dt:.1f} tok/s, accept {tok/max(steps,1):.2f}")
        detail["int4_batched_fused_sam_tokens_per_s"] = round(tok / dt, 2)
        detail["int4_batched_fused_sam_mean_accept"] = round(
            tok / max(steps, 1), 3)
        if "int8_batched_peak_tokens_per_s" in detail:
            detail["int4_vs_int8_batched_peak_ratio"] = round(
                (tok / dt) / detail["int8_batched_peak_tokens_per_s"], 3)
        del probe, eng, i4params

    # ------------------------------------------------------------------
    # 14. PAGED fused batched serving: the peak path on a page pool
    # ------------------------------------------------------------------
    # Round-2's declared top gap (docs/PARITY.md): the 1000+ tok/s fused
    # batched engines ran dense B×S_max bf16 KV.  Same peak config (B=12,
    # M=16, int8 weights), KV now in a shared page pool the page-table
    # Pallas kernel consumes directly; per-segment page pre-allocation,
    # pages freed as requests finish — footprint scales with LIVE tokens.
    # quantized_kv=True additionally stores int8 pages (+f32 per-token
    # scales): 0.53x the page bytes at rest AND on the kernel's DMA stream.
    @section("paged_fused_batched", 280, deps=("qparams",))
    def sec_paged_batched():
        from samd_tpu.fused_sam import PagedBatchedFusedSamEngine

        def run_paged_peak(quant_kv, n_pages, label):
            pk_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
            mk = lambda corpus=None: PagedBatchedFusedSamEngine(
                cfg, S.qparams, pk_cfg, corpus=corpus, batch_size=12,
                max_cache_len=MAX_CACHE, eos_token_id=-1,
                prefill_buckets=(128,), n_pages=n_pages, page_size=128,
                quantized_kv=quant_kv, interpret=False)
            probe = mk()
            probe.add_request(prompts[0][:64],
                              GenerationConfig(max_new_tokens=4,
                                               max_cache_len=MAX_CACHE))
            probe.run()
            for p in overlap_prompts:
                probe.add_request(p, gen)
            corp = []
            for r in probe.run().values():
                corp += r.output_ids + [0]
            eng = mk(corp)
            eng.add_request(prompts[0][:64],
                            GenerationConfig(max_new_tokens=4,
                                             max_cache_len=MAX_CACHE))
            eng.run()
            t0 = time.perf_counter()
            rids = [eng.add_request(p, gen) for p in all_prompts * 6]
            res = eng.run()
            dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in res.values())
            steps = sum(r.decode_steps for r in res.values())
            # consistency: the 6 instances of each prompt share corpus +
            # compiled program, so their outputs must agree bitwise
            outs = [res[r].output_ids for r in rids]
            consistent = all(outs[i] == outs[i % len(all_prompts)]
                             for i in range(len(outs)))
            log(f"{label}: {tok} tokens in {dt:.2f}s = {tok/dt:.1f} tok/s, "
                f"accept {tok/max(steps,1):.2f}, peak pages "
                f"{eng.peak_pages}/{n_pages}, consistent {consistent}")
            return (tok / dt, tok / max(steps, 1), eng.peak_pages,
                    consistent)

        # bf16-weight KV pages at the peak config (52 pages × 128 = 6656
        # pool tokens vs 12288 dense slots)
        pg_tps, pg_acc, pg_peak, pg_ok = run_paged_peak(
            False, 52, "paged int8 batched fused-sam (B=12 M=16)")
        detail.update({
            "paged_fused_batched_tokens_per_s": round(pg_tps, 2),
            "paged_fused_batched_mean_accept": round(pg_acc, 3),
            "paged_fused_batched_outputs_consistent": pg_ok,
            # token-slot footprint at the high-water mark vs dense B×S
            "paged_fused_batched_kv_footprint_ratio":
                round(pg_peak * 128 / (12 * MAX_CACHE), 3),
        })
        if hasattr(S, "b8_tps"):
            detail["paged_fused_batched_vs_dense_ratio"] = round(
                pg_tps / S.b8_tps, 3)
        # int8 page pool: same tokens, 0.53x the bytes ((64+4)/128 per
        # token-head) — the capacity knob for the peak path
        pq_tps, pq_acc, pq_peak, pq_ok = run_paged_peak(
            True, 52, "paged int8 batched fused-sam + int8-KV pages")
        detail.update({
            "paged_int8kv_fused_batched_tokens_per_s": round(pq_tps, 2),
            "paged_int8kv_fused_batched_mean_accept": round(pq_acc, 3),
            "paged_int8kv_fused_batched_outputs_consistent": pq_ok,
            # same HBM would hold ~1.88x the bf16 pool's tokens
            "paged_int8kv_capacity_slots":
                f"{52 * 128}tok@0.53x-bytes",
        })

    # ------------------------------------------------------------------
    # 15. PAGED fused batched HYBRID: SAM[Token Recycle] on pages
    # ------------------------------------------------------------------
    @section("paged_hybrid_batched", 220, deps=("qparams",))
    def sec_paged_hybrid():
        from samd_tpu.fused_hybrid import (PagedBatchedFusedHybridEngine,
                                           FusedHybridConfig as _FHC)

        ph_cfg = _FHC(steps_per_call=16, tree_nodes=23, n_predicts=20,
                      max_block=24)
        warm4p = GenerationConfig(max_new_tokens=4, max_cache_len=MAX_CACHE)
        ph_probe = PagedBatchedFusedHybridEngine(
            cfg, S.qparams, ph_cfg, batch_size=12, max_cache_len=MAX_CACHE,
            eos_token_id=-1, prefill_buckets=(128,), n_pages=64,
            page_size=128, interpret=False)
        log("paged batched hybrid (B=12 M=24) warmup/compile...")
        ph_probe.add_request(prompts[0][:64], warm4p)
        ph_probe.run()
        for p in overlap_prompts:
            ph_probe.add_request(p, gen)
        ph_corpus = []
        for r in ph_probe.run().values():
            ph_corpus += r.output_ids + [0]
        ph = PagedBatchedFusedHybridEngine(
            cfg, S.qparams, ph_cfg, corpus=ph_corpus, batch_size=12,
            max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(128,),
            n_pages=64, page_size=128, interpret=False)
        ph.add_request(prompts[0][:64], warm4p)
        ph.run()
        best = None
        for _ in range(2):   # pass 2 = warm harvest tables (steady state)
            t0 = time.perf_counter()
            for p in all_prompts * 6:
                ph.add_request(p, gen)
            ph_res = ph.run()
            ph_dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in ph_res.values())
            steps = sum(r.decode_steps for r in ph_res.values())
            if best is None or tok / ph_dt > best[0]:
                best = (tok / ph_dt, tok, steps, ph_dt)
        ph_tps, ph_tok, ph_steps, ph_dt = best
        log(f"paged int8 batched hybrid SAM[TR] (B=12 M=24): {ph_tok} "
            f"tokens in {ph_dt:.2f}s = {ph_tps:.1f} tok/s, accept "
            f"{ph_tok/max(ph_steps,1):.2f}, peak pages {ph.peak_pages}/64")
        detail.update({
            "paged_hybrid_batched_tokens_per_s": round(ph_tps, 2),
            "paged_hybrid_batched_mean_accept":
                round(ph_tok / max(ph_steps, 1), 3),
            "paged_hybrid_kv_footprint_ratio":
                round(ph.peak_pages * 128 / (12 * MAX_CACHE), 3),
        })
        del ph_probe, ph

    # ------------------------------------------------------------------
    # 16. int8 batched SAM[EAGLE-2]: the reference's strongest-accept
    #     config under continuous batching (per-slot draft-net KV, vmapped
    #     beam expansion; random net prices the mechanics — a trained net
    #     lifts tree-step accept to ~4.6, see trained_accept_eagle2)
    # ------------------------------------------------------------------
    @section("batched_eagle2", 240, deps=("qparams",))
    def sec_batched_eagle2():
        from samd_tpu.drafters.eagle.net import (EagleNetConfig,
                                                 init_eagle_params)
        from samd_tpu.fused_hybrid import (BatchedFusedHybridEagleEngine,
                                           FusedHybridEagleConfig)
        from samd_tpu.ops.quant import quantize_eagle_params

        be_cfg = FusedHybridEagleConfig(
            steps_per_call=16, eagle_depth=4, eagle_topk=4, eagle_total=23,
            max_block=24, n_predicts=20)
        qnet = quantize_eagle_params(init_eagle_params(
            EagleNetConfig.from_target(cfg), jax.random.PRNGKey(7)))
        warm4e = GenerationConfig(max_new_tokens=4, max_cache_len=MAX_CACHE)

        def mk_be(corpus=None):
            return BatchedFusedHybridEagleEngine(
                cfg, S.qparams, be_cfg, net_params=qnet, corpus=corpus,
                batch_size=8, max_cache_len=MAX_CACHE, eos_token_id=-1,
                prefill_buckets=(128,))

        log("batched SAM[EAGLE-2] (B=8) warmup/compile...")
        be_probe = mk_be()
        be_probe.add_request(prompts[0][:64], warm4e)
        be_probe.run()
        for p in overlap_prompts:
            be_probe.add_request(p, gen)
        be_corpus = []
        for r in be_probe.run().values():
            be_corpus += r.output_ids + [0]
        be = mk_be(be_corpus)
        be.add_request(prompts[0][:64], warm4e)
        be.run()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for p in all_prompts * 4:
                be.add_request(p, gen)
            be_res = be.run()
            be_dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in be_res.values())
            steps = sum(r.decode_steps for r in be_res.values())
            if best is None or tok / be_dt > best[0]:
                best = (tok / be_dt, tok, steps, be_dt)
        be_tps, be_tok, be_steps, be_dt = best
        log(f"int8 batched SAM[EAGLE-2] (B=8 block=24 tree=23): {be_tok} "
            f"tokens in {be_dt:.2f}s = {be_tps:.1f} tok/s, accept "
            f"{be_tok/max(be_steps,1):.2f}, sam_steps "
            f"{be.sam_steps_total}/{be.steps_total}")
        detail.update({
            "int8_batched_eagle2_tokens_per_s": round(be_tps, 2),
            "int8_batched_eagle2_mean_accept":
                round(be_tok / max(be_steps, 1), 3),
        })
        del be_probe, be

    # ------------------------------------------------------------------
    # 17. int8 batched fused HYBRID (B=12): continuous batching × the
    #     flagship SAM[Token Recycle] drafter (per-slot harvest tables
    #     lift accept above the chain engine's)
    # ------------------------------------------------------------------
    @section("batched_hybrid", 240, deps=("qparams",))
    def sec_batched_hybrid():
        from samd_tpu.fused_hybrid import (BatchedFusedHybridEngine,
                                           FusedHybridConfig)

        # tuned block (see the chain peak row's comment): at B=12 the
        # compute-bound forward wants a small tree — 23 nodes / M=24
        # measured 1005 tok/s vs 494 for the 61-node M=64 default
        bh_cfg = FusedHybridConfig(steps_per_call=16, tree_nodes=23,
                                   n_predicts=20, max_block=24)
        warm4 = GenerationConfig(max_new_tokens=4, max_cache_len=MAX_CACHE)
        bh_probe = BatchedFusedHybridEngine(
            cfg, S.qparams, bh_cfg, batch_size=12, max_cache_len=MAX_CACHE,
            eos_token_id=-1, prefill_buckets=(128,))
        log("int8 batched hybrid (B=12 M=24) warmup/compile...")
        bh_probe.add_request(prompts[0][:64], warm4)
        bh_probe.run()
        for p in overlap_prompts:
            bh_probe.add_request(p, gen)
        bh_corpus = []
        for r in bh_probe.run().values():
            bh_corpus += r.output_ids + [0]
        bh = BatchedFusedHybridEngine(
            cfg, S.qparams, bh_cfg, corpus=bh_corpus, batch_size=12,
            max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(128,))
        bh.add_request(prompts[0][:64], warm4)
        bh.run()
        # two passes, best-of: slot harvest tables persist across run()s
        # (Token Recycle's whole point), so pass 2 is the steady-state
        # serving number — pass 1 pays cold tables
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for p in all_prompts * 6:
                bh.add_request(p, gen)
            bh_res = bh.run()
            bh_dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in bh_res.values())
            steps = sum(r.decode_steps for r in bh_res.values())
            if best is None or tok / bh_dt > best[0]:
                best = (tok / bh_dt, tok, steps, bh_dt)
        bh_tps, bh_tok, bh_steps, bh_dt = best
        log(f"int8 batched hybrid SAM[TR] (B=12 M=24, peak): {bh_tok} "
            f"tokens in {bh_dt:.2f}s = {bh_tps:.1f} tok/s, "
            f"accept {bh_tok/max(bh_steps,1):.2f}, "
            f"sources sam={bh.sam_steps_total}")
        detail.update({
            "int8_batched_hybrid_peak_tokens_per_s": round(bh_tps, 2),
            "int8_batched_hybrid_peak_config": "B=12 M=24 tree=23",
            "int8_batched_hybrid_peak_mean_accept":
                round(bh_tok / max(bh_steps, 1), 3),
        })
        del bh_probe, bh

    # ------------------------------------------------------------------
    # 18. fused-sam sampling modes (speculative rejection / typical /
    #     nucleus at T=0.8): distribution-preserving acceptance costs
    #     ~nothing next to the forward — compare ms/step to the greedy row
    #     (tok/s is lower only because the greedy-built corpus cannot match
    #     a sampled trajectory, so retrieval rarely hits; accept ~1)
    # ------------------------------------------------------------------
    @section("fused_sam_sampling", 200, deps=("fs",))
    def sec_sampling():
        fs = S.fs
        gen_s = GenerationConfig(max_new_tokens=NEW_TOKENS,
                                 max_cache_len=MAX_CACHE, greedy=False,
                                 temperature=0.8, seed=1)
        log("fused-sam sampling warmup/compile...")
        fs.generate(warm_prompt, GenerationConfig(
            max_new_tokens=8, max_cache_len=MAX_CACHE, greedy=False,
            temperature=0.8, seed=1))
        s_outs, s_tok, s_steps, s_dt = timed_generate(fs, all_prompts,
                                                      gen_s)
        s_tps = s_tok / s_dt
        log(f"fused-sam sampling (T=0.8): {s_tps:.1f} tok/s, accept "
            f"{s_tok / max(s_steps, 1):.2f}, "
            f"{1000 * s_dt / max(s_steps, 1):.2f} ms/step")
        detail.update({
            "fused_sam_sampling_tokens_per_s": round(s_tps, 2),
            "fused_sam_sampling_mean_accept":
                round(s_tok / max(s_steps, 1), 3),
            "fused_sam_sampling_ms_per_step":
                round(1000 * s_dt / max(s_steps, 1), 3),
        })
        # typical / nucleus posterior acceptance at the same T (round-2
        # verdict #8: these serving modes had CPU evidence only).  Cost is
        # the quantity to compare (ms/step vs the greedy row); accept also
        # reported — posterior modes accept more aggressively than
        # rejection (they mask rather than match the target distribution).
        for mode, extra in (("typical", {}), ("nucleus", {"top_p": 0.9})):
            gen_m = GenerationConfig(max_new_tokens=NEW_TOKENS,
                                     max_cache_len=MAX_CACHE, greedy=False,
                                     temperature=0.8, seed=1,
                                     accept_mode=mode, **extra)
            log(f"fused-sam {mode} warmup/compile...")
            fs.generate(warm_prompt, GenerationConfig(
                max_new_tokens=8, max_cache_len=MAX_CACHE, greedy=False,
                temperature=0.8, seed=1, accept_mode=mode, **extra))
            m_outs2, m_tok2, m_steps2, m_dt2 = timed_generate(
                fs, all_prompts, gen_m)
            log(f"fused-sam {mode} (T=0.8): "
                f"{m_tok2 / m_dt2:.1f} tok/s, accept "
                f"{m_tok2 / max(m_steps2, 1):.2f}, "
                f"{1000 * m_dt2 / max(m_steps2, 1):.2f} ms/step")
            detail.update({
                f"fused_sam_{mode}_tokens_per_s": round(m_tok2 / m_dt2, 2),
                f"fused_sam_{mode}_mean_accept":
                    round(m_tok2 / max(m_steps2, 1), 3),
                f"fused_sam_{mode}_ms_per_step":
                    round(1000 * m_dt2 / max(m_steps2, 1), 3),
            })

    # ------------------------------------------------------------------
    # 19. SAM-Decoding (sam_only policy, reference-canonical knobs:
    #     scripts/inference_samd_sam_only.sh max_predicts=60 alpha=4 bias=0)
    # ------------------------------------------------------------------
    @section("host_samd", 170, deps=("ar_tps", "static_sam", "oracle_outs"))
    def sec_host_samd():
        engine = SamdEngine(cfg, params, samd_cfg,
                            make_drafter(samd_cfg, cfg.vocab_size,
                                         static_sam=S.static_sam),
                            max_cache_len=MAX_CACHE, eos_token_id=-1,
                            prefill_buckets=(128,))
        log("samd warmup/compile...")
        engine.generate(warm_prompt, warm)

        samd_outs, samd_tok, samd_steps, samd_dt = timed_generate(
            engine, all_prompts, gen)
        samd_tps = samd_tok / samd_dt
        mean_accept = samd_tok / max(samd_steps, 1)
        log(f"samd: {samd_tok} tokens in {samd_dt:.2f}s = "
            f"{samd_tps:.1f} tok/s, mean accepted/step = {mean_accept:.2f}, "
            f"{1000 * samd_dt / max(samd_steps, 1):.1f} ms/step")
        log(f"draft sources: {engine.stats.source_counts}")
        mismatches = sum(int(a != b)
                         for a, b in zip(S.oracle_outs, samd_outs))
        log(f"output equality vs block-AR oracle: "
            f"{len(S.oracle_outs) - mismatches}/{len(S.oracle_outs)}")
        detail.update({
            "host_sam_only_speedup": round(samd_tps / S.ar_tps, 4),
            "samd_tokens_per_s": round(samd_tps, 2),
            "samd_ms_per_step": round(1000 * samd_dt / max(samd_steps, 1),
                                      2),
            "mean_accepted_tokens": round(mean_accept, 3),
            "greedy_outputs_equal": mismatches == 0,
        })
        S.samd_outs = samd_outs
        S.samd_tps = samd_tps

    # ------------------------------------------------------------------
    # 20. GSPMD overhead probe: the same host engine under a 1-chip mesh
    # ------------------------------------------------------------------
    # Multi-chip TP/PP is validated on the virtual CPU mesh (only one real
    # chip exists); this pins what compiling the identical step under
    # GSPMD sharding machinery costs on real hardware: the mesh=1 program
    # must match the unsharded engine's throughput.
    @section("tp1_gspmd", 140, deps=("samd_outs", "static_sam"))
    def sec_tp1():
        from samd_tpu.parallel import make_mesh

        eng_tp = SamdEngine(cfg, params, samd_cfg,
                            make_drafter(samd_cfg, cfg.vocab_size,
                                         static_sam=S.static_sam),
                            max_cache_len=MAX_CACHE, eos_token_id=-1,
                            prefill_buckets=(128,), mesh=make_mesh(1))
        log("samd tp=1 GSPMD warmup/compile...")
        eng_tp.generate(warm_prompt, warm)
        tp_outs, tp_tok, tp_steps, tp_dt = timed_generate(
            eng_tp, all_prompts, gen)
        tp_tps = tp_tok / tp_dt
        log(f"samd under tp=1 mesh: {tp_tps:.1f} tok/s "
            f"(unsharded {S.samd_tps:.1f}; ratio "
            f"{tp_tps / S.samd_tps:.3f}), equal "
            f"{sum(int(a == b) for a, b in zip(S.samd_outs, tp_outs))}"
            f"/{len(S.samd_outs)}")
        detail.update({
            "tp1_gspmd_samd_tokens_per_s": round(tp_tps, 2),
            "tp1_gspmd_vs_unsharded_ratio": round(tp_tps / S.samd_tps, 4),
            "tp1_gspmd_outputs_equal":
                sum(int(a == b) for a, b in zip(S.samd_outs, tp_outs))
                == len(S.samd_outs),
        })
        del eng_tp

    # ------------------------------------------------------------------
    # 21. interleaved host samd: N exact-automaton lanes, overlapped
    #     fetches (the host engine's per-step blocking fetch costs ~1 RTT
    #     of idle device; round-robined lanes overlap the round trips —
    #     samd_tpu/interleave.py)
    # ------------------------------------------------------------------
    @section("interleaved_host", 170, deps=("ar_tps", "static_sam",
                                            "oracle_outs"))
    def sec_interleaved():
        from samd_tpu.interleave import InterleavedSamdEngine
        from samd_tpu.sam import SamCursor

        inter = InterleavedSamdEngine(
            cfg, params, samd_cfg,
            lambda: make_drafter(samd_cfg, cfg.vocab_size,
                                 static_sam=SamCursor(S.static_sam)),
            lanes=8, max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,))
        inter.add_request(warm_prompt, warm)
        inter.run()  # warmup/compile
        il_best = None
        for _ in range(2):
            # 8 requests fill the 8 lanes (lane-count sweep: 4 lanes 3.89x,
            # 8 lanes 5.67x — scripts/profile_interleave.py)
            rids = [inter.add_request(p, gen) for p in all_prompts * 2]
            t0 = time.perf_counter()
            il_res = inter.run()
            il_dt = time.perf_counter() - t0
            il_tok = sum(r.decode_tokens for r in il_res.values())
            if il_best is None or il_dt < il_best[0]:
                il_best = (il_dt, il_tok,
                           [il_res[r].output_ids for r in rids])
        il_dt, il_tok, il_outs = il_best
        il_tps = il_tok / il_dt
        il_equal = sum(int(a == b)
                       for a, b in zip(S.oracle_outs * 2, il_outs))
        log(f"interleaved host samd (8 lanes): {il_tok} tokens in "
            f"{il_dt:.2f}s = {il_tps:.1f} tok/s, equal {il_equal}/8")
        detail.update({
            "interleaved_host_samd_tokens_per_s": round(il_tps, 2),
            "interleaved_host_samd_speedup": round(il_tps / S.ar_tps, 4),
            "interleaved_host_samd_lanes": 8,
            "interleaved_host_samd_outputs_equal":
                il_equal == 2 * len(S.oracle_outs),
        })

    # ------------------------------------------------------------------
    # 22. SAM-Decoding[Token Recycle] host hybrid (reference scripts/
    #     inference_samd.sh: n_predicts=40 len_threshold=5 len_bias=5)
    # ------------------------------------------------------------------
    @section("token_recycle_host", 170, deps=("ar_tps", "static_sam",
                                              "oracle_outs"))
    def sec_tr_host():
        tr_cfg = SamdConfig(draft_source="sam_hybrid", max_predicts=M,
                            n_predicts=40, len_threshold=5, len_bias=5,
                            tree_method="token_recycle")
        tr_engine = SamdEngine(cfg, params, tr_cfg,
                               make_drafter(tr_cfg, cfg.vocab_size,
                                            static_sam=S.static_sam),
                               max_cache_len=MAX_CACHE, eos_token_id=-1,
                               prefill_buckets=(128,))
        log("token-recycle host hybrid warmup/compile...")
        tr_engine.generate(warm_prompt, warm)
        tr_outs, tr_tok, tr_steps, tr_dt = timed_generate(
            tr_engine, all_prompts, gen)
        tr_tps = tr_tok / tr_dt
        tr_equal = sum(int(a == b) for a, b in zip(S.oracle_outs, tr_outs))
        log(f"samd[token_recycle] host: {tr_tps:.1f} tok/s, "
            f"accept {tr_tok / max(tr_steps, 1):.2f}, equal {tr_equal}/4, "
            f"sources {tr_engine.stats.source_counts}")
        detail.update({
            "token_recycle_hybrid_speedup": round(tr_tps / S.ar_tps, 4),
            "token_recycle_mean_accept": round(tr_tok / max(tr_steps, 1),
                                               3),
            # tree-draft engines: equality is exact-in-exact-arithmetic;
            # bf16 near-tie argmaxes can flip on random weights
            # (docs/EXACTNESS.md)
            "token_recycle_outputs_equal": tr_equal == len(S.oracle_outs),
            "token_recycle_equal_count":
                f"{tr_equal}/{len(S.oracle_outs)}",
        })

    # ------------------------------------------------------------------
    # 23. continuous batching throughput (B=4, same prompt mix) + paged
    # ------------------------------------------------------------------
    # Each batched engine gets a corpus from its OWN trajectory: batched /
    # paged forwards accumulate bf16 differently than the single-stream
    # block oracle, so an oracle-built corpus misses on near-tie flips and
    # the accept rate collapses (the r01 INT8 anomaly, same mechanism).
    @section("batched_samd", 170, deps=("ar_tps",))
    def sec_batched_samd():
        from samd_tpu.batching import BatchedSamdEngine
        from samd_tpu.sam import SamCursor

        def run_batched(engine_ctor, label):
            """(probe → own-trajectory corpus → timed run) for a batched
            engine class; returns (tok/s, mean accept, tokens, dt)."""
            probe = engine_ctor(
                lambda: make_drafter(samd_cfg, cfg.vocab_size))
            probe.add_request(prompts[0][:64],
                              GenerationConfig(max_new_tokens=4,
                                               max_cache_len=MAX_CACHE))
            probe.run()  # warmup/compile
            for p in overlap_prompts:
                probe.add_request(p, gen)
            probe_out = [r.output_ids for r in probe.run().values()]
            own_sam = build_corpus_sam(probe_out, eos_token=0, topk=8)
            eng = engine_ctor(
                lambda: make_drafter(samd_cfg, cfg.vocab_size,
                                     static_sam=SamCursor(own_sam)))
            eng.add_request(prompts[0][:64],
                            GenerationConfig(max_new_tokens=4,
                                             max_cache_len=MAX_CACHE))
            eng.run()
            t0 = time.perf_counter()
            for p in all_prompts * 2:
                eng.add_request(p, gen)
            res = eng.run()
            dt = time.perf_counter() - t0
            tok = sum(r.decode_tokens for r in res.values())
            steps = sum(r.decode_steps for r in res.values())
            log(f"{label}: {tok} tokens in {dt:.2f}s = {tok/dt:.1f} tok/s, "
                f"accept {tok/max(steps,1):.2f}")
            return tok / dt, tok / max(steps, 1), tok, dt

        S.run_batched = run_batched
        btps, bacc, btok, bdt = run_batched(
            lambda df: BatchedSamdEngine(
                cfg, params, samd_cfg, df, batch_size=4,
                max_cache_len=MAX_CACHE, eos_token_id=-1,
                prefill_buckets=(128,)),
            "batched samd (B=4, own corpus)")
        detail["batched_samd_tokens_per_s"] = round(btps, 2)
        detail["batched_samd_mean_accept"] = round(bacc, 3)
        S.btps = btps

    # -- paged serving at B=4 (page-table-consuming attention kernel) ---
    @section("paged_batched_samd", 150, deps=("btps", "run_batched"))
    def sec_paged_samd():
        from samd_tpu.batching import PagedBatchedSamdEngine

        ptps, pacc, *_ = S.run_batched(
            lambda df: PagedBatchedSamdEngine(
                cfg, params, samd_cfg, df, batch_size=4,
                max_cache_len=MAX_CACHE, eos_token_id=-1,
                prefill_buckets=(128,), n_pages=48, page_size=128,
                interpret=False),
            "paged batched samd (B=4, own corpus)")
        detail["paged_batched_samd_tokens_per_s"] = round(ptps, 2)
        detail["paged_batched_mean_accept"] = round(pacc, 3)
        detail["paged_vs_dense_batched_ratio"] = round(ptps / S.btps, 3)
        detail["paged_kv_slots_vs_dense"] = f"{49 * 128}/{4 * MAX_CACHE}"

    # ------------------------------------------------------------------
    # 24. device-resident fused PLD (zero per-step host traffic)
    # ------------------------------------------------------------------
    @section("pld", 90, deps=("ar_tps",))
    def sec_pld():
        from samd_tpu.pld import PldConfig, PldEngine

        pld = PldEngine(cfg, params, PldConfig(steps_per_call=256),
                        max_cache_len=MAX_CACHE, eos_token_id=-1,
                        prefill_buckets=(128,))
        pld.generate(prompts[0][:64],
                     GenerationConfig(max_new_tokens=4,
                                      max_cache_len=MAX_CACHE))
        pld_outs, pld_tok, pld_steps, pld_dt = timed_generate(
            pld, all_prompts, gen)
        pld_tps = pld_tok / pld_dt
        log(f"pld fused: {pld_tps:.1f} tok/s ({pld_steps} steps)")
        detail["pld_fused_tokens_per_s"] = round(pld_tps, 2)
        detail["pld_fused_speedup"] = round(pld_tps / S.ar_tps, 4)

    # ------------------------------------------------------------------
    # 25. batched fused-sam (batching × fusion, bf16 B=4)
    # ------------------------------------------------------------------
    @section("batched_fused_sam", 130, deps=("ar_tps", "fs_corpus"))
    def sec_batched_fused_sam():
        from samd_tpu.fused_sam import BatchedFusedSamEngine

        bfs = BatchedFusedSamEngine(cfg, params, fscfg, corpus=S.fs_corpus,
                                    batch_size=4, max_cache_len=MAX_CACHE,
                                    eos_token_id=-1, prefill_buckets=(128,))
        bfs.add_request(prompts[0][:64],
                        GenerationConfig(max_new_tokens=4,
                                         max_cache_len=MAX_CACHE))
        bfs.run()
        t0 = time.perf_counter()
        for p in all_prompts * 2:
            bfs.add_request(p, gen)
        bfs_res = bfs.run()
        bfs_dt = time.perf_counter() - t0
        bfs_tok = sum(r.decode_tokens for r in bfs_res.values())
        bfs_tps = bfs_tok / bfs_dt
        log(f"batched fused-sam (B=4): {bfs_tok} tokens in {bfs_dt:.2f}s = "
            f"{bfs_tps:.1f} tok/s")
        detail["batched_fused_sam_tokens_per_s"] = round(bfs_tps, 2)
        detail["batched_fused_sam_speedup"] = round(bfs_tps / S.ar_tps, 4)
        detail["batch_size"] = 4

    # ------------------------------------------------------------------
    # 26. corpus-scale retrieval: 1M-token corpus through the n-gram index
    # ------------------------------------------------------------------
    # (reference corpora are millions of tokens, tools/gen_sam_alpaca.py;
    #  the windowed O(corpus) scan is hopeless there — the index probes
    #  O(grams x bucket_cap) positions per step regardless of size)
    @section("fused_sam_1m_corpus", 170, deps=("fs_corpus", "fs_oracle",
                                               "fs_ms"))
    def sec_1m_corpus():
        corpus_rng = np.random.default_rng(7)
        big = corpus_rng.integers(3, cfg.vocab_size,
                                  size=1 << 20).astype(np.int32)
        emb_at = 700_000
        doc = np.asarray(S.fs_corpus[:min(len(S.fs_corpus),
                                          (1 << 20) - emb_at)], np.int32)
        big[emb_at:emb_at + len(doc)] = doc
        fs1m = FusedSamEngine(
            cfg, params,
            FusedSamConfig(steps_per_call=256, corpus_capacity=1 << 20,
                           indexed=True, index_bucket_cap=8),
            corpus=big.tolist(), max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,))
        fs1m.generate(prompts[0][:64],
                      GenerationConfig(max_new_tokens=4,
                                       max_cache_len=MAX_CACHE))
        m_outs, m_tok, m_steps, m_dt = timed_generate(fs1m, all_prompts,
                                                      gen)
        m_tps = m_tok / m_dt
        m_ms = 1000 * m_dt / max(m_steps, 1)
        m_equal = sum(int(a == b) for a, b in zip(S.fs_oracle, m_outs[:2]))
        log(f"fused-sam 1M-token corpus (indexed): {m_tps:.1f} tok/s, "
            f"accept {m_tok/max(m_steps,1):.2f}, {m_ms:.2f} ms/step, "
            f"overlap trajectory equal {m_equal}/2")
        detail.update({
            "fused_sam_1m_corpus_tokens_per_s": round(m_tps, 2),
            "fused_sam_1m_corpus_mean_accept":
                round(m_tok / max(m_steps, 1), 3),
            "fused_sam_1m_corpus_ms_per_step": round(m_ms, 3),
            "fused_sam_1m_corpus_step_time_ratio_vs_32k":
                round(m_ms / S.fs_ms, 3),
            "fused_sam_1m_corpus_overlap_equal": m_equal == 2,
        })

    # ------------------------------------------------------------------
    # 27. long-cache serving: flash kernel v2 vs XLA at S=8192
    # ------------------------------------------------------------------
    # XLA attention reads the whole padded [S] axis every step; the v2
    # flash kernel (head-folded grid + boundary-window mask) streams only
    # live KV blocks.  Each impl benches against its own-trajectory corpus
    # and oracle (accumulation order differs -> near-tie argmaxes differ).
    @section("longcache_flash", 420)
    def sec_longcache():
        from dataclasses import replace as dcr

        S_LONG = 8192
        gen_long = GenerationConfig(max_new_tokens=NEW_TOKENS,
                                    max_cache_len=S_LONG)
        warm_long = GenerationConfig(max_new_tokens=8, max_cache_len=S_LONG)
        lc_rows = {}
        for label, lcfg in (
            ("xla", cfg),
            ("flash", dcr(cfg, attention_impl="flash", kv_layout="ds")),
            # int8 KV (cache.QuantizedKV): halves the [S]-axis read traffic
            # the xla row pays in full
            ("int8kv", dcr(cfg, kv_quant=True)),
            # combined: the flash kernel DMAs int8 KV blocks and
            # dequantizes in-register — half the v2 kernel's DMA bytes
            ("flash_int8kv", dcr(cfg, attention_impl="flash",
                                 kv_layout="ds", kv_quant=True)),
        ):
            probe = FusedSamEngine(lcfg, params, fscfg,
                                   max_cache_len=S_LONG, eos_token_id=-1,
                                   prefill_buckets=(128,))
            log(f"long-cache {label} warmup/compile...")
            probe.generate(warm_prompt, warm_long)
            orc = [probe.generate(p, gen_long).output_ids
                   for p in overlap_prompts]
            corp = []
            for o in orc:
                corp += o + [0]
            engl = FusedSamEngine(lcfg, params, fscfg, corpus=corp,
                                  max_cache_len=S_LONG, eos_token_id=-1,
                                  prefill_buckets=(128,))
            engl.generate(warm_prompt, warm_long)
            l_outs, l_tok, l_steps, l_dt = timed_generate(
                engl, all_prompts, gen_long)
            l_equal = sum(int(a == b) for a, b in zip(orc, l_outs[:2]))
            lc_rows[label] = 1000 * l_dt / max(l_steps, 1)
            log(f"long-cache (S=8192) fused-sam/{label}: "
                f"{l_tok / l_dt:.1f} tok/s, {lc_rows[label]:.2f} ms/step, "
                f"equal {l_equal}/2")
            detail.update({
                f"longcache8k_fused_sam_{label}_tokens_per_s":
                    round(l_tok / l_dt, 2),
                f"longcache8k_fused_sam_{label}_ms_per_step":
                    round(lc_rows[label], 3),
                f"longcache8k_fused_sam_{label}_equal": l_equal == 2,
            })
            del probe, engl
        detail["longcache8k_flash_vs_xla_ratio"] = round(
            lc_rows["flash"] / lc_rows["xla"], 3)

    # ------------------------------------------------------------------
    # 28. device-resident fused Token-Recycle
    # ------------------------------------------------------------------
    @section("fused_token_recycle", 90, deps=("ar_tps",))
    def sec_fused_tr():
        from samd_tpu.token_recycle_fused import (
            FusedTokenRecycleConfig,
            FusedTokenRecycleEngine,
        )

        ftr = FusedTokenRecycleEngine(
            cfg, params, FusedTokenRecycleConfig(steps_per_call=256),
            max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,))
        ftr.generate(prompts[0][:64],
                     GenerationConfig(max_new_tokens=4,
                                      max_cache_len=MAX_CACHE))
        _, ftr_tok, ftr_steps, ftr_dt = timed_generate(ftr, all_prompts,
                                                       gen)
        ftr_tps = ftr_tok / ftr_dt
        log(f"fused token-recycle: {ftr_tps:.1f} tok/s ({ftr_steps} steps)")
        detail["fused_token_recycle_tokens_per_s"] = round(ftr_tps, 2)
        detail["fused_token_recycle_speedup"] = round(ftr_tps / S.ar_tps, 4)

    # ------------------------------------------------------------------
    # 29. FLAGSHIP: fused SAM-Decoding[Token Recycle] (+ int8 variants)
    # ------------------------------------------------------------------
    # automated near-tie audit (docs/EXACTNESS.md, now a measurement):
    # tree-engine equality misses are re-verified on canonical columns — a
    # miss whose top-2 logit gap is within bf16 rounding is a measured
    # near-tie flip; a large gap would flag a real bug.
    _auditors = {}

    def neartie_audit(prefix, oracle_list, outs, pkey, pvals):
        from samd_tpu.evaluation.neartie import NearTieAuditor

        equal = sum(int(a == b) for a, b in zip(oracle_list, outs))
        if equal == len(oracle_list):
            aud = {"misses": 0, "near_tie_confirmed": True, "details": []}
        else:
            if pkey not in _auditors:
                _auditors[pkey] = NearTieAuditor(cfg, pvals,
                                                 max_cache_len=MAX_CACHE)
            aud = _auditors[pkey].audit(oracle_list, outs)
            log(f"{prefix} near-tie audit: {aud}")
        detail[f"{prefix}_near_tie_confirmed"] = aud["near_tie_confirmed"]
        if aud["details"]:
            detail[f"{prefix}_miss_audit"] = aud["details"]

    # (reference README.md:55: 2.27x; policy samd/draft.py:52-63)
    @section("hybrid_tr_flagship", 280, deps=("ar_tps", "corpus64",
                                              "oracle64_outs"))
    def sec_hybrid_tr():
        from samd_tpu.fused_hybrid import (FusedHybridConfig,
                                           FusedHybridEngine)

        hy = FusedHybridEngine(
            cfg, params, FusedHybridConfig(steps_per_call=256),
            corpus=S.corpus64, max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,))
        log("fused SAM[token_recycle] warmup/compile...")
        hy.generate(warm_prompt, warm)
        sam0, steps0 = hy.sam_steps_total, hy.steps_total
        hy_outs, hy_tok, hy_steps, hy_dt = timed_generate(
            hy, all_prompts, gen)
        hy_tps = hy_tok / hy_dt
        hy_accept = hy_tok / max(hy_steps, 1)
        hy_equal = sum(int(a == b)
                       for a, b in zip(S.oracle64_outs, hy_outs))
        hy_sam = hy.sam_steps_total - sam0
        hy_all = hy.steps_total - steps0
        log(f"fused SAM[token_recycle]: {hy_tps:.1f} tok/s, "
            f"accept {hy_accept:.2f}, equal {hy_equal}/4, "
            f"sources sam={hy_sam} tree={hy_all - hy_sam}")
        detail.update({
            "fused_sam_token_recycle_tokens_per_s": round(hy_tps, 2),
            "fused_sam_token_recycle_speedup": round(hy_tps / S.ar_tps, 4),
            "fused_sam_token_recycle_mean_accept": round(hy_accept, 3),
            "fused_sam_token_recycle_outputs_equal":
                hy_equal == len(S.oracle64_outs),
            "fused_sam_token_recycle_equal_count":
                f"{hy_equal}/{len(S.oracle64_outs)}",
            "fused_sam_token_recycle_ms_per_step":
                round(1000 * hy_dt / max(hy_steps, 1), 3),
            "fused_sam_token_recycle_sources":
                {"sam": int(hy_sam), "tree": int(hy_all - hy_sam)},
        })
        neartie_audit("fused_sam_token_recycle", S.oracle64_outs, hy_outs,
                      "bf16", params)
        if not hasattr(S, "qparams"):
            return
        # INT8 flagship hybrid: own int8 block-64 oracle + own corpus
        # (same own-dtype methodology as the INT8 fused-sam section)
        q_oracle64 = ArBaseline(cfg, S.qparams, max_cache_len=MAX_CACHE,
                                eos_token_id=-1, prefill_buckets=(128,),
                                block_size=M64)
        q64_outs, *_ = timed_generate(q_oracle64, all_prompts, gen,
                                      repeats=1)
        q_corpus64 = []
        for o in q64_outs[:N_PROMPTS]:
            q_corpus64 += o + [0]
        hq = FusedHybridEngine(
            cfg, S.qparams, FusedHybridConfig(steps_per_call=256),
            corpus=q_corpus64, max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,))
        hq.generate(warm_prompt, warm)
        hq_outs, hq_tok, hq_steps, hq_dt = timed_generate(
            hq, all_prompts, gen)
        hq_tps = hq_tok / hq_dt
        hq_equal = sum(int(a == b) for a, b in zip(q64_outs, hq_outs))
        log(f"int8 fused SAM[token_recycle]: {hq_tps:.1f} tok/s, "
            f"accept {hq_tok / max(hq_steps, 1):.2f}, equal {hq_equal}/4, "
            f"{1000 * hq_dt / max(hq_steps, 1):.2f} ms/step")
        detail.update({
            "int8_fused_sam_token_recycle_tokens_per_s": round(hq_tps, 2),
            "int8_fused_sam_token_recycle_mean_accept":
                round(hq_tok / max(hq_steps, 1), 3),
            "int8_fused_sam_token_recycle_equal_count":
                f"{hq_equal}/{len(q64_outs)}",
            "int8_fused_sam_token_recycle_ms_per_step":
                round(1000 * hq_dt / max(hq_steps, 1), 3),
        })
        neartie_audit("int8_fused_sam_token_recycle", q64_outs, hq_outs,
                      "int8", S.qparams)

        # INT8 fused EAGLE-2: fully-quantized expansion — draft net AND
        # lm_head stream 1-byte weights depth× per step
        from samd_tpu.drafters.eagle.net import (EagleNetConfig,
                                                 init_eagle_params)
        from samd_tpu.eagle_fused import FusedEagle2Engine as _FE2
        from samd_tpu.ops.quant import quantize_eagle_params

        qnet = quantize_eagle_params(init_eagle_params(
            EagleNetConfig.from_target(cfg), jax.random.PRNGKey(7)))
        egq = _FE2(cfg, S.qparams, net_params=qnet, max_cache_len=MAX_CACHE,
                   eos_token_id=-1, prefill_buckets=(128,))
        log("int8 fused EAGLE-2 warmup/compile...")
        egq.generate(warm_prompt, warm)
        eq_outs, eq_tok, eq_steps, eq_dt = timed_generate(
            egq, all_prompts, gen)
        eq_tps = eq_tok / eq_dt
        eq_equal = sum(int(a == b) for a, b in zip(q64_outs, eq_outs))
        log(f"int8 fused EAGLE-2 (quantized net+head): {eq_tps:.1f} tok/s, "
            f"accept {eq_tok / max(eq_steps, 1):.2f}, equal {eq_equal}/4, "
            f"{1000 * eq_dt / max(eq_steps, 1):.2f} ms/step")
        detail.update({
            "int8_fused_eagle2_tokens_per_s": round(eq_tps, 2),
            "int8_fused_eagle2_ms_per_step":
                round(1000 * eq_dt / max(eq_steps, 1), 3),
            "int8_fused_eagle2_equal_count": f"{eq_equal}/{len(q64_outs)}",
        })
        neartie_audit("int8_fused_eagle2", q64_outs, eq_outs, "int8",
                      S.qparams)

    # ------------------------------------------------------------------
    # 30. fused EAGLE-2 (untrained draft net: mechanics + timing only)
    # ------------------------------------------------------------------
    # With seeded-random net weights the beam's predictions almost never
    # match the target, so accept ~= 1.0; this row prices the per-step cost
    # of the depth-5 expansion + 64-wide verify, and pins losslessness.
    @section("fused_eagle2", 140, deps=("ar_tps", "oracle64_outs"))
    def sec_fused_eagle2():
        from samd_tpu.eagle_fused import FusedEagle2Engine

        eg = FusedEagle2Engine(cfg, params, max_cache_len=MAX_CACHE,
                               eos_token_id=-1, prefill_buckets=(128,))
        log("fused EAGLE-2 warmup/compile...")
        eg.generate(warm_prompt, warm)
        eg_outs, eg_tok, eg_steps, eg_dt = timed_generate(
            eg, all_prompts, gen)
        eg_tps = eg_tok / eg_dt
        eg_equal = sum(int(a == b)
                       for a, b in zip(S.oracle64_outs, eg_outs))
        log(f"fused EAGLE-2 (untrained net): {eg_tps:.1f} tok/s, "
            f"accept {eg_tok / max(eg_steps, 1):.2f}, equal {eg_equal}/4, "
            f"{1000 * eg_dt / max(eg_steps, 1):.2f} ms/step")
        detail.update({
            "fused_eagle2_untrained_tokens_per_s": round(eg_tps, 2),
            "fused_eagle2_untrained_speedup": round(eg_tps / S.ar_tps, 4),
            "fused_eagle2_untrained_mean_accept":
                round(eg_tok / max(eg_steps, 1), 3),
            "fused_eagle2_untrained_outputs_equal":
                eg_equal == len(S.oracle64_outs),
            "fused_eagle2_untrained_ms_per_step":
                round(1000 * eg_dt / max(eg_steps, 1), 3),
        })

    # ------------------------------------------------------------------
    # 31. FLAGSHIP: fused SAM-Decoding[EAGLE-2]
    # ------------------------------------------------------------------
    # (reference README.md:57: 2.58x — its strongest configuration)
    @section("fused_sam_eagle2", 140, deps=("ar_tps", "corpus64",
                                            "oracle64_outs"))
    def sec_fused_sam_eagle2():
        from samd_tpu.fused_hybrid import (
            FusedHybridEagleConfig,
            FusedHybridEagleEngine,
        )

        he = FusedHybridEagleEngine(
            cfg, params, FusedHybridEagleConfig(),
            corpus=S.corpus64, max_cache_len=MAX_CACHE, eos_token_id=-1,
            prefill_buckets=(128,))
        log("fused SAM[EAGLE-2] warmup/compile...")
        he.generate(warm_prompt, warm)
        hesam0, hesteps0 = he.sam_steps_total, he.steps_total
        he_outs, he_tok, he_steps, he_dt = timed_generate(
            he, all_prompts, gen)
        he_tps = he_tok / he_dt
        he_accept = he_tok / max(he_steps, 1)
        he_equal = sum(int(a == b)
                       for a, b in zip(S.oracle64_outs, he_outs))
        he_sam = he.sam_steps_total - hesam0
        he_all = he.steps_total - hesteps0
        log(f"fused SAM[EAGLE-2]: {he_tps:.1f} tok/s, accept "
            f"{he_accept:.2f}, equal {he_equal}/4, "
            f"sources sam={he_sam} eagle={he_all - he_sam}")
        detail.update({
            "fused_sam_eagle2_tokens_per_s": round(he_tps, 2),
            "fused_sam_eagle2_speedup": round(he_tps / S.ar_tps, 4),
            "fused_sam_eagle2_mean_accept": round(he_accept, 3),
            "fused_sam_eagle2_outputs_equal":
                he_equal == len(S.oracle64_outs),
            "fused_sam_eagle2_equal_count":
                f"{he_equal}/{len(S.oracle64_outs)}",
            "fused_sam_eagle2_ms_per_step":
                round(1000 * he_dt / max(he_steps, 1), 3),
            "fused_sam_eagle2_sources":
                {"sam": int(he_sam), "eagle": int(he_all - he_sam)},
        })
        neartie_audit("fused_sam_eagle2", S.oracle64_outs, he_outs, "bf16",
                      params)

    # ------------------------------------------------------------------
    # 32. model families: Qwen2 / MoE trunks through the same engine
    # ------------------------------------------------------------------
    # The reference serves Qwen2/Mixtral targets via vendored modeling
    # copies; here one forward serves all families, so the fused engine
    # runs them unchanged.  Each family benches against its own-trajectory
    # corpus (same methodology as the flagship row).
    @section("model_families", 280)
    def sec_families():
        from dataclasses import replace as dc_replace

        for fam, fam_cfg in (
            ("qwen2", dc_replace(cfg, attn_bias=True, rope_theta=1e6)),
            ("moe", dc_replace(cfg, intermediate_size=1408, num_experts=8,
                               num_experts_per_tok=2)),
        ):
            try:
                fam_params = init_params(fam_cfg, jax.random.PRNGKey(0))
                f_probe = FusedSamEngine(fam_cfg, fam_params, fscfg,
                                         max_cache_len=MAX_CACHE,
                                         eos_token_id=-1,
                                         prefill_buckets=(128,))
                log(f"{fam}-family fused-sam warmup/compile...")
                f_probe.generate(warm_prompt, warm)
                f_oracle = [f_probe.generate(p, gen).output_ids
                            for p in overlap_prompts]
                f_corpus = []
                for o in f_oracle:
                    f_corpus += o + [0]
                feng = FusedSamEngine(fam_cfg, fam_params, fscfg,
                                      corpus=f_corpus,
                                      max_cache_len=MAX_CACHE,
                                      eos_token_id=-1,
                                      prefill_buckets=(128,))
                feng.generate(warm_prompt, warm)
                f_outs, f_tok, f_steps, f_dt = timed_generate(
                    feng, all_prompts, gen)
                f_tps = f_tok / f_dt
                f_equal = sum(int(a == b)
                              for a, b in zip(f_oracle, f_outs[:2]))
                log(f"{fam}-family fused-sam: {f_tps:.1f} tok/s, accept "
                    f"{f_tok / max(f_steps, 1):.2f}, "
                    f"{1000 * f_dt / max(f_steps, 1):.2f} ms/step, "
                    f"overlap trajectory equal {f_equal}/2")
                detail.update({
                    f"{fam}_fused_sam_tokens_per_s": round(f_tps, 2),
                    f"{fam}_fused_sam_ms_per_step":
                        round(1000 * f_dt / max(f_steps, 1), 3),
                    f"{fam}_fused_sam_overlap_trajectory_equal":
                        f_equal == 2,
                })
                del fam_params, f_probe, feng
            except Exception:
                log(f"{fam} family section FAILED:\n"
                    + traceback.format_exc())

    # ------------------------------------------------------------------
    # Budgeted runner: information-value order, per-section fault
    # isolation, skip-don't-die when the wall clock runs short.
    # ------------------------------------------------------------------
    budget_s = float(os.environ.get("SAMD_BENCH_BUDGET_S", "3000"))
    t_start = time.monotonic()
    section_seconds = {}
    skipped = []
    detail["bench_budget_s"] = budget_s
    for name, est_s, deps, fn in sections:
        elapsed = time.monotonic() - t_start
        missing = [d for d in deps if not hasattr(S, d)]
        if missing:
            skipped.append({"section": name,
                            "reason": f"missing deps {missing}"})
            log(f"SKIP {name}: upstream section did not produce {missing}")
            continue
        if elapsed + est_s > budget_s:
            skipped.append({"section": name,
                            "reason": f"budget ({elapsed:.0f}s elapsed + "
                                      f"{est_s}s est > {budget_s:.0f}s)"})
            log(f"SKIP {name}: budget ({elapsed:.0f}s elapsed, est "
                f"{est_s}s, budget {budget_s:.0f}s)")
            continue
        log(f"=== section {name} (elapsed {elapsed:.0f}s / "
            f"{budget_s:.0f}s) ===")
        t_sec = time.monotonic()
        try:
            fn()
        except Exception:
            log(f"section {name} FAILED:\n" + traceback.format_exc())
        section_seconds[name] = round(time.monotonic() - t_sec, 1)
        detail["section_seconds"] = section_seconds
        detail["skipped_sections"] = [s["section"] for s in skipped]
        detail["skipped_section_reasons"] = skipped
        em.emit()

    # Synthetic-workload engine-mechanics speedup, NOT a Spec-Bench claim:
    # random 1B weights, corpus = oracle's own outputs on the overlap
    # prompts.  Reference Spec-Bench baselines live in BASELINE.md;
    # real-checkpoint parity needs real weights.  The final stdout line is
    # the compact headline (full detail in bench_detail.json).
    detail.update({
        "model": "llama-1b-random-bf16",
        "attention": "xla",
        "prompts": 2 * N_PROMPTS,
        "new_tokens_each": NEW_TOKENS,
        "timing": "best_of_2_all_timed_rows",
        "skipped_sections": [s["section"] for s in skipped],
        "skipped_section_reasons": skipped,
        "bench_wall_s": round(time.monotonic() - t_start, 1),
    })
    em.emit(complete=True)


if __name__ == "__main__":
    main()
