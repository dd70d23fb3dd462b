"""Serving front-end (samd_tpu/server.py): thread-safe scheduler + HTTP API
over the batched engines.

The reference ships only a single-user CLI; the serving layer here must (a)
return outputs identical to single-stream generation (tiny config is
fp32-exact, so bitwise), (b) accept submissions from concurrent client
threads mid-run (continuous batching through ``engine.queue``), and (c)
survive malformed requests."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from samd_tpu.config import GenerationConfig
from samd_tpu.fused_sam import (
    BatchedFusedSamEngine,
    FusedSamConfig,
    FusedSamEngine,
)
from samd_tpu.models import init_params, tiny_config
from samd_tpu.server import Scheduler, serve

FSCFG = FusedSamConfig(n_predicts=15, steps_per_call=6, corpus_capacity=256)
GEN = GenerationConfig(max_new_tokens=16, max_cache_len=256)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    return cfg, params


@pytest.fixture(scope="module")
def expected(tiny_model):
    cfg, params = tiny_model
    single = FusedSamEngine(cfg, params, FSCFG, max_cache_len=256,
                            eos_token_id=-1, prefill_buckets=(32,))
    prompts = [np.random.default_rng(11).integers(
        3, 128, size=int(n)).tolist() for n in (12, 17, 9, 22, 14)]
    return prompts, [single.generate(p, GEN).output_ids for p in prompts]


def _engine(tiny_model):
    cfg, params = tiny_model
    return BatchedFusedSamEngine(cfg, params, FSCFG, batch_size=2,
                                 max_cache_len=256, eos_token_id=-1,
                                 prefill_buckets=(32,))


def test_scheduler_concurrent_submissions_match_single(tiny_model, expected):
    prompts, exp = expected
    sched = Scheduler(_engine(tiny_model))
    try:
        outs = [None] * len(prompts)

        def client(i):
            outs[i] = sched.generate(prompts[i], GEN, timeout=120)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, out in enumerate(outs):
            assert out is not None and not isinstance(out, Exception)
            assert out.output_ids == exp[i], f"prompt {i}"
        stats = sched.stats()
        assert stats["submitted"] == len(prompts)
        assert stats["queued"] == 0
    finally:
        sched.close()


def test_scheduler_late_submission_joins_running_batch(tiny_model, expected):
    """A request submitted while the driver is mid-run must be admitted by
    the engine's continuous-batching loop, not wait for a drain."""
    prompts, exp = expected
    sched = Scheduler(_engine(tiny_model))
    try:
        first = sched.submit(prompts[0], GEN)
        # second arrives while the batch runs
        second = sched.submit(prompts[1], GEN)
        assert sched.result(first, timeout=120).output_ids == exp[0]
        assert sched.result(second, timeout=120).output_ids == exp[1]
    finally:
        sched.close()


def test_http_generate_health_and_errors(tiny_model, expected):
    prompts, exp = expected
    server, sched = serve(_engine(tiny_model), port=0, block=False)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"input_ids": prompts[0],
                           "max_new_tokens": 16,
                           "max_cache_len": 256}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{url}/generate", data=body,
                headers={"Content-Type": "application/json"}),
                timeout=120) as r:
            out = json.loads(r.read())
        assert out["output_ids"] == exp[0]
        assert out["new_tokens"] == len(exp[0]) - len(prompts[0])
        assert out["decode_steps"] >= 1

        with urllib.request.urlopen(f"{url}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["submitted"] >= 1

        # malformed: missing input_ids -> 400, server stays up
        bad = urllib.request.Request(
            f"{url}/generate", data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=30)
        assert exc.value.code == 400

        with urllib.request.urlopen(f"{url}/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
        sched.close()


def test_sampling_signature_conflict_rejected(tiny_model):
    sched = Scheduler(_engine(tiny_model))
    try:
        g1 = GenerationConfig(max_new_tokens=8, max_cache_len=256,
                              greedy=False, temperature=0.8, seed=1)
        g2 = GenerationConfig(max_new_tokens=8, max_cache_len=256,
                              greedy=False, temperature=0.5, seed=2)
        rid = sched.submit([5, 6, 7, 8], g1)
        with pytest.raises(ValueError, match="sampling signature"):
            sched.submit([5, 6, 7, 8], g2)
        out = sched.result(rid, timeout=120)
        assert not isinstance(out, Exception)
    finally:
        sched.close()


def test_build_server_engine_choices():
    """Every --engine choice constructs (tiny random model)."""
    import argparse

    from samd_tpu.server import build_server_engine

    for engine in ("fused_sam_batched", "fused_hybrid_batched",
                   "eagle2_hybrid_batched", "batched"):
        args = argparse.Namespace(
            model=None, random_model=True, tiny=True, engine=engine,
            batch_size=2, quantize=None, max_cache_len=256, sam=None)
        eng = build_server_engine(args)
        assert hasattr(eng, "add_request") and hasattr(eng, "run")
    # every weight-quant choice constructs (int4 keeps the CPU-safe XLA
    # dequant path under --cpu; the kernel impl is TPU-only)
    for quant in ("int8", "fp8", "int4"):
        args = argparse.Namespace(
            model=None, random_model=True, tiny=True,
            engine="fused_sam_batched", batch_size=2, quantize=quant,
            max_cache_len=256, sam=None, cpu=True)
        eng = build_server_engine(args)
        assert eng.model_cfg.int4_impl == "xla"
        out = eng.add_request([5, 6, 7, 8],
                              GenerationConfig(max_new_tokens=4,
                                               max_cache_len=256))
        assert eng.run()[out].decode_tokens >= 1


def test_sse_streaming_matches_blocking(tiny_model, expected):
    """POST /generate {"stream": true} emits SSE chunk events whose
    concatenation equals the blocking response's generated tokens, then a
    terminal done event with the full summary."""
    prompts, exp = expected
    server, sched = serve(_engine(tiny_model), port=0, block=False)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"input_ids": prompts[0], "stream": True,
                           "max_new_tokens": 16,
                           "max_cache_len": 256}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{url}/generate", data=body,
                headers={"Content-Type": "application/json"}),
                timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            events = []
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[len("data: "):]))
        assert events and events[-1].get("done") is True
        streamed = [t for e in events[:-1] for t in e["tokens"]]
        final = events[-1]
        assert final["output_ids"] == exp[0]
        # chunk concatenation == generated part of the final output
        assert streamed == exp[0][len(prompts[0]):]
        assert final["new_tokens"] == len(streamed)
    finally:
        server.shutdown()
        sched.close()


def test_scheduler_submit_stream_chunks(tiny_model, expected):
    """Scheduler.submit_stream delivers ordered chunk events and a terminal
    done event; mixing streaming and blocking clients in one batch works."""
    prompts, exp = expected
    sched = Scheduler(_engine(tiny_model))
    try:
        rid, events = sched.submit_stream(prompts[2], GEN)
        other = sched.submit(prompts[3], GEN)
        chunks = []
        while True:
            kind, payload = events.get(timeout=120)
            if kind == "done":
                out = payload
                break
            assert kind == "tokens"
            chunks.append(payload)
        assert out.output_ids == exp[2]
        flat = [t for c in chunks for t in c]
        assert flat == exp[2][len(prompts[2]):]
        assert sched.result(other, timeout=120).output_ids == exp[3]
        # listener bookkeeping is cleaned up
        assert rid not in sched.engine.progress_listeners
    finally:
        sched.close()
