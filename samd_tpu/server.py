"""Serving front-end: thread-safe scheduler + HTTP API over the batched
engines.

The reference ships a single-user CLI (/root/reference/samd/inference/
cli.py); a production deployment needs concurrent request admission.  The
batched engines already implement continuous batching — their ``run()``
loop admits from ``engine.queue`` between fused segments and retires
finished slots mid-flight — so serving needs only (a) a thread-safe
submission surface and (b) one driver thread that owns the engine (all JAX
dispatch happens from that thread; HTTP threads never touch device state).

    Scheduler(engine)         — submit()/result() from any thread
    serve(engine, port=8089)  — stdlib ThreadingHTTPServer:
        POST /generate  {"input_ids": [...], "max_new_tokens": 64,
                         "temperature": 0.0, ...}
                        -> {"request_id", "output_ids", "new_tokens",
                            "decode_steps", "wall_ms"}
        POST /generate  {"stream": true, ...} (or /generate?stream=1)
                        -> Server-Sent Events: one ``data: {"tokens":
                           [...]}`` event per committed chunk (segment
                           granularity, streaming.ProgressStreamMixin),
                           then ``data: {"done": true, ...summary}``
        GET  /health    -> {"status": "ok", ...queue/slot counters}

Batch-wide constraint (engine-level): concurrent *sampling* requests must
share one sampling signature (one compiled step per signature); the HTTP
layer rejects mismatches with 400 instead of failing the whole batch.

No external dependencies: stdlib ``http.server`` only (this image has no
fastapi/uvicorn; see repo environment notes).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

from .config import GenerationConfig


class Scheduler:
    """Thread-safe request scheduler over one batched engine.

    One driver thread calls ``engine.run()`` whenever work is pending;
    ``engine.run`` itself admits queued requests between fused segments
    (continuous batching), so requests submitted mid-run join the batch
    without waiting for it to drain.
    """

    def __init__(self, engine, *, poll_s: float = 0.002):
        self.engine = engine
        self._poll_s = poll_s
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._stop = False
        self._submitted = 0
        self._outstanding: set = set()
        self._results: dict = {}
        self._stream_queues: dict = {}   # rid -> queue.Queue of events
        self._active_sig: Optional[tuple] = None
        self._driver = threading.Thread(target=self._drive, daemon=True)
        self._driver.start()

    # -- client surface (any thread) -----------------------------------
    def submit(self, input_ids: Sequence[int],
               gen: Optional[GenerationConfig] = None) -> int:
        """Enqueue a request; returns its id.  Raises ValueError if a
        sampling request's signature conflicts with requests already in
        flight (the engine compiles one sampling step per signature)."""
        gen = gen or GenerationConfig()
        with self._lock:
            if not gen.greedy:
                sig = gen.sampling_signature
                if self._active_sig is not None and sig != self._active_sig:
                    raise ValueError(
                        "concurrent sampling requests must share one "
                        "sampling signature")
                self._active_sig = sig
            rid = self.engine.add_request(list(input_ids), gen)
            self._submitted += 1
            self._outstanding.add(rid)
        self._work.set()
        return rid

    def submit_stream(self, input_ids: Sequence[int],
                      gen: Optional[GenerationConfig] = None):
        """Enqueue a request with progress streaming; returns
        ``(rid, events)`` where ``events`` is a ``queue.Queue`` yielding
        ``("tokens", [ids])`` per committed chunk and a terminal
        ``("done", Outputs)`` / ``("error", Exception)``.

        Requires an engine with ``progress_listeners``
        (streaming.ProgressStreamMixin — all batched engines)."""
        if not hasattr(self.engine, "progress_listeners"):
            raise ValueError("engine does not support progress streaming")
        gen = gen or GenerationConfig()
        events: queue.Queue = queue.Queue()
        with self._lock:
            if not gen.greedy:
                sig = gen.sampling_signature
                if self._active_sig is not None and sig != self._active_sig:
                    raise ValueError(
                        "concurrent sampling requests must share one "
                        "sampling signature")
                self._active_sig = sig
            # the listener must exist BEFORE the driver can admit the
            # request; every add_request goes through this lock, so the
            # engine's next id is stable across the two calls
            rid_pred = self.engine._next_id
            self.engine.progress_listeners[rid_pred] = (
                lambda chunk: events.put(("tokens", chunk)))
            rid = self.engine.add_request(list(input_ids), gen)
            assert rid == rid_pred
            self._stream_queues[rid] = events
            self._submitted += 1
            self._outstanding.add(rid)
        self._work.set()
        return rid, events

    def result(self, rid: int, timeout: Optional[float] = None):
        """Block until request `rid` finishes; returns its Outputs.

        Finished slots are visible in ``engine.results`` MID-run (the
        engine retires them between fused segments), so an early finisher
        returns without waiting for the batch to drain; ``run()`` hands the
        drained dict to the driver, which merges it into ``_results``."""
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            out = self._results.get(rid)
            if out is None:
                out = self.engine.results.get(rid)
            if out is not None:
                return out
            if self._stop:
                raise RuntimeError("scheduler closed")
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError(f"request {rid} not done in {timeout}s")
            time.sleep(self._poll_s)

    def generate(self, input_ids: Sequence[int],
                 gen: Optional[GenerationConfig] = None,
                 timeout: Optional[float] = None):
        return self.result(self.submit(input_ids, gen), timeout=timeout)

    def stats(self) -> dict:
        return {
            "submitted": self._submitted,
            "queued": len(self.engine.queue),
            "completed": len(self._results) + len(self.engine.results),
            "batch_size": getattr(self.engine, "B", 1),
        }

    def close(self):
        self._stop = True
        self._work.set()
        self._driver.join(timeout=30)

    # -- driver thread (owns the engine / JAX dispatch) -----------------
    def _drive(self):
        while not self._stop:
            self._work.wait()
            if self._stop:
                return
            self._work.clear()
            while self.engine.queue:
                try:
                    # drains queue + in-flight slots; returns (and clears)
                    # the engine's results dict
                    self._results.update(self.engine.run())
                except Exception as e:  # surface per-batch failure to
                    # every waiter (queued AND in-flight) instead of
                    # killing the driver
                    print(f"serving batch FAILED: {e!r}", flush=True)
                    self.engine.queue.clear()
                    self._results.update(self.engine.results)
                    self.engine.results.clear()
                    with self._lock:
                        for rid in self._outstanding:
                            self._results.setdefault(rid, e)
                self._notify_streams()
            with self._lock:
                self._outstanding -= set(self._results)
                if not self.engine.queue and not self._outstanding:
                    self._active_sig = None

    def _notify_streams(self):
        """Terminal events + listener cleanup for finished streaming
        requests (tokens chunks were already pushed mid-run by the
        engine's listener; SSE handlers additionally poll ``try_result``
        so early finishers do not wait for the batch to drain)."""
        with self._lock:
            done = [rid for rid in self._stream_queues if rid in self._results]
            for rid in done:
                events = self._stream_queues.pop(rid)
                self.engine.progress_listeners.pop(rid, None)
                out = self._results[rid]
                events.put(("error", out) if isinstance(out, Exception)
                           else ("done", out))

    def try_result(self, rid: int):
        """Non-blocking result peek (engine-mid-run results included)."""
        out = self._results.get(rid)
        if out is None:
            out = self.engine.results.get(rid)
        return out


def _gen_from_json(d: dict) -> GenerationConfig:
    kw = {}
    for k in ("max_new_tokens", "max_steps", "max_cache_len", "temperature",
              "top_p", "top_k", "seed", "accept_mode",
              "posterior_threshold", "posterior_alpha"):
        if k in d:
            kw[k] = d[k]
    if kw.get("temperature", 0.0) > 0:
        kw["greedy"] = False
    return GenerationConfig(**kw)


class _Handler(BaseHTTPRequestHandler):
    scheduler: Scheduler = None  # set by serve()

    def _reply(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):
        if self.path in ("/health", "/stats"):
            self._reply(200, {"status": "ok", **self.scheduler.stats()})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        path, _, query = self.path.partition("?")
        if path != "/generate":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            ids = req["input_ids"]
            if (not isinstance(ids, list) or not ids
                    or not all(isinstance(t, int) for t in ids)):
                raise ValueError("input_ids must be a non-empty int list")
            gen = _gen_from_json(req)
        except (KeyError, ValueError, TypeError,
                json.JSONDecodeError) as e:
            self._reply(400, {"error": str(e)})
            return
        stream = bool(req.get("stream")) or "stream=1" in query
        t0 = time.perf_counter()
        if stream:
            self._stream_generate(ids, gen, req, t0)
            return
        try:
            rid = self.scheduler.submit(ids, gen)
        except ValueError as e:  # sampling-signature conflict
            self._reply(400, {"error": str(e)})
            return
        out = self.scheduler.result(rid, timeout=req.get("timeout_s", 600))
        if isinstance(out, Exception):
            self._reply(500, {"error": repr(out), "request_id": rid})
            return
        self._reply(200, {
            "request_id": rid,
            "output_ids": list(out.output_ids),
            "new_tokens": out.decode_tokens,
            "decode_steps": out.decode_steps,
            "wall_ms": round((time.perf_counter() - t0) * 1e3, 2),
        })

    def _stream_generate(self, ids, gen, req, t0):
        """Server-Sent Events response: one ``data:`` JSON event per
        committed chunk, then a terminal ``{"done": true, ...}`` event.
        HTTP/1.0 connection-close framing (no chunked encoding needed)."""
        import queue as _q

        try:
            rid, events = self.scheduler.submit_stream(ids, gen)
        except ValueError as e:
            self._reply(400, {"error": str(e)})
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()

        def emit(obj):
            self.wfile.write(b"data: " + json.dumps(obj).encode() + b"\n\n")
            self.wfile.flush()

        deadline = time.monotonic() + req.get("timeout_s", 600)
        try:
            while True:
                try:
                    kind, payload = events.get(timeout=0.05)
                except _q.Empty:
                    # early finishers surface in engine.results mid-run,
                    # before the driver's terminal event — all chunks are
                    # already queued by then (same thread ordering)
                    out = self.scheduler.try_result(rid)
                    if out is None:
                        if time.monotonic() > deadline:
                            emit({"error": f"timeout for request {rid}"})
                            return
                        continue
                    while True:   # drain remaining chunk events in order
                        try:
                            kind, payload = events.get_nowait()
                        except _q.Empty:
                            break
                        if kind == "tokens":
                            emit({"tokens": payload})
                    kind, payload = (
                        ("error", out) if isinstance(out, Exception)
                        else ("done", out))
                if kind == "tokens":
                    emit({"tokens": payload})
                    continue
                if kind == "error":
                    emit({"error": repr(payload), "request_id": rid})
                    return
                out = payload
                emit({
                    "done": True,
                    "request_id": rid,
                    "output_ids": list(out.output_ids),
                    "new_tokens": out.decode_tokens,
                    "decode_steps": out.decode_steps,
                    "wall_ms": round((time.perf_counter() - t0) * 1e3, 2),
                })
                return
        except (BrokenPipeError, ConnectionResetError):
            pass  # client went away; the batch keeps running


def serve(engine, *, host: str = "127.0.0.1", port: int = 8089,
          block: bool = True):
    """Start the HTTP front-end over `engine`.  Returns (server, scheduler);
    with ``block=False`` the server runs on a daemon thread (tests)."""
    scheduler = Scheduler(engine)
    handler = type("Handler", (_Handler,), {"scheduler": scheduler})
    server = ThreadingHTTPServer((host, port), handler)
    if block:
        try:
            server.serve_forever()
        finally:
            scheduler.close()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, scheduler


def build_server_engine(args):
    """Build a batched serving engine from CLI args (checkpoint or
    --random-model; int8/fp8 weight quant; optional static corpus SAM)."""
    import jax

    from .models import init_params, llama_1b, tiny_config

    static_sam = None
    if args.sam:
        from .sam.serialize import load_sam

        static_sam = load_sam(args.sam, topk=8)
    if args.random_model:
        cfg = tiny_config(vocab_size=256) if args.tiny else llama_1b()
        params = init_params(cfg, jax.random.PRNGKey(0))
        eos = -1
    else:
        from .models.loader import load_llama

        cfg, params = load_llama(args.model)
        from transformers import AutoTokenizer

        eos = AutoTokenizer.from_pretrained(args.model).eos_token_id
    if args.quantize:
        import jax.numpy as jnp

        from .ops.quant import quantize_llama_params

        qdtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
                  "int4": jnp.int4}[args.quantize]
        params = quantize_llama_params(params, dtype=qdtype)
        if args.quantize == "int4" and not getattr(args, "cpu", False):
            # int4 serves through the Pallas weight-streaming kernel.
            # Regime guidance (docs/PERFORMANCE.md "INT4"): the kernel
            # halves the weight stream but doubles the matmul issue (two
            # dots per packed block), so it wins where decode is
            # weight-bound — 7B-class at any batch (0.66x the int8 step),
            # small models at low batch — and loses to int8 at
            # compute-bound high-batch 1B configs (877 vs 1079 tok/s at
            # B=12).  The operator picks the dtype; we pick the impl.
            from dataclasses import replace

            cfg = replace(cfg, int4_impl="kernel")

    corpus = static_sam.text if static_sam is not None else None
    if args.engine == "batched":
        from .batching import BatchedSamdEngine
        from .config import SamdConfig
        from .drafters import make_drafter

        scfg = SamdConfig(draft_source="sam_only")
        return BatchedSamdEngine(
            cfg, params, scfg,
            lambda: make_drafter(scfg, cfg.vocab_size,
                                 static_sam=static_sam),
            batch_size=args.batch_size, max_cache_len=args.max_cache_len,
            eos_token_id=eos)
    if args.engine in ("fused_hybrid_batched", "paged_fused_hybrid"):
        from .fused_hybrid import (BatchedFusedHybridEngine,
                                   FusedHybridConfig,
                                   PagedBatchedFusedHybridEngine)

        # batch-tuned hybrid block (docs/PERFORMANCE.md sweep: B=12
        # M=24 tree=23 is the peak config)
        hy_cfg = FusedHybridConfig(steps_per_call=16, tree_nodes=23,
                                   n_predicts=20, max_block=24)
        ctor = (PagedBatchedFusedHybridEngine
                if args.engine == "paged_fused_hybrid"
                else BatchedFusedHybridEngine)
        return ctor(cfg, params, hy_cfg, corpus=corpus,
                    batch_size=args.batch_size,
                    max_cache_len=args.max_cache_len, eos_token_id=eos,
                    inline_prefill=getattr(args, "inline_prefill", False))
    if args.engine == "eagle2_hybrid_batched":
        from .fused_hybrid import (BatchedFusedHybridEagleEngine,
                                   FusedHybridEagleConfig)

        hy_cfg = FusedHybridEagleConfig(
            steps_per_call=16, eagle_depth=4, eagle_topk=4, eagle_total=23,
            max_block=24, n_predicts=20)
        return BatchedFusedHybridEagleEngine(
            cfg, params, hy_cfg, corpus=corpus,
            batch_size=args.batch_size,
            max_cache_len=args.max_cache_len, eos_token_id=eos)
    from .fused_sam import (BatchedFusedSamEngine, FusedSamConfig,
                            PagedBatchedFusedSamEngine)

    # serving block: the batch-tuned M=16 (docs/PERFORMANCE.md "Block size
    # is a batch-dependent knob"); steps_per_call=16 sets admission latency
    fs_cfg = FusedSamConfig(steps_per_call=16, n_predicts=15)
    if args.engine == "paged_fused_sam":
        return PagedBatchedFusedSamEngine(
            cfg, params, fs_cfg, corpus=corpus,
            batch_size=args.batch_size,
            max_cache_len=args.max_cache_len, eos_token_id=eos)
    return BatchedFusedSamEngine(
        cfg, params, fs_cfg, corpus=corpus, batch_size=args.batch_size,
        max_cache_len=args.max_cache_len, eos_token_id=eos,
        inline_prefill=getattr(args, "inline_prefill", False))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="samd_tpu serving front-end")
    p.add_argument("--model", help="checkpoint dir (omit for --random-model)")
    p.add_argument("--random-model", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="with --random-model: tiny config (smoke tests)")
    p.add_argument("--engine", default="fused_sam_batched",
                   choices=["fused_sam_batched", "paged_fused_sam",
                            "fused_hybrid_batched", "paged_fused_hybrid",
                            "eagle2_hybrid_batched", "batched"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--quantize", choices=["int8", "fp8", "int4"])
    p.add_argument("--max-cache-len", type=int, default=1024)
    p.add_argument("--sam", help="static corpus SAM .npz")
    p.add_argument("--inline-prefill", action="store_true",
                   help="prompts stream through the decode loop as "
                        "forced-accept chains (zero admission stall; "
                        "fused-sam and hybrid engines)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8089)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        from .testing import force_cpu

        force_cpu()
    if not args.random_model and not args.model:
        p.error("--model required (or --random-model)")
    engine = build_server_engine(args)
    print(f"serving {args.engine} on http://{args.host}:{args.port}",
          flush=True)
    serve(engine, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
