"""Per-request progress streaming for the batched serving engines.

The single-stream engines already stream (``SamdEngine.stream_generate``,
used by the CLI — reference analogue: the token-by-token REPL output in
/root/reference/samd/inference/cli.py:186-195).  The batched engines retire
whole requests between fused segments, so a server built on them could only
reply with complete generations.  This mixin closes that gap: a listener
registered under a request id receives each newly COMMITTED chunk of
generated token ids (prompt excluded, budget/EOS-clamped exactly like the
final ``Outputs``) as soon as the segment that produced it returns to the
host.  Chunk granularity is therefore the engine's ``steps_per_call``
segment (the serving configs run 16-step segments).

Listeners are invoked on the engine's driver thread — they must be cheap
and non-blocking (the HTTP front-end pushes into a ``queue.Queue``).
Listener exceptions are swallowed: a dead client must not kill the batch.

Used by ``server.Scheduler.submit_stream`` / the SSE ``POST /generate``
with ``"stream": true``.
"""

from __future__ import annotations

import numpy as np


class ProgressStreamMixin:
    """Opt-in per-request token streaming for batched engines.

    ``engine.progress_listeners[rid] = fn`` registers a callback; the engine
    calls ``fn(chunk_ids)`` with each new list of generated tokens.  Two
    bookkeeping styles serve the two engine families:

      * fused engines (device-resident histories) call
        ``_emit_stream_progress`` once per segment — it fetches the history
        matrix only when a streaming listener is active and emits the
        UNSEEN span of each streamed slot;
      * host-history engines (``batching.BatchedSamdEngine``) call
        ``_emit_stream_chunk`` with the per-step accepted chunk directly
        (no extra device traffic).

    ``_stream_done(rid)`` drops the per-request bookkeeping when it
    finishes (the listener itself is owned — and removed — by whoever
    registered it, normally ``server.Scheduler``).
    """

    @property
    def progress_listeners(self) -> dict:
        d = getattr(self, "_progress_listeners", None)
        if d is None:
            d = {}
            self._progress_listeners = d
            self._stream_pos = {}       # rid -> absolute history index
            self._stream_count = {}     # rid -> generated tokens emitted
        return d

    # -- fused engines: device-resident [B, S] histories -------------------
    def _emit_stream_progress(self, actives, hist_lens) -> None:
        """Per-segment hook: emit each streamed slot's newly committed span.

        Clamping matches the finish path bit-for-bit: tokens beyond
        ``prompt + max_new`` never stream (the device can overshoot by up
        to one block), and nothing streams after an EOS."""
        listeners = getattr(self, "_progress_listeners", None)
        if not listeners:
            return
        todo = [i for i in range(self.B)
                if actives[i] and self._slot_req[i] in listeners]
        if not todo:
            return
        hist_np = np.asarray(self.histories)
        for i in todo:
            rid = self._slot_req[i]
            plen = self._slot_prompt[i]
            limit = plen + self._slot_max_new[i]
            start = self._stream_pos.setdefault(rid, plen)
            end = min(int(hist_lens[i]), limit)
            if end <= start:
                continue
            chunk = hist_np[i, start:end].tolist()
            if self.eos_token_id in chunk:
                chunk = chunk[:chunk.index(self.eos_token_id) + 1]
                end = limit  # suppress anything the device wrote after EOS
            self._stream_pos[rid] = end
            try:
                listeners[rid](chunk)
            except Exception:
                pass

    # -- host-history engines: per-step accepted chunks --------------------
    def _emit_stream_chunk(self, rid, chunk, max_new: int) -> None:
        listeners = getattr(self, "_progress_listeners", None)
        if not listeners or rid not in listeners:
            return
        emitted = self._stream_count.setdefault(rid, 0)
        chunk = list(chunk)[:max(0, max_new - emitted)]
        if not chunk:
            return
        self._stream_count[rid] = emitted + len(chunk)
        try:
            listeners[rid](chunk)
        except Exception:
            pass

    def _stream_done(self, rid) -> None:
        if getattr(self, "_progress_listeners", None):
            self._stream_pos.pop(rid, None)
            self._stream_count.pop(rid, None)
