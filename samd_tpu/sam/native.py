"""ctypes bindings for the native (C++) suffix-automaton engine.

``NativeSuffixAutomaton`` is drop-in compatible with the Python
:class:`samd_tpu.sam.automaton.SuffixAutomaton` for everything the drafters
use (feed/peek/reset/sequence_draft/tree_draft/finalize_topk plus CSR
import/export).  The shared library builds lazily from ``csrc/sam_engine.cpp``
with g++ on first use; environments without a toolchain fall back to the
Python engine (``best_sam_class`` chooses).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "sam_engine.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "csrc", "build")
_LIB = os.path.join(_LIB_DIR, "libsamengine.so")

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None

I32 = ctypes.POINTER(ctypes.c_int32)
I64 = ctypes.POINTER(ctypes.c_int64)


def _ptr(arr: np.ndarray, ty):
    return arr.ctypes.data_as(ty)


def load_library():
    """Build (if needed) and load the native engine; returns None on failure."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
            return None
        lib.sam_create.restype = ctypes.c_void_p
        lib.sam_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.sam_destroy.argtypes = [ctypes.c_void_p]
        for fn in ("sam_num_states", "sam_text_len", "sam_num_edges"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.sam_feed.argtypes = [ctypes.c_void_p, I32, ctypes.c_int64,
                                 ctypes.c_int]
        lib.sam_reset_cursor.argtypes = [ctypes.c_void_p]
        lib.sam_reset.argtypes = [ctypes.c_void_p]
        lib.sam_cursor.argtypes = [ctypes.c_void_p, I32, I32]
        lib.sam_peek.argtypes = [ctypes.c_void_p, ctypes.c_int32, I32, I32]
        lib.sam_match.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_int32, I32, ctypes.c_int64,
                                  I32, I32]
        lib.sam_sequence_draft.restype = ctypes.c_int32
        lib.sam_sequence_draft.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int, ctypes.c_int, I32]
        lib.sam_finalize_topk.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.sam_tree_draft.restype = ctypes.c_int32
        lib.sam_tree_draft.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, I32, I32]
        lib.sam_export.argtypes = [ctypes.c_void_p, I32, I32, I32, I64, I64,
                                   I32, I32, I32]
        lib.sam_import.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            I32, I32, I32, I64, I64, I32, I32, I32]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


class NativeSuffixAutomaton:
    """C++-backed automaton with the SuffixAutomaton drafting interface."""

    def __init__(self, *, track_text: bool = True, track_counts: bool = False):
        lib = load_library()
        if lib is None:
            raise RuntimeError(f"native SAM engine unavailable: {_build_error}")
        self._lib = lib
        self.track_text = track_text
        self.track_counts = track_counts
        self._h = ctypes.c_void_p(lib.sam_create(int(track_text),
                                                 int(track_counts)))
        self._topk_k = 0

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sam_destroy(h)
            self._h = None

    # -- introspection -------------------------------------------------
    @property
    def num_states(self) -> int:
        return self._lib.sam_num_states(self._h)

    def __len__(self) -> int:
        return self._lib.sam_text_len(self._h)

    @property
    def cur_state(self) -> int:
        s, l = ctypes.c_int32(), ctypes.c_int32()
        self._lib.sam_cursor(self._h, ctypes.byref(s), ctypes.byref(l))
        return s.value

    @property
    def cur_length(self) -> int:
        s, l = ctypes.c_int32(), ctypes.c_int32()
        self._lib.sam_cursor(self._h, ctypes.byref(s), ctypes.byref(l))
        return l.value

    # -- construction / matching ---------------------------------------
    def feed(self, tokens: Sequence[int], *, grow: bool) -> None:
        arr = np.ascontiguousarray(tokens, dtype=np.int32)
        self._lib.sam_feed(self._h, _ptr(arr, I32), len(arr), int(grow))

    def extend(self, token: int) -> None:
        # match the Python engine's extend (index without cursor move):
        # sam_feed moves the cursor too, so emulate via raw feed of one token
        # with cursor save/restore is not exposed; instead use feed(grow) in
        # callers.  Kept for API parity in tests.
        arr = np.asarray([token], dtype=np.int32)
        s, l = ctypes.c_int32(), ctypes.c_int32()
        self._lib.sam_cursor(self._h, ctypes.byref(s), ctypes.byref(l))
        self._lib.sam_feed(self._h, _ptr(arr, I32), 1, 1)

    def advance_cursor(self, token: int) -> None:
        arr = np.asarray([token], dtype=np.int32)
        self._lib.sam_feed(self._h, _ptr(arr, I32), 1, 0)

    def peek(self, token: int) -> Tuple[int, int]:
        s, l = ctypes.c_int32(), ctypes.c_int32()
        self._lib.sam_peek(self._h, token, ctypes.byref(s), ctypes.byref(l))
        return s.value, l.value

    def match_step(self, state: int, length: int, token: int) -> Tuple[int, int]:
        """Stateless walk (SamCursor support)."""
        arr = np.asarray([token], dtype=np.int32)
        s, l = ctypes.c_int32(), ctypes.c_int32()
        self._lib.sam_match(self._h, state, length, _ptr(arr, I32), 1,
                            ctypes.byref(s), ctypes.byref(l))
        return s.value, l.value

    def reset_cursor(self) -> None:
        self._lib.sam_reset_cursor(self._h)

    def reset(self) -> None:
        self._lib.sam_reset(self._h)
        self._topk_k = 0

    def index_corpus(self, sequences: Sequence[Sequence[int]],
                     eos_token: int) -> None:
        for seq in sequences:
            self.feed(seq, grow=True)
            if len(seq) == 0 or seq[-1] != eos_token:
                self.feed([eos_token], grow=True)

    # -- drafting ------------------------------------------------------
    def sequence_draft(self, state: int, start_token: int, n_predicts: int,
                       *, widen: bool = False, pad: bool = False) -> List[int]:
        out = np.empty(max(n_predicts, 1), dtype=np.int32)
        n = self._lib.sam_sequence_draft(
            self._h, state, start_token, n_predicts, int(widen), int(pad),
            _ptr(out, I32))
        return out[:n].tolist()

    def finalize_topk(self, k: int = 8) -> None:
        self._lib.sam_finalize_topk(self._h, k)
        self._topk_k = k

    @property
    def _topk(self):
        # truthy sentinel so AdaptiveSelector's "already finalized" check works
        return self._topk_k or None

    def tree_draft(self, state: int, start_token: int, n_nodes: int,
                   k: int) -> Tuple[List[int], List[int]]:
        out_t = np.empty(max(n_nodes, 1), dtype=np.int32)
        out_p = np.empty(max(n_nodes, 1), dtype=np.int32)
        n = self._lib.sam_tree_draft(self._h, state, start_token, n_nodes, k,
                                     _ptr(out_t, I32), _ptr(out_p, I32))
        return out_t[:n].tolist(), out_p[:n].tolist()

    # -- serialization (CSR, same layout as samd_tpu/sam/serialize.py) --
    def to_arrays(self) -> dict:
        n = self.num_states
        e = self._lib.sam_num_edges(self._h)
        t = len(self)
        link = np.empty(n, np.int32)
        length = np.empty(n, np.int32)
        first_end = np.empty(n, np.int32)
        occ = np.empty(n, np.int64)
        ptr = np.empty(n + 1, np.int64)
        tok = np.empty(e, np.int32)
        dst = np.empty(e, np.int32)
        text = np.empty(t, np.int32)
        self._lib.sam_export(self._h, _ptr(link, I32), _ptr(length, I32),
                             _ptr(first_end, I32), _ptr(occ, I64),
                             _ptr(ptr, I64), _ptr(tok, I32), _ptr(dst, I32),
                             _ptr(text, I32))
        return {
            "version": np.int64(1),
            "flags": np.int64(int(self.track_text)
                              | (int(self.track_counts) << 1)),
            "link": link, "length": length, "first_end": first_end,
            "occ": occ, "trans_ptr": ptr, "trans_tok": tok, "trans_dst": dst,
            "text": text,
        }

    @classmethod
    def from_arrays(cls, arrays: dict) -> "NativeSuffixAutomaton":
        flags = int(arrays["flags"])
        sam = cls(track_text=bool(flags & 1), track_counts=bool(flags & 2))
        link = np.ascontiguousarray(arrays["link"], np.int32)
        length = np.ascontiguousarray(arrays["length"], np.int32)
        first_end = np.ascontiguousarray(arrays["first_end"], np.int32)
        occ = np.ascontiguousarray(arrays["occ"], np.int64)
        ptr = np.ascontiguousarray(arrays["trans_ptr"], np.int64)
        tok = np.ascontiguousarray(arrays["trans_tok"], np.int32)
        dst = np.ascontiguousarray(arrays["trans_dst"], np.int32)
        text = np.ascontiguousarray(arrays["text"], np.int32)
        sam._lib.sam_import(
            sam._h, len(link), len(tok), len(text), _ptr(link, I32),
            _ptr(length, I32), _ptr(first_end, I32), _ptr(occ, I64),
            _ptr(ptr, I64), _ptr(tok, I32), _ptr(dst, I32), _ptr(text, I32))
        return sam


def best_sam_class():
    """NativeSuffixAutomaton when the toolchain allows, else the Python one."""
    if native_available():
        return NativeSuffixAutomaton
    from .automaton import SuffixAutomaton
    return SuffixAutomaton
