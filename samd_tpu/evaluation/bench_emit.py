"""Bench artifact emission: compact stdout lines + full detail file.

Round-2 post-mortem (VERDICT.md "What's weak" #1): the bench printed ONE
stdout JSON line carrying every detail key; it outgrew the driver's
2000-char tail capture and the archived artifact lost its *leading* keys
(``BENCH_r02.json: "parsed": null``).  Round-2 #8: a single OOM wedges the
tunneled backend permanently, so a bench that only prints at the end loses
the whole artifact to one bad section.

This module fixes both:

  * ``compact_line`` builds a curated-headline JSON line guaranteed (and
    tested) to stay under ``MAX_LINE`` chars — small enough that the
    driver's tail capture always contains it whole;
  * ``BenchEmitter.emit`` is called after EVERY bench section: it rewrites
    the full-detail file (``bench_detail.json``) and prints a fresh compact
    line to stdout.  The driver parses the LAST stdout line, so a crash in
    section N still leaves sections 1..N-1 as a parsed-valid artifact.
"""

from __future__ import annotations

import json
import sys
from typing import Dict, Optional

MAX_LINE = 1800  # < the driver's 2000-char tail capture, with margin

# Curated headline keys (VERDICT.md round-2 item 2 names the required set:
# ar, host_sam_only speedup, fused_sam bf16/int8 tok/s + ms/step + accept +
# equal, batched peak, 7B rows, hybrid + eagle2 rows, TTFT) plus the
# round-3 additions (paged fused batched, near-tie audit, sampling modes).
# Everything else lives in the detail file only.
HEADLINE_KEYS = (
    # ar_ms_per_step and fused_sam_speedup are detail-only: the former is
    # derivable from ar_tokens_per_s, the latter duplicates the top-level
    # "value" field on the same line
    "ar_tokens_per_s",
    "host_sam_only_speedup",
    "greedy_outputs_equal",
    "fused_sam_tokens_per_s",
    "fused_sam_mean_accept",
    "fused_sam_ms_per_step",
    "fused_sam_overlap_trajectory_equal",
    "int8_fused_sam_tokens_per_s",
    "int8_fused_sam_ms_per_step",
    "int8_vs_bf16_step_time_ratio",
    "int4_fused_sam_tokens_per_s",
    "int4_vs_int8_step_time_ratio",
    "int8_batched_peak_tokens_per_s",
    "int8_batched_hybrid_peak_tokens_per_s",
    "paged_fused_batched_tokens_per_s",
    "paged_fused_batched_vs_dense_ratio",
    # int8_7b_ar moved to the detail file (r05 width budget; the
    # speedup-vs-own-AR keys carry its story)
    "int8_7b_fused_sam_tokens_per_s",
    "int8_7b_fused_sam_ms_per_step",
    # round 5: the int4 7B row quantizes the SAME base weights as the int8
    # row (ops/quant.int4_requant_from_int8_init, verified in-bench), so
    # tok/s + accept are comparable again
    # headline-width budget (round 5): int4 ms/step rows, the TR
    # near-tie flag, the int8-TR and int8kv-pages tok/s moved to the
    # detail file — their stories ride the retained ratio keys
    "int4_7b_fused_sam_tokens_per_s",
    "int4_7b_vs_int8_7b_step_time_ratio",
    "int4_7b_base_weights_match_int8_row",
    "int4_7b_paged_batched_tokens_per_s",
    "int4_13b_fused_sam_tokens_per_s",
    "int4_batched_fused_sam_tokens_per_s",
    "fused_sam_token_recycle_tokens_per_s",
    "fused_sam_token_recycle_mean_accept",
    "fused_sam_token_recycle_equal_count",
    "fused_sam_eagle2_tokens_per_s",
    "fused_sam_eagle2_equal_count",
    "int8_fused_eagle2_tokens_per_s",
    "flagship_ttft_ms",
    "flagship_ttft_2k_prompt_ms",
    # typical/nucleus ms/step + the int8-page capacity string moved to the
    # detail file in round 4 to make headline room for the int4 rows (they
    # are archived in BENCH_r03.json and unchanged by round-4 work)
    "trained_accept_eagle2",
    "trained_accept_token_recycle",
    "longcache8k_flash_vs_xla_ratio",
    # end-to-end Spec-Bench pipeline (trained tiny model); the sam_only
    # per-task table lives in the detail file
    "specbench_fused_sam_speedup",
    "specbench_equal",
    # budget accounting (round 5): which sections were skipped, if any —
    # LAST so an overflowing line drops it before any measurement
    "skipped_sections",
)


def compact_line(detail: Dict, *, value: float, vs_baseline: float,
                 complete: bool) -> str:
    """One stdout JSON line with only the curated headline keys, hard-capped
    at MAX_LINE chars (drops trailing headline keys if a pathological value
    would overflow — never the metric header)."""
    head = {k: detail[k] for k in HEADLINE_KEYS if k in detail}
    base = {
        "metric": "fused_sam_speedup_vs_own_ar_synthetic_1b",
        "value": value,
        "unit": "x",
        "vs_baseline": vs_baseline,
        "complete": complete,
        "detail_file": "bench_detail.json",
    }
    line = json.dumps({**base, "detail": head})
    while len(line) > MAX_LINE and head:
        head.pop(next(reversed(head)))
        line = json.dumps({**base, "detail": head})
    return line


class BenchEmitter:
    """Flushes the artifact after every section (crash/OOM hardening)."""

    def __init__(self, detail: Dict, path: str = "bench_detail.json"):
        self.detail = detail
        self.path = path
        self.value: Optional[float] = None
        self.vs_baseline: Optional[float] = None

    def emit(self, complete: bool = False) -> None:
        value = self.value if self.value is not None else 0.0
        vsb = self.vs_baseline if self.vs_baseline is not None else 0.0
        full = {
            "metric": "fused_sam_speedup_vs_own_ar_synthetic_1b",
            "value": value, "unit": "x", "vs_baseline": vsb,
            "complete": complete, "detail": self.detail,
        }
        try:
            with open(self.path, "w") as f:
                json.dump(full, f)
        except OSError as e:  # read-only cwd must not kill the bench
            print(f"bench_detail write failed: {e}", file=sys.stderr)
        print(compact_line(self.detail, value=value, vs_baseline=vsb,
                           complete=complete), flush=True)
