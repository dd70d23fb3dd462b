"""Bench artifact emission: the compact stdout line must stay under the
driver's tail capture (the round-2 `parsed: null` failure mode) and partial
emits must be parsed-valid (the OOM-wedge hardening)."""

import json

from samd_tpu.evaluation.bench_emit import (
    HEADLINE_KEYS,
    MAX_LINE,
    BenchEmitter,
    compact_line,
)


def _worst_case_detail():
    """Every headline key present, values at their realistic max widths
    (bench rounds floats to <= 3 decimals; counts are 'n/m' strings)."""
    detail = {}
    for k in HEADLINE_KEYS:
        if k.endswith("_equal") or k.endswith("_confirmed"):
            detail[k] = False
        elif k.endswith("_count"):
            detail[k] = "12/12"
        elif k.endswith("_slots"):
            detail[k] = "6144/12288"
        else:
            detail[k] = 99999.999
    return detail


def test_compact_line_fits_tail_capture():
    line = compact_line(_worst_case_detail(), value=99.9999,
                        vs_baseline=99.9999, complete=True)
    assert len(line) < MAX_LINE, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "fused_sam_speedup_vs_own_ar_synthetic_1b"
    assert parsed["complete"] is True
    # every headline key survived (no overflow-driven drops at real sizes)
    assert set(parsed["detail"]) == set(HEADLINE_KEYS)


def test_compact_line_never_overflows_even_when_pathological():
    detail = {k: "x" * 200 for k in HEADLINE_KEYS}
    line = compact_line(detail, value=0.0, vs_baseline=0.0, complete=False)
    assert len(line) <= MAX_LINE
    assert json.loads(line)["metric"]


def test_emitter_partial_then_complete(tmp_path, capsys):
    detail = {}
    em = BenchEmitter(detail, path=str(tmp_path / "d.json"))
    detail["ar_tokens_per_s"] = 35.2
    em.emit()
    detail["fused_sam_tokens_per_s"] = 400.0
    em.value = 11.3
    em.vs_baseline = 6.1
    em.emit(complete=True)
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    first, last = json.loads(lines[0]), json.loads(lines[-1])
    assert first["complete"] is False and first["value"] == 0.0
    assert last["complete"] is True and last["value"] == 11.3
    assert last["detail"]["fused_sam_tokens_per_s"] == 400.0
    full = json.loads((tmp_path / "d.json").read_text())
    assert full["detail"] == detail and full["complete"] is True


def test_bench_runner_budget_zero_skips_all_sections(tmp_path, capsys,
                                                     monkeypatch):
    """bench.py's budgeted runner (round-5 rc=124 fix): with a zero budget
    every section is SKIPPED (none runs device work beyond model init), the
    final line still emits complete=true, and the skip list names every
    section in information-value order."""
    import sys

    monkeypatch.setenv("SAMD_BENCH_BUDGET_S", "0")
    monkeypatch.chdir(tmp_path)  # bench_detail.json lands here
    sys.path.insert(0, "/root/repo")
    import bench

    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    final = json.loads(lines[-1])
    assert final["complete"] is True
    skipped = final["detail"]["skipped_sections"]
    # information-value order: honesty sections before the long tail
    assert skipped[:5] == ["ar_baseline", "oracles", "fused_sam",
                           "int8_fused_sam", "int4_fused_sam"]
    assert "trained_accept" in skipped[:7]
    assert "specbench_pipeline" in skipped[:7]
    assert "model_families" == skipped[-1]
    assert len(skipped) >= 30
    detail = json.loads((tmp_path / "bench_detail.json").read_text())
    assert detail["complete"] is True
    assert detail["detail"]["bench_budget_s"] == 0.0
