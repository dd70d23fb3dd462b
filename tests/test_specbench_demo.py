"""End-to-end Spec-Bench pipeline demo (trained tiny model).

Exercises the full reference eval stack in one run — question file on disk,
run_eval, answer JSONL, reorg, speed.py per-task speedups, equal.py — the
pipeline bench.py's specbench section executes on the TPU
(samd_tpu/evaluation/specbench_demo.py; reference:
/root/reference/evaluation/eval_vicuna.py + speed.py + equal.py)."""

import json
import os

from samd_tpu.evaluation.specbench_demo import run


def test_specbench_pipeline_end_to_end(tmp_path):
    out = run(steps=25, vocab=32, per_task=1, new_tokens=16, seed=0,
              out_dir=str(tmp_path))
    # the on-disk artifacts of every pipeline stage exist
    assert os.path.exists(tmp_path / "question.jsonl")
    assert os.path.exists(tmp_path / "baseline.jsonl")
    assert os.path.exists(tmp_path / "sam_only.jsonl")
    assert os.path.exists(tmp_path / "fused_sam.jsonl")
    # answer schema matches the reference (choices/turns/idxs/new_tokens)
    with open(tmp_path / "sam_only.jsonl") as f:
        row = json.loads(f.readline())
    assert set(row) >= {"question_id", "category", "model_id", "choices"}
    choice = row["choices"][0]
    assert set(choice) >= {"turns", "idxs", "new_tokens", "wall_time"}

    assert out["n_questions"] == 6  # one per Spec-Bench task
    for name in ("sam_only", "fused_sam"):
        row = out["engines"][name]
        assert row["errors"] == 0
        # chain drafts: bitwise-equal vs the matching-block AR oracle
        assert row["outputs_equal_vs_block_oracle"], row["mismatch_qids"]
        assert set(row["speedup"]) >= {"rag", "qa", "overall"}
        assert row["mean_accept"] > 0
    # the trained corpus SAM must pull real accept on the overlap tasks
    assert out["engines"]["sam_only"]["mean_accept"] > 1.5
