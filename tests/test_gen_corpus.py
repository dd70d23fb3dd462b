"""Corpus generation pipeline (tools/gen_corpus.py → tools/build_sam.py):
the TPU-native replacement for the reference's prepare_prompts →
vLLM gen_response → gen_sam_alpaca chain."""

import json
import subprocess
import sys


def test_tokens_pipeline_end_to_end(tmp_path):
    instr = tmp_path / "instr.jsonl"
    corpus = tmp_path / "corpus.jsonl"
    sam = tmp_path / "sam.npz"
    with open(instr, "w") as f:
        f.write(json.dumps({"tokens": list(range(3, 40))}) + "\n")
        f.write(json.dumps({"tokens": list(range(50, 90))}) + "\n")

    r1 = subprocess.run(
        [sys.executable, "-m", "samd_tpu.tools.gen_corpus",
         "--input", str(instr), "--output", str(corpus),
         "--synthetic", "--cpu", "--max-new-tokens", "12",
         "--max-cache-len", "256", "--temperature", "0"],
        capture_output=True, text=True, timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rows = [json.loads(l) for l in open(corpus) if l.strip()]
    assert len(rows) == 2 and all("tokens" in r for r in rows)
    # responses were appended to the prompts
    assert len(rows[0]["tokens"]) > 37

    r2 = subprocess.run(
        [sys.executable, "-m", "samd_tpu.tools.build_sam",
         "--input", str(corpus), "--output", str(sam), "--eos-token", "0"],
        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]

    from samd_tpu.sam.serialize import load_sam

    s = load_sam(str(sam))
    assert s.num_states > 100


def test_prompt_templates():
    from samd_tpu.tools.gen_corpus import template_prompt

    row = {"instruction": "Add 2 and 2.", "input": "numbers: 2, 2"}
    v = template_prompt(row, "vicuna")
    assert v.endswith("ASSISTANT:") and "Add 2 and 2." in v
    a = template_prompt(row, "alpaca")
    assert "### Input:" in a and a.endswith("### Response:\n")
    a2 = template_prompt({"instruction": "Hi."}, "alpaca")
    assert "### Input:" not in a2
    p = template_prompt({"prompt": "raw"}, "vicuna")
    assert p == "raw"
