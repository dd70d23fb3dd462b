"""Chat CLI smoke tests (token-id REPL; reference samd/inference/cli.py)."""

import subprocess
import sys

import pytest


@pytest.mark.parametrize("engine", ["samd", "fused_sam", "fused_hybrid",
                                    "eagle2"])
def test_cli_token_repl(engine):
    r = subprocess.run(
        [sys.executable, "-m", "samd_tpu.cli", "--random-model", "--tiny",
         "--cpu", "--engine", engine, "--max-new-tokens", "8",
         "--max-cache-len", "256"],
        input="5 6 7 8 9 10\nnot-a-token\n!!reset\n3 4 5\n!!exit\n",
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    # two generations (plus the re-prompt after garbage input)
    assert r.stdout.count("ASSISTANT>") == 2
    assert "token-id mode" in r.stderr
    first = r.stdout.splitlines()[0]
    toks = [t for t in first.replace("USER>", "").replace(
        "ASSISTANT>", "").split() if t]
    assert len(toks) >= 1 and all(t.isdigit() for t in toks)


@pytest.mark.parametrize("quantize", ["int8", "fp8"])
def test_cli_quantized(quantize):
    """--quantize serves weight-only quantized params through the fused
    engine (the recommended fast serving config; docs/PERFORMANCE.md)."""
    r = subprocess.run(
        [sys.executable, "-m", "samd_tpu.cli", "--random-model", "--tiny",
         "--cpu", "--engine", "fused_sam", "--quantize", quantize,
         "--max-new-tokens", "8", "--max-cache-len", "256"],
        input="5 6 7 8 9 10\n!!exit\n",
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("ASSISTANT>") == 1


def test_cli_kv_quant():
    """--kv-quant serves through the int8 KV cache (capacity mode)."""
    r = subprocess.run(
        [sys.executable, "-m", "samd_tpu.cli", "--random-model", "--tiny",
         "--cpu", "--engine", "fused_sam", "--kv-quant",
         "--max-new-tokens", "8", "--max-cache-len", "256"],
        input="5 6 7 8 9 10\n!!exit\n",
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("ASSISTANT>") == 1


def test_cli_family_smoke():
    """--family qwen2/moe tiny configs serve through every engine type."""
    for family, engine in (("qwen2", "fused_hybrid"), ("moe", "samd")):
        r = subprocess.run(
            [sys.executable, "-m", "samd_tpu.cli", "--random-model",
             "--tiny", "--cpu", "--family", family, "--engine", engine,
             "--max-new-tokens", "8", "--max-cache-len", "256"],
            input="5 6 7 8 9 10\n!!exit\n",
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, (family, engine, r.stderr[-2000:])
        assert r.stdout.count("ASSISTANT>") == 1


def test_cli_conversation_commands(tmp_path):
    """!!remove / !!regen / !!save / !!load (reference
    samd/inference/cli.py:9-14): turn management + persistence."""
    save = tmp_path / "conv.json"
    script = (
        "5 6 7 8 9 10\n"      # turn 1
        "11 12 13\n"          # turn 2
        "!!regen\n"           # redo turn 2 (greedy => same output)
        f"!!save {save}\n"
        "!!remove\n"          # drop turn 2
        f"!!load {save}\n"    # restore both turns
        "!!remove\n!!remove\n!!remove\n"   # drain + one extra (warns)
        "3 4 5\n"             # fresh turn on empty history
        "!!exit\n")
    r = subprocess.run(
        [sys.executable, "-m", "samd_tpu.cli", "--random-model", "--tiny",
         "--cpu", "--engine", "fused_sam", "--max-new-tokens", "8",
         "--max-cache-len", "256"],
        input=script, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    # 4 generations: turn1, turn2, regen, final fresh turn
    assert r.stdout.count("ASSISTANT>") == 4
    # greedy regen reproduces turn 2 exactly
    lines = [ln for ln in r.stdout.splitlines() if "ASSISTANT>" in ln]
    assert lines[1].split("ASSISTANT>")[1] == lines[2].split("ASSISTANT>")[1]
    assert f"saved 2 turns" in r.stderr
    assert f"loaded 2 turns" in r.stderr
    assert "nothing to remove" in r.stderr
    import json

    turns = json.loads(save.read_text())
    assert len(turns) == 2 and turns[0][0] == [5, 6, 7, 8, 9, 10]
