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
