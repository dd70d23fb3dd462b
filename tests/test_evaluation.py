"""Evaluation harness tests: runner → answer files → speed/equal analysis."""

import json

import pytest

import jax

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import ArBaseline, SamdEngine
from samd_tpu.evaluation import (
    compare,
    load_questions,
    make_questions,
    mean_accepted_tokens,
    run_eval,
    speedup,
    tokens_per_second,
    write_questions,
)
from samd_tpu.models import init_params, tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_config(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=512)
    questions = make_questions(cfg.vocab_size, per_task=1, seed=1,
                               tasks=["summarization", "qa", "mt_bench"])
    tmp = tmp_path_factory.mktemp("eval")
    return cfg, params, gen, questions, tmp


def test_questions_roundtrip(setup, tmp_path):
    _, _, _, questions, _ = setup
    path = tmp_path / "q.jsonl"
    write_questions(questions, str(path))
    loaded = load_questions(str(path))
    assert [q.question_id for q in loaded] == [q.question_id for q in questions]
    assert loaded[0].turns == questions[0].turns


def test_run_eval_and_analysis(setup):
    cfg, params, gen, questions, tmp = setup
    ar = ArBaseline(cfg, params, max_cache_len=512, eos_token_id=-1,
                    prefill_buckets=(256, 512))
    base_path = str(tmp / "baseline.jsonl")
    stats_b = run_eval(ar, questions, base_path, gen_config=gen, warmup=1)
    assert stats_b["total_tokens"] > 0

    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=8, len_bias=0)
    engine = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=512, eos_token_id=-1,
                        prefill_buckets=(256, 512))
    ans_path = str(tmp / "samd.jsonl")
    stats_s = run_eval(engine, questions, ans_path, gen_config=gen, warmup=1)
    assert stats_s["mean_accepted_tokens"] >= 1.0

    # speed analysis has per-task and overall entries
    tps = tokens_per_second(ans_path)
    assert "overall" in tps and "summarization" in tps
    sp = speedup(ans_path, base_path)
    assert all(v > 0 for v in sp.values())
    assert mean_accepted_tokens(ans_path) == pytest.approx(
        stats_s["mean_accepted_tokens"])

    # losslessness (fp32 CPU: exact)
    equal, mismatches = compare(ans_path, base_path)
    assert equal, f"mismatched questions: {mismatches}"

    # answer schema matches the reference's field names
    with open(ans_path) as f:
        row = json.loads(f.readline())
    assert {"question_id", "category", "model_id", "choices",
            "tstamp"} <= set(row)
    choice = row["choices"][0]
    assert {"turns", "idxs", "new_tokens", "wall_time",
            "accept_lengths"} <= set(choice)


def test_multi_turn_context_carries(setup):
    cfg, params, gen, _, tmp = setup
    questions = make_questions(cfg.vocab_size, per_task=1, seed=3,
                               tasks=["mt_bench"])
    assert len(questions[0].turns) == 2
    ar = ArBaseline(cfg, params, max_cache_len=512, eos_token_id=-1,
                    prefill_buckets=(256, 512))
    path = str(tmp / "mt.jsonl")
    run_eval(ar, questions, path, gen_config=gen, warmup=0)
    with open(path) as f:
        row = json.loads(f.readline())
    assert len(row["choices"][0]["turns"]) == 2


def test_reorg_answer_file(tmp_path):
    from samd_tpu.evaluation import reorg_answer_file

    path = tmp_path / "a.jsonl"
    rows = [{"question_id": 2, "v": "old"},
            {"question_id": 1, "v": "x"},
            {"question_id": 2, "v": "new"}]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    reorg_answer_file(str(path))
    got = [json.loads(l) for l in open(path)]
    assert [g["question_id"] for g in got] == [1, 2]
    assert got[1]["v"] == "new"
