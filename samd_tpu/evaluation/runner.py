"""Spec-Bench-style evaluation runner.

Mirrors the reference eval loop (/root/reference/evaluation/eval_vicuna.py):
load a question file (Spec-Bench JSONL schema: ``question_id``, ``category``,
``turns``), run warmups, generate per turn with wall-clock timing, and write
an answer JSONL with per-turn token/step/accept statistics.  Differences:

  * model-agnostic: takes any engine exposing ``generate(input_ids, gen)``
    and a tokenizer-like codec (for token-id questions, the identity codec);
  * no ray / GPU fan-out — multi-host sharding happens inside the engine.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

from ..config import GenerationConfig


@dataclass
class Question:
    question_id: int
    category: str
    turns: List[object]  # str (needs codec) or List[int] token ids


def load_questions(path: str) -> List[Question]:
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            out.append(Question(
                question_id=d["question_id"],
                category=d.get("category", "unknown"),
                turns=d["turns"]))
    return out


class IdentityCodec:
    """Codec for questions whose turns are already token-id lists."""

    def encode(self, turn) -> List[int]:
        return list(turn)

    def decode(self, ids: Sequence[int]):
        return list(ids)

    def encode_conversation(self, turns, answers) -> List[int]:
        """Token-id transcript: raw alternating concatenation."""
        out: List[int] = []
        for i, t in enumerate(turns):
            out.extend(t)
            if i < len(answers):
                out.extend(answers[i])
        return out


def run_eval(engine, questions: Sequence[Question], out_path: str, *,
             gen_config: Optional[GenerationConfig] = None,
             codec=None, warmup: int = 3,
             multi_turn_context: bool = True,
             model_id: str = "samd_tpu",
             append: bool = False) -> Dict:
    """Evaluate `engine` over `questions`, writing answer JSONL to
    `out_path`.  Returns aggregate stats.

    Answer schema mirrors /root/reference/evaluation/eval_vicuna.py:229-243:
    {question_id, category, model_id, choices: [{turns, idxs(decode_steps),
    new_tokens, wall_time, accept_lengths}], tstamp}.

    Multi-turn prompts are the codec's full conversation transcript
    (``encode_conversation(turns_so_far, answers_so_far)``), matching the
    reference's FastChat threading (eval_vicuna.py:96-107).

    Fault tolerance: a question whose generation raises records ``"ERROR"``
    turns and the run continues (reference eval_vicuna.py:218-220).
    """
    gen = gen_config or GenerationConfig()
    codec = codec or IdentityCodec()

    # Warmup: compile all step shapes before timing (reference runs 3 full
    # generations, eval_vicuna.py:93-156).  Beyond the first ``warmup``
    # questions, also warm the FIRST question of every category: task
    # prompt lengths differ, so a later task can hit a fresh prefill
    # bucket whose remote compile would otherwise land INSIDE its timed
    # run and poison that task's speedup row (r05 dev run: fused-sam rag
    # 0.39x from exactly this).
    warm_qs = list(questions)[:warmup]
    seen_cats = {q.category for q in warm_qs}
    for q in questions:
        if q.category not in seen_cats:
            seen_cats.add(q.category)
            warm_qs.append(q)
    for q in warm_qs:
        try:
            engine.generate(codec.encode(q.turns[0]), gen)
        except Exception:
            pass
    errors = 0

    total_tokens = 0
    total_steps = 0
    total_time = 0.0
    accept_all: List[int] = []
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "a" if append else "w") as fout:
        for q in questions:
            turns_out, idxs, new_tokens, wall_time, accepts = [], [], [], [], []
            answers: List[object] = []
            try:
                for i in range(len(q.turns)):
                    if multi_turn_context:
                        prompt = codec.encode_conversation(
                            q.turns[:i + 1], answers)
                    else:
                        prompt = codec.encode(q.turns[i])
                    t0 = time.perf_counter()
                    out = engine.generate(prompt, gen)
                    dt = time.perf_counter() - t0
                    gen_ids = out.output_ids[len(prompt):]
                    answer = codec.decode(gen_ids)
                    answers.append(answer)
                    turns_out.append(answer)
                    idxs.append(out.decode_steps)
                    new_tokens.append(out.decode_tokens)
                    wall_time.append(dt)
                    accepts.append(out.accept_length_per_step)
                    accept_all.extend(out.accept_length_per_step)
                    total_tokens += out.decode_tokens
                    total_steps += out.decode_steps
                    total_time += dt
            except Exception as e:
                # record the failure and keep evaluating (reference
                # eval_vicuna.py:218-220 records "ERROR" per question)
                print(f"ERROR on question {q.question_id}: {e!r}")
                errors += 1
                turns_out.append("ERROR")
                idxs.append(0)
                new_tokens.append(0)
                wall_time.append(0.0)
                accepts.append([])
            fout.write(json.dumps({
                "question_id": q.question_id,
                "category": q.category,
                "model_id": model_id,
                "choices": [{
                    "turns": turns_out,
                    "idxs": idxs,
                    "new_tokens": new_tokens,
                    "wall_time": wall_time,
                    "accept_lengths": accepts,
                }],
                "tstamp": time.time(),
            }) + "\n")
    mean_accept = (sum(accept_all) / len(accept_all)) if accept_all else 0.0
    return {
        "total_tokens": total_tokens,
        "total_steps": total_steps,
        "total_time": total_time,
        "tokens_per_s": total_tokens / total_time if total_time else 0.0,
        "mean_accepted_tokens": mean_accept,
        "errors": errors,
    }


def reorg_answer_file(path: str) -> None:
    """Deduplicate (last answer wins) and sort an answer JSONL by
    question_id — the reference's eval-resume mechanism
    (/root/reference/evaluation/eval_vicuna.py:247-258)."""
    answers = {}
    with open(path) as f:
        for line in f:
            if line.strip():
                answers[json.loads(line)["question_id"]] = line
    with open(path, "w") as f:
        for qid in sorted(answers):
            f.write(answers[qid])
