"""Codecs: text questions ↔ token ids for the evaluation runner.

The reference hardcodes two chat conventions — FastChat's vicuna template
(/root/reference/evaluation/eval_vicuna.py:96-107) and
``tokenizer.apply_chat_template`` for Llama-3
(/root/reference/evaluation/eval_llama3.py:109,193).  Here they are runner
codecs pluggable next to the token-id IdentityCodec.
"""

from __future__ import annotations

from typing import List, Sequence


class TokenizerCodec:
    """Plain encode/decode through an HF tokenizer."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def encode(self, turn: str) -> List[int]:
        return self.tokenizer.encode(turn)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=True)


class VicunaCodec(TokenizerCodec):
    """FastChat vicuna v1.1 conversation convention."""

    SYSTEM = ("A chat between a curious user and an artificial intelligence "
              "assistant. The assistant gives helpful, detailed, and polite "
              "answers to the user's questions.")

    def encode(self, turn: str) -> List[int]:
        prompt = f"{self.SYSTEM} USER: {turn} ASSISTANT:"
        return self.tokenizer.encode(prompt)


class ChatTemplateCodec(TokenizerCodec):
    """``tokenizer.apply_chat_template`` (Llama-3 style)."""

    def encode(self, turn: str) -> List[int]:
        return self.tokenizer.apply_chat_template(
            [{"role": "user", "content": turn}],
            add_generation_prompt=True)
