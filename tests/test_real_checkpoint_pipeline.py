"""End-to-end real-checkpoint pipeline: HF fixture on disk → loader →
engine → Spec-Bench runner with a real tokenizer codec → speed/equal.

This is the rehearsal for the day real weights appear (VERDICT r01 §missing
1): everything the reference does per /root/reference/evaluation/
eval_vicuna.py:93-258 runs here against a tiny on-disk checkpoint —
safetensors weights + config.json + a real (WordLevel) HF tokenizer —
so a real parity run is one path substitution away.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.config import GenerationConfig, SamdConfig
from samd_tpu.drafters import make_drafter
from samd_tpu.engine import ArBaseline, SamdEngine

VOCAB = 256
MAX_CACHE = 512


@pytest.fixture(scope="module")
def hf_fixture_dir(tmp_path_factory):
    """A tiny on-disk HF Llama checkpoint + real tokenizer."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("hf_ckpt")
    hf_cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=MAX_CACHE, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(7)
    model = LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(str(d))

    # Real HF tokenizer: WordLevel over a small word vocabulary, saved and
    # loaded through the standard tokenizer machinery.
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = {f"w{i}": i for i in range(VOCAB - 8)}
    vocab = {"<unk>": VOCAB - 8, "<s>": VOCAB - 7, "</s>": VOCAB - 6,
             "USER:": VOCAB - 5, "ASSISTANT:": VOCAB - 4, "A": VOCAB - 3,
             "user": VOCAB - 2, "assistant": VOCAB - 1, **words}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    return str(d)


@pytest.fixture(scope="module")
def tokenizer(hf_fixture_dir):
    from transformers import PreTrainedTokenizerFast

    tk = PreTrainedTokenizerFast(
        tokenizer_file=hf_fixture_dir + "/tokenizer.json",
        unk_token="<unk>", bos_token="<s>", eos_token="</s>")
    tk.chat_template = (
        "{% for m in messages %}<s> {{ m['role'] }} {{ m['content'] }} "
        "{% endfor %}{% if add_generation_prompt %}<s> assistant{% endif %}")
    return tk


@pytest.fixture(scope="module")
def loaded(hf_fixture_dir):
    from samd_tpu.models.loader import load_llama

    return load_llama(hf_fixture_dir, dtype=jnp.float32)


def _questions(n=3, turns=2, words_per_turn=24, poisoned_id=None):
    from samd_tpu.evaluation.runner import Question

    rng = np.random.default_rng(0)
    qs = []
    for qid in range(n):
        if qid == poisoned_id:
            # longer than the largest prefill bucket => engine raises
            qs.append(Question(question_id=qid, category="qa",
                               turns=[" ".join("w1" for _ in range(2000))]))
            continue
        tt = []
        for _ in range(turns):
            ids = rng.integers(0, VOCAB - 6, size=words_per_turn)
            tt.append(" ".join(f"w{i}" for i in ids))
        qs.append(Question(question_id=qid, category="qa", turns=tt))
    return qs


def test_load_serve_runner_speed_equal(loaded, tokenizer, tmp_path):
    """loader → AR + samd engines → run_eval (Vicuna transcript codec) →
    speed + equal harnesses, greedy losslessness across the whole pipeline."""
    from samd_tpu.evaluation.codecs import VicunaCodec
    from samd_tpu.evaluation.equal import compare
    from samd_tpu.evaluation.runner import run_eval
    from samd_tpu.evaluation.speed import (
        mean_accepted_tokens,
        speedup,
        tokens_per_second,
    )

    cfg, params = loaded
    M = 16
    samd_cfg = SamdConfig(draft_source="sam_only", max_predicts=M)
    engine = SamdEngine(cfg, params, samd_cfg,
                        make_drafter(samd_cfg, cfg.vocab_size),
                        max_cache_len=MAX_CACHE, eos_token_id=-1,
                        prefill_buckets=(128, 256))
    oracle = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                        eos_token_id=-1, prefill_buckets=(128, 256),
                        block_size=M)
    codec = VicunaCodec(tokenizer)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=MAX_CACHE)
    qs = _questions()

    a_path, b_path = str(tmp_path / "samd.jsonl"), str(tmp_path / "ar.jsonl")
    stats = run_eval(engine, qs, a_path, gen_config=gen, codec=codec,
                     warmup=1, model_id="samd")
    base = run_eval(oracle, qs, b_path, gen_config=gen, codec=codec,
                    warmup=1, model_id="ar")
    assert stats["errors"] == 0 and base["errors"] == 0
    assert stats["total_tokens"] > 0

    # answers decode to text through the real tokenizer
    with open(a_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert len(rows) == len(qs)
    assert all(isinstance(t, str) and t
               for r in rows for t in r["choices"][0]["turns"])

    # losslessness: same text as the block-AR oracle, question by question
    equal, mismatches = compare(a_path, b_path)
    assert equal, f"speculative output diverged on questions {mismatches}"

    # speed harness consumes the files
    tps = tokens_per_second(a_path)
    assert tps["overall"] > 0 and "qa" in tps
    sp = speedup(a_path, b_path)
    assert "overall" in sp
    assert mean_accepted_tokens(a_path) >= 1.0


def test_runner_survives_poisoned_question(loaded, tokenizer, tmp_path):
    """One bad question (prompt exceeds every prefill bucket) records ERROR
    and the run continues (reference eval_vicuna.py:218-220)."""
    from samd_tpu.evaluation.codecs import VicunaCodec
    from samd_tpu.evaluation.runner import run_eval

    cfg, params = loaded
    oracle = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                        eos_token_id=-1, prefill_buckets=(128, 256))
    qs = _questions(n=3, poisoned_id=1)
    out = str(tmp_path / "ans.jsonl")
    stats = run_eval(oracle, qs, out,
                     gen_config=GenerationConfig(max_new_tokens=8,
                                                 max_cache_len=MAX_CACHE),
                     codec=VicunaCodec(tokenizer), warmup=0)
    assert stats["errors"] == 1
    with open(out) as f:
        rows = {json.loads(l)["question_id"]: json.loads(l)
                for l in f if l.strip()}
    assert set(rows) == {0, 1, 2}
    assert rows[1]["choices"][0]["turns"] == ["ERROR"]
    assert all("ERROR" not in rows[q]["choices"][0]["turns"] for q in (0, 2))


def test_vicuna_transcript_multiturn(tokenizer):
    """The Vicuna codec threads the full conversation with role separators
    (FastChat convention, reference eval_vicuna.py:96-107)."""
    from samd_tpu.evaluation.codecs import VicunaCodec

    codec = VicunaCodec(tokenizer)
    t1 = codec.transcript(["w1 w2"], [])
    assert t1.endswith("ASSISTANT:") and "USER: w1 w2" in t1
    t2 = codec.transcript(["w1 w2", "w3"], ["w9 w8"])
    assert "ASSISTANT: w9 w8</s>" in t2
    assert t2.index("w9 w8") < t2.index("USER: w3")
    assert t2.endswith("ASSISTANT:")
    # ids grow with the transcript and are real tokenizer output
    ids1 = codec.encode_conversation(["w1 w2"], [])
    ids2 = codec.encode_conversation(["w1 w2", "w3"], ["w9 w8"])
    assert len(ids2) > len(ids1)


def test_chat_template_multiturn(tokenizer):
    from samd_tpu.evaluation.codecs import ChatTemplateCodec

    codec = ChatTemplateCodec(tokenizer)
    ids1 = codec.encode_conversation(["w1 w2"], [])
    ids2 = codec.encode_conversation(["w1 w2", "w3"], ["w7"])
    assert len(ids2) > len(ids1)
    # generation prompt is appended
    text = tokenizer.decode(ids2)
    assert text.rstrip().endswith("assistant")


def test_eagle_bin_fixture_load_and_serve(loaded, tmp_path):
    """EAGLE draft-net weights from a pytorch_model.bin fixture drive the
    sam_hybrid[eagle2] engine end-to-end with greedy losslessness
    (reference weight load: eagle2_model.py:659-666)."""
    torch = pytest.importorskip("torch")

    from samd_tpu.drafters.eagle.net import (
        EagleNetConfig,
        convert_eagle_state_dict,
    )

    cfg, params = loaded
    net_cfg = EagleNetConfig.from_target(cfg)
    H, I = net_cfg.hidden_size, net_cfg.intermediate_size
    NH, KH, D = net_cfg.num_heads, net_cfg.num_kv_heads, net_cfg.head_dim
    torch.manual_seed(3)
    sd = {
        "fc.weight": torch.randn(H, 2 * H) * 0.2,
        "fc.bias": torch.zeros(H),
        "layers.0.self_attn.q_proj.weight": torch.randn(NH * D, H) * 0.2,
        "layers.0.self_attn.k_proj.weight": torch.randn(KH * D, H) * 0.2,
        "layers.0.self_attn.v_proj.weight": torch.randn(KH * D, H) * 0.2,
        "layers.0.self_attn.o_proj.weight": torch.randn(H, NH * D) * 0.2,
        "layers.0.post_attention_layernorm.weight": torch.ones(H),
        "layers.0.mlp.gate_proj.weight": torch.randn(I, H) * 0.2,
        "layers.0.mlp.up_proj.weight": torch.randn(I, H) * 0.2,
        "layers.0.mlp.down_proj.weight": torch.randn(H, I) * 0.2,
    }
    bin_path = tmp_path / "pytorch_model.bin"
    torch.save(sd, str(bin_path))

    loaded_sd = torch.load(str(bin_path), map_location="cpu",
                           weights_only=True)
    net_params = convert_eagle_state_dict(loaded_sd, net_cfg)

    M = 16
    samd_cfg = SamdConfig(draft_source="sam_hybrid", tree_method="eagle2",
                          max_predicts=M, n_predicts=8,
                          eagle_depth=3, eagle_topk=4, eagle_total_tokens=11)
    engine = SamdEngine(
        cfg, params, samd_cfg,
        make_drafter(samd_cfg, cfg.vocab_size, model_cfg=cfg, params=params,
                     eagle_net_params=net_params),
        max_cache_len=MAX_CACHE, eos_token_id=-1, prefill_buckets=(128,))
    oracle = ArBaseline(cfg, params, max_cache_len=MAX_CACHE,
                        eos_token_id=-1, prefill_buckets=(128,), block_size=M)
    gen = GenerationConfig(max_new_tokens=24, max_cache_len=MAX_CACHE)
    prompt = np.random.default_rng(5).integers(
        0, cfg.vocab_size, size=40).tolist()
    out = engine.generate(prompt, gen)
    ref = oracle.generate(prompt, gen)
    assert out.output_ids == ref.output_ids
