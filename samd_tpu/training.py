"""Training: next-token LM pretraining + EAGLE draft-net distillation.

The reference consumes public checkpoints and ships no training code; this
machine has no checkpoint access (zero egress), so *every* acceptance number
would otherwise come from random weights.  This module closes that gap: it
trains a small target LM and an EAGLE draft net on a synthetic-but-learnable
corpus, producing honest accept-length measurements for every drafter and
exercising the full train → orbax checkpoint → serve pipeline
(models/checkpoint.py, evaluation/accept_demo.py).

TPU-first design:
  * ONE jitted train step per config, params/opt-state donated (true
    in-place updates on device);
  * the training forward IS the serving forward (models/llama.py:126) —
    scan-stacked layers, the same attention kernels; what trains is
    literally what serves;
  * loss in fp32 regardless of param dtype (bf16 matmuls, fp32 logits via
    ``preferred_element_type`` — the standard TPU mixed-precision recipe).

EAGLE distillation follows the reference's vendored net semantics
(/root/reference/samd/tree_model/eagle2/eagle2_model.py:237-666): the net
sees (embedding of token t+1, target hidden at t) and predicts the target's
hidden at t+1; trained with hidden-state regression + soft cross-entropy
against the frozen target head's distribution.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cache import init_kv_cache
from .models.configs import ModelConfig
from .models.llama import forward, init_params, prefill_mask


# ----------------------------------------------------------------------
# Synthetic-but-learnable corpora
# ----------------------------------------------------------------------

def markov_corpus(vocab_size: int, length: int, *, peak: float = 0.9,
                  branch: int = 2, order: int = 2, seed: int = 0,
                  reserved: int = 3) -> np.ndarray:
    """Sample a peaked order-``order`` Markov chain over the vocabulary.

    Each context (tuple of ``order`` tokens) has ``branch`` plausible
    successors: the first drawn with probability ``peak``, the rest sharing
    the remainder.  A model trained on this learns near-deterministic
    continuations — the regime where speculative decoding pays — while the
    branching keeps verification non-trivial.  Tokens < ``reserved`` are
    never emitted (0 stays free for EOS/corpus separators)."""
    rng = np.random.default_rng(seed)
    usable = vocab_size - reserved

    def successors(ctx: Tuple[int, ...]) -> np.ndarray:
        # deterministic per-context successor set from a hashed sub-seed
        h = hash((ctx, seed)) & 0xFFFFFFFF
        r = np.random.default_rng(h)
        return r.choice(usable, size=branch, replace=False) + reserved

    probs = np.full(branch, (1.0 - peak) / max(branch - 1, 1))
    probs[0] = peak if branch > 1 else 1.0
    out = list(rng.integers(reserved, vocab_size, size=order))
    for _ in range(length - order):
        succ = successors(tuple(out[-order:]))
        out.append(int(rng.choice(succ, p=probs)))
    return np.asarray(out, np.int32)


# ----------------------------------------------------------------------
# LM pretraining
# ----------------------------------------------------------------------

def lm_loss(params, cfg: ModelConfig, tokens: jax.Array) -> jax.Array:
    """Mean next-token cross-entropy over a [B, T] batch (fp32)."""
    B, T = tokens.shape
    kv_k, kv_v = init_kv_cache(cfg, B, T)
    pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    logits, _, _, _ = forward(params, cfg, tokens, pos, kv_k, kv_v,
                              jnp.int32(0), prefill_mask(B, T, T))
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_lm_train_step(cfg: ModelConfig, tx) -> Callable:
    """Jitted (params, opt_state, tokens) -> (params, opt_state, loss)."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: lm_loss(p, cfg, tokens))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_lm(cfg: ModelConfig, corpus: np.ndarray, *, steps: int = 500,
             batch: int = 16, seq_len: int = 64, lr: float = 3e-3,
             seed: int = 0, params=None,
             log_every: int = 0) -> Tuple[Dict, list]:
    """Train a Llama LM on a flat token array; returns (params, loss curve).

    Batches are random windows of the corpus.  AdamW with cosine decay and
    short warmup — robust defaults for from-scratch tiny models."""
    import optax

    if params is None:
        params = init_params(cfg, jax.random.PRNGKey(seed))
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=max(steps // 20, 10),
            decay_steps=steps, end_value=lr * 0.1),
        weight_decay=1e-4)
    opt_state = tx.init(params)
    step_fn = make_lm_train_step(cfg, tx)
    rng = np.random.default_rng(seed)
    max_start = len(corpus) - seq_len - 1
    losses = []
    for i in range(steps):
        starts = rng.integers(0, max_start, size=batch)
        toks = np.stack([corpus[s:s + seq_len] for s in starts])
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(toks))
        if log_every and (i % log_every == 0 or i == steps - 1):
            losses.append(float(loss))
        elif not log_every and i >= steps - 5:
            losses.append(float(loss))
    return params, losses


# ----------------------------------------------------------------------
# EAGLE draft-net distillation
# ----------------------------------------------------------------------

def eagle_distill_loss(net_params, net_cfg, target_cfg: ModelConfig,
                       target_params, tokens: jax.Array,
                       *, w_reg: float = 1.0,
                       w_cls: float = 0.5) -> jax.Array:
    """EAGLE training objective on a [B, T] batch.

    Teacher pass (stop-gradient): target hiddens h_0..h_{T-1} and the
    head's distributions.  Student: for i in [0, T-2], from
    (embed(token_{i+1}), h_i) predict ĥ_{i+1}; loss =
    w_reg · Huber(ĥ_{i+1}, h_{i+1}) + w_cls · soft-CE(head(ĥ), head(h))
    — the EAGLE paper's regression + classification pair, with the soft
    target matching what acceptance actually compares at serve time."""
    from .drafters.eagle.net import eagle_forward, init_eagle_kv

    B, T = tokens.shape
    kv_k, kv_v = init_kv_cache(target_cfg, B, T)
    pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    t_logits, t_hidden, _, _ = forward(
        target_params, target_cfg, tokens, pos, kv_k, kv_v, jnp.int32(0),
        prefill_mask(B, T, T))
    t_hidden = jax.lax.stop_gradient(t_hidden)
    t_logits = jax.lax.stop_gradient(t_logits)

    embeds = jax.lax.stop_gradient(target_params["embed"])[tokens[:, 1:]]
    prev_h = t_hidden[:, :-1]                                # [B, T-1, H]
    nk, nv = init_eagle_kv(net_cfg, B, T - 1)
    pred, _, _ = eagle_forward(
        net_params, net_cfg, embeds, prev_h, pos[:, :-1], nk, nv,
        jnp.int32(0), prefill_mask(B, T - 1, T - 1))         # [B, T-1, H]

    true_h = t_hidden[:, 1:].astype(jnp.float32)
    diff = pred.astype(jnp.float32) - true_h
    huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                      jnp.abs(diff) - 0.5)
    reg = huber.mean()

    head = (target_params["embed"].T if target_cfg.tie_embeddings
            else target_params["lm_head"])
    head = jax.lax.stop_gradient(head)
    s_logits = jnp.dot(pred, head, preferred_element_type=jnp.float32)
    t_prob = jax.nn.softmax(t_logits[:, 1:].astype(jnp.float32), axis=-1)
    s_logp = jax.nn.log_softmax(s_logits, axis=-1)
    cls = -(t_prob * s_logp).sum(-1).mean()
    return w_reg * reg + w_cls * cls


def train_eagle(target_cfg: ModelConfig, target_params, corpus: np.ndarray,
                *, steps: int = 500, batch: int = 16, seq_len: int = 64,
                lr: float = 3e-3, seed: int = 0,
                net_params=None) -> Tuple[Dict, list]:
    """Distill an EAGLE draft net against a frozen target; returns
    (net_params, loss curve tail)."""
    import functools

    import optax

    from .drafters.eagle.net import EagleNetConfig, init_eagle_params

    net_cfg = EagleNetConfig.from_target(target_cfg)
    if net_params is None:
        net_params = init_eagle_params(net_cfg, jax.random.PRNGKey(seed + 1))
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=max(steps // 20, 10),
            decay_steps=steps, end_value=lr * 0.1),
        weight_decay=1e-4)
    opt_state = tx.init(net_params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(net_p, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: eagle_distill_loss(p, net_cfg, target_cfg,
                                         target_params, tokens))(net_p)
        updates, opt_state = tx.update(grads, opt_state, net_p)
        net_p = optax.apply_updates(net_p, updates)
        return net_p, opt_state, loss

    rng = np.random.default_rng(seed)
    max_start = len(corpus) - seq_len - 1
    losses = []
    for i in range(steps):
        starts = rng.integers(0, max_start, size=batch)
        toks = np.stack([corpus[s:s + seq_len] for s in starts])
        net_params, opt_state, loss = step_fn(net_params, opt_state,
                                              jnp.asarray(toks))
        if i >= steps - 5:
            losses.append(float(loss))
    return net_params, losses
