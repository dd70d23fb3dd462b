"""Paged flash attention: page-table-consuming kernel == dense attention.

v1 paged serving gathered live pages into a dense view every step; the
kernel (ops/paged_attention.py) reads the pool directly.  These tests run
the kernel in interpreter mode on CPU against the dense reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.models import init_params, tiny_config
from samd_tpu.models.llama import _attention, block_decode_mask

PAGE = 16


def _random_pool_and_dense(rng, cfg, B, n_pages, pages_per_req, live):
    """Build a dp-layout pool whose pages hold random KV, plus the dense
    [B, KH, S, D] view implied by each request's page table."""
    KH, D = cfg.num_kv_heads, cfg.head_dim
    S_logical = pages_per_req * PAGE
    pool_k = jnp.asarray(rng.normal(size=(n_pages, KH, D, PAGE)),
                         jnp.float32)
    pool_v = jnp.asarray(rng.normal(size=(n_pages, KH, D, PAGE)),
                         jnp.float32)
    # distinct page tables per request (shuffled to exercise the remap)
    perm = rng.permutation(n_pages)
    tables = np.full((B, pages_per_req), -1, np.int32)
    dense_k = np.zeros((B, KH, S_logical, D), np.float32)
    dense_v = np.zeros((B, KH, S_logical, D), np.float32)
    pk = np.asarray(pool_k)
    pv = np.asarray(pool_v)
    idx = 0
    for b in range(B):
        npg = -(-live[b] // PAGE)
        for j in range(npg):
            p = int(perm[idx]); idx += 1
            tables[b, j] = p
            dense_k[b, :, j * PAGE:(j + 1) * PAGE] = \
                pk[p].transpose(0, 2, 1)
            dense_v[b, :, j * PAGE:(j + 1) * PAGE] = \
                pv[p].transpose(0, 2, 1)
    return pool_k, pool_v, jnp.asarray(tables), dense_k, dense_v


def test_paged_kernel_matches_dense_attention():
    from samd_tpu.ops.paged_attention import (boundary_mask_window,
                                              paged_block_attention)

    cfg = tiny_config(vocab_size=64)
    rng = np.random.default_rng(0)
    B, T = 2, 8
    NH, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pages_per_req = 4
    live = [37, 21]   # uneven live lengths (include the fresh block)
    pool_k, pool_v, tables, dense_k, dense_v = _random_pool_and_dense(
        rng, cfg, B, 16, pages_per_req, live)

    q = jnp.asarray(rng.normal(size=(B, T, NH, D)), jnp.float32)
    S_logical = pages_per_req * PAGE
    masks = []
    windows = []
    tri = jnp.tril(jnp.ones((T, T), bool))
    for b in range(B):
        cl = live[b] - T
        masks.append(block_decode_mask(tri, jnp.int32(cl), S_logical)[0])
        windows.append(boundary_mask_window(tri, jnp.int32(cl), PAGE))
    mask = jnp.stack(masks)
    kv_limits = jnp.asarray(live, jnp.int32)

    out = paged_block_attention(q, pool_k, pool_v, tables,
                                jnp.stack(windows), kv_limits,
                                interpret=True)
    ref = _attention(q, jnp.asarray(dense_k), jnp.asarray(dense_v), mask,
                     cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cache_len", [0, 5, 15, 16, 17, 31, 48])
def test_boundary_mask_window_matches_full_mask(cache_len):
    """Window == the corresponding column slice of the full logical mask
    (including page-aligned cache lengths and tree masks)."""
    from samd_tpu.ops.paged_attention import (boundary_mask_window,
                                              window_pages)

    T = 8
    rng = np.random.default_rng(cache_len)
    tree = np.tril(np.ones((T, T), bool))
    tree &= rng.random((T, T)) < 0.8
    np.fill_diagonal(tree, True)
    tree = jnp.asarray(tree)
    S_logical = 80
    full = np.asarray(block_decode_mask(tree, jnp.int32(cache_len),
                                        S_logical)[0])
    win = np.asarray(boundary_mask_window(tree, jnp.int32(cache_len), PAGE))
    w0 = (cache_len // PAGE) * PAGE
    W = window_pages(T, PAGE) * PAGE
    np.testing.assert_array_equal(win[:, :min(W, S_logical - w0)],
                                  full[:, w0:w0 + W])
    # pages fully below the window origin are all-allowed (kernel contract)
    assert full[:, :w0].all()


def test_scatter_block_t_roundtrip():
    from samd_tpu.ops.paged_attention import scatter_block_t

    cfg = tiny_config()
    rng = np.random.default_rng(1)
    KH, D = cfg.num_kv_heads, cfg.head_dim
    pool = jnp.zeros((8, KH, D, PAGE), jnp.float32)
    table = jnp.asarray([5, 2, 7, -1], jnp.int32)
    block = jnp.asarray(rng.normal(size=(KH, 10, D)), jnp.float32)
    offset = 12   # straddles pages 0 (slots 12-15) and 1 (slots 0-5)
    pool = scatter_block_t(pool, table, jnp.int32(offset), block)
    got = np.asarray(pool)
    blk = np.asarray(block)
    for t in range(10):
        logical = offset + t
        p = int(table[logical // PAGE])
        s = logical % PAGE
        np.testing.assert_array_equal(got[p, :, :, s], blk[:, t, :])


def test_paged_forward_matches_dense_forward():
    """Full decode block through paged_forward == dense forward logits."""
    from samd_tpu.cache import init_kv_cache
    from samd_tpu.models.llama import forward, prefill_mask
    from samd_tpu.ops.paged_attention import scatter_block_t
    from samd_tpu.paged_kv import paged_forward

    cfg = tiny_config(vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    rng = np.random.default_rng(2)
    B, T = 2, 6
    pages_per_req = 4
    S_logical = pages_per_req * PAGE
    prompt_lens = [20, 13]
    prompts = [rng.integers(3, 64, size=n) for n in prompt_lens]

    # dense reference: per-request prefill then one batched decode block
    dense_k, dense_v = init_kv_cache(cfg, B, S_logical)
    kvs = []
    for b in range(B):
        k1, v1 = init_kv_cache(cfg, 1, S_logical)
        P = 32
        padded = np.zeros(P, np.int32)
        padded[:prompt_lens[b]] = prompts[b]
        _, _, k1, v1 = forward(params, cfg, jnp.asarray(padded)[None],
                               jnp.arange(P)[None], k1, v1, jnp.int32(0),
                               prefill_mask(1, P, S_logical))
        kvs.append((k1, v1))
    dense_k = jnp.concatenate([k for k, _ in kvs], axis=1)
    dense_v = jnp.concatenate([v for _, v in kvs], axis=1)

    blocks = np.stack([rng.integers(3, 64, size=T) for _ in range(B)])
    offsets = jnp.asarray(prompt_lens, jnp.int32)
    tri = jnp.tril(jnp.ones((T, T), bool))
    mask = jnp.stack([
        block_decode_mask(tri, jnp.int32(prompt_lens[b]), S_logical)[0]
        for b in range(B)])
    pos = jnp.asarray(prompt_lens, jnp.int32)[:, None] + jnp.arange(T)[None]
    ref_logits, _, _, _ = forward(
        params, cfg, jnp.asarray(blocks, jnp.int32), pos, dense_k, dense_v,
        offsets, mask)

    # paged: scatter the prefilled dense KV into shuffled pages
    n_pages = 2 * B * pages_per_req
    perm = rng.permutation(n_pages)
    tables = np.full((B, pages_per_req), -1, np.int32)
    L, KH, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    pool_k = jnp.zeros((L, n_pages, KH, D, PAGE), cfg.dtype)
    pool_v = jnp.zeros((L, n_pages, KH, D, PAGE), cfg.dtype)
    idx = 0
    for b in range(B):
        for j in range(pages_per_req):
            tables[b, j] = int(perm[idx]); idx += 1
    # write prompt KV page by page (transposed layout) for every layer
    dk, dv = np.asarray(dense_k), np.asarray(dense_v)
    pk, pv = np.array(pool_k), np.array(pool_v)
    for b in range(B):
        for j in range(pages_per_req):
            p = tables[b, j]
            pk[:, p] = dk[:, b, :, j * PAGE:(j + 1) * PAGE].transpose(
                0, 1, 3, 2)
            pv[:, p] = dv[:, b, :, j * PAGE:(j + 1) * PAGE].transpose(
                0, 1, 3, 2)

    from samd_tpu.ops.paged_attention import boundary_mask_window

    mask_win = jnp.stack([
        boundary_mask_window(tri, jnp.int32(prompt_lens[b]), PAGE)
        for b in range(B)])
    logits, _, _, _ = paged_forward(
        params, cfg, jnp.asarray(blocks, jnp.int32), pos,
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(tables), offsets,
        mask_win, offsets + T, n_pages - 1, interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-4, atol=5e-4)
