"""Paged KV pool: allocator behavior + decode equivalence with dense cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samd_tpu.cache import init_kv_cache
from samd_tpu.models import (
    block_decode_mask,
    forward,
    init_params,
    prefill_mask,
    tiny_config,
)
from samd_tpu.paged_kv import (
    PagedKVPool,
    PagedRequest,
    gather_request,
    scatter_block,
)


def test_allocator():
    cfg = tiny_config()
    pool = PagedKVPool(cfg, n_pages=8, page_size=16)
    a = pool.alloc(3)
    b = pool.alloc(4)
    assert len(set(a) | set(b)) == 7
    with pytest.raises(MemoryError):
        pool.alloc(2)
    pool.free(a)
    c = pool.alloc(2)
    assert set(c) <= set(a) | {7}  # the remaining free page + recycled ones


def test_request_growth_and_release():
    cfg = tiny_config()
    pool = PagedKVPool(cfg, n_pages=8, page_size=16)
    req = PagedRequest(pool, max_len=64)
    req.ensure(10)
    assert len(req.pages) == 1
    req.ensure(17)
    assert len(req.pages) == 2
    req.ensure(64)
    assert len(req.pages) == 4
    with pytest.raises(ValueError):
        req.ensure(65)
    req.release()
    assert len(pool._free) == 8


def test_paged_decode_matches_dense():
    """Prefill + several decode blocks through the paged pool produce the
    same logits as the dense cache."""
    cfg = tiny_config(vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0), scale=0.4)
    rng = np.random.default_rng(0)
    P, page = 12, 16
    S_dense = 64
    prompt = jnp.asarray(rng.integers(3, 64, size=(1, P)), jnp.int32)

    # dense reference
    dk, dv = init_kv_cache(cfg, 1, S_dense)
    logits_d, _, dk, dv = forward(params, cfg, prompt, jnp.arange(P)[None],
                                  dk, dv, jnp.int32(0),
                                  prefill_mask(1, P, S_dense))

    # paged: pool with view capacity = max_pages * page
    pool = PagedKVPool(cfg, n_pages=8, page_size=page)
    req = PagedRequest(pool, max_len=S_dense)
    req.ensure(P)
    table = req.table()
    S_view = req.max_pages * page
    vk, vv = gather_request(pool.k, pool.v, table)
    logits_p, _, vk, vv = forward(params, cfg, prompt, jnp.arange(P)[None],
                                  vk, vv, jnp.int32(0),
                                  prefill_mask(1, P, S_view))
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_d),
                               rtol=1e-5, atol=1e-5)
    # write the prompt block back to pages (pad to page multiple)
    Tpad = ((P + page - 1) // page) * page
    kblk = jax.lax.dynamic_slice(vk, (0, 0, 0, 0, 0),
                                 (cfg.num_layers, 1, cfg.num_kv_heads, Tpad,
                                  cfg.head_dim))
    vblk = jax.lax.dynamic_slice(vv, (0, 0, 0, 0, 0),
                                 (cfg.num_layers, 1, cfg.num_kv_heads, Tpad,
                                  cfg.head_dim))
    pool.k = scatter_block(pool.k, table, jnp.int32(0), kblk, Tpad)
    pool.v = scatter_block(pool.v, table, jnp.int32(0), vblk, Tpad)
    req.length = P

    # decode 20 tokens one at a time through pages, crossing a page boundary
    chain = jnp.ones((1, 1), bool)
    cur_d = int(jnp.argmax(logits_d[0, P - 1]))
    cur_p = int(jnp.argmax(logits_p[0, P - 1]))
    assert cur_d == cur_p
    for i in range(20):
        pos = P + i
        # dense step
        ld, _, dk, dv = forward(params, cfg, jnp.asarray([[cur_d]]),
                                jnp.asarray([[pos]]), dk, dv, jnp.int32(pos),
                                block_decode_mask(chain, jnp.int32(pos),
                                                  S_dense))
        # paged step
        req.ensure(pos + 1)
        table = req.table()
        vk, vv = gather_request(pool.k, pool.v, table)
        lp, _, vk, vv = forward(params, cfg, jnp.asarray([[cur_p]]),
                                jnp.asarray([[pos]]), vk, vv, jnp.int32(pos),
                                block_decode_mask(chain, jnp.int32(pos),
                                                  S_view))
        kblk = jax.lax.dynamic_slice(
            vk, (0, 0, 0, pos, 0),
            (cfg.num_layers, 1, cfg.num_kv_heads, 1, cfg.head_dim))
        vblk = jax.lax.dynamic_slice(
            vv, (0, 0, 0, pos, 0),
            (cfg.num_layers, 1, cfg.num_kv_heads, 1, cfg.head_dim))
        pool.k = scatter_block(pool.k, table, jnp.int32(pos), kblk, 1)
        pool.v = scatter_block(pool.v, table, jnp.int32(pos), vblk, 1)
        req.length = pos + 1
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                                   rtol=1e-5, atol=1e-5)
        cur_d = int(jnp.argmax(ld[0, 0]))
        cur_p = int(jnp.argmax(lp[0, 0]))
        assert cur_d == cur_p
