"""Blockwise (flash-style) masked attention (ops/attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptranking_tpu.ops.attention import blockwise_attention
from ptranking_tpu.parallel.ring import reference_attention


def _fixtures(B=2, H=2, N=300, d=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, N, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, d), jnp.float32)
    mask = jnp.ones((B, N), bool).at[0, 200:].set(False)
    return q, k, v, mask


@pytest.mark.parametrize("block", [64, 128, 150])
def test_blockwise_matches_dense(block):
    q, k, v, mask = _fixtures()
    with jax.default_matmul_precision("highest"):
        ref = reference_attention(q, k, v, mask)
        out = blockwise_attention(q, k, v, mask, block_size=block)
    # only real query rows carry meaning; fully-masked rows are garbage by
    # contract (every consumer applies the mask)
    rows = mask[:, None, :, None]
    diff = jnp.where(rows, jnp.abs(out - ref), 0.0)
    assert float(jnp.max(diff)) < 1e-5


def test_blockwise_grads_match_dense():
    q, k, v, mask = _fixtures(N=256)
    rows = mask[:, None, :, None]

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(lambda x: jnp.sum(jnp.where(
            rows, blockwise_attention(x, k, v, mask, 128), 0.0) ** 2))(q)
        g2 = jax.grad(lambda x: jnp.sum(jnp.where(
            rows, reference_attention(x, k, v, mask), 0.0) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_scorer_attn_block_size_routing():
    """listsf with attn_block_size produces the same scores as dense."""
    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    rng = np.random.RandomState(1)
    F = 16
    cfg_d = ScorerConfig.default_listsf(num_features=F, encoder_layers=2)
    cfg_b = ScorerConfig.default_listsf(num_features=F, encoder_layers=2,
                                        attn_block_size=64)
    params = init_scorer(jax.random.PRNGKey(0), cfg_d)
    x = jnp.asarray(rng.randn(3, 200, F), jnp.float32)
    m = jnp.ones((3, 200), bool).at[0, 150:].set(False)
    with jax.default_matmul_precision("highest"):
        sd = apply_scorer(params, cfg_d, x, m, training=False)
        sb = apply_scorer(params, cfg_b, x, m, training=False)
    diff = jnp.where(m, jnp.abs(sd - sb), 0.0)
    assert float(jnp.max(diff)) < 1e-4


def test_flash_attention_matches_dense_interpret():
    """Pallas flash path == dense masked attention (fwd + grad), run in
    interpret mode so it executes on the CPU test mesh."""
    from jax.experimental.pallas import tpu as pltpu

    from ptranking_tpu.ops.attention import flash_attention

    B, H, N, d = 2, 2, 256, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, N, d))
    k = jax.random.normal(kk, (B, H, N, d))
    v = jax.random.normal(kv, (B, H, N, d))
    mask = jnp.arange(N)[None, :] < jnp.array([N, 100])[:, None]
    m4 = mask[:, None, :, None]

    def dense(q):
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(float(d))
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(logits, -1), v)

    ref = dense(q)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, mask)
        assert float(jnp.max(jnp.abs(jnp.where(m4, out - ref, 0.0)))) < 1e-5
        gd = jax.grad(lambda q: jnp.sum(jnp.where(m4, dense(q), 0.0) ** 2))(q)
        gf = jax.grad(lambda q: jnp.sum(jnp.where(
            m4, flash_attention(q, k, v, mask), 0.0) ** 2))(q)
        rel = jnp.max(jnp.abs(gf - gd)) / jnp.max(jnp.abs(gd))
        assert float(rel) < 1e-5


def test_flash_attn_config_falls_back_off_tpu():
    """ScorerConfig(flash_attn=True) resolves per LOWERING PLATFORM
    (lax.platform_dependent): non-TPU platforms get the blockwise lax path
    with the same no-attention-dropout contract, matching dense at eval —
    so a config written for TPU still runs locally, and a cross-platform
    StableHLO export bakes the right kernel per platform."""
    import dataclasses

    from ptranking_tpu.models.scorers import (ScorerConfig, apply_scorer,
                                              init_scorer)

    cfg = ScorerConfig.default_listsf(num_features=10, ff_dims=(16, 16),
                                      encoder_layers=2, flash_attn=True)
    params = init_scorer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 150, 10))
    mask = jnp.ones((2, 150), bool).at[1, 100:].set(False)
    s = apply_scorer(params, cfg, x, mask, training=False)
    sd = apply_scorer(params, dataclasses.replace(cfg, flash_attn=False),
                      x, mask, training=False)
    assert float(jnp.max(jnp.where(mask, jnp.abs(s - sd), 0.0))) < 1e-4
    # grads flow through the platform-selected branch
    g = jax.grad(lambda p: jnp.sum(jnp.where(
        mask, apply_scorer(p, cfg, x, mask, training=False), 0.0) ** 2))(params)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    # per-platform exports of the flash config must each lower their own
    # branch (the scenario the host-backend gate broke): the tpu program
    # carries the mosaic kernel, the cpu program doesn't — and the cpu one
    # executes here, matching dense. (One multi-platform module can't hold a
    # platform-exclusive kernel; ptranking_tpu.export stores one module per
    # platform for exactly this reason.)
    from jax import export as jexport

    fn = jax.jit(lambda xx, mm: apply_scorer(params, cfg, xx, mm,
                                             training=False))
    args = (jax.ShapeDtypeStruct((2, 150, 10), jnp.float32),
            jax.ShapeDtypeStruct((2, 150), jnp.bool_))
    exp_tpu = jexport.export(fn, platforms=["tpu"])(*args)
    assert "tpu_custom_call" in exp_tpu.mlir_module()
    exp_cpu = jexport.export(fn, platforms=["cpu"])(*args)
    assert "tpu_custom_call" not in exp_cpu.mlir_module()
    s_exp = exp_cpu.call(x, mask)
    assert float(jnp.max(jnp.where(mask, jnp.abs(s_exp - sd), 0.0))) < 1e-4
