"""Pallas kernel tests (interpret mode on CPU): numerics vs the lax paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptranking_tpu.losses import get_loss
from ptranking_tpu.ops.pallas import lambda_rank_pallas, ranknet_pallas, sinkstep_pallas
from ptranking_tpu.ops.sinkhorn import _safe_log, log_sinkstep

KEY = jax.random.PRNGKey(42)


def batch(B=3, N=20):
    ks, kl = jax.random.split(KEY)
    scores = jax.random.normal(ks, (B, N))
    labels = jnp.sort(jax.random.randint(kl, (B, N), 0, 4).astype(jnp.float32), axis=1)[:, ::-1]
    mask = jnp.arange(N)[None] < jnp.asarray([N, N - 5, N // 2])[:, None]
    return scores, jnp.where(mask, labels, 0.0), mask


def test_lambda_rank_pallas_matches_lax():
    scores, labels, mask = batch()
    ours = lambda_rank_pallas(scores, labels, mask, sigma=1.0, interpret=True)
    ref = get_loss("LambdaRank")(scores, labels, mask, sigma=1.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_lambda_rank_pallas_grad_matches_lax():
    scores, labels, mask = batch()
    g_pallas = jax.grad(lambda s: lambda_rank_pallas(s, labels, mask, interpret=True))(scores)
    g_lax = jax.grad(lambda s: get_loss("LambdaRank")(s, labels, mask))(scores)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_lax), rtol=1e-4, atol=1e-6)


def test_ranknet_pallas_matches_lax():
    scores, labels, mask = batch()
    ours = ranknet_pallas(scores, labels, mask, sigma=1.5, interpret=True)
    ref = get_loss("RankNet")(scores, labels, mask, sigma=1.5)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    g_pallas = jax.grad(lambda s: ranknet_pallas(s, labels, mask, sigma=1.5, interpret=True))(scores)
    g_lax = jax.grad(lambda s: get_loss("RankNet")(s, labels, mask, sigma=1.5))(scores)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_lax), rtol=1e-4, atol=1e-6)


def test_pallas_pad_invariance():
    scores, labels, mask = batch()
    v1 = lambda_rank_pallas(scores, labels, mask, interpret=True)
    junk = jnp.where(mask, scores, 1e3)
    v2 = lambda_rank_pallas(junk, labels, mask, interpret=True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)


def test_pallas_large_n_tiling():
    # N > TILE exercises multi-tile accumulation
    B, N = 2, 300
    ks, kl = jax.random.split(KEY)
    scores = jax.random.normal(ks, (B, N))
    labels = jnp.sort(jax.random.randint(kl, (B, N), 0, 3).astype(jnp.float32), 1)[:, ::-1]
    mask = jnp.arange(N)[None] < jnp.asarray([N, 257])[:, None]
    labels = jnp.where(mask, labels, 0.0)
    ours = lambda_rank_pallas(scores, labels, mask, interpret=True)
    ref = get_loss("LambdaRank")(scores, labels, mask)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_sinkstep_pallas_matches_lax():
    B, N = 3, 16
    k1, k2, k3 = jax.random.split(KEY, 3)
    cost = jnp.abs(jax.random.normal(k1, (B, N, N)))
    mu = jax.nn.softmax(jax.random.normal(k2, (B, N)))
    log_u = _safe_log(jax.nn.softmax(jax.random.normal(k3, (B, N))))
    lam = 0.2
    ref = log_sinkstep(-cost / lam, _safe_log(mu), log_u)
    ours = sinkstep_pallas(cost, _safe_log(mu), log_u, lam, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sinkstep_pallas_column_tiling():
    # N > tile exercises the column-slab path incl. a non-divisible remainder
    B, N, tile = 2, 50, 16
    k1, k2, k3 = jax.random.split(KEY, 3)
    cost = jnp.abs(jax.random.normal(k1, (B, N, N)))
    mu = jax.nn.softmax(jax.random.normal(k2, (B, N)))
    log_u = _safe_log(jax.nn.softmax(jax.random.normal(k3, (B, N))))
    lam = 0.3
    ref = log_sinkstep(-cost / lam, _safe_log(mu), log_u)
    ours = sinkstep_pallas(cost, _safe_log(mu), log_u, lam, interpret=True, tile=tile)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pair_kernel_no_nxn_buffer_at_16k():
    """The Pallas pair kernel's reason to exist is memory: at N~16k the lax
    path materializes an [B, N, N] fp32 pair matrix (dozens of GB at fp32,
    past a 16 GB chip) while the tiled kernel keeps O(N*tile) live. Cross-
    platform TPU export (no chip needed) machine-checks the claim: the
    pallas program's StableHLO carries NO NxN-shaped tensor; the lax
    program's does (docs/kernel_bench.md memory-fallback row)."""
    from jax import export as jexport

    from ptranking_tpu.losses.pairwise import ranknet

    B, N = 4, 16384
    args = (jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N), bool))
    txt_pallas = jexport.export(
        jax.jit(lambda s, l, m: ranknet(s, l, m, use_pallas=True)),
        platforms=["tpu"])(*args).mlir_module()
    txt_lax = jexport.export(
        jax.jit(lambda s, l, m: ranknet(s, l, m, use_pallas=False)),
        platforms=["tpu"])(*args).mlir_module()
    assert f"{N}x{N}" not in txt_pallas
    assert "tpu_custom_call" in txt_pallas  # the mosaic kernel is really there
    assert f"{N}x{N}" in txt_lax
