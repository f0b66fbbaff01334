"""Fused Pallas kernel for the pairwise lambda loss (RankNet/LambdaRank core).

The hot op of the framework: for every query, the O(N^2) pairwise matrix of
score differences -> sigmoid BCE -> DeltaNDCG weights -> masked triu sum
(reference formulation: ltr_adhoc/listwise/lambdarank.py:27-62 +
metric/metric_utils.py:19-45). The lax path (losses/listwise.py) materialises
[B, N, N] intermediates in HBM between ops when XLA's fusion gives up; this
kernel tiles the pair space [TI x TJ] in VMEM and accumulates scalars, so the
N x N matrix never exists anywhere — O(N) memory instead of O(N^2).

Inputs arrive PRE-SORTED by predicted score (pads at the tail, handled by the
caller's argsort, through which gradients flow via take_along_axis):
    sorted_scores [B, N], pred_sorted_labels [B, N], n_gains [B, N]
    (gain/IDCG, zero at pads), mask [B, N].

Forward computes loss = sum_{b} sum_{i<j, valid} w_ij * BCE_ij with
  BCE_ij = softplus(sigma*(s_i-s_j)) - t_ij * sigma*(s_i-s_j),
  t_ij = (1+clip(l_i-l_j,-1,1))/2,
  w_ij = |nG_i - nG_j| * |1/log2(i+2) - 1/log2(j+2)|   (LambdaRank)
  or w_ij = 1                                           (RankNet).
The custom VJP runs a second kernel accumulating dL/ds_i row/col sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # pair-space tile (TILE x TILE fp32 block = 256KB in VMEM)


def _pad_to_tile(x, fill=0.0):
    n = x.shape[-1]
    rem = (-n) % TILE
    if rem == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
    return jnp.pad(x, pad, constant_values=fill)


def _pair_terms(s_i, s_j, l_i, l_j, g_i, g_j, d_i, d_j, m_i, m_j, sigma, weighted):
    """Elementwise pair math on a [TI, TJ] block. Returns (bce*w, dloss/ds_i)."""
    diffs = sigma * (s_i[:, None] - s_j[None, :])
    targets = 0.5 * (1.0 + jnp.clip(l_i[:, None] - l_j[None, :], -1.0, 1.0))
    sig = jax.nn.sigmoid(diffs)
    bce = jnp.logaddexp(0.0, diffs) - targets * diffs
    grad_core = sigma * (sig - targets)
    if weighted:
        w = jnp.abs(g_i[:, None] - g_j[None, :]) * jnp.abs(d_i[:, None] - d_j[None, :])
    else:
        w = 1.0
    valid = (m_i[:, None] > 0) & (m_j[None, :] > 0)
    return jnp.where(valid, bce * w, 0.0), jnp.where(valid, grad_core * w, 0.0)


def _fwd_kernel(s_ref, l_ref, g_ref, m_ref, out_ref, *, sigma, weighted, n_pad):
    """Grid (B, nI). One program = one i-tile row of one query: loops j-tiles
    >= its own tile (strict upper triangle) and writes a partial sum."""
    n_tiles = n_pad // TILE
    ti = pl.program_id(1)
    disc_base = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0].astype(jnp.float32)

    def tile_vec(ref, t):
        return ref[0, 0, pl.ds(t * TILE, TILE)]

    i_pos = disc_base + (ti * TILE).astype(jnp.float32)
    d_i = 1.0 / jnp.log2(i_pos + 2.0)

    def body(tj_off, acc):
        tj = ti + tj_off
        j_pos = disc_base + (tj * TILE).astype(jnp.float32)
        d_j = 1.0 / jnp.log2(j_pos + 2.0)
        bce, _ = _pair_terms(
            tile_vec(s_ref, ti), tile_vec(s_ref, tj),
            tile_vec(l_ref, ti), tile_vec(l_ref, tj),
            tile_vec(g_ref, ti), tile_vec(g_ref, tj),
            d_i, d_j,
            tile_vec(m_ref, ti), tile_vec(m_ref, tj),
            sigma, weighted,
        )
        gi = i_pos[:, None]
        gj = j_pos[None, :]
        bce = jnp.where(gi < gj, bce, 0.0)
        return acc + jnp.sum(bce)

    out_ref[0, 0, 0, 0] = jax.lax.fori_loop(0, n_tiles - ti, body, 0.0)


def _bwd_kernel(s_ref, l_ref, g_ref, m_ref, grad_ref, *, sigma, weighted, n_pad):
    """Accumulates dL/ds (per query): +core over row i (j>i), -core over col."""
    n_tiles = n_pad // TILE
    disc_base = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0].astype(jnp.float32)

    def tile_vec(ref, t):
        return ref[0, 0, pl.ds(t * TILE, TILE)]

    ti = pl.program_id(1)
    if True:
        i_pos = disc_base + (ti * TILE).astype(jnp.float32)
        d_i = 1.0 / jnp.log2(i_pos + 2.0)

        def body_j(tj, acc):
            j_pos = disc_base + (tj * TILE).astype(jnp.float32)
            d_j = 1.0 / jnp.log2(j_pos + 2.0)
            _, core = _pair_terms(
                tile_vec(s_ref, ti), tile_vec(s_ref, tj),
                tile_vec(l_ref, ti), tile_vec(l_ref, tj),
                tile_vec(g_ref, ti), tile_vec(g_ref, tj),
                d_i, d_j,
                tile_vec(m_ref, ti), tile_vec(m_ref, tj),
                sigma, weighted,
            )
            gi = i_pos[:, None]
            gj = j_pos[None, :]
            # pair (i,j), i<j: dL/ds_i = +w*core_ij. For pair (j,i), j<i, this
            # i is the second element: dL/ds_i = -w*core_ji = +w*core_ij since
            # core_ji = -core_ij and w is symmetric. Hence simply sum j != i.
            offdiag = jnp.where(gi != gj, core, 0.0)
            return acc + jnp.sum(offdiag, axis=1)

        row_grad = jax.lax.fori_loop(0, n_tiles, body_j, jnp.zeros((TILE,), jnp.float32))
        grad_ref[0, 0, :] = row_grad


def _run_fwd(sorted_scores, labels, n_gains, mask, sigma, weighted, interpret):
    B, N = sorted_scores.shape
    s = _pad_to_tile(sorted_scores)
    l = _pad_to_tile(labels)
    g = _pad_to_tile(n_gains)
    m = _pad_to_tile(mask.astype(jnp.float32))
    n_pad = s.shape[-1]
    # TPU lowering requires trailing block dims to equal the array dims:
    # stage each [B, n] array as [B, 1, n] with full (1, n) trailing blocks.
    s, l, g, m = (x[:, None, :] for x in (s, l, g, m))
    n_tiles = n_pad // TILE
    kern = functools.partial(_fwd_kernel, sigma=sigma, weighted=weighted, n_pad=n_pad)
    partials = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, n_pad), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, 1), jnp.float32),
        interpret=interpret,
    )(s, l, g, m)
    return jnp.sum(partials)


def _run_bwd(sorted_scores, labels, n_gains, mask, sigma, weighted, interpret):
    B, N = sorted_scores.shape
    s = _pad_to_tile(sorted_scores)
    l = _pad_to_tile(labels)
    g = _pad_to_tile(n_gains)
    m = _pad_to_tile(mask.astype(jnp.float32))
    n_pad = s.shape[-1]
    s, l, g, m = (x[:, None, :] for x in (s, l, g, m))
    n_tiles = n_pad // TILE
    kern = functools.partial(_bwd_kernel, sigma=sigma, weighted=weighted, n_pad=n_pad)
    grad = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, n_pad), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, 1, TILE), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n_pad), jnp.float32),
        interpret=interpret,
    )(s, l, g, m)
    return grad[:, 0, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def pairwise_lambda_loss_pallas(sorted_scores, pred_sorted_labels, n_gains, mask,
                                sigma: float = 1.0, weighted: bool = True,
                                interpret: bool = False):
    """Fused pairwise (weighted) BCE over valid i<j pairs of pre-sorted lists.

    Differentiable w.r.t. sorted_scores only (labels/gains/mask are data).
    Set interpret=True to run on CPU (tests).
    """
    return _run_fwd(sorted_scores, pred_sorted_labels, n_gains, mask, sigma, weighted, interpret)


def _pll_fwd(sorted_scores, labels, n_gains, mask, sigma, weighted, interpret):
    loss = _run_fwd(sorted_scores, labels, n_gains, mask, sigma, weighted, interpret)
    return loss, (sorted_scores, labels, n_gains, mask)


def _pll_bwd(sigma, weighted, interpret, res, g):
    sorted_scores, labels, n_gains, mask = res
    grad = _run_bwd(sorted_scores, labels, n_gains, mask, sigma, weighted, interpret)
    return (g * grad, None, None, None)


pairwise_lambda_loss_pallas.defvjp(_pll_fwd, _pll_bwd)


def lambda_rank_pallas(scores, labels, mask, sigma: float = 1.0,
                       label_type=None, interpret: bool = False, **_):
    """Drop-in LambdaRank loss using the fused kernel. Mirrors
    losses/listwise.py::lambda_rank numerically (tested)."""
    from ptranking_tpu import EPSILON
    from ptranking_tpu.losses.listwise import _full_dcg
    from ptranking_tpu.ops import gain, sort_labels_by_scores
    from ptranking_tpu.types import LabelType

    lt = label_type or LabelType.MultiLabel
    sorted_scores, pred_sorted_labels, sorted_mask = sort_labels_by_scores(scores, labels, mask)
    idcg = jnp.maximum(_full_dcg(labels, mask, lt), EPSILON)
    n_gains = gain(jnp.where(sorted_mask, pred_sorted_labels, 0.0), lt) / idcg[:, None]
    return pairwise_lambda_loss_pallas(sorted_scores, pred_sorted_labels, n_gains,
                                       sorted_mask, sigma, True, interpret)


def ranknet_pallas(scores, labels, mask, sigma: float = 1.0,
                   interpret: bool = False, **_):
    """Drop-in RankNet loss using the fused kernel (weights = 1). Note the
    kernel works on the raw order — RankNet is order-invariant over pairs, so
    no sort is needed."""
    zeros = jnp.zeros_like(scores)
    return pairwise_lambda_loss_pallas(scores, labels, zeros, mask, sigma, False, interpret)
