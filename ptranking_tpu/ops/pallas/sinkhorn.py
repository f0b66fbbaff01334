"""Pallas kernel for the batched log-domain Sinkhorn half-step.

The reference's only device kernel is an inline CUDA `sinkstep` — a log-sum-
exp matvec with warp-shuffle reductions (reference ltr_adhoc/listwise/
wassrank/pytorch_wasserstein.py:76-268). This is its TPU equivalent:
    log_v[b, j] = log_marginal[b, j] - LSE_i(-C[b, i, j]/lam + log_u[b, i])
computed per (batch-row, column-tile) grid step with [N, TILE] cost slabs in
VMEM and the full reduction axis resident per slab, so N is bounded only by
one [N, TILE] slab fitting in VMEM (N up to ~16k at TILE=256), not by the
full [N, N] block. The pure-XLA fallback lives in ops/sinkhorn.py
(log_sinkstep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _sinkstep_kernel(cost_ref, marg_ref, u_ref, out_ref, *, lam):
    c = cost_ref[0]                 # [N, TILE] column slab
    log_u = u_ref[0, 0]             # [N]
    x = -c / lam + log_u[:, None]   # [N, TILE]; reduce over i (rows)
    m = jnp.maximum(jnp.max(x, axis=0), _NEG)
    s = jnp.sum(jnp.exp(x - m[None, :]), axis=0)
    lse = m + jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-38)), _NEG)
    out_ref[0, 0] = marg_ref[0, 0] - lse


def sinkstep_pallas(cost: jnp.ndarray, log_marginal: jnp.ndarray,
                    log_u: jnp.ndarray, lam: float,
                    interpret: bool = False, tile: int = 256) -> jnp.ndarray:
    """cost [B, N, N] (rows = summed-over axis), log_marginal/log_u [B, N].

    Columns are processed in TILE-wide slabs so only an [N, TILE] block of the
    cost matrix is VMEM-resident at a time; each output column needs the full
    row (reduction) axis, which stays resident per slab.
    """
    B, N, _ = cost.shape
    if N <= tile:
        tile = N
        n_tiles, pad = 1, 0
    else:
        n_tiles = -(-N // tile)
        pad = n_tiles * tile - N
    if pad:
        # pad the COLUMN axis only; padded columns produce garbage that is
        # sliced off below (each output column is independent)
        cost = jnp.pad(cost, [(0, 0), (0, 0), (0, pad)])
        log_marginal = jnp.pad(log_marginal, [(0, 0), (0, pad)])
    kern = functools.partial(_sinkstep_kernel, lam=lam)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, N, tile), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n_tiles * tile), jnp.float32),
        interpret=interpret,
    )(cost, log_marginal[:, None, :], log_u[:, None, :])
    return out[:, 0, :N]
