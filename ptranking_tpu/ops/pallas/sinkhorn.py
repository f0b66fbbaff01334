"""

NOTE: the kernel stages one batch row's full [N, N] cost block in VMEM
(~16 MB/core), so it is valid for N up to roughly 1.5k; beyond that use the
XLA log-sum-exp path in ops/sinkhorn.py (which handles any N).Pallas kernel for the batched log-domain Sinkhorn half-step.

The reference's only device kernel is an inline CUDA `sinkstep` — a log-sum-
exp matvec with warp-shuffle reductions (reference ltr_adhoc/listwise/
wassrank/pytorch_wasserstein.py:76-268). This is its TPU equivalent:
    log_v[b, j] = log_marginal[b, j] - LSE_i(-C[b, i, j]/lam + log_u[b, i])
computed per (batch-row) grid step with the [N, N] cost block in VMEM. The
pure-XLA fallback lives in ops/sinkhorn.py (log_sinkstep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _sinkstep_kernel(cost_ref, marg_ref, u_ref, out_ref, *, lam):
    c = cost_ref[0]                 # [N, N]
    log_u = u_ref[0, 0]             # [N]
    x = -c / lam + log_u[:, None]   # [N, N]; reduce over i (rows)
    m = jnp.maximum(jnp.max(x, axis=0), _NEG)
    s = jnp.sum(jnp.exp(x - m[None, :]), axis=0)
    lse = m + jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-38)), _NEG)
    out_ref[0, 0] = marg_ref[0, 0] - lse


def sinkstep_pallas(cost: jnp.ndarray, log_marginal: jnp.ndarray,
                    log_u: jnp.ndarray, lam: float,
                    interpret: bool = False) -> jnp.ndarray:
    """cost [B, N, N] (rows = summed-over axis), log_marginal/log_u [B, N]."""
    B, N, _ = cost.shape
    kern = functools.partial(_sinkstep_kernel, lam=lam)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        interpret=interpret,
    )(cost, log_marginal[:, None, :], log_u[:, None, :])
    return out[:, 0, :]
