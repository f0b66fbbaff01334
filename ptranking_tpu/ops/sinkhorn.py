"""Batched log-domain Sinkhorn iterations for entropic optimal transport.

TPU-native replacement for the reference's WassRank machinery
(reference ptranking/ltr_adhoc/listwise/wassrank/pytorch_wasserstein.py):
  * OldSinkhornOT (:325-393): fixed-iteration Sinkhorn with the analytic
    gradient d W / d mu = lam * log(u), mean-centered. Reproduced here as a
    `jax.custom_vjp` so the backward pass is O(1) instead of differentiating
    through the loop.
  * EntropicOT (:27-74): Sinkhorn with a convergence threshold — reproduced
    with `lax.while_loop` carrying the marginal error.
  * The inline CUDA `sinkstep` kernel (:76-268) — the log-sum-exp matvec —
    maps to a single fused XLA reduction here; a Pallas kernel version lives
    in ops/pallas/sinkhorn.py for mid-sized N.

All functions are batched ([B, N] histograms, [B, N, N] costs) and masked:
padded slots must carry zero mass; they are excluded from every logsumexp.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30  # log-domain "minus infinity" that stays NaN-free under arithmetic


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    # double-where: the log must never SEE a non-positive input, or its
    # backward (cot/x) manufactures inf/NaN that the outer where cannot erase
    pos = x > 0
    return jnp.where(pos, jnp.log(jnp.where(pos, x, 1.0)), _NEG)


def _lse(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """logsumexp that treats _NEG entries as exact zeros (no -inf NaNs)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    m = jnp.maximum(m, _NEG)  # all-pad rows stay at _NEG
    s = jnp.sum(jnp.exp(x - m), axis=axis)
    return jnp.squeeze(m, axis) + _safe_log(s)


def log_sinkstep(neg_cost_over_lam_T: jnp.ndarray, log_marginal: jnp.ndarray,
                 log_u: jnp.ndarray) -> jnp.ndarray:
    """One log-domain Sinkhorn half-step:
    log_v = log_marginal - LSE_i(-C_ij/lam + log_u_i).

    neg_cost_over_lam_T: [B, N_from, N_to] = -C/lam (rows = summed-over axis)
    log_marginal, log_u: [B, N_to] / [B, N_from]
    """
    return log_marginal - _lse(neg_cost_over_lam_T + log_u[..., :, None], axis=-2)


def use_pallas_sinkstep(N: int) -> bool:
    """Per-shape kernel selection (VERDICT r1 #5). Measured on TPU v5e
    (tools/bench_kernels.py; table in docs/kernel_bench.md): the Pallas
    column-slab kernel reaches parity at mid N and wins ~1.3x once N >= 1k,
    where the XLA path's full [B, N, N] intermediate goes HBM-bandwidth
    bound; below that XLA's fusion is at parity or better."""
    return jax.default_backend() == "tpu" and N >= 1024


def sinkhorn_log_scalings(
    log_mu: jnp.ndarray,
    log_nu: jnp.ndarray,
    cost: jnp.ndarray,
    lam: float,
    n_iters: int,
    use_pallas: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run n_iters Sinkhorn iterations; returns (log_u, log_v).

    Matches the iteration order of reference OldSinkhornOT.forward
    (pytorch_wasserstein.py:340-351): v-update from u, then u-update from v,
    starting from log_u = -log(n). use_pallas=None auto-selects the Pallas
    half-step kernel by shape (use_pallas_sinkstep)."""
    B, N = log_mu.shape
    if use_pallas is None:
        use_pallas = use_pallas_sinkstep(N)
    log_u0 = jnp.where(log_mu > _NEG / 2, -jnp.log(N), _NEG)
    log_v0 = jnp.where(log_nu > _NEG / 2, -jnp.log(N), _NEG)

    if use_pallas:
        from ptranking_tpu.ops.pallas.sinkhorn import sinkstep_pallas

        cost_t = jnp.swapaxes(cost, -1, -2)

        def body(carry, _):
            log_u, log_v = carry
            log_v = sinkstep_pallas(cost, log_nu, log_u, lam)
            log_u = sinkstep_pallas(cost_t, log_mu, log_v, lam)
            return (log_u, log_v), None
    else:
        neg_c = -cost / lam  # [B, N, N]

        def body(carry, _):
            log_u, log_v = carry
            log_v = log_sinkstep(neg_c, log_nu, log_u)  # sum over i (rows)
            log_u = log_sinkstep(jnp.swapaxes(neg_c, -1, -2), log_mu, log_v)
            return (log_u, log_v), None

    (log_u, log_v), _ = jax.lax.scan(body, (log_u0, log_v0), None, length=n_iters)
    return log_u, log_v


def _transport_cost(log_u, log_v, cost, lam):
    """sum_ij u_i K_ij C_ij v_j in log space (K = exp(-C/lam))."""
    log_kc = _safe_log(cost) - cost / lam  # [B, N, N]
    terms = log_kc + log_u[..., :, None] + log_v[..., None, :]
    return jnp.exp(_lse(_lse(terms, axis=-1), axis=-1))  # [B]


def _row_weights(mu, row_mask):
    if row_mask is None:
        return jnp.ones(mu.shape[0], mu.dtype)
    return row_mask.astype(mu.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sinkhorn_distance(mu: jnp.ndarray, nu: jnp.ndarray, cost: jnp.ndarray,
                      row_mask: jnp.ndarray = None,
                      lam: float = 0.1, n_iters: int = 20) -> jnp.ndarray:
    """Entropic-OT transport cost per batch row, mean over REAL rows.

    Semantics mirror reference OldSinkhornOT (pytorch_wasserstein.py:325-393):
    forward returns mean_b sum_ij u K C v; backward propagates only into `mu`
    with the analytic dual gradient lam*log(u), double-mean-centered.

    mu, nu: [B, N] histograms (padded slots = 0 mass); cost: [B, N, N];
    row_mask: [B] bool — all-padded remainder rows of bucketed batches must
    not dilute the mean (repo convention: means divide by real queries).
    """
    log_u, log_v = sinkhorn_log_scalings(_safe_log(mu), _safe_log(nu), cost, lam, n_iters)
    w = _row_weights(mu, row_mask)
    per_row = _transport_cost(log_u, log_v, cost, lam)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def _sd_fwd(mu, nu, cost, row_mask, lam, n_iters):
    log_u, log_v = sinkhorn_log_scalings(_safe_log(mu), _safe_log(nu), cost, lam, n_iters)
    w = _row_weights(mu, row_mask)
    per_row = _transport_cost(log_u, log_v, cost, lam)
    out = jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
    return out, (log_u, mu, w)


def _sd_bwd(lam, n_iters, res, g):
    log_u, mu, w = res
    valid = mu > 0
    grad = jnp.where(valid, log_u * lam, 0.0)
    n = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
    # double mean-centering over valid entries (pytorch_wasserstein.py:377-379)
    grad = grad - jnp.where(valid, jnp.sum(grad, -1, keepdims=True) / n, 0.0)
    grad = grad - jnp.where(valid, jnp.sum(grad, -1, keepdims=True) / n, 0.0)
    grad = grad * (w / jnp.maximum(jnp.sum(w), 1.0))[:, None]
    return (g * grad, None, None, None)


sinkhorn_distance.defvjp(_sd_fwd, _sd_bwd)


def entropic_ot(mu: jnp.ndarray, nu: jnp.ndarray, cost: jnp.ndarray,
                eps: float = 0.1, max_iters: int = 100, thresh: float = 1e-1,
                row_mask: jnp.ndarray = None):
    """Sinkhorn divergence with a convergence freeze, reverse-mode
    differentiable (fixed-length lax.scan; once the L1 marginal error drops
    below thresh the potentials stop updating — same result as the
    reference's early break, but grad-able, unlike lax.while_loop).

    Mirrors reference EntropicOT (pytorch_wasserstein.py:27-74): u/v potentials
    updated in log space, then loss = sum(pi * C) per row, mean over REAL
    rows. Returns (loss, pi).
    """
    log_mu, log_nu = _safe_log(mu), _safe_log(nu)
    valid_mu = mu > 0

    def m_op(f, g):  # M_ij = (-C + f_i + g_j) / eps
        return (-cost + f[..., :, None] + g[..., None, :]) / eps

    def body(state, _):
        f, g, err = state
        f1 = eps * (log_mu - _lse(m_op(f, g), axis=-1)) + f
        f1 = jnp.where(valid_mu, f1, _NEG)
        g1 = eps * (log_nu - _lse(jnp.swapaxes(m_op(f1, g), -1, -2), axis=-1)) + g
        g1 = jnp.where(nu > 0, g1, _NEG)
        # the marginal-error probe only drives the boolean freeze; it must
        # carry no gradient (its exp can overflow, and 0*inf => NaN backward)
        marg = jax.lax.stop_gradient(jnp.exp(_lse(m_op(f1, g1), axis=-1)))
        err1 = jnp.mean(jnp.sum(jnp.abs(marg - jax.lax.stop_gradient(mu)), axis=-1))
        done = err <= thresh  # freeze once converged (reference's early break)
        f1 = jnp.where(done, f, f1)
        g1 = jnp.where(done, g, g1)
        err1 = jnp.where(done, err, err1)
        return (f1, g1, err1), None

    f0 = jnp.zeros_like(mu)
    g0 = jnp.zeros_like(nu)
    (f, g, _), _ = jax.lax.scan(body, (f0, g0, jnp.inf), None, length=max_iters)
    pi = jnp.exp(m_op(f, g))
    per_row = jnp.sum(pi * cost, axis=(-2, -1))
    w = _row_weights(mu, row_mask)
    loss = jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss, pi
