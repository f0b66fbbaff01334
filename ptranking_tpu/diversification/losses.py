"""Diversification losses: DALETOR and the DivProbRanker family.

Pure functions over (mus/vars/cocos | scores, rele_mat, doc_mask). All take
the coverage matrix in IDEAL order (presort) like the reference. Shapes:
scores/mus/vars [B, N]; rele_mat [B, S, N]; doc_mask [B, N].

Reference: ptranking/ltr_diversification/score_and_sort/{daletor.py,
div_prob_ranker.py} and util/{prob_utils.py, div_lambda_utils.py}.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ptranking_tpu.metrics.srd import delta_alpha_dcg
from ptranking_tpu.ops import robust_sigmoid
from ptranking_tpu.diversification.scorers import expected_ranks

_EPS = 1e-8


def _pair_mask(doc_mask):
    return doc_mask[..., :, None] & doc_mask[..., None, :]


def _triu(n):
    i = jnp.arange(n)
    return i[:, None] < i[None, :]


# --------------------------------------------------------------- DALETOR


def daletor_loss(scores, rele_mat, doc_mask, rt: float = 10.0, top_k: Optional[int] = 10,
                 alpha: float = 0.5, **_):
    """Smooth alpha-DCG via approximated ranks + smooth prior cover counts
    (reference alphaDCG_as_a_loss, daletor.py:9-38). Maximised (returns -DCG)."""
    B, S, N = rele_mat.shape
    rele_mat = rele_mat * doc_mask[:, None, :]
    diffs = scores[..., :, None] - scores[..., None, :]  # s_i - s_j
    indicators = robust_sigmoid(-diffs, rt)  # sigma(rt*(s_j - s_i)) [B, N, N]
    valid = _pair_mask(doc_mask)
    indicators = jnp.where(valid, indicators, 0.0)
    hat_pis = jnp.sum(indicators, axis=-1) + 0.5  # [B, N]
    # prior cover counts: sum_j sigma_ij * rele[s, j] - rele[s, i]/2
    cover = jnp.einsum("bij,bsj->bsi", indicators, rele_mat) - rele_mat / 2.0
    per_subtopic = rele_mat * jnp.power(1.0 - alpha, cover) / jnp.log2(1.0 + hat_pis)[:, None, :]
    global_gains = jnp.sum(per_subtopic, axis=1)  # [B, N]
    if top_k is not None:
        kmask = (jnp.arange(N) < min(top_k, N))[None]
        global_gains = jnp.where(kmask, global_gains, 0.0)
    return -jnp.sum(jnp.where(doc_mask, global_gains, 0.0))


# ------------------------------------------------ SuperSoft (expected ranks)


def alpha_dcg_expected_loss(mus, vars_, rele_mat, doc_mask, cocos=None,
                            top_k: Optional[int] = 10, alpha: float = 0.5,
                            opt_ideal: bool = True, **_):
    """alpha-DCG with Gaussian expected ranks and Phi0 prior-cover counts
    (reference alpha_dcg_as_a_loss, div_prob_ranker.py:29-79, opt_ideal path;
    the resort path re-orders by expected rank first)."""
    B, S, N = rele_mat.shape
    rele_mat = rele_mat * doc_mask[:, None, :]
    ranks, phi0, _, _ = expected_ranks(mus, vars_, doc_mask, cocos)
    offdiag = ~jnp.eye(N, dtype=bool)
    indicators = jnp.where(_pair_mask(doc_mask) & offdiag, phi0, 0.0)
    if not opt_ideal:
        order = jnp.argsort(jnp.where(doc_mask, ranks, 1e9), axis=-1, stable=True)
        ranks = jnp.take_along_axis(ranks, order, -1)
        indicators = jnp.take_along_axis(indicators, order[..., None, :].repeat(N, -2), -1)
        indicators = jnp.take_along_axis(indicators, order[..., :, None].repeat(N, -1), -2)
        rele_mat = jnp.take_along_axis(rele_mat, order[:, None, :].repeat(S, 1), -1)
        doc_mask = jnp.take_along_axis(doc_mask, order, -1)
    cover = jnp.einsum("bij,bsj->bsi", indicators, rele_mat)
    per_subtopic = rele_mat * jnp.power(1.0 - alpha, cover) / jnp.log2(1.0 + ranks)[:, None, :]
    global_gains = jnp.sum(per_subtopic, axis=1)
    if top_k is not None:
        kmask = (jnp.arange(N) < min(top_k, N))[None]
        global_gains = jnp.where(kmask, global_gains, 0.0)
    return -jnp.sum(jnp.where(doc_mask, global_gains, 0.0))


def err_ia_expected_loss(mus, vars_, rele_mat, doc_mask, cocos=None,
                         top_k: Optional[int] = 10, max_label: float = 1.0,
                         opt_ideal: bool = True, **_):
    """ERR-IA with 1/E[rank] reciprocal ranks (reference err_ia_as_a_loss,
    div_prob_ranker.py:81-165)."""
    B, S, N = rele_mat.shape
    rele_mat = rele_mat * doc_mask[:, None, :]
    ranks, *_unused = expected_ranks(mus, vars_, doc_mask, cocos)
    if not opt_ideal:
        order = jnp.argsort(jnp.where(doc_mask, ranks, 1e9), axis=-1, stable=True)
        ranks = jnp.take_along_axis(ranks, order, -1)
        rele_mat = jnp.take_along_axis(rele_mat, order[:, None, :].repeat(S, 1), -1)
        doc_mask = jnp.take_along_axis(doc_mask, order, -1)
    satis = (jnp.power(2.0, rele_mat) - 1.0) / jnp.power(2.0, max_label)
    unsatis = jnp.where(doc_mask[:, None, :], 1.0 - satis, 1.0)
    cum_unsatis = jnp.cumprod(unsatis, axis=-1)
    cascade = jnp.concatenate([jnp.ones_like(cum_unsatis[..., :1]), cum_unsatis[..., :-1]], -1)
    expt = satis * cascade / jnp.maximum(ranks, _EPS)[:, None, :]
    if top_k is not None:
        kmask = (jnp.arange(N) < min(top_k, N))[None, None]
        expt = jnp.where(kmask, expt, 0.0)
    expt = jnp.where(doc_mask[:, None, :], expt, 0.0)
    return -jnp.sum(jnp.sum(expt, axis=(-2, -1)) / S)


# ------------------------------------------- probabilistic pairwise losses


def _prob_pairwise_probs(mus, vars_, rele_mat, doc_mask, cocos=None):
    """(reference get_prob_pairwise_comp_probs, div_lambda_utils.py:26-45):
    p_ij = 1 - 0.5 erfc(pairsub_mu / sqrt(2 pairsub_var)); targets average the
    per-subtopic {0, .5, 1} preferences over subtopics."""
    _, _, pairsub_mus, pairsub_vars = expected_ranks(mus, vars_, doc_mask, cocos)
    p_ij = 1.0 - 0.5 * jax.lax.erfc(pairsub_mus / jnp.sqrt(2.0 * pairsub_vars))
    sub_diffs = jnp.clip(rele_mat[..., :, None] - rele_mat[..., None, :], -1.0, 1.0)
    std_p_ij = jnp.mean(0.5 * (1.0 + sub_diffs), axis=-3)  # mean over subtopics
    return p_ij, std_p_ij


def prob_pair_cls_loss(mus, vars_, rele_mat, doc_mask, cocos=None,
                       opt_id: str = "PairCLS", opt_ideal: bool = True,
                       norm: bool = True, alpha: float = 0.5, **_):
    """PairCLS / LambdaPairCLS (reference prob_lambda_loss,
    div_prob_ranker.py:167-233): BCE over upper-triangular pairs, optionally
    weighted by |Delta alpha-DCG| of the (ideal or resorted) order."""
    B, S, N = rele_mat.shape
    rele_mat = rele_mat * doc_mask[:, None, :]
    if opt_id == "LambdaPairCLS" and not opt_ideal:
        ranks, *_unused = expected_ranks(mus, vars_, doc_mask, cocos)
        order = jnp.argsort(jnp.where(doc_mask, ranks, 1e9), axis=-1, stable=True)
        mus = jnp.take_along_axis(mus, order, -1)
        vars_ = jnp.take_along_axis(vars_, order, -1)
        if cocos is not None:
            cocos = jnp.take_along_axis(cocos, order[..., None, :].repeat(N, -2), -1)
            cocos = jnp.take_along_axis(cocos, order[..., :, None].repeat(N, -1), -2)
        sys_rele = jnp.take_along_axis(rele_mat, order[:, None, :].repeat(S, 1), -1)
        doc_mask = jnp.take_along_axis(doc_mask, order, -1)
    else:
        sys_rele = rele_mat
    p_ij, std_p_ij = _prob_pairwise_probs(mus, vars_, sys_rele, doc_mask, cocos)
    bce = -(std_p_ij * jnp.log(jnp.clip(p_ij, _EPS, 1.0))
            + (1.0 - std_p_ij) * jnp.log(jnp.clip(1.0 - p_ij, _EPS, 1.0)))
    sel = _pair_mask(doc_mask) & _triu(N)[None]
    if opt_id == "LambdaPairCLS":
        weights = delta_alpha_dcg(rele_mat, sys_rele, doc_mask, alpha, normalization=norm)
        bce = bce * weights
    return jnp.sum(jnp.where(sel, bce, 0.0))


# --------------------------------------------------------------- Portfolio


def _project_simplex(w, doc_mask):
    """EXACT Euclidean projection of each row onto the masked probability
    simplex {w >= 0, sum over real docs = 1} (the sort-based algorithm of
    Held/Wolfe/Crowder). Differentiable a.e.; pads are forced to zero."""
    N = w.shape[-1]
    big = -1e9
    wm = jnp.where(doc_mask > 0, w, big)
    u = jnp.sort(wm, axis=-1)[..., ::-1]                       # desc
    css = jnp.cumsum(u, axis=-1) - 1.0
    j = jnp.arange(1, N + 1, dtype=w.dtype)
    cond = (u - css / j) > 0                                    # active set
    rho = jnp.maximum(jnp.sum(cond, axis=-1) - 1, 0)            # [B]
    theta = jnp.take_along_axis(css, rho[..., None], axis=-1) / (
        rho[..., None].astype(w.dtype) + 1.0)
    return jnp.clip(w - theta, 0.0, None) * doc_mask


def portfolio_weights(mus, vars_, doc_mask, cocos=None, alpha_reg: float = 0.01,
                      gamma: float = 0.1, n_qp_iters: int = 50,
                      lr: float = 0.1) -> jnp.ndarray:
    """Solve the reference's mean-variance QP
        max_w  mus.w - ||gamma Cov w||^2 - alpha ||w||^2
        s.t.   sum w = 1, 0 <= w <= 1
    (cvxpylayers problem, div_prob_ranker.py:268-287) by UNROLLED projected
    gradient ascent with the exact simplex projection — fully differentiable,
    jit/TPU-friendly, no host round-trip to a convex solver. Validated
    against a scipy QP oracle in tests/test_diversification.py."""
    B, N = mus.shape
    if cocos is None:
        cov = jnp.eye(N)[None] * vars_[..., None]
    else:
        std = jnp.sqrt(jnp.maximum(vars_, _EPS))
        cov = cocos * std[..., :, None] * std[..., None, :]
    covg = gamma * cov
    m = doc_mask.astype(mus.dtype)
    w = m / jnp.maximum(jnp.sum(m, -1, keepdims=True), _EPS)

    def step(_, w):
        cw = jnp.einsum("bij,bj->bi", covg, w)
        grad = mus - 2.0 * jnp.einsum("bij,bj->bi", covg, cw) - 2.0 * alpha_reg * w
        w = w + lr * grad * m
        return _project_simplex(w, m)

    return jax.lax.fori_loop(0, n_qp_iters, step, w)


def portfolio_loss(mus, vars_, rele_mat, doc_mask, cocos=None, rt: float = 10.0,
                   top_k: Optional[int] = 10, alpha_reg: float = 0.01,
                   gamma: float = 0.1, n_qp_iters: int = 50, **_):
    """Mean-variance portfolio scoring (portfolio_weights), then DALETOR loss
    on the weights (reference 'Portfolio' opt_id)."""
    w = portfolio_weights(mus, vars_, doc_mask, cocos,
                          alpha_reg=alpha_reg, gamma=gamma, n_qp_iters=n_qp_iters)
    return daletor_loss(w, rele_mat, doc_mask, rt=rt, top_k=top_k)


DIV_LOSSES = {
    "DALETOR": daletor_loss,
    # DivProbRanker opt_ids
    "SuperSoft-aNDCG": alpha_dcg_expected_loss,
    "SuperSoft-nERR-IA": err_ia_expected_loss,
    "PairCLS": prob_pair_cls_loss,
    "LambdaPairCLS": prob_pair_cls_loss,
    "Portfolio": portfolio_loss,
}
