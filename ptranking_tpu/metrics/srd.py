"""Diversity (SRD) metrics: alpha-DCG / alpha-nDCG, ERR-IA / nERR-IA,
delta-alpha-DCG and the greedy ideal diversified ranking.

Batched, masked counterparts of reference ptranking/metric/srd/
diversity_metric.py. A query's diversity labels form a subtopic-coverage
matrix rele_mat [S, N] (subtopics x docs, 0/1 or graded); batched versions
take [B, S, N] plus a doc mask [B, N] and a subtopic mask [B, S] so padded
docs/subtopics contribute nothing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def _prior_cover_cnts(rele_mat: jnp.ndarray) -> jnp.ndarray:
    """cover counts of each subtopic BEFORE each position: shifted cumsum
    along the doc axis (reference torch_alpha_dcg_at_k, diversity_metric.py:18-22)."""
    shifted = jnp.concatenate(
        [jnp.zeros_like(rele_mat[..., :1]), rele_mat[..., :-1]], axis=-1
    )
    return jnp.cumsum(shifted, axis=-1)


def alpha_dcg_rankwise(rele_mat: jnp.ndarray, doc_mask: jnp.ndarray,
                       alpha: float = 0.5) -> jnp.ndarray:
    """Cumulative alpha-DCG per position. rele_mat: [..., S, N] already sorted
    in the ranking order with pads (all-zero columns) at the tail; doc_mask
    [..., N]. (reference torch_alpha_dcg_at_ks, diversity_metric.py:43-56)."""
    n = rele_mat.shape[-1]
    rele_mat = rele_mat * doc_mask[..., None, :]
    cover = _prior_cover_cnts(rele_mat)
    denom = jnp.log2(jnp.arange(n, dtype=rele_mat.dtype) + 2.0)
    gains = jnp.power(1.0 - alpha, cover) * rele_mat / denom
    global_gains = jnp.sum(gains, axis=-2)  # sum over subtopics -> [..., N]
    return jnp.cumsum(global_gains * doc_mask, axis=-1)


def alpha_ndcg_at_ks(sys_rele_mat, ideal_rele_mat, doc_mask, ks: Sequence[int],
                     alpha: float = 0.5) -> jnp.ndarray:
    """alpha-nDCG@ks, 0.0 where k exceeds the real list length or ideal DCG is 0
    (reference torch_alpha_ndcg_at_ks, diversity_metric.py:58-82).
    Returns [..., len(ks)]."""
    sys_dcg = alpha_dcg_rankwise(sys_rele_mat, doc_mask, alpha)
    ideal_dcg = alpha_dcg_rankwise(ideal_rele_mat, doc_mask, alpha)
    n = sys_dcg.shape[-1]
    n_real = jnp.sum(doc_mask, axis=-1)
    idx = jnp.asarray([min(k, n) - 1 for k in ks], dtype=jnp.int32)
    sys_at = sys_dcg[..., idx]
    ideal_at = ideal_dcg[..., idx]
    ndcg = jnp.where(ideal_at > 0, sys_at / jnp.maximum(ideal_at, _EPS), 0.0)
    valid = jnp.asarray(ks) <= n_real[..., None]
    return jnp.where(valid, ndcg, 0.0)


def rankwise_err_ia(rele_mat: jnp.ndarray, doc_mask: jnp.ndarray,
                    max_label: float, subtopic_mask: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """Cumulative ERR-IA per position: mean over subtopics of the per-subtopic
    cascade ERR (reference torch_rankwise_err_ia, diversity_metric.py:189-222).
    rele_mat: [..., S, N] sorted; returns [..., N]."""
    rele_mat = rele_mat * doc_mask[..., None, :]
    satis = (jnp.power(2.0, rele_mat) - 1.0) / jnp.power(2.0, max_label)
    unsatis = 1.0 - satis
    cum_unsatis = jnp.cumprod(unsatis, axis=-1)
    cascade = jnp.concatenate(
        [jnp.ones_like(cum_unsatis[..., :1]), cum_unsatis[..., :-1]], axis=-1
    )
    n = rele_mat.shape[-1]
    recip = 1.0 / (jnp.arange(n, dtype=rele_mat.dtype) + 1.0)
    expt = satis * cascade * recip  # [..., S, N]
    if subtopic_mask is not None:
        expt = expt * subtopic_mask[..., :, None]
        n_sub = jnp.maximum(jnp.sum(subtopic_mask, axis=-1), 1.0)
    else:
        n_sub = rele_mat.shape[-2]
    rankwise = jnp.cumsum(jnp.sum(expt, axis=-2), axis=-1)
    return rankwise / jnp.asarray(n_sub)[..., None] if subtopic_mask is not None else rankwise / n_sub


def err_ia_at_ks(rele_mat, doc_mask, max_label, ks: Sequence[int],
                 subtopic_mask=None) -> jnp.ndarray:
    rw = rankwise_err_ia(rele_mat, doc_mask, max_label, subtopic_mask)
    n = rw.shape[-1]
    n_real = jnp.sum(doc_mask, axis=-1)
    idx = jnp.asarray([min(k, n) - 1 for k in ks], dtype=jnp.int32)
    vals = rw[..., idx]
    valid = jnp.asarray(ks) <= n_real[..., None]
    return jnp.where(valid, vals, 0.0)


def nerr_ia_at_ks(sys_rele_mat, ideal_rele_mat, doc_mask, max_label,
                  ks: Sequence[int], subtopic_mask=None) -> jnp.ndarray:
    """(reference torch_nerr_ia_at_ks, diversity_metric.py:266-291)."""
    sys_rw = rankwise_err_ia(sys_rele_mat, doc_mask, max_label, subtopic_mask)
    ideal_rw = rankwise_err_ia(ideal_rele_mat, doc_mask, max_label, subtopic_mask)
    n = sys_rw.shape[-1]
    n_real = jnp.sum(doc_mask, axis=-1)
    idx = jnp.asarray([min(k, n) - 1 for k in ks], dtype=jnp.int32)
    nerr = jnp.where(ideal_rw[..., idx] > 0,
                     sys_rw[..., idx] / jnp.maximum(ideal_rw[..., idx], _EPS), 0.0)
    valid = jnp.asarray(ks) <= n_real[..., None]
    return jnp.where(valid, nerr, 0.0)


def delta_alpha_dcg(ideal_rele_mat, sys_rele_mat, doc_mask, alpha: float = 0.5,
                    normalization: bool = True) -> jnp.ndarray:
    """|Delta alpha-DCG| of swapping each doc pair of the predicted ranking
    (reference get_delta_alpha_dcg, diversity_metric.py:143-183).
    sys_rele_mat: [..., S, N] in predicted order; returns [..., N, N]."""
    n = sys_rele_mat.shape[-1]
    sys_rele_mat = sys_rele_mat * doc_mask[..., None, :]
    cover = _prior_cover_cnts(sys_rele_mat)
    focus = jnp.power(1.0 - alpha, cover)  # [..., S, N]

    gains = jnp.power(2.0, sys_rele_mat) - 1.0
    gain_diffs = gains[..., :, None] - gains[..., None, :]  # [..., S, N, N]

    discounts = 1.0 / jnp.log2(jnp.arange(n, dtype=sys_rele_mat.dtype) + 2.0)
    coffs_1st = discounts[:, None] * focus[..., :, None]  # [..., S, N, N]
    coffs_2nd = discounts[None, :] * focus[..., None, :]

    delta = jnp.abs(jnp.sum(gain_diffs * coffs_1st, axis=-3)
                    - jnp.sum(gain_diffs * coffs_2nd, axis=-3))  # [..., N, N]
    pmask = doc_mask[..., :, None] & doc_mask[..., None, :]
    delta = jnp.where(pmask, delta, 0.0)
    if normalization:
        ideal = alpha_dcg_rankwise(ideal_rele_mat, doc_mask, alpha)[..., -1]
        return delta / jnp.maximum(ideal[..., None, None], _EPS)
    return delta


# --- greedy ideal diversified ranking ---------------------------------------


def np_greedy_ideal_ranking(rele_mat: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Greedy max-global-gain ordering of one query's [S, N] coverage matrix;
    returns doc indices (reference get_div_ideal_ranking,
    diversity_metric.py:113-141). Host-side, used in dataset prep."""
    S, N = rele_mat.shape
    cover = np.zeros(S)
    remaining = list(range(N))
    order = []
    while remaining:
        ggs = [float(np.sum((1.0 - alpha) ** cover * rele_mat[:, d])) for d in remaining]
        best = remaining[int(np.argmax(ggs))]
        cover += rele_mat[:, best]
        order.append(best)
        remaining.remove(best)
    return np.asarray(order, dtype=np.int64)


def greedy_ideal_ranking(rele_mat: jnp.ndarray, doc_mask: jnp.ndarray,
                         alpha: float = 0.5) -> jnp.ndarray:
    """On-device greedy ideal ordering via lax.fori_loop (jit/vmap-safe):
    each step picks the unselected real doc with max global gain."""
    S, N = rele_mat.shape
    rele_mat = rele_mat * doc_mask[None, :]

    # pads get a finite, strictly-ordered sentinel gain so they are picked
    # exactly once each, after every real doc, in index order
    pad_gain = -1e6 - jnp.arange(N, dtype=jnp.float32)

    def step(i, state):
        cover, selected, order = state
        gg = jnp.sum(jnp.power(1.0 - alpha, cover)[:, None] * rele_mat, axis=0)
        gg = jnp.where(doc_mask, gg, pad_gain)
        gg = jnp.where(selected, -jnp.inf, gg)
        best = jnp.argmax(gg)
        cover = cover + rele_mat[:, best]
        selected = selected.at[best].set(True)
        order = order.at[i].set(best.astype(jnp.int32))
        return cover, selected, order

    init = (jnp.zeros(S), jnp.zeros(N, bool), jnp.zeros(N, jnp.int32))
    _, _, order = jax.lax.fori_loop(0, N, step, init)
    return order
