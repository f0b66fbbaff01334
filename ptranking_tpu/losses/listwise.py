"""Listwise losses: LambdaRank, ListNet, STListNet, ListMLE, RankCosine,
ApproxNDCG, LambdaLoss, SoftRank, MDPRank.

Contract shared by every loss in the zoo:
    loss(scores, labels, mask, *, key=None, **hyper) -> scalar
with scores/labels/mask of shape [B, N]. Training batches arrive PRESORTED —
labels descending with ties randomly shuffled, pads at the tail — matching the
reference's presort=True pipeline (reference data_utils.py:420-549). Losses
that need the ideal ranking therefore use `labels` directly.

Every loss is mask-invariant: adding padded slots or mutating their contents
never changes the value (the property the reference never needed — it only
ever batches equal-length lists).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ptranking_tpu import EPSILON
from ptranking_tpu.types import LabelType
from ptranking_tpu.ops import (
    delta_ndcg,
    gain,
    logcumsumexp_reverse,
    masked_log_softmax,
    masked_softmax,
    pair_mask,
    pairwise_diffs,
    robust_sigmoid,
    shuffle_ties_argsort,
    sort_labels_by_scores,
    triu_pair_mask,
)
from ptranking_tpu.losses.pairwise import _pair_bce_from_logits
from ptranking_tpu.metrics.adhoc import dcg

_GUMBEL_EPS = 1e-20  # reference sampling_utils.py:6 EPS


def _full_dcg(labels, mask, label_type=LabelType.MultiLabel):
    """Whole-list DCG of already-ideal-ordered labels, pads contributing 0."""
    n = labels.shape[-1]
    gains = gain(jnp.where(mask, labels, 0.0), label_type)
    discounts = jnp.log2(jnp.arange(n, dtype=labels.dtype) + 2.0)
    return jnp.sum(jnp.where(mask, gains / discounts, 0.0), axis=-1)  # [B]


# ---------------------------------------------------------------------------


def lambda_rank(scores, labels, mask, sigma: float = 1.0,
                label_type: LabelType = LabelType.MultiLabel,
                use_pallas: bool = False, **_):
    """RankNet BCE weighted by |DeltaNDCG| of pairwise swaps on the predicted
    order (reference LambdaRank.custom_loss_function, lambdarank.py:27-62).

    use_pallas=True routes through the fused tiled kernel
    (ops/pallas/pairwise.py): O(N) memory instead of materialising [B, N, N].
    Measured on TPU v5e (docs/kernel_bench.md), the XLA-fused lax path wins
    at every (B, N) operating point (0.73-0.87x for the kernel), so lax is
    the default BY MEASUREMENT; the kernel is the fallback when the dense
    pair matrix cannot fit in HBM.
    """
    if use_pallas:
        from ptranking_tpu.ops.pallas import lambda_rank_pallas

        return lambda_rank_pallas(scores, labels, mask, sigma=sigma, label_type=label_type)
    sorted_scores, pred_sorted_labels, sorted_mask = sort_labels_by_scores(scores, labels, mask)
    logits = sigma * pairwise_diffs(sorted_scores)
    targets = 0.5 * (1.0 + jnp.clip(pairwise_diffs(pred_sorted_labels), -1.0, 1.0))
    weights = delta_ndcg(labels, pred_sorted_labels, sorted_mask, label_type)
    bce = _pair_bce_from_logits(logits, targets) * weights
    return jnp.sum(jnp.where(triu_pair_mask(sorted_mask), bce, 0.0))


def listnet(scores, labels, mask, **_):
    """Top-1 cross entropy (reference ListNet, listnet.py:22-45)."""
    p_std = masked_softmax(labels, mask)
    logp = masked_log_softmax(scores, mask)
    return jnp.sum(-jnp.sum(p_std * logp, axis=-1))


def st_listnet(scores, labels, mask, key: Optional[jax.Array] = None,
               temperature: float = 1.0, **_):
    """ListNet on Gumbel-perturbed, temperature-scaled scores
    (reference STListNet, st_listnet.py:33-55)."""
    assert key is not None, "st_listnet is stochastic: pass a PRNG key"
    unif = jax.random.uniform(key, scores.shape)
    gumbel = -jnp.log(-jnp.log(unif + _GUMBEL_EPS) + _GUMBEL_EPS)
    noisy = (scores + gumbel) / temperature
    return listnet(noisy, labels, mask)


def listmle(scores, labels, mask, key: Optional[jax.Array] = None, **_):
    """Plackett-Luce NLL over the (tie-shuffled) label order
    (reference ListMLE, listmle.py:73-104)."""
    assert key is not None, "listmle shuffles ties per epoch: pass a PRNG key"
    order = shuffle_ties_argsort(key, labels, mask, descending=True)
    s = jnp.take_along_axis(scores, order, axis=-1)
    m = jnp.take_along_axis(mask, order, axis=-1)
    lcse = logcumsumexp_reverse(s, m)
    return jnp.sum(jnp.where(m, lcse - s, 0.0))


def rank_cosine(scores, labels, mask, **_):
    """sum_b (1 - cos(scores_b, labels_b)) / 0.5 over valid docs
    (reference RankCosine, rank_cosine.py:25-38)."""
    s = jnp.where(mask, scores, 0.0)
    l = jnp.where(mask, labels, 0.0)
    dot = jnp.sum(s * l, axis=-1)

    def safe_norm(v):  # sqrt with a zero-safe backward (d sqrt(0) = inf)
        sq = jnp.sum(v * v, axis=-1)
        pos = sq > 0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)

    denom = safe_norm(s) * safe_norm(l)
    cos = dot / jnp.maximum(denom, 1e-8)  # torch CosineSimilarity eps=1e-8
    real = jnp.any(mask, axis=-1)  # all-padded rows must contribute 0, not 2.0
    return jnp.sum(jnp.where(real, (1.0 - cos) / 0.5, 0.0))


def approx_ranks(scores, mask, alpha: float = 10.0):
    """Smooth ranks pi_i = 0.5 + sum_j sigmoid(alpha*(s_j - s_i)) over valid j
    (reference get_approx_ranks, approxNDCG.py:19-27; the j=i term contributes
    the remaining 0.5). Padded i get arbitrary values — callers mask."""
    diffs = pairwise_diffs(scores)  # s_i - s_j
    indicators = robust_sigmoid(-diffs, alpha)  # sigma(alpha*(s_j - s_i))
    valid = pair_mask(mask)
    return jnp.sum(jnp.where(valid, indicators, 0.0), axis=-1) + 0.5


def approx_ndcg(scores, labels, mask, alpha: float = 10.0,
                label_type: LabelType = LabelType.MultiLabel, **_):
    """-sum_b approxNDCG_b with smooth log2(pi+1) discounts
    (reference approxNDCG_loss, approxNDCG.py:45-62; labels are the ideal
    ranking thanks to presort).

    Deviation (reference bug): approxNDCG.py:58-60 divides a [B] dcg vector by
    a [B,1] idcg, broadcasting to [B,B] and summing cross-query ratios. We
    compute the intended per-query nDCG; the two agree exactly at B=1
    (verified in tests/test_reference_parity.py).
    """
    hat_pi = approx_ranks(scores, mask, alpha)
    gains = gain(jnp.where(mask, labels, 0.0), label_type)
    idcg = jnp.maximum(_full_dcg(labels, mask, label_type), EPSILON)
    dcg_terms = jnp.where(mask, gains / jnp.log2(hat_pi + 1.0), 0.0)
    return -jnp.sum(jnp.sum(dcg_terms, axis=-1) / idcg)


# --- LambdaLoss (reference lambdaloss.py:33-138) ---------------------------


def lambda_loss(scores, labels, mask, loss_type: str = "NDCG_Loss2",
                k: int = 5, sigma: float = 1.0, mu: float = 5.0,
                label_type: LabelType = LabelType.MultiLabel, **_):
    """LambdaLoss framework: power-weighted pairwise log-loss with top-k
    truncation. loss_type in {NDCG_Loss1, NDCG_Loss2, NDCG_Loss2++}.

    Pair weights follow reference ndcg_loss{1,2,2++}_power_weights
    (lambdaloss.py:33-58); for Loss1 the reference's [B,N] ** broadcast
    right-aligns to the column axis, i.e. w_ij = nG_j/D_j — reproduced
    explicitly here.
    """
    N = scores.shape[-1]
    sorted_scores, pred_sorted_labels, sorted_mask = sort_labels_by_scores(scores, labels, mask)
    positions = jnp.arange(N, dtype=scores.dtype)
    inv_discounts = jnp.log2(positions + 2.0)  # 1/discounts[r] = log2(r+2)

    idcg = jnp.maximum(_full_dcg(labels, mask, label_type), EPSILON)  # [B]
    gains = gain(jnp.where(sorted_mask, pred_sorted_labels, 0.0), label_type)
    n_gains = gains / idcg[:, None]  # [B, N]

    if loss_type == "NDCG_Loss1":
        # reference: batch_n_gains / dists_1D with dists = 1/log2(r+2), i.e.
        # n_gains * log2(r+2); column-aligned per the [B,N] ** broadcast
        w = (n_gains * inv_discounts)[:, None, :]
        weights = jnp.broadcast_to(w, (scores.shape[0], N, N))
    else:
        d = jnp.abs(positions[:, None] - positions[None, :])  # |i-j|
        delta_ij = jnp.abs(jnp.log2(d + 2.0) - jnp.log2(d + 1.0))
        delta_ij = jnp.where(jnp.eye(N, dtype=bool), 0.0, delta_ij)
        ng_diffs = jnp.abs(n_gains[:, :, None] - n_gains[:, None, :])
        if loss_type == "NDCG_Loss2":
            weights = delta_ij[None] * ng_diffs
        elif loss_type == "NDCG_Loss2++":
            rho_ij = jnp.abs(inv_discounts[:, None] - inv_discounts[None, :])
            weights = (rho_ij[None] + mu * delta_ij[None]) * ng_diffs
        else:
            raise NotImplementedError(loss_type)

    diffs = jnp.clip(pairwise_diffs(sorted_scores), -1e8, 1e8)
    log_probas = jnp.log2(jnp.clip(jax.nn.sigmoid(sigma * diffs), EPSILON, None))
    # reference clamps p^w itself to eps as well (lambdaloss.py:120):
    # log2(clamp(p^w, eps)) == max(w*log2(p), log2(eps))
    log_weighted = jnp.maximum(weights * log_probas, jnp.log2(EPSILON))

    trunc = (positions[:, None] < k) & (positions[None, :] < k)
    select = trunc[None] & pair_mask(sorted_mask)
    if loss_type in ("NDCG_Loss2", "NDCG_Loss2++"):
        label_diffs = pairwise_diffs(pred_sorted_labels)
        select = select & (label_diffs > 0)
    # Loss1 in the reference also hits the clamp floor for selected-but-zero
    # weight entries; weights*log2(clamped p) reproduces the value exactly.
    return -jnp.sum(jnp.where(select, log_weighted, 0.0))


# --- SoftRank (reference softrank.py:33-77) ---------------------------------


def soft_rank(scores, labels, mask, delta: float = 1.0, top_k: Optional[int] = None,
              label_type: LabelType = LabelType.MultiLabel, **_):
    """Expected nDCG under Gaussian score uncertainty: expected ranks from
    pairwise Phi(0) = 0.5*erfc(dmu / sqrt(2*2*delta^2)), discount
    1/log2(E[rank]+1)."""
    pairsub_var = 2.0 * delta * delta
    diffs = pairwise_diffs(scores)
    phi0 = 0.5 * jax.lax.erfc(diffs / jnp.sqrt(2.0 * pairsub_var))
    N = scores.shape[-1]
    offdiag = ~jnp.eye(N, dtype=bool)
    valid = pair_mask(mask) & offdiag[None]
    expt_ranks = jnp.sum(jnp.where(valid, phi0, 0.0), axis=-1) + 1.0

    gains = gain(jnp.where(mask, labels, 0.0), label_type)
    dists = 1.0 / jnp.log2(expt_ranks + 1.0)
    idcg = jnp.maximum(_full_dcg(labels, mask, label_type), EPSILON)
    terms = jnp.where(mask, dists * gains, 0.0)
    if top_k is not None:
        kmask = jnp.arange(N) < min(top_k, N)
        terms = jnp.where(kmask[None], terms, 0.0)
    return -jnp.sum(jnp.sum(terms, axis=-1) / idcg)


# --- MDPRank (reference mdprank.py:24-81) -----------------------------------


def mdp_rank(scores, labels, mask, key: Optional[jax.Array] = None,
             distribution: str = "PL", temperature: float = 1.0,
             gamma: float = 1.0, top_k: Optional[int] = None, **_):
    """Policy gradient over sampled rankings: reward = DCG terms, return-to-go
    weighting x Plackett-Luce NLL.

    Sampling uses the Gumbel-argsort trick, distributionally identical to the
    reference's sequential multinomial PL sampling (sample_ranking_PL,
    sampling_utils.py:31-60): argsort(logits + Gumbel) ~ PL(softmax(logits)).
    'PL' scores the ORIGINAL predictions in sample order; 'STPL' scores the
    noisy temperature-scaled logits (sampling_utils.py:62-84).
    """
    assert key is not None, "mdp_rank samples rankings: pass a PRNG key"
    from ptranking_tpu import PAD_SCORE

    unif = jax.random.uniform(key, scores.shape)
    gumbel = -jnp.log(-jnp.log(unif + _GUMBEL_EPS) + _GUMBEL_EPS)
    if distribution == "PL":
        logits = jnp.where(mask, scores / temperature + gumbel, PAD_SCORE)
        order = jnp.argsort(-logits, axis=-1, stable=True)
        action_preds = jnp.take_along_axis(scores, order, axis=-1)
    elif distribution == "STPL":
        noisy = (scores + gumbel) / temperature
        logits = jnp.where(mask, noisy, PAD_SCORE)
        order = jnp.argsort(-logits, axis=-1, stable=True)
        action_preds = jnp.take_along_axis(noisy, order, axis=-1)
    else:
        raise NotImplementedError(distribution)

    m = jnp.take_along_axis(mask, order, axis=-1)  # pads land at the tail
    action_labels = jnp.take_along_axis(jnp.where(mask, labels, 0.0), order, axis=-1)

    N = scores.shape[-1]
    ranks = jnp.arange(N, dtype=scores.dtype)
    rewards = jnp.where(m, gain(action_labels) / jnp.log2(2.0 + ranks), 0.0)
    kmask = m if top_k is None else (m & (ranks < min(top_k, N))[None])
    rewards = jnp.where(kmask, rewards, 0.0)
    g_t = jnp.flip(jnp.cumsum(jnp.flip(rewards, -1), -1), -1)
    if gamma != 1.0:
        g_t = g_t * jnp.power(gamma, ranks + 1.0)[None]

    lcse = logcumsumexp_reverse(action_preds, m)
    neg_log_probs = jnp.where(kmask, lcse - action_preds, 0.0)
    return jnp.sum(neg_log_probs * g_t)


# --- NeuralNDCG (no reference counterpart) ----------------------------------


def neural_ndcg(scores, labels, mask, temperature: float = 1.0,
                top_k: Optional[int] = None, sinkhorn_iters: int = 10,
                label_type: LabelType = LabelType.MultiLabel, **_):
    """NeuralNDCG: nDCG through NeuralSort's relaxed permutation matrix.

    Pobrotyn & Bialobrzeski, "NeuralNDCG: Direct Optimisation of a Ranking
    Metric via Differentiable Relaxation of Sorting" (arXiv:2102.07831),
    building on NeuralSort (Grover et al., ICLR 2019). Beyond the
    reference's zoo (PAPERS.md) — included because the relaxation is pure
    batched matmuls/softmaxes over the [N, N] permutation space, exactly
    the shape the MXU wants.

    Deterministic NeuralSort row i (1-indexed rank), valid docs only:
        P[i, j] = softmax_j((n + 1 - 2 i) s_j - sum_k |s_j - s_k|) / tau
    then `sinkhorn_iters` rounds of masked log-domain Sinkhorn scaling
    toward a doubly-stochastic matrix (the paper's scaling step), smooth
    gains ghat_i = sum_j P[i, j] gain_j, and
        loss = -sum_b DCG(ghat) / maxDCG@k
    with both DCG and maxDCG truncated at `top_k`. maxDCG uses the given
    label order (training batches arrive presorted-ideal, see module
    docstring). Mask-invariant; all-padded rows contribute exactly 0.
    """
    from ptranking_tpu.ops.sinkhorn import _NEG, _lse

    N = scores.shape[-1]
    n = jnp.sum(mask, axis=-1, keepdims=True).astype(scores.dtype)  # [B, 1]
    s = jnp.where(mask, scores, 0.0)
    diffs = jnp.abs(s[..., :, None] - s[..., None, :])
    A = jnp.sum(jnp.where(pair_mask(mask), diffs, 0.0), axis=-1)    # [B, N]
    ranks = jnp.arange(1, N + 1, dtype=scores.dtype)
    c = n + 1.0 - 2.0 * ranks[None, :]                              # [B, N(i)]
    logits = (c[..., :, None] * s[..., None, :] - A[..., None, :]) / temperature
    row_ok = ranks[None, :] <= n                                    # [B, N(i)]
    cell = row_ok[..., :, None] & mask[..., None, :]
    log_p = masked_log_softmax(logits, cell)                        # rows sum to 1
    log_p = jnp.where(cell, log_p, _NEG)
    for _ in range(int(sinkhorn_iters)):
        log_p = log_p - _lse(log_p, -2)[..., None, :]               # columns
        log_p = jnp.where(cell, log_p, _NEG)
        log_p = log_p - _lse(log_p, -1)[..., :, None]               # rows
        log_p = jnp.where(cell, log_p, _NEG)
    P = jnp.where(cell, jnp.exp(log_p), 0.0)

    gains = gain(jnp.where(mask, labels, 0.0), label_type)
    ghat = jnp.einsum("bij,bj->bi", P, gains)                       # [B, N(i)]
    disc = 1.0 / jnp.log2(ranks + 1.0)
    kmask = row_ok if top_k is None else (row_ok & (ranks <= min(top_k, N))[None])
    dcg_b = jnp.sum(jnp.where(kmask, ghat * disc[None], 0.0), axis=-1)
    # maxDCG@k over the given (presorted-ideal) order; position == rank
    ideal_terms = jnp.where(kmask & mask, gains * disc[None], 0.0)
    idcg_b = jnp.maximum(jnp.sum(ideal_terms, axis=-1), EPSILON)
    return -jnp.sum(dcg_b / idcg_b)
