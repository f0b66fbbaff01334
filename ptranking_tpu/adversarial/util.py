"""Adversarial-branch utilities: ranking log-probs, masked sampling,
f-divergence table.

Counterparts of reference ptranking/ltr_adversarial/util/{list_probability.py,
list_sampling.py, f_divergence.py}.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ptranking_tpu import PAD_SCORE
from ptranking_tpu.ops import logcumsumexp_reverse

_EPS = 1e-20


def log_ranking_prob_pl(preds: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Plackett-Luce log prob of the GIVEN order (reference
    log_ranking_prob_Plackett_Luce, list_probability.py:24-31). [..., N] -> [...]."""
    lcse = logcumsumexp_reverse(preds, mask)
    return jnp.sum(jnp.where(mask, preds - lcse, 0.0), axis=-1)


def log_ranking_prob_bt(preds: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Bradley-Terry log prob over upper-triangular pairs (reference
    log_ranking_prob_Bradley_Terry, list_probability.py:42-62)."""
    n = preds.shape[-1]
    diffs = preds[..., :, None] - preds[..., None, :]
    log_bt = jax.nn.log_sigmoid(diffs)  # log(e^si / (e^si + e^sj))
    i = jnp.arange(n)
    triu = (i[:, None] < i[None, :])
    valid = (mask[..., :, None] & mask[..., None, :]) & triu
    return jnp.sum(jnp.where(valid, log_bt, 0.0), axis=(-2, -1))


def sample_categorical_masked(key, logits, mask, num_samples: int,
                              replacement: bool = True) -> jnp.ndarray:
    """Sample indices ~ softmax(logits) over valid entries.
    logits/mask [..., N] -> [..., num_samples]. Without replacement uses the
    Gumbel top-k trick (equivalent to sequential multinomial sampling)."""
    masked = jnp.where(mask, logits, PAD_SCORE)
    if replacement:
        keys = jnp.reshape(
            jax.random.categorical(key, masked[..., None, :], axis=-1,
                                   shape=(*masked.shape[:-1], num_samples)),
            (*masked.shape[:-1], num_samples))
        return keys
    unif = jax.random.uniform(key, masked.shape)
    gumbel = -jnp.log(-jnp.log(unif + _EPS) + _EPS)
    noisy = masked + gumbel
    order = jnp.argsort(-noisy, axis=-1)
    return order[..., :num_samples]


def sample_uniform_positions(key, counts: jnp.ndarray, num_samples: int,
                             upper: int) -> jnp.ndarray:
    """counts [...]: per-row number of valid leading positions. Returns
    [..., num_samples] indices uniform over [0, counts) (with replacement),
    clipped safe when counts==0."""
    u = jax.random.uniform(key, (*counts.shape, num_samples))
    idx = jnp.floor(u * jnp.maximum(counts, 1)[..., None]).astype(jnp.int32)
    return jnp.clip(idx, 0, upper - 1)


# --- f-divergences (reference f_divergence.py:9-76) --------------------------


def get_f_divergence_functions(f_div_str: str) -> Tuple[Callable, Callable]:
    """(activation, conjugate) pair per divergence id."""
    if f_div_str == "TVar":
        return (lambda v: 0.5 * jnp.tanh(v)), (lambda t: t)
    if f_div_str == "KL":
        return (lambda v: v), (lambda t: jnp.exp(t - 1.0))
    if f_div_str == "RKL":
        return (lambda v: -jnp.exp(-v)), (lambda t: -1.0 - jnp.log(jnp.maximum(-t, 1e-20)))
    if f_div_str == "PC":
        return (lambda v: v), (lambda t: 0.25 * t * t + t)
    if f_div_str == "NC":
        return (lambda v: 1.0 - jnp.exp(-v)), (lambda t: 2.0 - 2.0 * jnp.sqrt(jnp.maximum(1.0 - t, 1e-20)))
    if f_div_str == "SH":
        return (lambda v: 1.0 - jnp.exp(-v)), (lambda t: t / jnp.maximum(1.0 - t, 1e-8))
    if f_div_str == "JS":
        return (lambda v: jnp.log(2.0) - jnp.log1p(jnp.exp(-v))), \
               (lambda t: -jnp.log(jnp.maximum(2.0 - jnp.exp(t), 1e-20)))
    if f_div_str == "JSW":
        pi = math.pi
        return (lambda v: -pi * jnp.log(pi) - jnp.log1p(jnp.exp(-v))), \
               (lambda t: (1.0 - pi) * jnp.log(jnp.maximum((1.0 - pi) / jnp.maximum(1.0 - pi * jnp.exp(t / pi), 1e-20), 1e-20)))
    if f_div_str == "GAN":
        return (lambda v: -jnp.log1p(jnp.exp(-v))), \
               (lambda t: -jnp.log(jnp.maximum(1.0 - jnp.exp(t), 1e-20)))
    raise NotImplementedError(f_div_str)


F_DIVERGENCES = ["TVar", "KL", "RKL", "PC", "NC", "SH", "JS", "JSW", "GAN"]


# --- listwise sampling helpers shared by IRGAN_List / IRFGAN_List -------------


def sample_pl_rankings(key: jax.Array, scores: jnp.ndarray, mask: jnp.ndarray,
                       S: int, k: int, temperature: float
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gumbel-softmax PL sampling: [B, N] -> (top-k indices [B, S, k],
    top-k noisy probs [B, S, k]) (reference gumbel_softmax,
    list_sampling.py:16-36 + sort)."""
    B, N = scores.shape
    unif = jax.random.uniform(key, (B, S, N))
    gumbel = -jnp.log(-jnp.log(unif + _EPS) + _EPS)
    noisy = (scores[:, None, :] + gumbel) / temperature
    noisy = jnp.where(mask[:, None, :], noisy, PAD_SCORE)
    probs = jax.nn.softmax(noisy, axis=-1)
    order = jnp.argsort(-noisy, axis=-1)[..., :k]  # [B, S, k]
    top_probs = jnp.take_along_axis(probs, order, axis=-1)
    return order, top_probs


def gather_subrankings(features: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """[B, N, F] + [B, S, k] -> [B*S, k, F]."""
    B, Ssz, ksz = order.shape
    flat = jnp.take_along_axis(
        features[:, None].repeat(Ssz, 1), order[..., None], axis=2)
    return flat.reshape(B * Ssz, ksz, -1)


def shuffled_truth_rankings(key: jax.Array, labels: jnp.ndarray,
                            mask: jnp.ndarray, S: int, k: int) -> jnp.ndarray:
    """Per-sample tie-shuffled truth top-k indices [B, S, k]."""
    B, N = labels.shape
    unif = jax.random.uniform(key, (B, S, N))
    skey = jnp.where(mask[:, None, :], labels[:, None, :] + 0.0, PAD_SCORE)
    noisy = skey + 1e-3 * unif  # stable label-desc sort + tie shuffle
    return jnp.argsort(-noisy, axis=-1)[..., :k]


def subranking_masks(mask: jnp.ndarray, S: int, k: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sub_mask [B*S, k], row_weight [B*S]) for top-k sub-rankings.

    sub_mask marks positions beyond a query's real doc count as pads (a
    short list cannot fill its top-k), and row_weight zeroes all-padded
    remainder queries of bucketed batches so they never train G or D."""
    n_valid = jnp.sum(mask, axis=-1)  # [B]
    sub = jnp.arange(k)[None, :] < jnp.minimum(n_valid, k)[:, None]  # [B, k]
    sub_mask = jnp.repeat(sub, S, axis=0)  # row-major match for reshape(B*S, ...)
    w = jnp.repeat((n_valid > 0).astype(jnp.float32), S, axis=0)
    return sub_mask, w


def weighted_mean(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


# --- pair sampling (reference ltr_adversarial/util/pair_sampling.py:27-150) ---
#
# The reference's per-qid Python loops with torch.multinomial become batched
# [B, N, N] weight matrices + one categorical draw over the flattened pair
# axis — identical distributions, static shapes for XLA.


def weighted_clipped_pos_diffs(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Position-discounted positive label gaps [B, N, N] (reference
    get_weighted_clipped_pos_diffs, pair_sampling.py:26-51): w_ij =
    max(l_i - l_j, 0) / (log2(2+i) * log2(2+j)). The reference clips rows to
    [0:num_pos] and columns to [0:num_explicit]; under presorted labels the
    row clip is implicit (rows beyond the positives carry no positive gaps),
    and the column clip maps to excluding UNJUDGED (-1) tails — without it,
    semi-supervised data would yield (0, -1) "true pairs" the reference never
    samples."""
    n = labels.shape[-1]
    diffs = jnp.maximum(labels[..., :, None] - labels[..., None, :], 0.0)
    disc = 1.0 / jnp.log2(2.0 + jnp.arange(n, dtype=labels.dtype))
    w = diffs * disc[None, :, None] * disc[None, None, :]
    explicit_tail = labels[..., None, :] >= 0  # judged docs only (num_explicit)
    valid = mask[..., :, None] & mask[..., None, :] & explicit_tail
    return jnp.where(valid, w, 0.0)


def _flat_pair_sample(key, weights: jnp.ndarray, num_pairs: int):
    """weights [B, N, N] -> (head [B, S], tail [B, S]) ~ categorical over the
    flattened pair axis, with replacement (reference torch.multinomial over
    .view(1, -1))."""
    B, N, _ = weights.shape
    logits = jnp.log(jnp.maximum(weights.reshape(B, N * N), _EPS))
    idx = jax.random.categorical(key, logits[:, None, :], axis=-1,
                                 shape=(B, num_pairs))
    return idx // N, idx % N


def generate_true_pairs(key, labels: jnp.ndarray, mask: jnp.ndarray,
                        num_pairs: int):
    """Discounted true-pair sampling (reference generate_true_pairs,
    pair_sampling.py:53-78): (head, tail, has_pairs[B])."""
    w = weighted_clipped_pos_diffs(labels, mask)
    head, tail = _flat_pair_sample(key, w, num_pairs)
    return head, tail, jnp.sum(w, axis=(-2, -1)) > 0


def sample_points_bernoulli(key, mat_probs: jnp.ndarray, num_pairs: int):
    """Two-stage Bernoulli-then-multinomial pair draw (reference
    sample_points_Bernoulli, pair_sampling.py:112-124): b ~ Bernoulli(p) per
    pair, then uniform (multinomial over b) among successes, with replacement.
    Rows with zero successes fall back to p itself (the reference would
    propagate an all-zero multinomial error)."""
    k_b, k_m = jax.random.split(key)
    B, N, _ = mat_probs.shape
    flat = mat_probs.reshape(B, N * N)
    b = jax.random.bernoulli(k_b, jnp.clip(flat, 0.0, 1.0))
    any_success = jnp.any(b, axis=-1, keepdims=True)
    weights = jnp.where(any_success, b.astype(flat.dtype), flat)
    logits = jnp.log(jnp.maximum(weights, _EPS))
    idx = jax.random.categorical(k_m, logits[:, None, :], axis=-1,
                                 shape=(B, num_pairs))
    return idx // N, idx % N


def sample_pairs_bt(key, point_vals: jnp.ndarray, mask: jnp.ndarray,
                    num_pairs: int):
    """Bradley-Terry pair sampling (reference sample_pairs_BT,
    pair_sampling.py:89-110): p(d_i > d_j) = sigmoid(s_i - s_j), then the
    Bernoulli/multinomial two-stage draw."""
    probs = jax.nn.sigmoid(point_vals[..., :, None] - point_vals[..., None, :])
    valid = mask[..., :, None] & mask[..., None, :]
    return sample_points_bernoulli(key, jnp.where(valid, probs, 0.0), num_pairs)


def gaussian_integral_0_inf(mu: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Closed form of the reference's quad() (pt_extensions.py:112-132):
    integral_0^inf N(y; mu/sigma, 1)/sigma dy = Phi(mu/sigma)/sigma.
    Faithful quirk: the extra 1/sigma factor means this is NOT a normalized
    probability (the reference feeds it to Bernoulli regardless)."""
    z = mu / sigma
    return 0.5 * (1.0 + jax.lax.erf(z / jnp.sqrt(2.0))) / sigma


def sample_pairs_gaussian(key, point_vals: jnp.ndarray, mask: jnp.ndarray,
                          num_pairs: int, sigma: float = 1.0):
    """Gaussian pair sampling (reference sample_pairs_gaussian,
    pair_sampling.py:80-87): pair prob = GaussianIntegral_0_inf(s_i - s_j,
    sqrt(2)*sigma), then the Bernoulli/multinomial two-stage draw."""
    import math as _math

    means = point_vals[..., :, None] - point_vals[..., None, :]
    probs = gaussian_integral_0_inf(means, _math.sqrt(2.0) * sigma)
    valid = mask[..., :, None] & mask[..., None, :]
    return sample_points_bernoulli(key, jnp.where(valid, probs, 0.0), num_pairs)
