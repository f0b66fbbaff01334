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
