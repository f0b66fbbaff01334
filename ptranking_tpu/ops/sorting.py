"""Masked sorting / gathering utilities.

Everything here is jit-safe (static shapes; `jnp.argsort`/`take_along_axis`
lower to XLA's on-device sort) so evaluation never leaves the chip — unlike the
reference's per-batch `.cpu()` sort-gather loops (reference base/ranker.py:40-65).
"""

import jax
import jax.numpy as jnp

from ptranking_tpu import PAD_SCORE


def mask_scores(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace padded entries with a large-negative sentinel (pads sort last)."""
    return jnp.where(mask, scores, PAD_SCORE)


def sort_labels_by_scores(scores: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
    """Sort each list by predicted score descending; pads go to the tail.

    Returns (sorted_scores, labels_in_predicted_order, sorted_mask).
    Replaces the reference sort+gather idiom (e.g. lambdarank.py:39-43).
    """
    masked = mask_scores(scores, mask)
    order = jnp.argsort(-masked, axis=-1, stable=True)
    sorted_scores = jnp.take_along_axis(masked, order, axis=-1)
    sorted_labels = jnp.take_along_axis(jnp.where(mask, labels, 0.0), order, axis=-1)
    sorted_mask = jnp.take_along_axis(mask, order, axis=-1)
    return sorted_scores, sorted_labels, sorted_mask


def ideal_sorted_labels(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Labels sorted descending with pads forced to the tail (ideal ranking)."""
    key = jnp.where(mask, labels, PAD_SCORE)
    out = -jnp.sort(-key, axis=-1)
    return jnp.where(out <= PAD_SCORE, 0.0, out)


def shuffle_ties_argsort(
    key: jax.Array, labels: jnp.ndarray, mask: jnp.ndarray, descending: bool = True
) -> jnp.ndarray:
    """Indices sorting labels (desc) with uniformly shuffled ties; pads last.

    Mirrors reference arg_shuffle_ties (ltr_adhoc/util/sampling_utils.py:14-29):
    a random permutation followed by a stable argsort is equivalent to breaking
    ties uniformly at random. Here we jointly sort on (label, random) pairs,
    which yields the same distribution in one fused on-device sort.
    """
    sign = -1.0 if descending else 1.0
    noise = jax.random.uniform(key, labels.shape)
    # pads always sort LAST: the ascending sort needs them at +inf-like keys
    primary = jnp.where(mask, sign * labels, -PAD_SCORE)
    # lexicographic: primary ascending, noise breaks ties
    _, _, order = jax.lax.sort(
        (primary, noise, jnp.broadcast_to(jnp.arange(labels.shape[-1]), labels.shape)),
        dimension=-1,
        num_keys=2,
    )
    return order
