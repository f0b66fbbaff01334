"""Gain conventions and masked softmax helpers."""

import jax
import jax.numpy as jnp

from ptranking_tpu import PAD_SCORE
from ptranking_tpu.types import LabelType


def gain(labels: jnp.ndarray, label_type: LabelType = LabelType.MultiLabel) -> jnp.ndarray:
    """Relevance gain. MultiLabel: 2^label - 1; Permutation: raw label.

    Mirrors the gain switch in reference torch_dcg_at_k
    (ptranking/metric/adhoc/adhoc_metric.py:208-213).
    """
    if label_type == LabelType.MultiLabel:
        return jnp.power(2.0, labels) - 1.0
    elif label_type == LabelType.Permutation:
        return labels
    raise NotImplementedError(label_type)


def masked_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over valid entries only; padded entries get probability 0."""
    x = jnp.where(mask, x, PAD_SCORE)
    out = jax.nn.softmax(x, axis=axis)
    return jnp.where(mask, out, 0.0)


def masked_log_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """log_softmax over valid entries; padded entries are 0 (callers mask products)."""
    x = jnp.where(mask, x, PAD_SCORE)
    out = jax.nn.log_softmax(x, axis=axis)
    return jnp.where(mask, out, 0.0)
