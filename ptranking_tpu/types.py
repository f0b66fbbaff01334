"""Core typed containers shared across the framework.

The reference passes raw `[batch, num_docs, num_features]` tensors plus implicit
"every batch has one list length" invariants (reference
ptranking/data/data_utils.py:553-742). Here every batch carries an explicit
boolean mask so that fixed-shape padded buckets compile once per bucket on TPU.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax.numpy as jnp


class LabelType(enum.Enum):
    """Mirrors reference LABEL_TYPE (ptranking/data/data_utils.py): gain convention."""

    MultiLabel = 1  # gain = 2^label - 1
    Permutation = 2  # gain = label


class RankingBatch(NamedTuple):
    """One batch of padded query lists.

    features: [B, N, F] float — per-document feature vectors (0 for padding)
    labels:   [B, N]    float — graded relevance (0 for padding)
    mask:     [B, N]    bool  — True for real documents
    qids:     optional [B] int — query ids (host-side bookkeeping only)
    """

    features: jnp.ndarray
    labels: jnp.ndarray
    mask: jnp.ndarray
    qids: Optional[jnp.ndarray] = None

    @property
    def num_queries(self) -> int:
        return self.features.shape[0]

    @property
    def list_size(self) -> int:
        return self.features.shape[1]

    @property
    def num_features(self) -> int:
        return self.features.shape[2]
