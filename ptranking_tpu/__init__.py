"""ptranking_tpu — a TPU-native learning-to-rank framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of wildltr/ptranking
(reference layout documented in SURVEY.md). The compute path is pure JAX traced
once per (bucket-shape, loss, scorer) triple; variable-length candidate lists are
handled with fixed-shape padded buckets plus boolean masks (the reference instead
bins queries by identical list length, cf. reference ptranking/data/data_utils.py:683).
"""

__version__ = "0.1.0"

# Global constants mirroring reference ptranking/ltr_global.py:7-10.
LTR_SEED = 137
EPSILON = 1e-8
# Large-negative sentinel used to push padded documents to the tail of any
# descending sort. Finite (not -inf) so arithmetic on sorted scores stays NaN-free.
PAD_SCORE = -1e9
