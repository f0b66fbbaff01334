"""Scorers (pointwise FFN / listwise MHSA encoder) and the loss zoo."""

from ptranking_tpu.models.scorers import (
    ScorerConfig,
    init_scorer,
    apply_scorer,
)

__all__ = ["ScorerConfig", "init_scorer", "apply_scorer"]
