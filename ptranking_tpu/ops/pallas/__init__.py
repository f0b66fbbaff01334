"""Pallas TPU kernels for the hot ops (lax fallbacks live in ops/)."""

from ptranking_tpu.ops.pallas.pairwise import (
    lambda_rank_pallas,
    pairwise_lambda_loss_pallas,
    ranknet_pallas,
)
from ptranking_tpu.ops.pallas.sinkhorn import sinkstep_pallas

__all__ = [
    "lambda_rank_pallas",
    "pairwise_lambda_loss_pallas",
    "ranknet_pallas",
    "sinkstep_pallas",
]
