"""Training layer: optimizer factory + AdhocRanker lifecycle."""

from ptranking_tpu.train.optimizer import OptimizerConfig, epoch_lr, make_optimizer, set_lr
from ptranking_tpu.train.ranker import AdhocRanker

__all__ = ["OptimizerConfig", "epoch_lr", "make_optimizer", "set_lr", "AdhocRanker"]
