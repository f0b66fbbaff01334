"""Experiment orchestration: settings, tapes, k-fold CV evaluator."""

from ptranking_tpu.eval.settings import DataSetting, EvalSetting, ModelSetting, SFSetting
from ptranking_tpu.eval.tapes import CVTape, OptLossTape, SummaryTape, ValidationTape
from ptranking_tpu.eval.evaluator import LTR_ADHOC_MODELS, LTREvaluator

__all__ = [
    "DataSetting", "EvalSetting", "ModelSetting", "SFSetting",
    "CVTape", "OptLossTape", "SummaryTape", "ValidationTape",
    "LTR_ADHOC_MODELS", "LTREvaluator",
]
