"""Adversarial base: players (G/D) and the minimax machine protocol.

Counterpart of reference ptranking/ltr_adversarial/base/{ad_machine.py,
ad_player.py}. A player is an AdhocRanker-shaped bundle (scorer params +
optimizer + compiled predict); machines own one jitted G-step and one jitted
D-step per bucket shape — the reference's per-query Python loops
(irgan_point.py:116-220) become single batched device steps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer
from ptranking_tpu.train.optimizer import OptimizerConfig, make_optimizer
from ptranking_tpu.train.ranker import AdhocRanker


class AdversarialPlayer(AdhocRanker):
    """G/D are AdhocNeuralRankers in the reference (ad_player.py:6-12); here
    they are AdhocRankers with a score temperature (irgan_point.py:23-33)."""

    def __init__(self, scorer_cfg: ScorerConfig, opt_cfg: Optional[OptimizerConfig] = None,
                 temperature: Optional[float] = None, seed: int = 137):
        # RankMSE is a placeholder loss: players train through machine steps
        super().__init__("RankMSE", scorer_cfg, opt_cfg=opt_cfg, seed=seed)
        self.temperature = temperature

    def predict_scaled(self, params, features, mask):
        scores = apply_scorer(params, self.scorer_cfg, features, mask, training=False)
        if self.temperature is not None and self.temperature != 1.0:
            scores = scores / self.temperature
        return scores


class AdversarialMachine:
    """Abstract minimax trainer (reference ad_machine.py:5-55)."""

    def __init__(self, sf_para: Dict[str, Any], ad_para_dict: Dict[str, Any]):
        self.ad_para_dict = ad_para_dict

    def pre_check(self):
        pass

    def burn_in(self, train_data=None):
        pass

    def fill_global_buffer(self, train_data=None):
        pass

    def mini_max_train(self, train_data=None) -> bool:
        raise NotImplementedError

    def reset_generator(self):
        self.generator.init()

    def reset_discriminator(self):
        self.discriminator.init()

    def reset_generator_discriminator(self):
        self.reset_generator()
        self.reset_discriminator()

    def get_generator(self) -> AdversarialPlayer:
        return self.generator

    def get_discriminator(self) -> AdversarialPlayer:
        return self.discriminator
