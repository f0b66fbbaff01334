"""Optimizer factory: optax chains matching the reference's torch semantics.

Reference config_optimizer (ptranking/base/ranker.py:512-525): Adam / RMSprop /
Adagrad with coupled L2 weight decay (torch adds wd*p to the gradient BEFORE
the moment updates — not decoupled AdamW), plus StepLR(step_size=20, gamma=0.5)
stepped once per epoch.

The learning rate is injected as mutable optimizer-state hyperparameter so the
per-epoch StepLR decay never retriggers a jit compile: the host updates
opt_state.hyperparams['learning_rate'] between epochs.
"""

from __future__ import annotations

import dataclasses

import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    opt: str = "Adam"  # Adam | RMS | Adagrad
    lr: float = 1e-4
    weight_decay: float = 1e-3
    lr_step_size: int = 20  # epochs per decay step
    lr_gamma: float = 0.5


def _torch_like_core(opt: str) -> optax.GradientTransformation:
    if opt == "Adam":
        # torch Adam defaults: betas (0.9, 0.999), eps 1e-8
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    if opt == "RMS":
        # torch RMSprop defaults: alpha 0.99, eps 1e-8
        return optax.scale_by_rms(decay=0.99, eps=1e-8)
    if opt == "Adagrad":
        # torch Adagrad defaults: initial_accumulator_value 0, eps 1e-10
        return optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10)
    raise NotImplementedError(opt)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    def build(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),  # coupled L2, torch-style
            _torch_like_core(cfg.opt),
            optax.scale(-1.0),
            optax.scale_by_learning_rate(learning_rate, flip_sign=False),
        )

    return optax.inject_hyperparams(build)(learning_rate=cfg.lr)


def epoch_lr(cfg: OptimizerConfig, epoch_k: int) -> float:
    """StepLR(step_size, gamma) evaluated at 1-based epoch counter.

    Reference steps the scheduler after each epoch (ltr.py:335), so epoch e
    trains at lr * gamma^((e-1)//step_size).
    """
    return cfg.lr * (cfg.lr_gamma ** ((epoch_k - 1) // cfg.lr_step_size))


def set_lr(opt_state, lr: float):
    """Write the learning rate into injected hyperparams (no recompile)."""
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=getattr(cur, "dtype", jnp.float32))
    return opt_state
