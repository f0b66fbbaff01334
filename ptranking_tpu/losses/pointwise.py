"""Pointwise losses."""

import jax.numpy as jnp


def rank_mse(scores, labels, mask, **_):
    """Masked MSE: sum over docs, mean over queries.

    Mirrors reference rankMSE_loss_function
    (ptranking/ltr_adhoc/pointwise/rank_mse.py:10-20).
    """
    sq = jnp.square(scores - labels)
    per_query = jnp.sum(jnp.where(mask, sq, 0.0), axis=-1)
    # mean over REAL queries only: all-padded remainder rows of a bucketed
    # batch must not inflate the denominator (the reference never pads, so its
    # torch.mean over the batch axis sees real queries only)
    real = jnp.sum(jnp.any(mask, axis=-1).astype(per_query.dtype))
    return jnp.sum(per_query) / jnp.maximum(real, 1.0)
