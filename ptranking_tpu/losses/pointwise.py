"""Pointwise losses."""

import jax.numpy as jnp


def rank_mse(scores, labels, mask, **_):
    """Masked MSE: sum over docs, mean over queries.

    Mirrors reference rankMSE_loss_function
    (ptranking/ltr_adhoc/pointwise/rank_mse.py:10-20).
    """
    sq = jnp.square(scores - labels)
    per_query = jnp.sum(jnp.where(mask, sq, 0.0), axis=-1)
    return jnp.mean(per_query)
