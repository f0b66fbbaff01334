"""Cumulative log-sum-exp (the ListMLE workhorse).

The reference implements this as a custom autograd op and as an inline
flip-cumsum (ptranking/ltr_adhoc/listwise/listmle.py:14-62, 92-97). In JAX the
flip-cumsum formulation differentiates automatically and XLA keeps it on-chip.
"""

import jax.numpy as jnp

from ptranking_tpu import PAD_SCORE


def logcumsumexp_reverse(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """out[b, i] = log(sum_{j >= i, mask_j} exp(x[b, j])), padded entries excluded.

    Assumes padded entries may appear anywhere; they contribute exp(-inf)=0.
    Max-subtraction mirrors the reference's stability trick (listmle.py:92-97).
    """
    neg = jnp.where(mask, x, PAD_SCORE)
    m = jnp.max(neg, axis=-1, keepdims=True)
    y = jnp.where(mask, jnp.exp(neg - m), 0.0)
    rev_cumsum = jnp.flip(jnp.cumsum(jnp.flip(y, axis=-1), axis=-1), axis=-1)
    return jnp.log(jnp.maximum(rev_cumsum, 1e-30)) + m
