"""Seeded fuzz over the loss zoo: the padding/masking contract must hold for
EVERY loss at random shapes, ragged masks, all-padded rows and single-doc
queries — not just the fixed batch test_losses.py pins.

Contract (losses/listwise.py module docstring): labels arrive presorted
descending with pads at the tail; every loss is mask-invariant and padded
slots never receive gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptranking_tpu.losses import DEFAULT_PARAS, LOSSES, STOCHASTIC, get_loss

KEY = jax.random.PRNGKey(99)


def _fuzz_batch(rng):
    B = int(rng.randint(1, 5))
    N = int(rng.randint(2, 25))
    scores = jnp.asarray(rng.randn(B, N).astype(np.float32))
    # real lengths: allow 0 (all-padded remainder row) and 1 (single doc)
    n = rng.randint(0, N + 1, size=B)
    if (n == 0).all():
        n[0] = max(1, N // 2)  # at least one real query in the batch
    mask = jnp.asarray(np.arange(N)[None, :] < n[:, None])
    labels = rng.randint(0, 4, size=(B, N)).astype(np.float32)
    labels = np.sort(labels, axis=1)[:, ::-1]  # presorted desc (contract)
    labels = jnp.asarray(np.where(np.asarray(mask), labels, 0.0))
    return scores, labels, mask


def _call(model_id, scores, labels, mask):
    kw = {"key": KEY} if model_id in STOCHASTIC else {}
    return get_loss(model_id)(scores, labels, mask,
                              **DEFAULT_PARAS[model_id], **kw)


@pytest.mark.parametrize("seed", range(4))
def test_zoo_fuzz_pad_content_and_grads(seed):
    rng = np.random.RandomState(seed)
    scores, labels, mask = _fuzz_batch(rng)
    junk_s = jnp.where(mask, scores, jnp.asarray(rng.randn() * 50.0))
    junk_l = jnp.where(mask, labels, 3.0)
    for model_id in sorted(LOSSES):
        v1 = _call(model_id, scores, labels, mask)
        assert bool(jnp.isfinite(v1)), (model_id, seed)
        v2 = _call(model_id, junk_s, junk_l, mask)
        assert jnp.allclose(v1, v2, rtol=1e-4, atol=1e-5), (model_id, seed, v1, v2)
        g = jax.grad(lambda s: _call(model_id, s, labels, mask))(scores)
        assert bool(jnp.all(jnp.isfinite(g))), (model_id, seed)
        assert bool(jnp.all(jnp.where(mask, 0.0, g) == 0.0)), (model_id, seed)


@pytest.mark.parametrize("seed", range(4))
def test_zoo_fuzz_pad_width(seed):
    rng = np.random.RandomState(seed + 100)
    scores, labels, mask = _fuzz_batch(rng)
    pad = int(rng.randint(1, 7))
    B = scores.shape[0]
    s2 = jnp.concatenate([scores, jnp.full((B, pad), -9.9)], axis=1)
    l2 = jnp.concatenate([labels, jnp.full((B, pad), 2.0)], axis=1)
    m2 = jnp.concatenate([mask, jnp.zeros((B, pad), bool)], axis=1)
    for model_id in sorted(set(LOSSES) - STOCHASTIC):
        v1 = _call(model_id, scores, labels, mask)
        v2 = _call(model_id, s2, l2, m2)
        assert jnp.allclose(v1, v2, rtol=1e-4, atol=2e-4), (model_id, seed, v1, v2)
