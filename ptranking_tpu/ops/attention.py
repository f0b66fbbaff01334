"""Blockwise (flash-style) masked attention for ultra-long candidate lists.

The listwise scorer's MHSA materialises an [B, H, N, N] matrix per layer
(models/scorers/listsf.py mhsa_apply) — at N in the thousands that dominates
HBM. This module computes the same masked softmax attention with an online
running-max softmax over key blocks (`jax.lax.scan`), with each block step
rematerialised (`jax.checkpoint`) so neither the forward nor the backward
ever holds more than one [*, N, block] slab: O(N * block) memory instead of
O(N^2).

Semantics match mhsa_apply's core exactly: masked keys get logit -1e9 (so a
fully-masked row degrades to uniform attention, same as the dense path), fp32
logits/accumulators, output in the input dtype. The multi-chip counterpart is
parallel/ring.ring_attention (same math, ppermute instead of scan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def blockwise_attention(
    q: jnp.ndarray,      # [B, H, N, d]
    k: jnp.ndarray,      # [B, H, N, d]
    v: jnp.ndarray,      # [B, H, N, d]
    mask: jnp.ndarray,   # [B, N] key mask
    block_size: int = 512,
) -> jnp.ndarray:
    B, H, N, d = q.shape
    block = min(block_size, N)
    rem = (-N) % block
    if rem:  # pad the KEY axis; padded keys are masked out
        pad = [(0, 0), (0, 0), (0, rem), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, rem)])
    nk = k.shape[2] // block

    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    k_blocks = k.reshape(B, H, nk, block, d).transpose(2, 0, 1, 3, 4)
    v_blocks = v.reshape(B, H, nk, block, d).transpose(2, 0, 1, 3, 4)
    m_blocks = mask.reshape(B, nk, block).transpose(1, 0, 2)

    @jax.checkpoint  # recompute the block logits in the backward pass
    def step(carry, blk):
        num, den, mx = carry
        kb, vb, mb = blk
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, kb,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mb[:, None, None, :], logits, _NEG)
        bm = jnp.max(logits, axis=-1)
        new_mx = jnp.maximum(mx, bm)
        alpha = jnp.exp(mx - new_mx)
        p = jnp.exp(logits - new_mx[..., None])
        num = num * alpha[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32)
        den = den * alpha + jnp.sum(p, axis=-1)
        return (num, den, new_mx), None

    init = (
        jnp.zeros((B, H, N, d), jnp.float32),
        jnp.zeros((B, H, N), jnp.float32),
        jnp.full((B, H, N), -jnp.inf, jnp.float32),
    )
    (num, den, _), _ = jax.lax.scan(step, init, (k_blocks, v_blocks, m_blocks))
    out = num / jnp.maximum(den, 1e-30)[..., None]
    return out.astype(q.dtype)
