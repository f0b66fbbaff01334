"""Blockwise (flash-style) masked attention for ultra-long candidate lists.

The listwise scorer's MHSA materialises an [B, H, N, N] matrix per layer
(models/scorers/listsf.py mhsa_apply) — at N in the thousands that dominates
HBM. This module computes the same masked softmax attention with an online
running-max softmax over key blocks (`jax.lax.scan`), with each block step
rematerialised (`jax.checkpoint`) so neither the forward nor the backward
ever holds more than one [*, N, block] slab: O(N * block) memory instead of
O(N^2).

Semantics match mhsa_apply's dense core for real query rows: masked keys get
logit -1e9, fp32 logits/accumulators, output in the input dtype, and
attention-probability dropout is supported exactly (dropping the unnormalised
numerator terms equals dropping the normalised probabilities, since the
denominator is unaffected by dropout in the dense path too). Fully-masked
query rows are garbage by contract in both paths (the dense path spreads
uniform weight over N keys, this path over N plus key padding) — every
consumer applies the mask. The multi-chip counterpart is
parallel/ring.ring_attention, which shares the block math below.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG = -1e9


def sdpa_block(q, k, v, kmask, scale) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One (q-block, kv-block) partial attention: returns (num, denom, m).

    q: [B, H, nq, d]; k/v: [B, H, nk, d]; kmask: [B, nk].
    num   = sum_j exp(logit_j - m) v_j      [B, H, nq, d]
    denom = sum_j exp(logit_j - m)          [B, H, nq]
    m     = max_j logit_j                   [B, H, nq]
    Shared by blockwise_attention (scan over local blocks) and
    parallel/ring.ring_attention (ppermute over remote blocks).
    """
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[:, None, None, :], logits, _NEG)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    denom = jnp.sum(p, axis=-1)
    num = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return num, denom, m


def _sdpa_block_dropped(q, k, v, kmask, scale, drop_rate, key):
    """sdpa_block with Bernoulli dropout on the NUMERATOR terms only — the
    exact blockwise equivalent of dense dropout(softmax(qk))v, because the
    dense path's denominator is also computed before dropout."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[:, None, None, :], logits, _NEG)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    denom = jnp.sum(p, axis=-1)
    keep = 1.0 - drop_rate
    keep_mask = jax.random.bernoulli(key, keep, p.shape)
    p_num = jnp.where(keep_mask, p / keep, 0.0)
    num = jnp.einsum("bhnm,bhmd->bhnd", p_num.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return num, denom, m


def online_combine(num, den, mx, part_num, part_den, part_m):
    """Fold one block's partial softmax into the running accumulators."""
    new_mx = jnp.maximum(mx, part_m)
    alpha = jnp.exp(mx - new_mx)
    beta = jnp.exp(part_m - new_mx)
    num = num * alpha[..., None] + part_num * beta[..., None]
    den = den * alpha + part_den * beta
    return num, den, new_mx


def blockwise_attention(
    q: jnp.ndarray,      # [B, H, N, d]
    k: jnp.ndarray,      # [B, H, N, d]
    v: jnp.ndarray,      # [B, H, N, d]
    mask: jnp.ndarray,   # [B, N] key mask
    block_size: int = 512,
    drop_rate: float = 0.0,
    key: Optional[jax.Array] = None,
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
    dropping = drop_rate > 0.0 and key is not None
    block_keys = (jax.random.split(key, nk) if dropping
                  else jnp.zeros((nk, 2), jnp.uint32))

    @jax.checkpoint  # recompute the block logits in the backward pass
    def step(carry, blk):
        num, den, mx = carry
        kb, vb, mb, bk = blk
        if dropping:
            part = _sdpa_block_dropped(q, kb, vb, mb, scale, drop_rate, bk)
        else:
            part = sdpa_block(q, kb, vb, mb, scale)
        return online_combine(num, den, mx, *part), None

    init = (
        jnp.zeros((B, H, N, d), jnp.float32),
        jnp.zeros((B, H, N), jnp.float32),
        jnp.full((B, H, N), -jnp.inf, jnp.float32),
    )
    (num, den, _), _ = jax.lax.scan(
        step, init, (k_blocks, v_blocks, m_blocks, block_keys))
    out = num / jnp.maximum(den, 1e-30)[..., None]
    return out.astype(q.dtype)


def flash_attention(
    q: jnp.ndarray,      # [B, H, N, d]
    k: jnp.ndarray,      # [B, H, N, d]
    v: jnp.ndarray,      # [B, H, N, d]
    mask: jnp.ndarray,   # [B, N] key mask
    block: int = 128,
) -> jnp.ndarray:
    """Fused Pallas flash attention for the masked MHSA (TPU only).

    Unlike blockwise_attention (a lax.scan whose [*, N, block] logits slabs
    still round-trip HBM), this runs jax's Pallas flash kernel: the scores
    tile lives only in VMEM, softmax is online, and the custom-VJP backward
    recomputes from (o, l, m) residuals — no [B, H, N, N] buffer in either
    pass. Doc-padding is expressed as segment ids (padded docs get segment 0,
    real docs 1), so real-query rows match the dense path's masked softmax;
    fully-padded rows are finite garbage by the same contract. Attention-
    probability dropout is not applied on this path (the matrix is never
    materialised — same contract as the CP ring path).

    Head dim is zero-padded to a 128-lane multiple (zero K columns leave
    scores unchanged; zero V columns are sliced off), the doc axis to a
    multiple of `block`; sm_scale uses the ORIGINAL head dim.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds)
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    B, H, N, d = q.shape
    scale = 1.0 / float(d) ** 0.5
    d_pad = (-d) % 128
    n_pad = (-N) % block
    if d_pad or n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, d_pad)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if n_pad:
        mask = jnp.pad(mask, [(0, 0), (0, n_pad)])
    seg = mask.astype(jnp.int32)
    bq = bk = min(block, q.shape[2])
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = _fa.flash_attention(
        q, k, v, segment_ids=SegmentIds(q=seg, kv=seg), causal=False,
        sm_scale=scale, block_sizes=sizes)
    return out[:, :, :N, :d].astype(q.dtype)
