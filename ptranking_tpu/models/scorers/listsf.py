"""Listwise (permutation-equivariant) scorer: FFN head -> MHSA encoder -> FFN tail.

TPU-native re-design of reference ptranking/base/list_ranker.py:176-401. The
three encoder wirings are kept behaviourally identical (AllRank pre-norm
residual, DASALC post-norm latent cross, AttnDIN post-norm residual;
list_ranker.py:118-149, 351-378), with two TPU-first changes:

  * Attention logits are masked on the key axis so padded documents receive
    zero attention weight (the reference never pads, list_ranker.py:232-245).
  * QKV projections run as one fused [F, 3F] matmul per layer — one MXU pass
    instead of three — and attention math stays in fp32 accumulation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ptranking_tpu import PAD_SCORE
from ptranking_tpu.models.scorers.nn import (
    Params,
    dropout,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
)


def mhsa_init(key: jax.Array, hid_dim: int, dtype=jnp.float32) -> Params:
    k_qkv, k_fc = jax.random.split(key)
    # fused QKV: equivalent to the reference's separate w_q/w_k/w_v
    # (list_ranker.py:190-200) but a single MXU-friendly matmul.
    import math

    std = math.sqrt(2.0 / (hid_dim + hid_dim))  # xavier per-projection fan
    w = std * jax.random.normal(k_qkv, (hid_dim, 3 * hid_dim), dtype)
    return {
        "qkv": {"w": w, "b": jnp.zeros((3 * hid_dim,), dtype)},
        "fc": linear_init(k_fc, hid_dim, hid_dim, dtype),
    }


def mhsa_apply(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    n_heads: int,
    drop_rate: float = 0.1,
    training: bool = False,
    key: Optional[jax.Array] = None,
    attn_block_size: Optional[int] = None,
    cp=None,
    flash: bool = False,
) -> jnp.ndarray:
    """Masked multi-head self-attention over the document axis.

    x: [B, N, F]; mask: [B, N]. Mirrors reference MultiheadAttention.forward
    (list_ranker.py:208-254) plus key-axis masking.

    cp (a parallel.ring.CPPlan) routes the attention through the doc-axis
    context-parallel exchange (ring ppermute or Ulysses all-to-all) so only
    N/P-sized blocks of the [B, H, N, N] matrix ever exist per device.
    Attention-probability dropout is skipped under CP (the matrix is never
    materialised — same contract as flash attention).
    """
    B, N, F = x.shape
    d_head = F // n_heads
    qkv = linear_apply(p["qkv"], x)  # [B, N, 3F]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [B, N, F] -> [B, H, N, d]
        return t.reshape(B, N, n_heads, d_head).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if cp is not None:
        from ptranking_tpu.parallel.ring import ring_attention, ulysses_attention

        fn = ring_attention if cp.impl == "ring" else ulysses_attention
        out = fn(q, k, v, mask, cp.mesh, axis_name=cp.axis_name,
                 batch_axis=cp.batch_axis)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, F)
        return linear_apply(p["fc"], out)
    if flash:
        # fused Pallas flash kernel on TPU (scores tile never leaves VMEM);
        # any other lowering platform gets the blockwise lax path with the
        # SAME semantics (attention-prob dropout skipped by contract on both
        # — see ops/attention.py). The choice is made PER LOWERING PLATFORM
        # (lax.platform_dependent), not from the trace host's backend, so a
        # cross-platform StableHLO export (ptranking_tpu.export, platforms=
        # cpu,tpu) bakes the right kernel into each platform's program.
        from ptranking_tpu.ops.attention import (blockwise_attention,
                                                 flash_attention)

        out = jax.lax.platform_dependent(
            q, k, v, mask,
            tpu=lambda q, k, v, m: flash_attention(q, k, v, m),
            default=lambda q, k, v, m: blockwise_attention(
                q, k, v, m, block_size=min(128, max(N, 1))),
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, F)
        return linear_apply(p["fc"], out)
    if attn_block_size is not None and N > attn_block_size:
        # flash-style blockwise path for ultra-long lists: O(N*block) memory;
        # attention-probability dropout is applied inside the blocks (exact
        # dense equivalence — see ops/attention.py)
        from ptranking_tpu.ops.attention import blockwise_attention

        out = blockwise_attention(
            q, k, v, mask, block_size=attn_block_size,
            drop_rate=drop_rate if training else 0.0,
            key=key if training else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, F)
        return linear_apply(p["fc"], out)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(d_head, jnp.float32))
    logits = jnp.where(mask[:, None, None, :], logits, PAD_SCORE)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)  # softmax fp32
    attn = dropout(key, attn, drop_rate, training)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, F)
    return linear_apply(p["fc"], out)


def pff_init(key: jax.Array, num_features: int, hid_dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "w1": linear_init(k1, num_features, hid_dim, dtype),
        "w2": linear_init(k2, hid_dim, num_features, dtype),
    }


def pff_apply(
    p: Params,
    x: jnp.ndarray,
    drop_rate: float = 0.1,
    training: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Position-wise FFN (reference PositionwiseFeedForward, list_ranker.py:256-277)."""
    h = jax.nn.relu(linear_apply(p["w1"], x))
    h = dropout(key, h, drop_rate, training)
    return linear_apply(p["w2"], h)


def encoder_init(
    key: jax.Array,
    num_features: int,
    n_layers: int,
    encoder_type: str,
    dtype=jnp.float32,
) -> Params:
    """L encoder layers. Unlike the reference (which deep-copies ONE randomly
    initialised layer L times, list_ranker.py:50-52 make_clones — all layers
    share initial weights), each layer gets an independent init; weights are
    untied in both designs, so this only changes the starting point."""
    layers = []
    keys = jax.random.split(key, n_layers)
    for lk in keys:
        k_mhsa, k_fc, _ = jax.random.split(lk, 3)
        layer: Dict[str, Params] = {"mhsa": mhsa_init(k_mhsa, num_features, dtype)}
        if encoder_type == "AllRank":
            layer["fc"] = pff_init(k_fc, num_features, num_features, dtype)
            layer["ln1"] = layer_norm_init(num_features, dtype)
            layer["ln2"] = layer_norm_init(num_features, dtype)
        else:  # DASALC / AttnDIN: single post-norm sublayer
            layer["ln"] = layer_norm_init(num_features, dtype)
        layers.append(layer)
    enc: Params = {"layers": layers}
    if encoder_type == "AllRank":
        enc["final_ln"] = layer_norm_init(num_features, dtype)
    return enc


def encoder_apply(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    n_heads: int,
    encoder_type: str,
    drop_rate: float = 0.1,
    training: bool = False,
    key: Optional[jax.Array] = None,
    remat: bool = False,
    attn_block_size: Optional[int] = None,
    cp=None,
    flash: bool = False,
) -> jnp.ndarray:
    """Encoder wiring per variant (reference Encoder/EncoderLayer/
    SublayerConnection, list_ranker.py:53-149):

      AllRank: x + drop(MHSA(LN(x))); x + drop(FC(LN(x))); final LN
      DASALC:  LN(MHSA(x))
      AttnDIN: LN(x + MHSA(x))
    """
    n_layers = len(p["layers"])
    keys = jax.random.split(key, 4 * n_layers) if (training and key is not None) else None

    def k(i):
        return keys[i] if keys is not None else None

    def one_layer(layer, x, k0, k1, k2, k3):
        """Apply ONE encoder layer (shared by the unrolled and scan paths)."""
        if encoder_type == "AllRank":
            h = layer_norm_apply(layer["ln1"], x)
            h = mhsa_apply(layer["mhsa"], h, mask, n_heads, drop_rate, training, k0, attn_block_size, cp, flash)
            x = x + dropout(k1, h, drop_rate, training)
            h = layer_norm_apply(layer["ln2"], x)
            h = pff_apply(layer["fc"], h, drop_rate, training, k2)
            x = x + dropout(k3, h, drop_rate, training)  # independent of k1
        elif encoder_type == "DASALC":
            h = mhsa_apply(layer["mhsa"], x, mask, n_heads, drop_rate, training, k0, attn_block_size, cp, flash)
            x = layer_norm_apply(layer["ln"], h)
        elif encoder_type == "AttnDIN":
            h = mhsa_apply(layer["mhsa"], x, mask, n_heads, drop_rate, training, k0, attn_block_size, cp, flash)
            x = layer_norm_apply(layer["ln"], x + h)
        else:
            raise NotImplementedError(encoder_type)
        return x

    # remat: recompute each layer's activations in the backward pass instead
    # of keeping the [B, H, N, N] attention intermediates alive across the
    # whole stack — trades FLOPs for HBM so very long lists fit on-chip
    apply_one = jax.checkpoint(one_layer) if remat else one_layer
    for li, layer in enumerate(p["layers"]):
        x = apply_one(layer, x, k(4 * li), k(4 * li + 1), k(4 * li + 2), k(4 * li + 3))
    # guarded so partial-stack callers (the GPipe pipeline feeds one layer at
    # a time) can apply the final LN themselves, once
    if encoder_type == "AllRank" and "final_ln" in p:
        x = layer_norm_apply(p["final_ln"], x)
    return x
