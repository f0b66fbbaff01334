"""Pure-pytree neural-net building blocks: activations, masked norms, FFN stacks.

This is the TPU-native counterpart of reference ptranking/base/utils.py
(get_AF:101, LTRBatchNorm:201, LTRBatchNorm2:249, get_stacked_FFNet:288).
Design differences from the reference, all deliberate:

  * Modules are (init_fn, apply_fn) pairs over plain dict pytrees — no nn.Module
    graph, so params shard/donate cleanly under pjit and jit retraces only on
    shape/config changes.
  * Every op is mask-aware. The reference never pads (it bins queries by equal
    list length); we batch fixed-shape padded buckets, so normalisation
    statistics must exclude padded documents or they silently drift.
  * Both batch-norm variants are stateless. The reference's LTRBatchNorm wraps
    nn.BatchNorm1d with track_running_stats=False (utils.py:213) — i.e. batch
    statistics in train AND eval — so statelessness is exact there. For
    LTRBatchNorm2 (per-query stats, utils.py:227-282) the reference keeps
    moving averages for eval; we use per-query batch statistics in eval too
    (documented deviation: keeps the whole scorer a pure function, and a
    per-query normaliser has a full "batch" — the query's own docs — at eval).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

_BN_EPS = 1e-5
_LN_EPS = 1e-6


# ---------------------------------------------------------------------------
# Activations (reference get_AF, utils.py:101-143)
# ---------------------------------------------------------------------------

def _rrelu(x):  # eval-mode RReLU == LeakyReLU with the mean slope (1/8+1/3)/2
    return jnp.where(x >= 0, x, x * ((1.0 / 8.0 + 1.0 / 3.0) / 2.0))


_ACTIVATIONS: Dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "R": jax.nn.relu,
    "LR": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "RR": _rrelu,
    "E": jax.nn.elu,
    "SE": jax.nn.selu,
    "CE": jax.nn.celu,
    "GE": jax.nn.gelu,
    "S": jax.nn.sigmoid,
    "SW": jax.nn.silu,  # reference raises NotImplementedError; silu == swish
    "T": jnp.tanh,
    "ST": lambda x: jax.nn.softmax(x, axis=-1),
}


def get_af(af_str: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation by short string id (reference get_AF, utils.py:101-143)."""
    try:
        return _ACTIVATIONS[af_str]
    except KeyError:
        raise NotImplementedError(f"unknown activation id {af_str!r}")


# ---------------------------------------------------------------------------
# Linear layers (xavier-normal weights, zero bias — reference nr_init, utils.py:13)
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    std = math.sqrt(2.0 / (d_in + d_out))
    w = std * jax.random.normal(key, (d_in, d_out), dtype)
    return {"w": w, "b": jnp.zeros((d_out,), dtype)}


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:
        # int8 serving path (models/quantize.py): dynamic per-token
        # activation scales, int8 x int8 -> int32 on the MXU (2x bf16
        # peak), fp32 rescale by (a_t * s_c). Scales stay fp32 even under
        # bf16 compute — they carry the dynamic range.
        a_s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        a_s = jnp.maximum(a_s / 127.0, 1e-12)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                       -127, 127).astype(jnp.int8)
        acc = jnp.dot(x_q, p["w_q"], preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (a_s * p["w_s"].astype(jnp.float32))
             + p["b"].astype(jnp.float32))
        return y.astype(x.dtype)
    # MXU-native mixed precision: bf16 operands accumulate in fp32, then the
    # result returns to the activation dtype so the NEXT matmul stays bf16
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Masked normalisation
# ---------------------------------------------------------------------------

def batch_norm_init(num_features: int, affine: bool, dtype=jnp.float32) -> Params:
    if not affine:
        return {}
    return {"gamma": jnp.ones((num_features,), dtype), "beta": jnp.zeros((num_features,), dtype)}


def masked_batch_norm(
    p: Params, x: jnp.ndarray, mask: jnp.ndarray, per_query: bool = False
) -> jnp.ndarray:
    """Feature-wise batch norm over real documents only.

    per_query=False: statistics across ALL real docs in the batch — the
    TPU-native LTRBatchNorm (reference utils.py:201-223, biased variance as in
    torch.nn.BatchNorm1d).
    per_query=True: statistics per query across its own real docs — the
    TPU-native LTRBatchNorm2 (reference utils.py:227-282; see module docstring
    for the eval-mode deviation).

    x: [B, N, F]; mask: [B, N] bool.
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # statistics in fp32 even under bf16 compute
    m = mask[..., None].astype(x.dtype)  # [B, N, 1]
    if per_query:
        axes: Tuple[int, ...] = (1,)
    else:
        axes = (0, 1)
    count = jnp.maximum(jnp.sum(m, axis=axes, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=axes, keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=axes, keepdims=True) / count
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS)
    if "gamma" in p:
        y = y * p["gamma"].astype(x.dtype) + p["beta"].astype(x.dtype)
    # keep padded rows at zero so they cannot leak through later layers
    return (y * m).astype(in_dtype)


def layer_norm_init(num_features: int, dtype=jnp.float32) -> Params:
    return {"a": jnp.ones((num_features,), dtype), "b": jnp.zeros((num_features,), dtype)}


def layer_norm_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm matching reference list_ranker.py:152-174: normalises by the
    UNBIASED std (torch .std default) and adds eps to std (not variance)."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # statistics in fp32 even under bf16 compute
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / max(n - 1, 1)
    # grad-safe sqrt: a constant row (e.g. the all-zero output of an
    # all-padded query at init) has var == 0, where d/dv sqrt(v) = inf would
    # leak NaN into EVERY parameter's gradient. The double-where keeps the
    # forward identical and routes the backward through the safe branch.
    safe = var > 0
    std = jnp.where(safe, jnp.sqrt(jnp.where(safe, var, 1.0)), 0.0)
    a = p["a"].astype(x.dtype)
    b = p["b"].astype(x.dtype)
    return (a * (x - mean) / (std + _LN_EPS) + b).astype(in_dtype)


def dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    if not training or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    keep_mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(keep_mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Stacked feed-forward network (reference get_stacked_FFNet, utils.py:288-355)
# ---------------------------------------------------------------------------

def ffn_init(
    key: jax.Array,
    ff_dims: Sequence[int],
    BN: bool = True,
    bn_affine: bool = False,
    apply_tl_af: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Per-layer layout mirrors the reference: hidden layers are
    dropout -> linear -> [BN] -> AF; the last layer is linear -> [BN -> TL_AF]
    when apply_tl_af (utils.py:298-333, 340-355)."""
    assert len(ff_dims) >= 2
    n_linear = len(ff_dims) - 1
    keys = jax.random.split(key, n_linear)
    layers: List[Params] = []
    for i in range(n_linear - 1):
        lp: Params = {"linear": linear_init(keys[i], ff_dims[i], ff_dims[i + 1], dtype)}
        if BN:
            lp["bn"] = batch_norm_init(ff_dims[i + 1], bn_affine, dtype)
        layers.append(lp)
    last: Params = {"linear": linear_init(keys[-1], ff_dims[-2], ff_dims[-1], dtype)}
    if apply_tl_af and BN:
        last["bn"] = batch_norm_init(ff_dims[-1], bn_affine, dtype)
    layers.append(last)
    return {"layers": layers}


def ffn_apply(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    AF: str = "R",
    TL_AF: str = "S",
    apply_tl_af: bool = False,
    BN: bool = True,
    bn_per_query: bool = False,
    drop_rate: float = 0.1,
    training: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """x: [B, N, d_in] -> [B, N, d_out]."""
    af = get_af(AF)
    layers = p["layers"]
    n_hidden = len(layers) - 1
    keys = (
        jax.random.split(key, n_hidden) if (training and key is not None and n_hidden) else None
    )
    for i in range(n_hidden):
        lp = layers[i]
        x = dropout(keys[i] if keys is not None else None, x, drop_rate, training)
        x = linear_apply(lp["linear"], x)
        if BN:
            x = masked_batch_norm(lp["bn"], x, mask, per_query=bn_per_query)
        x = af(x)
    last = layers[-1]
    x = linear_apply(last["linear"], x)
    if apply_tl_af:
        if BN:
            x = masked_batch_norm(last["bn"], x, mask, per_query=bn_per_query)
        x = get_af(TL_AF)(x)
    return x
