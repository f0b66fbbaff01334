"""Int8 weight quantization for serving: the MXU's 2x-peak integer path.

TPU MXUs execute int8 x int8 -> int32 matmuls at twice the bf16 rate, and
int8 weights quarter the HBM traffic per layer — for the scorer's dense
pipeline (head/tail FFNs + QKV/out/FFN projections, all routed through
models/scorers/nn.py::linear_apply) that is the whole serving FLOP budget.
The attention's QK^T/AV einsums stay floating point (standard weight-only
dynamic quantization: activations are quantized on the fly per token).

Scheme (symmetric, zero-point-free — MXU-native):
  * weights: per-OUTPUT-CHANNEL scale s_c = max|w[:, c]| / 127,
    w_q = round(w / s_c) in [-127, 127] (int8).
  * activations: dynamic per-token scale a_t = max|x[t, :]| / 127 computed
    inside the compiled program, x_q = round(x / a_t) (int8).
  * y = (x_q @ w_q) [int32 accumulate] * (a_t * s_c) + b  [fp32].

`quantize_scorer_params` rewrites every linear {"w", "b"} leaf-dict of a
scorer tree to {"w_q", "w_s", "b"}; linear_apply dispatches on the keys, so
the same apply_scorer / export / scoring paths serve quantized params with
no other change. Training is not supported on quantized trees (rounding has
no gradient) — use AdhocRanker.quantized() for an inference-only view.

The reference has no inference path at all outside its evaluators
(SURVEY §2.9); this is serving-side functionality the TPU design adds.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np


def quantize_linear(p: dict) -> dict:
    """{"w": [d_in, d_out], "b"} -> {"w_q" int8, "w_s" f32 [d_out], "b"}."""
    w = np.asarray(p["w"], np.float32)
    s = np.max(np.abs(w), axis=0) / 127.0
    s = np.maximum(s, 1e-12)  # all-zero channels: keep the scale finite
    w_q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return {"w_q": jnp.asarray(w_q), "w_s": jnp.asarray(s, jnp.float32),
            "b": jnp.asarray(np.asarray(p["b"], np.float32))}


def is_quantized(params: Any) -> bool:
    found = []

    def walk(t):
        if isinstance(t, dict):
            if "w_q" in t:
                found.append(True)
            for v in t.values():
                walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)

    walk(params)
    return bool(found)


def quantize_scorer_params(params: Any) -> Any:
    """Rewrite every linear leaf ({"w", "b"} dict) to its int8 form; norm
    params, embeddings and anything else pass through untouched."""
    if isinstance(params, dict):
        if set(params) == {"w", "b"}:
            return quantize_linear(params)
        return {k: quantize_scorer_params(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(quantize_scorer_params(v) for v in params)
    return params
