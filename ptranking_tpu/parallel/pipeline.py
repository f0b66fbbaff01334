"""Pipeline parallelism (PP): GPipe-style microbatch pipelining over the
listwise encoder's layer stack.

The reference runs its L encoder layers sequentially on one device
(Encoder.layers loop, base/list_ranker.py:69-79). Here the stack is cut into
P stages laid out across the mesh's `model` axis; microbatches flow through
the classic GPipe schedule — at tick t, stage s processes microbatch t-s while
`jax.lax.ppermute` rotates activations to the next stage over ICI. Deliberate
scope (SURVEY §2.10 lists PP as provide-but-deprioritise): the encoder stack
is shallow in practice, so this is the mechanism plus correctness tests, not
a tuned schedule — bubble ticks compute garbage that is simply not collected.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from ptranking_tpu.parallel._compat import SM_NOCHECK as _SM_NOCHECK, shard_map
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class PPPlan:
    """Routing plan handed to apply_scorer(pp=...): stage the listsf encoder
    as a GPipe pipeline over `axis_name` (DistributedTrainer(pp_stages=k)).
    Inference-only — the training path keeps DP/TP/CP (docs/parallel.md)."""

    mesh: Mesh
    num_microbatches: int = 4
    axis_name: str = "model"


def gpipe(
    stage_fn: Callable,
    stage_params,
    xs: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
):
    """Run `stage_fn` as a P-stage pipeline over `axis_name`.

    stage_fn(local_params, x) -> y with y.shape == x.shape (stage i applies
    its own slice of layers; local_params is stage_params indexed at the
    stage's position on the leading axis).
    stage_params: pytree whose leaves have leading axis P (one slice per
    stage).
    xs: [M, ...] microbatches; every microbatch flows through all P stages in
    order. Returns [M, ...] outputs.
    """
    num_stages = mesh.shape[axis_name]
    M = xs.shape[0]
    T = M + num_stages - 1  # total ticks incl. pipeline fill/drain

    def per_device(local_params, xs_local):
        # local_params leaves: [1, ...] (this stage's slice); drop the axis
        local_params = jax.tree_util.tree_map(lambda a: a[0], local_params)
        idx = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def tick(prev_out, t):
            recv = jax.lax.ppermute(prev_out, axis_name, perm)
            mb = jnp.clip(t - idx, 0, M - 1)
            x_in = jnp.where(idx == 0, xs_local[mb], recv)
            out = stage_fn(local_params, x_in)
            return out, out

        _, outs = jax.lax.scan(tick, jnp.zeros_like(xs_local[0]), jnp.arange(T))
        # only the LAST stage's outputs are pipeline results; emit its slice
        # from every device (identical shape), caller reads stage P-1's copy
        return outs[None]  # [1, T, ...]

    spec_params = jax.tree_util.tree_map(
        lambda _: P(axis_name), stage_params)
    out = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_params, P()),          # xs replicated to all stages
        out_specs=P(axis_name),               # [P, T, ...] stacked by stage
        **_SM_NOCHECK,
    )(stage_params, xs)
    # stage P-1 produced microbatch m at tick m + (P-1)
    return out[num_stages - 1, num_stages - 1:]


def gpipe_reference(stage_fn, stage_params, xs):
    """Sequential oracle: every microbatch through all stages in order."""
    num_stages = jax.tree_util.tree_leaves(stage_params)[0].shape[0]

    def full(x):
        for s in range(num_stages):
            local = jax.tree_util.tree_map(lambda a: a[s], stage_params)
            x = stage_fn(local, x)
        return x

    return jax.vmap(full)(xs)


def stack_encoder_layers(encoder_params):
    """[{layer}, {layer}, ...] -> one pytree with leading axis L (layers must
    be structurally identical, which holds for DASALC/AttnDIN; AllRank's
    final_ln lives outside the stack and is applied by the caller)."""
    layers = encoder_params["layers"]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_encoder_apply(
    encoder_params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    n_heads: int,
    encoder_type: str,
    mesh: Mesh,
    num_microbatches: int = 4,
    axis_name: str = "model",
):
    """The listsf encoder (models/scorers/listsf.py encoder_apply) as a GPipe
    pipeline: layer stack cut into mesh.shape[axis_name] stages, batch cut
    into microbatches. Inference-mode (training dropout stays single-device)."""
    from ptranking_tpu.models.scorers import listsf as _listsf

    stacked = stack_encoder_layers(encoder_params)
    L = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    num_stages = mesh.shape[axis_name]
    assert L % num_stages == 0, f"{L} layers not divisible into {num_stages} stages"
    per_stage = L // num_stages
    # [L, ...] -> [P, per_stage, ...]
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((num_stages, per_stage) + a.shape[1:]), stacked)

    B = x.shape[0]
    # microbatch count must divide B; clamp to the largest divisor <= the
    # request so arbitrary eval batch shapes (B=6, 3, 1 at ~100-doc buckets)
    # work instead of tripping an assert — fewer microbatches only means
    # less pipelining, never a wrong result
    num_microbatches = min(num_microbatches, B)
    while B % num_microbatches:
        num_microbatches -= 1
    xs = x.reshape((num_microbatches, B // num_microbatches) + x.shape[1:])
    ms = mask.reshape((num_microbatches, B // num_microbatches) + mask.shape[1:])

    def stage_fn(local, xm):
        xb, mb = xm[..., :-1], xm[..., -1].astype(bool)
        for i in range(per_stage):
            layer = jax.tree_util.tree_map(lambda a: a[i], local)
            one = {"layers": [layer]}
            xb = _listsf.encoder_apply(one, xb, mb, n_heads, encoder_type,
                                       drop_rate=0.0, training=False)
        return jnp.concatenate([xb, xm[..., -1:]], axis=-1)

    # thread the mask through the pipeline as an extra channel so stage_fn
    # stays shape-preserving (gpipe's contract)
    xm = jnp.concatenate([xs, ms[..., None].astype(xs.dtype)], axis=-1)
    out = gpipe(stage_fn, staged, xm, mesh, axis_name)
    out = out[..., :-1]
    out = out.reshape((B,) + out.shape[2:])
    if encoder_type == "AllRank":  # final LN applied ONCE, outside the stages
        from ptranking_tpu.models.scorers.nn import layer_norm_apply

        out = layer_norm_apply(encoder_params["final_ln"], out)
    return out
