"""Scorer configuration + pointsf/listsf dispatch.

TPU-native counterpart of reference ptranking/base/adhoc_ranker.py:7-87
(the sf_id switch), ptranking/base/point_ranker.py:30-55 (pointsf) and
ptranking/base/list_ranker.py:303-378 (listsf). A scorer is a pure function
pair: `init_scorer(key, cfg) -> params`, `apply_scorer(params, cfg, x, mask)
-> scores [B, N]` — no module objects, no in-place state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ptranking_tpu.models.scorers.nn import Params, ffn_apply, ffn_init
from ptranking_tpu.models.scorers import listsf as _listsf


@dataclasses.dataclass(frozen=True)
class ScorerConfig:
    """Hyper-parameters of the scoring function.

    Defaults mirror reference default_pointsf_para_dict (parameter.py:139-148:
    num_layers=5, AF='GE', TL_AF='S', apply_tl_af=True, BN=True, bn_type='BN',
    bn_affine=True) and default_listsf_para_dict (parameter.py:159-166).
    """

    sf_id: str = "pointsf"  # 'pointsf' | 'listsf'
    num_features: int = 46
    # --- pointsf ---
    h_dim: int = 100
    out_dim: int = 1
    num_layers: int = 5
    # --- shared FFN knobs ---
    AF: str = "GE"
    TL_AF: str = "S"
    apply_tl_af: bool = True
    BN: bool = True
    bn_type: str = "BN"  # 'BN' (cross-batch stats) | 'BN2' (per-query stats)
    bn_affine: bool = True
    dropout: float = 0.1
    # --- listsf ---
    ff_dims: Tuple[int, ...] = (128, 256, 512)
    n_heads: int = 2
    encoder_layers: int = 6
    encoder_type: str = "DASALC"  # DASALC | AllRank | AttnDIN
    # MXU precision: 'bfloat16' casts params+activations for the scorer
    # compute (master params, norm statistics, attention logits and the loss
    # stay fp32)
    compute_dtype: str = "float32"
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades FLOPs for HBM so very long candidate lists fit on-chip
    remat: bool = False
    # flash-style blockwise attention above this list length (None = dense):
    # O(N*block) memory instead of the [B,H,N,N] matrix
    attn_block_size: Optional[int] = None
    # fused Pallas flash-attention kernel for the MHSA (TPU only; overrides
    # attn_block_size): the scores tile never leaves VMEM and the custom-VJP
    # backward recomputes from (o, l, m) residuals, removing the [B,H,N,N]
    # HBM round-trips that dominate the long-list regime. Attention-prob
    # dropout is skipped on this path (same contract as CP ring attention).
    flash_attn: bool = False
    # lane_align (listsf only): round the scorer's working width up to a
    # multiple of 128 so every matmul fills the MXU's 128-lane tiles.
    # MSLR's F=136 half-fills a second tile (d_head 68 is worse) — the
    # measured reason bf16 MFU sat at 9.6% with bf16 barely beating fp32
    # (BASELINE.md). Input features are zero-padded once at entry; all
    # trunk matmuls (head/encoder/tail) then run at the aligned width.
    # A model VARIANT (more params), not a numerical no-op — the
    # training-dynamics A/B lives in BASELINE.md.
    lane_align: bool = False

    @property
    def bn_per_query(self) -> bool:
        return self.bn_type == "BN2"

    @property
    def width(self) -> int:
        """The trunk working width: num_features, rounded up to a 128-lane
        multiple under lane_align (136 -> 256, 46 -> 128)."""
        if self.lane_align and self.sf_id.startswith("listsf"):
            return ((self.num_features + 127) // 128) * 128
        return self.num_features

    @staticmethod
    def default_pointsf(num_features: int, **overrides) -> "ScorerConfig":
        return ScorerConfig(sf_id="pointsf", num_features=num_features, **overrides)

    @staticmethod
    def default_listsf(num_features: int, **overrides) -> "ScorerConfig":
        base = dict(
            sf_id="listsf",
            num_features=num_features,
            AF="R",
            TL_AF="GE",
            apply_tl_af=False,
            BN=False,
            bn_type="BN2",
            bn_affine=False,
            ff_dims=(128, 256, 512),
            n_heads=2,
            encoder_layers=6,
            encoder_type="DASALC",
        )
        base.update(overrides)
        return ScorerConfig(**base)


def init_scorer(key: jax.Array, cfg: ScorerConfig, dtype=jnp.float32) -> Params:
    if cfg.sf_id.startswith("pointsf"):
        ff_dims = [cfg.num_features] + [cfg.h_dim] * cfg.num_layers + [cfg.out_dim]
        return {
            "point_sf": ffn_init(
                key, ff_dims, BN=cfg.BN, bn_affine=cfg.bn_affine, apply_tl_af=cfg.apply_tl_af, dtype=dtype
            )
        }
    elif cfg.sf_id.startswith("listsf"):
        k_head, k_enc, k_tail = jax.random.split(key, 3)
        F = cfg.width  # == num_features unless lane_align pads to 128-lanes
        head_dims = [F, *cfg.ff_dims, F]
        tail_dims = [F, *cfg.ff_dims, cfg.out_dim]
        return {
            # head FFN always ends with BN+AF (apply_tl_af=True with TL_AF=AF,
            # reference list_ranker.py:312-317)
            "head_ffnns": ffn_init(k_head, head_dims, BN=cfg.BN, bn_affine=cfg.bn_affine, apply_tl_af=True, dtype=dtype),
            "encoder": _listsf.encoder_init(k_enc, F, cfg.encoder_layers, cfg.encoder_type, dtype),
            "tail_ffnns": ffn_init(k_tail, tail_dims, BN=cfg.BN, bn_affine=cfg.bn_affine, apply_tl_af=cfg.apply_tl_af, dtype=dtype),
        }
    raise NotImplementedError(cfg.sf_id)


def apply_scorer(
    params: Params,
    cfg: ScorerConfig,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    training: bool = False,
    key: Optional[jax.Array] = None,
    cp=None,
    pp=None,
) -> jnp.ndarray:
    """Score a padded batch: [B, N, F] -> [B, N]. Padded docs score garbage by
    design — every consumer applies `mask`.

    cp (parallel.ring.CPPlan) routes the listsf MHSA through doc-axis context
    parallelism (ring / Ulysses) — set by DistributedTrainer(shard_docs=True).
    pp (parallel.pipeline.PPPlan) stages the listsf encoder as a GPipe
    pipeline over the mesh's model axis (inference only — set by
    DistributedTrainer(pp_stages=k) on its predict/eval path)."""
    # scores are always at least fp32: the mixed-precision contract keeps the
    # LOSS math in fp32 even when inputs arrive bf16 (e.g. bf16-resident
    # feature storage) — bf16 stays confined to the scorer compute
    out_dtype = jnp.promote_types(x.dtype, jnp.float32)
    if cfg.compute_dtype == "bfloat16":
        cast = lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a
        params = jax.tree_util.tree_map(cast, params)
        x = x.astype(jnp.bfloat16)

    def finish(scores):
        return scores.astype(out_dtype)

    if cfg.sf_id.startswith("pointsf"):
        out = ffn_apply(
            params["point_sf"], x, mask,
            AF=cfg.AF, TL_AF=cfg.TL_AF, apply_tl_af=cfg.apply_tl_af,
            BN=cfg.BN, bn_per_query=cfg.bn_per_query,
            drop_rate=cfg.dropout, training=training, key=key,
        )
        return finish(out[..., 0])

    elif cfg.sf_id.startswith("listsf"):
        if cfg.width != x.shape[-1]:
            # lane_align: zero-pad features once at entry; every trunk matmul
            # then runs at the 128-multiple width (full MXU tiles)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, cfg.width - x.shape[-1])))
        if training and key is not None:
            k_head, k_enc, k_tail = jax.random.split(key, 3)
        else:
            k_head = k_enc = k_tail = None

        def head(v):
            return ffn_apply(
                params["head_ffnns"], v, mask,
                AF=cfg.AF, TL_AF=cfg.AF, apply_tl_af=True,
                BN=cfg.BN, bn_per_query=cfg.bn_per_query,
                drop_rate=cfg.dropout, training=training, key=k_head,
            )

        def encode(v):
            if pp is not None and not training:
                from ptranking_tpu.parallel.pipeline import pipeline_encoder_apply

                return pipeline_encoder_apply(
                    params["encoder"], v, mask, cfg.n_heads, cfg.encoder_type,
                    pp.mesh, num_microbatches=pp.num_microbatches,
                    axis_name=pp.axis_name,
                )
            return _listsf.encoder_apply(
                params["encoder"], v, mask, cfg.n_heads, cfg.encoder_type,
                drop_rate=cfg.dropout, training=training, key=k_enc,
                remat=cfg.remat, attn_block_size=cfg.attn_block_size, cp=cp,
                flash=cfg.flash_attn and cp is None,
            )

        # Variant wiring mirrors reference ListNeuralRanker.forward
        # (list_ranker.py:351-378).
        if cfg.encoder_type == "AllRank":
            combined = encode(head(x))
        elif cfg.encoder_type == "DASALC":
            combined = (encode(x) + 1.0) * head(x)  # latent cross
        elif cfg.encoder_type == "AttnDIN":
            combined = encode(head(x)) + x  # residual to raw features
        else:
            raise NotImplementedError(cfg.encoder_type)

        out = ffn_apply(
            params["tail_ffnns"], combined, mask,
            AF=cfg.AF, TL_AF=cfg.TL_AF, apply_tl_af=cfg.apply_tl_af,
            BN=cfg.BN, bn_per_query=cfg.bn_per_query,
            drop_rate=cfg.dropout, training=training, key=k_tail,
        )
        return finish(out[..., 0])

    raise NotImplementedError(cfg.sf_id)
