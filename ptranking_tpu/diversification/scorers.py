"""Diversity scorers: query-conditioned document scoring with MDN heads.

TPU-native counterpart of reference ptranking/ltr_diversification/base/
{div_point_ranker.py, div_list_ranker.py, div_mdn_ranker.py}. One query's
input is (q_repr [D], doc_reprs [N, D]); we batch queries with padding
(the reference runs batch_size=1).

  * pointsf: concat(q, q*d, d) -> [B, N, 3D] -> stacked FFN
    (div_point_ranker.py:14-24)
  * listsf:  cat1 = [q, d, q*d] -> 3D-wide MHSA encoder -> cat2 = [cat1, enc]
    [B, N, 6D] -> univariate FFN (div_list_ranker.py:20-110)
  * MDN head (div_mdn_ranker.py:252-310): out_dim 2 (K=1: mu, var),
    3K (K>1: softmax-mixed components), or a cluster of K independent scorers
    each emitting 3 values; limit_delta caps variance by sigmoid.
  * "co" variant (sf_id suffix 'co'): an extra FFN on cat2 whose outputs give
    a cosine-similarity correlation matrix (div_mdn_ranker.py:137-151,242).

Expert parallelism: cluster-of-K scorers hold params stacked on a leading K
axis and run under vmap — sharding that axis over the mesh `model` axis gives
EP with zero code change (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ptranking_tpu.models.scorers.nn import ffn_apply, ffn_init
from ptranking_tpu.models.scorers import listsf as _listsf

SORT_ID = ["ExpRele", "RERAR", "RiskAware"]


@dataclasses.dataclass(frozen=True)
class DivScorerConfig:
    sf_id: str = "pointsf"  # pointsf | listsf | pointsf_co | listsf_co
    num_features: int = 100  # D: representation dim (TREC WT uses 100)
    # MDN head (reference DivProbRankerParameter defaults)
    K: int = 1
    cluster: bool = False
    sort_id: str = "ExpRele"
    limit_delta: Optional[float] = None
    b: float = 0.1  # RiskAware trade-off (div_mdn_ranker.py:46)
    # pointsf stack
    h_dim: int = 100
    num_layers: int = 5
    # listsf
    ff_dims: Tuple[int, ...] = (256, 128, 64)
    n_heads: int = 2
    encoder_layers: int = 2
    encoder_type: str = "AttnDIN"
    # shared
    AF: str = "R"
    TL_AF: str = "GE"
    apply_tl_af: bool = False
    BN: bool = True
    bn_type: str = "BN"
    bn_affine: bool = False
    dropout: float = 0.1

    @property
    def with_cocos(self) -> bool:
        return self.sf_id.endswith("co")

    @property
    def out_dim(self) -> int:
        if self.cluster:
            return 3
        return 2 if self.K == 1 else 3 * self.K


def _single_init(key, cfg: DivScorerConfig, dtype=jnp.float32):
    D = cfg.num_features
    if cfg.sf_id.startswith("pointsf"):
        dims = [3 * D] + [cfg.h_dim] * cfg.num_layers + [cfg.out_dim]
        return {"point_sf": ffn_init(key, dims, BN=cfg.BN, bn_affine=cfg.bn_affine,
                                     apply_tl_af=cfg.apply_tl_af, dtype=dtype)}
    k_enc, k_uni, k_co = jax.random.split(key, 3)
    p = {
        "encoder": _listsf.encoder_init(k_enc, 3 * D, cfg.encoder_layers, cfg.encoder_type, dtype),
        "uni_sf": ffn_init(k_uni, [6 * D, *cfg.ff_dims, cfg.out_dim], BN=cfg.BN,
                           bn_affine=cfg.bn_affine, apply_tl_af=cfg.apply_tl_af, dtype=dtype),
    }
    if cfg.with_cocos:
        # co-embedding FFN on cat2 (div_mdn_ranker.py:137-148)
        p["co_ffnns"] = ffn_init(k_co, [6 * D, *cfg.ff_dims, cfg.ff_dims[-1]], BN=cfg.BN,
                                 bn_affine=cfg.bn_affine, apply_tl_af=False, dtype=dtype)
    return p


def init_div_scorer(key: jax.Array, cfg: DivScorerConfig, dtype=jnp.float32):
    if cfg.cluster:
        assert cfg.K >= 2 and not cfg.with_cocos
        keys = jax.random.split(key, cfg.K)
        return jax.vmap(lambda k: _single_init(k, cfg, dtype))(keys)
    return _single_init(key, cfg, dtype)


def _single_raw_forward(params, cfg: DivScorerConfig, q_repr, doc_reprs, mask,
                        training=False, key=None):
    """-> raw [B, N, out_dim] (+ cocos [B, N, N] for the co variant)."""
    B, N, D = doc_reprs.shape
    q = jnp.broadcast_to(q_repr[:, None, :], (B, N, D))
    cross = q * doc_reprs
    if cfg.sf_id.startswith("pointsf"):
        cat = jnp.concatenate([q, cross, doc_reprs], axis=-1)  # order: q, q*d, d
        out = ffn_apply(params["point_sf"], cat, mask, AF=cfg.AF, TL_AF=cfg.TL_AF,
                        apply_tl_af=cfg.apply_tl_af, BN=cfg.BN,
                        bn_per_query=cfg.bn_type == "BN2", drop_rate=cfg.dropout,
                        training=training, key=key)
        return out, None
    cat1 = jnp.concatenate([q, doc_reprs, cross], axis=-1)  # order: q, d, q*d
    if training and key is not None:
        k_enc, k_uni, k_co = jax.random.split(key, 3)
    else:
        k_enc = k_uni = k_co = None
    enc = _listsf.encoder_apply(params["encoder"], cat1, mask, cfg.n_heads,
                                cfg.encoder_type, drop_rate=cfg.dropout,
                                training=training, key=k_enc)
    cat2 = jnp.concatenate([cat1, enc], axis=-1)
    out = ffn_apply(params["uni_sf"], cat2, mask, AF=cfg.AF, TL_AF=cfg.TL_AF,
                    apply_tl_af=cfg.apply_tl_af, BN=cfg.BN,
                    bn_per_query=cfg.bn_type == "BN2", drop_rate=cfg.dropout,
                    training=training, key=k_uni)
    cocos = None
    if cfg.with_cocos:
        emb = ffn_apply(params["co_ffnns"], cat2, mask, AF=cfg.AF, apply_tl_af=False,
                        BN=cfg.BN, bn_per_query=cfg.bn_type == "BN2",
                        drop_rate=cfg.dropout, training=training, key=k_co)
        sq = jnp.sum(emb * emb, axis=-1, keepdims=True)
        pos = sq > 0  # grad-safe: d sqrt(0) = inf would leak NaN via pads
        norm = jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)
        unit = emb / jnp.maximum(norm, 1e-8)
        cocos = jnp.einsum("bnd,bmd->bnm", unit, unit)
    return out, cocos


def div_forward(params, cfg: DivScorerConfig, q_repr, doc_reprs, mask,
                training=False, key=None):
    """-> (mus [B, N], vars [B, N], cocos [B, N, N] | None).

    Mirrors reference DivMDNRanker.div_forward (div_mdn_ranker.py:252-310).
    """
    if cfg.cluster:
        raw, _ = jax.vmap(
            lambda p: _single_raw_forward(p, cfg, q_repr, doc_reprs, mask, training, key)
        )(params)  # [K, B, N, 3]
        comps = jnp.moveaxis(raw, 0, -2)  # [B, N, K, 3]
        weights, mu_i, std_var_i = comps[..., 0], comps[..., 1], comps[..., 2]
        cocos = None
    else:
        raw, cocos = _single_raw_forward(params, cfg, q_repr, doc_reprs, mask, training, key)
        if cfg.K == 1:
            mus, std_vars = raw[..., 0], raw[..., 1]
            if cfg.limit_delta is None:
                vars_ = jnp.exp(std_vars)
            else:
                vars_ = jax.nn.sigmoid(std_vars) * cfg.limit_delta
            return mus, vars_, cocos
        comps = raw.reshape(*raw.shape[:-1], 3, cfg.K)  # split: weights, mus, std_vars
        weights, mu_i, std_var_i = comps[..., 0, :], comps[..., 1, :], comps[..., 2, :]
    if cfg.limit_delta is None:
        var_i = jnp.exp(std_var_i)
    else:
        var_i = jax.nn.sigmoid(std_var_i) * cfg.limit_delta
    coeff = jax.nn.softmax(weights, axis=-1)
    mus = jnp.sum(coeff * mu_i, axis=-1)
    vars_ = jnp.sum(coeff * var_i, axis=-1)
    return mus, vars_, cocos


def expected_ranks(mus, vars_, mask, cocos=None):
    """Expected rank under Gaussian uncertainty (reference get_expected_rank,
    prob_utils.py:62-80), masked over real docs."""
    pairsub_mus = mus[..., :, None] - mus[..., None, :]
    if cocos is not None:
        std = jnp.sqrt(vars_)
        pairsub_vars = (vars_[..., :, None] + vars_[..., None, :]
                        - cocos * std[..., :, None] * std[..., None, :])
    else:
        pairsub_vars = vars_[..., :, None] + vars_[..., None, :]
    pairsub_vars = jnp.maximum(pairsub_vars, 1e-8)
    phi0 = 0.5 * jax.lax.erfc(pairsub_mus / jnp.sqrt(2.0 * pairsub_vars))
    n = mus.shape[-1]
    offdiag = ~jnp.eye(n, dtype=bool)
    valid = (mask[..., :, None] & mask[..., None, :]) & offdiag
    ranks = jnp.sum(jnp.where(valid, phi0, 0.0), axis=-1) + 1.0
    return ranks, phi0, pairsub_mus, pairsub_vars


def div_predict(params, cfg: DivScorerConfig, q_repr, doc_reprs, mask):
    """Scores used for sorting at inference (reference div_predict,
    div_mdn_ranker.py:312-337): ExpRele = mus; RERAR = 1/E[rank];
    RiskAware = mu - b*var."""
    mus, vars_, cocos = div_forward(params, cfg, q_repr, doc_reprs, mask)
    if cfg.sort_id == "ExpRele":
        return mus
    if cfg.sort_id == "RERAR":
        ranks, *_ = expected_ranks(mus, vars_, mask, cocos)
        return 1.0 / ranks
    if cfg.sort_id == "RiskAware":
        return mus - cfg.b * vars_
    raise NotImplementedError(cfg.sort_id)
