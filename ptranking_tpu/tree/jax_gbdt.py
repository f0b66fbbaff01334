"""TPU-native GBDT: histogram-based gradient-boosted trees in pure JAX.

The reference's tree branch delegates to LightGBM's C++ runtime
(ptranking/ltr_tree/lambdamart/lightgbm_lambdaMART.py:23-275). This module is
the TPU-first equivalent: a level-wise, histogram-based tree learner where
every boosting step is a fixed-shape XLA program —

  * features are quantile-binned once on the host (int32 bins),
  * per-level (node, feature, bin) gradient/hessian histograms are built with
    `jax.ops.segment_sum` (one scatter-add over [docs x features]),
  * split search is a vectorized cumsum + argmax over the histogram,
  * leaf values are Newton steps -G/(H+lambda),

so the whole tree-grow step jits and runs on the MXU-adjacent vector units
with no host round-trips. Ranking objectives (lambdarank / ranknet / listnet
grad+hess) come from ptranking_tpu.tree.objectives — the same custom-objective
zoo the reference feeds LightGBM (lightgbm_util.py:15-390).

Differences from LightGBM, by design:
  * level-wise growth to a fixed depth (fixed shapes for XLA) instead of
    leaf-wise best-first growth; `max_depth=8` gives 256 leaves vs the
    reference default 400 num_leaves,
  * min_data_in_leaf is enforced through min_child_hessian only.
"""

from __future__ import annotations

import functools
import pickle
import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptranking_tpu.tree.objectives import CUSTOM_OBJECTIVES


# --- feature quantization -----------------------------------------------------


def quantile_bin_edges(data: np.ndarray, num_bins: int) -> np.ndarray:
    """Per-feature quantile bin edges. Returns [F, num_bins - 1], padded with
    +inf where a feature has fewer distinct quantiles than requested (so the
    padded bins are simply never populated)."""
    n, F = data.shape
    qs = np.linspace(0.0, 1.0, num_bins + 1)[1:-1]
    edges = np.full((F, num_bins - 1), np.inf, dtype=np.float64)
    for f in range(F):
        e = np.unique(np.quantile(data[:, f], qs))
        e = e[np.isfinite(e)]
        edges[f, : len(e)] = e
    return edges


def bin_features(data: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """float features [n, F] -> int32 bins [n, F]: bin = #edges < x, so
    bin b covers (edges[b-1], edges[b]]."""
    n, F = data.shape
    out = np.empty((n, F), dtype=np.int32)
    for f in range(F):
        out[:, f] = np.searchsorted(edges[f], data[:, f], side="left")
    return out


# --- single-tree grow/predict (jitted, fixed shapes) ---------------------------


@functools.partial(jax.jit, static_argnames=("depth", "num_bins"))
def grow_tree(
    bins: jnp.ndarray,   # [n, F] int32
    grad: jnp.ndarray,   # [n] f32
    hess: jnp.ndarray,   # [n] f32
    depth: int,
    num_bins: int,
    l2: float,
    min_child_hessian: float,
    feat_mask: Optional[jnp.ndarray] = None,  # [F] bool; False = feature
    #                                            not splittable this tree
    #                                            (LightGBM feature_fraction)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Grow one depth-`depth` tree level-wise.

    Returns (split_feat [2^depth - 1], split_bin [2^depth - 1],
    leaf_value [2^depth]). Nodes are heap-ordered (children of i are
    2i+1 / 2i+2); a doc goes LEFT when bins[doc, feat] <= split_bin. Nodes
    with no profitable split get a no-op split (feat 0, bin num_bins - 1:
    everything goes left) so shapes stay static."""
    n, F = bins.shape
    node = jnp.zeros((n,), jnp.int32)  # current heap index per doc

    # feature-block size for histogram building: transient memory per level is
    # O(n * FB * 3) instead of O(n * F * 3) — at MSLR scale (n ~ 2.4M, F=136)
    # the full-F broadcast would allocate multi-GB per level
    FB = min(F, 8)
    nb_blocks = -(-F // FB)
    F_pad = nb_blocks * FB
    bins_T = jnp.swapaxes(bins, 0, 1)  # [F, n]
    if F_pad != F:
        # padded fake features put every doc in bin 0 -> zero split gain,
        # never selected over the no-op split
        bins_T = jnp.pad(bins_T, [(0, F_pad - F), (0, 0)])
    bins_blocks = bins_T.reshape(nb_blocks, FB, n)
    fb_idx = jnp.arange(FB, dtype=jnp.int32)
    gh = jnp.stack([grad, hess], axis=-1)  # [n, 2]

    split_feats: List[jnp.ndarray] = []
    split_bins: List[jnp.ndarray] = []

    for level in range(depth):
        num_nodes = 1 << level
        first = num_nodes - 1
        local = node - first  # [n], in [0, num_nodes)

        def block_hist(_, blk):  # blk: [FB, n] bins of one feature block
            seg = (local[None, :] * (FB * num_bins)
                   + fb_idx[:, None] * num_bins + blk)       # [FB, n]
            data = jnp.broadcast_to(gh[None], (FB, n, 2)).reshape(FB * n, 2)
            h = jax.ops.segment_sum(data, seg.ravel(),
                                    num_segments=num_nodes * FB * num_bins)
            return None, h.reshape(num_nodes, FB, num_bins, 2)

        _, hist_blocks = jax.lax.scan(block_hist, None, bins_blocks)
        # [nb, nodes, FB, bins, 2] -> [nodes, F, bins, 2]
        hist = jnp.moveaxis(hist_blocks, 0, 1).reshape(
            num_nodes, F_pad, num_bins, 2)[:, :F]

        cum = jnp.cumsum(hist, axis=2)                       # left sums per bin
        total = cum[:, :1, -1:, :]                           # [nodes,1,1,2]
        gl, hl = cum[..., 0], cum[..., 1]
        gt, ht = total[..., 0], total[..., 1]
        gr, hr = gt - gl, ht - hl

        def score(g, h):
            # 0/0 guard: an empty child with l2=0 must score 0, not NaN —
            # NaN gains would make argmax pick arbitrary splits over the no-op
            denom = h + l2
            return jnp.where(denom > 0, jnp.square(g) / jnp.where(denom > 0, denom, 1.0), 0.0)

        gain = score(gl, hl) + score(gr, hr) - score(gt, ht)  # [nodes, F, bins]
        ok = (hl >= min_child_hessian) & (hr >= min_child_hessian)
        gain = jnp.where(ok, gain, -jnp.inf)
        if feat_mask is not None:
            gain = jnp.where(feat_mask[None, :, None], gain, -jnp.inf)

        flat = gain.reshape(num_nodes, F * num_bins)
        best = jnp.argmax(flat, axis=1)
        best_gain = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
        bf = (best // num_bins).astype(jnp.int32)
        bb = (best % num_bins).astype(jnp.int32)
        # unprofitable/empty node -> no-op split: all docs go left
        noop = ~(best_gain > 0.0)
        bf = jnp.where(noop, 0, bf)
        bb = jnp.where(noop, num_bins - 1, bb)
        split_feats.append(bf)
        split_bins.append(bb)

        doc_feat = bf[local]                               # [n]
        doc_thr = bb[local]
        doc_bin = jnp.take_along_axis(bins, doc_feat[:, None], axis=1)[:, 0]
        go_right = (doc_bin > doc_thr).astype(jnp.int32)
        node = 2 * node + 1 + go_right

    num_leaves = 1 << depth
    leaf_local = node - (num_leaves - 1)
    sums = jax.ops.segment_sum(
        jnp.stack([grad, hess], axis=-1), leaf_local, num_segments=num_leaves)
    leaf_value = -sums[:, 0] / (sums[:, 1] + l2)

    return (jnp.concatenate(split_feats), jnp.concatenate(split_bins),
            leaf_value)


@functools.partial(jax.jit, static_argnames=("depth",))
def predict_tree(bins: jnp.ndarray, split_feat: jnp.ndarray,
                 split_bin: jnp.ndarray, leaf_value: jnp.ndarray,
                 depth: int) -> jnp.ndarray:
    """Route binned docs down one tree; returns [n] leaf values."""
    n = bins.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for _ in range(depth):
        f = split_feat[node]
        t = split_bin[node]
        doc_bin = jnp.take_along_axis(bins, f[:, None], axis=1)[:, 0]
        node = 2 * node + 1 + (doc_bin > t).astype(jnp.int32)
    return leaf_value[node - (len(leaf_value) - 1)]


@functools.partial(jax.jit, static_argnames=("depth",))
def predict_forest(bins, split_feats, split_bins, leaf_values, depth: int):
    """[T, ...] stacked trees -> summed raw scores [n] via lax.scan."""
    def body(acc, tree):
        sf, sb, lv = tree
        return acc + predict_tree(bins, sf, sb, lv, depth), None

    init = jnp.zeros((bins.shape[0],), jnp.float32)
    out, _ = jax.lax.scan(body, init, (split_feats, split_bins, leaf_values))
    return out


# --- boosting driver -----------------------------------------------------------


@dataclass
class GBDTConfig:
    """Mirrors the reference's LightGBM defaults where they transfer
    (lightgbm_lambdaMART.py:163-189): lr .05, 1000 trees; depth 8 (256
    leaves) stands in for num_leaves 400 (level-wise growth)."""
    num_trees: int = 1000
    learning_rate: float = 0.05
    max_depth: int = 8
    num_bins: int = 64
    l2: float = 0.0
    min_child_hessian: float = 1e-3
    objective: str = "lambdarank_newton"  # key into CUSTOM_OBJECTIVES
    early_stopping_rounds: int = 200
    vali_k: int = 5
    # stochastic regularization (LightGBM names/semantics, default off):
    # feature_fraction draws a per-tree splittable-feature subset;
    # bagging samples a QUERY subset every bagging_freq trees (group-aware
    # bagging — LTR gradients are only exchangeable within a query)
    feature_fraction: float = 1.0
    bagging_fraction: float = 1.0
    bagging_freq: int = 0
    random_state: int = 137

    @classmethod
    def from_paras(cls, paras: Optional[dict], **overrides) -> "GBDTConfig":
        """Accept either GBDTConfig fields or LightGBM-style keys (so the
        LightGBM->native fallback can consume the caller's para_dict):
        num_leaves -> max_depth=ceil(log2(.)), learning_rate/num_trees pass
        through; unknown keys are ignored with a notice."""
        import math

        paras = dict(paras or {})
        # the reference nests LightGBM keys under lightgbm_para_dict and the
        # custom-objective switches under custom_dict — flatten both
        paras.update(paras.pop("lightgbm_para_dict", {}) or {})
        custom = paras.pop("custom_dict", {}) or {}
        if custom.get("custom") and custom.get("custom_obj_id"):
            paras.setdefault("objective", custom["custom_obj_id"])
        if "num_leaves" in paras and "max_depth" not in paras:
            paras["max_depth"] = max(2, math.ceil(math.log2(max(paras.pop("num_leaves"), 2))))
        if "num_trees" not in paras and "num_iterations" in paras:
            paras["num_trees"] = paras.pop("num_iterations")
        # Newton leaves need all-positive hessians: map the reference-quirk
        # signed-hessian objectives onto their Newton-safe equivalent
        if paras.get("objective") in ("lambdarank", "ranknet"):
            print(f" [gbdt] objective {paras['objective']!r} uses the reference's "
                  "signed pair hessian; using 'lambdarank_newton' for Newton leaves")
            paras["objective"] = "lambdarank_newton"
        known = {f.name for f in dataclasses.fields(cls)}
        dropped = sorted(set(paras) - known)
        if dropped:
            print(f" [gbdt] ignoring non-native parameters: {dropped}")
        kept = {k: v for k, v in paras.items() if k in known}
        kept.update(overrides)
        return cls(**kept)


@dataclass
class TPUGBDTRanker:
    """Gradient-boosted LambdaMART trained with JAX histogram kernels.

    fit() consumes the same flat (data, target, group) arrays as the
    reference's GBM path (GBMDataset, data_utils.py:764-857)."""

    cfg: GBDTConfig = field(default_factory=GBDTConfig)
    edges: Optional[np.ndarray] = None
    trees: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = field(default_factory=list)
    best_round: Optional[int] = None

    def fit(self, data: np.ndarray, target: np.ndarray, group: np.ndarray,
            vali: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
            verbose: bool = False) -> "TPUGBDTRanker":
        cfg = self.cfg
        if cfg.objective in ("lambdarank", "ranknet"):
            raise ValueError(
                f"objective {cfg.objective!r} keeps the reference's signed pair "
                "hessian, which breaks the Newton leaf -G/(H+l2); use "
                "'lambdarank_newton' (GBDTConfig.from_paras maps it automatically)")
        objective = CUSTOM_OBJECTIVES[cfg.objective][0]  # (plain, lgbm-fobj) pair
        data = np.asarray(data, np.float64)
        target = np.asarray(target, np.float64)
        group = np.asarray(group, np.int64)

        self.edges = quantile_bin_edges(data, cfg.num_bins)
        bins = jnp.asarray(bin_features(data, self.edges))
        preds = np.zeros(len(target), np.float64)

        vali_bins = vali_best = None
        rounds_since_best = 0
        if vali is not None:
            vdata, vtarget, vgroup = vali
            vali_bins = jnp.asarray(bin_features(np.asarray(vdata, np.float64), self.edges))
            vpreds = np.zeros(len(vtarget), np.float64)
            vali_best = -np.inf

        F = data.shape[1]
        rng = np.random.RandomState(cfg.random_state)
        bagging = cfg.bagging_freq > 0 and cfg.bagging_fraction < 1.0
        subsampling = bagging or cfg.feature_fraction < 1.0
        doc_w = np.ones(len(target))
        q_off = np.cumsum(np.concatenate([[0], group]))

        self.trees = []
        for t in range(cfg.num_trees):
            grad, hess = objective(target, preds, group)
            feat_mask = None
            if subsampling:
                if cfg.feature_fraction < 1.0:
                    k = max(1, int(round(cfg.feature_fraction * F)))
                    chosen = rng.choice(F, size=k, replace=False)
                    fm = np.zeros(F, bool)
                    fm[chosen] = True
                    feat_mask = jnp.asarray(fm)
                if bagging and t % cfg.bagging_freq == 0:
                    # group-aware bagging: in-bag QUERIES keep their docs'
                    # (g, h); out-of-bag docs are zeroed — they then carry
                    # no weight in histograms, gains, or Newton leaves
                    kq = max(1, int(round(cfg.bagging_fraction * len(group))))
                    in_bag = rng.choice(len(group), size=kq, replace=False)
                    doc_w = np.zeros(len(target))
                    for qi in in_bag:
                        doc_w[q_off[qi]:q_off[qi + 1]] = 1.0
                if bagging:
                    grad, hess = grad * doc_w, hess * doc_w
            sf, sb, lv = grow_tree(
                bins, jnp.asarray(grad, jnp.float32), jnp.asarray(hess, jnp.float32),
                depth=cfg.max_depth, num_bins=cfg.num_bins, l2=cfg.l2,
                min_child_hessian=cfg.min_child_hessian, feat_mask=feat_mask)
            lv = lv * cfg.learning_rate
            self.trees.append((np.asarray(sf), np.asarray(sb), np.asarray(lv)))
            preds += np.asarray(predict_tree(bins, sf, sb, lv, cfg.max_depth), np.float64)

            if vali is not None:
                vpreds += np.asarray(
                    predict_tree(vali_bins, sf, sb, lv, cfg.max_depth), np.float64)
                score = _ndcg_at_k(vpreds, vtarget, vgroup, cfg.vali_k)
                if score > vali_best:
                    vali_best, self.best_round, rounds_since_best = score, t + 1, 0
                else:
                    rounds_since_best += 1
                if verbose and (t + 1) % 50 == 0:
                    print(f"  [gbdt] round {t + 1}: vali nDCG@{cfg.vali_k}={score:.5f}"
                          f" (best {vali_best:.5f} @ {self.best_round})")
                if rounds_since_best >= cfg.early_stopping_rounds:
                    break
        if self.best_round is not None:
            self.trees = self.trees[: self.best_round]
        return self

    def predict(self, data: np.ndarray) -> np.ndarray:
        assert self.edges is not None and self.trees, "fit() first"
        bins = jnp.asarray(bin_features(np.asarray(data, np.float64), self.edges))
        sf = jnp.asarray(np.stack([t[0] for t in self.trees]))
        sb = jnp.asarray(np.stack([t[1] for t in self.trees]))
        lv = jnp.asarray(np.stack([t[2] for t in self.trees]))
        return np.asarray(predict_forest(bins, sf, sb, lv, self.cfg.max_depth))

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({"cfg": self.cfg, "edges": self.edges,
                         "trees": self.trees, "best_round": self.best_round}, f)

    @classmethod
    def load(cls, path: str) -> "TPUGBDTRanker":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return cls(cfg=d["cfg"], edges=d["edges"], trees=d["trees"],
                   best_round=d["best_round"])


def _ndcg_at_k(preds: np.ndarray, labels: np.ndarray, group: np.ndarray,
               k: int) -> float:
    """Flat-array mean nDCG@k over query groups (host-side, used only for
    early stopping; matches the reference's eval_at convention)."""
    vals, head = [], 0
    for g in group.astype(int):
        p, l = preds[head:head + g], labels[head:head + g]
        head += g
        kk = min(k, g)
        order = np.argsort(-p, kind="stable")
        gains = (2.0 ** l[order][:kk] - 1.0) / np.log2(np.arange(kk) + 2.0)
        igains = (2.0 ** np.sort(l)[::-1][:kk] - 1.0) / np.log2(np.arange(kk) + 2.0)
        denom = igains.sum()
        vals.append(gains.sum() / denom if denom > 0 else 0.0)
    return float(np.mean(vals)) if vals else 0.0
