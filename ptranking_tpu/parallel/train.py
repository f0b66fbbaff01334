"""DistributedTrainer: the multi-chip train/eval step.

One jitted step covers DP (batch over `data`), TP (scorer weights over
`model`) and doc-axis CP (docs over `seq`): the mesh + shardings tell XLA
where every array lives, and it inserts the psum for gradient reduction, the
TP all-reduces between column/row-parallel matmuls, and the gathers for the
[B, N, N] pairwise blocks. Host code stays identical to single-chip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptranking_tpu.losses import DEFAULT_PARAS, STOCHASTIC, get_loss
from ptranking_tpu.metrics.adhoc import evaluate_all_at_ks
from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer
from ptranking_tpu.parallel.mesh import batch_sharding, replicated, scorer_param_sharding
from ptranking_tpu.train.optimizer import OptimizerConfig, make_optimizer
from ptranking_tpu.types import LabelType, RankingBatch


# Compiled-program cache across trainer instances: k-fold CV and grid search
# rebuild the trainer per fold with an identical (config, mesh) pair, and
# without this every fold re-traced the step/eval programs (mirrors the
# single-chip _COMPILED_CACHE in train/ranker.py). Keyed by everything that
# shapes the traced computation; jax.sharding.Mesh hashes by device layout.
_DIST_COMPILED_CACHE: Dict[Any, tuple] = {}


class DistributedTrainer:
    """Mesh-parallel counterpart of train.AdhocRanker.

    tp=True shards the scorer weights over the `model` axis;
    shard_docs=True additionally shards the document axis over `seq` (CP):
    the listsf MHSA runs through ring/Ulysses attention and the pairwise
    losses (LambdaRank/RankNet) through the blockwise ring pair loss, so the
    [B, H, N, N] attention and [B, N, N] pair matrices only ever exist as
    N/P-sized blocks per device (SURVEY §5.7) — XLA auto-gather is used only
    for the cheap [B, N] score-row sort.
    """

    # model ids whose [B, N, N] pair space routes through a blockwise/sharded
    # loss under shard_docs (no full pair matrix per device; HLO-asserted).
    # This is every O(N^2) loss in the zoo — WassRank's two OT modes both
    # run through the doc-sharded Sinkhorn (parallel/ot.py).
    CP_PAIR_LOSSES = ("LambdaRank", "RankNet", "LambdaLoss", "ApproxNDCG",
                      "SoftRank", "WassRank", "NeuralNDCG")

    stop_check_freq = 10  # reference stop_training cadence (base/ranker.py:496)

    def __init__(
        self,
        model_id: str,
        scorer_cfg: ScorerConfig,
        mesh,
        model_paras: Optional[Dict[str, Any]] = None,
        opt_cfg: Optional[OptimizerConfig] = None,
        label_type: LabelType = LabelType.MultiLabel,
        tp: bool = False,
        shard_docs: bool = False,
        cp_impl: str = "ring",  # 'ring' | 'ulysses' attention exchange
        pp_stages: int = 0,     # >0: stage the listsf encoder as a GPipe
        #                         pipeline over the `model` axis at INFERENCE
        #                         (predict/evaluate); training stays DP/TP/CP
        #                         (docs/parallel.md records the reasoning)
        scan_steps: int = 32,   # batches per fused device dispatch (K-sweep, BASELINE.md)
        eval_chunk: Optional[int] = None,  # batches per fused EVAL dispatch;
        #                         default 64 by measurement (train/ranker.py
        #                         EVAL_CHUNK) — decoupled from scan_steps
        seed: int = 137,
    ):
        self.model_id = model_id
        self.scorer_cfg = scorer_cfg
        self.mesh = mesh
        self.loss_fn = get_loss(model_id)
        self.model_paras = {**DEFAULT_PARAS[model_id], **(model_paras or {})}
        self.opt_cfg = opt_cfg or OptimizerConfig()
        self.label_type = label_type
        self.tp = tp
        self.shard_docs = shard_docs
        assert cp_impl in ("ring", "ulysses")
        self.cp_impl = cp_impl
        self.pp_stages = int(pp_stages)
        if self.pp_stages:
            assert not tp, "pp_stages and tp both claim the `model` axis"
            assert scorer_cfg.sf_id.startswith("listsf"), \
                "pp_stages stages the listsf encoder stack"
            assert self.pp_stages == mesh.shape["model"], \
                f"pp_stages={pp_stages} must equal the mesh model axis " \
                f"({mesh.shape['model']}): stages live on `model`"
            assert scorer_cfg.encoder_layers % self.pp_stages == 0
        self.scan_steps = max(int(scan_steps), 1)
        from ptranking_tpu.train.ranker import EVAL_CHUNK

        self.eval_chunk = max(int(eval_chunk if eval_chunk is not None
                                  else EVAL_CHUNK), 1)
        self.seed = seed
        self.stochastic = model_id in STOCHASTIC

    def init(self):
        key = jax.random.PRNGKey(self.seed)
        self._key, sub = jax.random.split(key)
        params = init_scorer(sub, self.scorer_cfg)
        self.param_shardings = (
            scorer_param_sharding(self.mesh, params) if self.tp else
            jax.tree_util.tree_map(lambda _: replicated(self.mesh), params)
        )
        self.params = jax.device_put(params, self.param_shardings)
        self._optimizer = make_optimizer(self.opt_cfg)
        # optimizer moments mirror the params PYTREE inside the optax state,
        # so shardings are matched by tree-path suffix (shape-only matching
        # mis-assigned whenever two params shared a shape but not a sharding);
        # scalars (count, hyperparams) replicate
        self.opt_state = jax.jit(
            self._optimizer.init,
            out_shardings=self._opt_state_shardings(params),
        )(self.params)
        self._batch_sharding = batch_sharding(self.mesh, self.shard_docs)
        from ptranking_tpu.train.ranker import _freeze

        cache_key = (self.model_id, self.scorer_cfg, _freeze(self.model_paras),
                     self.opt_cfg, self.label_type, self.mesh, self.tp,
                     self.shard_docs, self.cp_impl, self.pp_stages)
        cached = _DIST_COMPILED_CACHE.get(cache_key)
        if cached is None:
            self._compile()
            _DIST_COMPILED_CACHE[cache_key] = (
                self._step, self._scan_step, self._gather_scan, self._predict,
                self._eval, self._eval_scan, self._eval_gather)
        else:
            (self._step, self._scan_step, self._gather_scan, self._predict,
             self._eval, self._eval_scan, self._eval_gather) = cached
        return self

    def _opt_state_shardings(self, params):
        from jax.tree_util import tree_flatten_with_path

        state_shape = jax.eval_shape(self._optimizer.init, params)
        p_leaves, _ = tree_flatten_with_path(params)
        sh_leaves = jax.tree_util.tree_leaves(self.param_shardings)
        by_suffix = {}
        for (path, leaf), sh in zip(p_leaves, sh_leaves):
            keys = tuple(str(k) for k in path)
            by_suffix[(keys, leaf.shape)] = sh

        rep = replicated(self.mesh)

        def pick(path, leaf):
            if leaf.ndim == 0:
                return rep
            keys = tuple(str(k) for k in path)
            # the moment subtrees ('mu', 'nu', ...) embed the params tree, so
            # some suffix of the state path IS a params path
            for start in range(len(keys)):
                sh = by_suffix.get((keys[start:], leaf.shape))
                if sh is not None:
                    return sh
            return rep

        flat, treedef = tree_flatten_with_path(state_shape)
        return jax.tree_util.tree_unflatten(
            treedef, [pick(path, leaf) for path, leaf in flat])

    def _cp_plan(self):
        """CPPlan for the scorer's MHSA under shard_docs (listsf only)."""
        if not (self.shard_docs and self.scorer_cfg.sf_id.startswith("listsf")):
            return None
        from ptranking_tpu.parallel.ring import CPPlan

        batch_axes = ("dcn", "data") if "dcn" in self.mesh.axis_names else "data"
        return CPPlan(self.mesh, axis_name="seq", impl=self.cp_impl,
                      batch_axis=batch_axes)

    def _cp_pair_loss(self):
        """Doc-axis-sharded O(N^2) losses: row-wise O(N) prep (sorts gather
        [B, N] scalars, not matrices), then the pair space accumulates
        blockwise around the ring (parallel/ring.py). Each routing exactly
        matches its dense loss (equivalence-tested):

          RankNet/LambdaRank -> ring_lambda_loss   (pair BCE [+ ΔnDCG])
          LambdaLoss         -> ring_lambdaloss    (power-weighted log-loss)
          ApproxNDCG         -> ring_approx_ndcg   (blockwise rank sums)
          SoftRank           -> ring_soft_rank     (blockwise Gaussian ranks)
          WassRank           -> cp_wass_rank       (doc-sharded Sinkhorn OT)
          NeuralNDCG         -> ring_neural_ndcg   (rank-row-sharded P_hat)
        """
        from ptranking_tpu.ops import gain as label_gain
        from ptranking_tpu.ops.sorting import sort_labels_by_scores
        from ptranking_tpu.parallel.ot import cp_wass_rank
        from ptranking_tpu.parallel.ring import (
            ring_approx_ndcg, ring_lambda_loss, ring_lambdaloss,
            ring_neural_ndcg, ring_soft_rank)

        model_id, label_type = self.model_id, self.label_type
        paras = self.model_paras
        sigma = float(paras.get("sigma", 1.0))
        mesh = self.mesh
        batch_axes = ("dcn", "data") if "dcn" in mesh.axis_names else "data"

        def rowwise_idcg(labels, mask):
            # the SAME ideal-DCG (incl. the EPSILON floor) the dense losses
            # divide by — one source of truth for the CP == dense contract
            from ptranking_tpu import EPSILON
            from ptranking_tpu.losses.listwise import _full_dcg

            return jnp.maximum(_full_dcg(labels, mask, label_type),
                               EPSILON)[..., None]

        def cp_loss(scores, labels, mask):
            if model_id == "RankNet":
                # pairs over the given (label-presorted) order, unweighted
                zeros = jnp.zeros_like(scores)
                return ring_lambda_loss(scores, labels, zeros, mask, mesh,
                                        sigma=sigma, weighted=False,
                                        batch_axis=batch_axes)
            if model_id == "ApproxNDCG":
                # labels are the ideal order (presort): no sort at all
                idcg = rowwise_idcg(labels, mask)
                gains = label_gain(jnp.where(mask, labels, 0.0), label_type)
                n_gains = jnp.where(mask, gains / idcg, 0.0)
                return ring_approx_ndcg(scores, n_gains, mask, mesh,
                                        alpha=float(paras.get("alpha", 10.0)),
                                        batch_axis=batch_axes)
            if model_id == "WassRank":
                return cp_wass_rank(
                    scores, labels, mask, mesh,
                    mode=paras.get("mode", "SinkhornOT"),
                    sh_itr=int(paras.get("sh_itr", 20)),
                    lam=float(paras.get("lam", 0.1)),
                    smooth_type=paras.get("smooth_type", "ST"),
                    cost_type=paras.get("cost_type", "eg"),
                    non_rele_gap=float(paras.get("non_rele_gap", 100.0)),
                    var_penalty=float(paras.get("var_penalty", float(jnp.e))),
                    gain_base=float(paras.get("gain_base", 4.0)),
                    tl_af=paras.get("tl_af", "S"),
                    batch_axis=batch_axes)
            if model_id == "NeuralNDCG":
                top_k = paras.get("top_k")
                return ring_neural_ndcg(
                    scores, labels, mask, mesh,
                    temperature=float(paras.get("temperature", 1.0)),
                    top_k=None if top_k is None else int(top_k),
                    sinkhorn_iters=int(paras.get("sinkhorn_iters", 10)),
                    label_type=label_type, batch_axis=batch_axes)
            if model_id == "SoftRank":
                # expected ranks over the GIVEN order, like the dense loss
                idcg = rowwise_idcg(labels, mask)
                gains = label_gain(jnp.where(mask, labels, 0.0), label_type)
                n_gains = jnp.where(mask, gains / idcg, 0.0)
                top_k = paras.get("top_k")
                return ring_soft_rank(scores, n_gains, mask, mesh,
                                      delta=float(paras.get("delta", 2.0)),
                                      top_k=None if top_k is None else int(top_k),
                                      batch_axis=batch_axes)
            # sorted-order pair losses
            s_sorted, l_sorted, m_sorted = sort_labels_by_scores(scores, labels, mask)
            idcg = rowwise_idcg(labels, mask)
            pred_gains = label_gain(jnp.where(m_sorted, l_sorted, 0.0), label_type)
            n_gains = jnp.where(m_sorted, pred_gains / idcg, 0.0)
            if model_id == "LambdaLoss":
                return ring_lambdaloss(
                    s_sorted, l_sorted, n_gains, m_sorted, mesh,
                    loss_type=paras.get("loss_type", "NDCG_Loss2"),
                    k=int(paras.get("k", 5)), sigma=sigma,
                    mu=float(paras.get("mu", 5.0)), batch_axis=batch_axes)
            # LambdaRank: pairs over the predicted order with |ΔnDCG| weights
            return ring_lambda_loss(s_sorted, l_sorted, n_gains, m_sorted, mesh,
                                    sigma=sigma, weighted=True,
                                    batch_axis=batch_axes)

        return cp_loss

    def _resident_shardings(self):
        """Shardings for device-resident bucket arrays [Q+1, N, F] / [Q+1, N]:
        the query axis is REPLICATED (batch composition is a random gather —
        replication makes every gather device-local and zero-comm, and the
        packed datasets are small next to HBM); the doc axis shards over
        `seq` under CP so gathered batches land already doc-sharded."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.shard_docs:
            return (NamedSharding(self.mesh, P(None, "seq", None)),
                    NamedSharding(self.mesh, P(None, "seq")))
        rep = replicated(self.mesh)
        return rep, rep

    def _compile(self):
        scorer_cfg, loss_fn, paras = self.scorer_cfg, self.loss_fn, self.model_paras
        label_type, stochastic = self.label_type, self.stochastic
        optimizer = self._optimizer
        rep = replicated(self.mesh)
        bsh = self._batch_sharding
        mask_sh = jax.sharding.NamedSharding(self.mesh, bsh.spec)  # [B, N] same spec
        cp = self._cp_plan()
        pp = None
        if self.pp_stages:
            from ptranking_tpu.parallel.pipeline import PPPlan

            pp = PPPlan(self.mesh)
        cp_loss = (self._cp_pair_loss()
                   if self.shard_docs and self.model_id in self.CP_PAIR_LOSSES
                   else None)

        def step(params, opt_state, key, features, labels, mask):
            k_drop, k_loss = jax.random.split(key)

            def loss_of(p):
                scores = apply_scorer(p, scorer_cfg, features, mask, training=True,
                                      key=k_drop, cp=cp)
                if cp_loss is not None:
                    return cp_loss(scores, labels, mask)
                kw = {"key": k_loss} if stochastic else {}
                return loss_fn(scores, labels, mask, label_type=label_type, **paras, **kw)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        self._step = jax.jit(
            step,
            in_shardings=(self.param_shardings, self._opt_shardings_cached(), rep,
                          bsh, mask_sh, mask_sh),
            out_shardings=(self.param_shardings, self._opt_shardings_cached(), rep),
            donate_argnums=(0, 1),
        )

        # K-batch fused step (see train/ranker.py scan_step): the stacked
        # arrays keep the per-batch shardings on their trailing axes
        # ([K, B, N, ...] with K replicated)
        stacked_spec = jax.sharding.PartitionSpec(None, *bsh.spec)
        stacked_sh = jax.sharding.NamedSharding(self.mesh, stacked_spec)

        def scan_step(params, opt_state, key, features_k, labels_k, mask_k):
            K = features_k.shape[0]
            keys = jax.random.split(key, K)

            def body(carry, inp):
                params, opt_state = carry
                sub, f, l, m = inp
                params, opt_state, loss = step(params, opt_state, sub, f, l, m)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (keys, features_k, labels_k, mask_k))
            return params, opt_state, jnp.sum(losses)

        self._scan_step = jax.jit(
            scan_step,
            in_shardings=(self.param_shardings, self._opt_shardings_cached(), rep,
                          stacked_sh, stacked_sh, stacked_sh),
            out_shardings=(self.param_shardings, self._opt_shardings_cached(), rep),
            donate_argnums=(0, 1),
        )

        # gather-fused step over device-resident bucket arrays (mirrors
        # train/ranker.py gather_scan_step): one dispatch per K-batch chunk,
        # host->device traffic is just the [K, B] index rows
        res_f_sh, res_lm_sh = self._resident_shardings()
        wsc = jax.lax.with_sharding_constraint

        def gather_scan_step(params, opt_state, key, feats_all, labels_all,
                             mask_all, idx_k):
            K = idx_k.shape[0]
            keys = jax.random.split(key, K)

            def body(carry, inp):
                params, opt_state = carry
                sub, idx = inp
                # replicated-Q -> batch-sharded: each device slices the rows
                # it already holds (a free reshard, no collective)
                f = wsc(jnp.take(feats_all, idx, axis=0), bsh)
                l = wsc(jnp.take(labels_all, idx, axis=0), mask_sh)
                m = wsc(jnp.take(mask_all, idx, axis=0), mask_sh)
                params, opt_state, loss = step(params, opt_state, sub, f, l, m)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (keys, idx_k))
            return params, opt_state, jnp.sum(losses)

        self._gather_scan = jax.jit(
            gather_scan_step,
            in_shardings=(self.param_shardings, self._opt_shardings_cached(), rep,
                          res_f_sh, res_lm_sh, res_lm_sh, rep),
            out_shardings=(self.param_shardings, self._opt_shardings_cached(), rep),
            donate_argnums=(0, 1),
        )

        def predict(params, features, mask):
            return apply_scorer(params, scorer_cfg, features, mask,
                                training=False, cp=cp, pp=pp)

        self._predict = jax.jit(
            predict, in_shardings=(self.param_shardings, bsh, mask_sh))

        def eval_batch(params, features, labels, mask, ks):
            # packed [4K+1] sums (see train/ranker.py _reduce_packed_rows):
            # the epoch reduces on device and fetches ONE vector — per-chunk
            # dict fetches were the r2 eval bottleneck
            scores = apply_scorer(params, scorer_cfg, features, mask,
                                  training=False, cp=cp, pp=pp)
            out = evaluate_all_at_ks(scores, labels, mask, ks, label_type)
            sums = [jnp.sum(out[m], axis=0) for m in ("nDCG", "nERR", "AP", "P")]
            count = jnp.sum(jnp.any(mask, axis=-1).astype(jnp.float32))
            return jnp.concatenate(sums + [count[None]])

        self._eval = jax.jit(eval_batch, static_argnums=(4,),
                             in_shardings=(self.param_shardings, bsh, mask_sh, mask_sh))

        def eval_batches(params, features_k, labels_k, mask_k, ks):
            # vmap keeps per-batch semantics (BN batch statistics)
            rows = jax.vmap(lambda f, l, m: eval_batch(params, f, l, m, ks))(
                features_k, labels_k, mask_k)
            return jnp.sum(rows, axis=0)

        self._eval_scan = jax.jit(
            eval_batches, static_argnums=(4,),
            in_shardings=(self.param_shardings, stacked_sh, stacked_sh, stacked_sh))

        # gather-fused eval over device-resident bucket arrays
        def eval_gather(params, feats_all, labels_all, mask_all, idx_k, ks):
            def one(idx):
                # no explicit constraint under vmap: XLA propagates the
                # resident arrays' (replicated-Q, seq-sharded-N) layout
                f = jnp.take(feats_all, idx, axis=0)
                l = jnp.take(labels_all, idx, axis=0)
                m = jnp.take(mask_all, idx, axis=0)
                return eval_batch(params, f, l, m, ks)

            return jnp.sum(jax.vmap(one)(idx_k), axis=0)

        self._eval_gather = jax.jit(
            eval_gather, static_argnums=(5,),
            in_shardings=(self.param_shardings, res_f_sh, res_lm_sh,
                          res_lm_sh, rep))

    def _opt_shardings_cached(self):
        if not hasattr(self, "_opt_sh"):
            self._opt_sh = jax.tree_util.tree_map(lambda x: x.sharding, self.opt_state)
        return self._opt_sh

    # ------------------------------------------------------------------ api

    @property
    def _dp_degree(self) -> int:
        """Devices along the batch (query) axes."""
        d = self.mesh.shape["data"]
        if "dcn" in self.mesh.axis_names:
            d *= self.mesh.shape["dcn"]
        return d

    @property
    def _cp_degree(self) -> int:
        return self.mesh.shape["seq"] if self.shard_docs else 1

    def _mesh_pad(self, f, l, m):
        """Pad batch rows to a multiple of the DP degree (and docs to a
        multiple of the CP degree): GSPMD requires every sharded dim to
        divide its mesh axis, and bucketed batches come in arbitrary sizes.
        Pad rows/docs are mask-False, so they contribute zero loss/metric —
        exactly the padding-invariance the loss and metric suites assert."""
        f, l, m = np.asarray(f), np.asarray(l), np.asarray(m)
        B, N = m.shape[-2], m.shape[-1]
        pb, pn = (-B) % self._dp_degree, (-N) % self._cp_degree
        if not pb and not pn:
            return f, l, m
        pad_f = [(0, 0)] * (f.ndim - 3) + [(0, pb), (0, pn), (0, 0)]
        pad_l = [(0, 0)] * (l.ndim - 2) + [(0, pb), (0, pn)]
        return np.pad(f, pad_f), np.pad(l, pad_l), np.pad(m, pad_l)

    def _pad_idx(self, idx_k, sentinel: int):
        """Pad gather-index columns to a multiple of the DP degree with the
        resident arrays' all-masked sentinel row."""
        idx_k = np.asarray(idx_k)
        pb = (-idx_k.shape[-1]) % self._dp_degree
        if not pb:
            return idx_k
        pad = [(0, 0)] * (idx_k.ndim - 1) + [(0, pb)]
        return np.pad(idx_k, pad, constant_values=sentinel)

    def _put(self, batch: RankingBatch):
        f, l, m = self._mesh_pad(batch.features, batch.labels, batch.mask)
        lm_sh = jax.sharding.NamedSharding(self.mesh, self._batch_sharding.spec)
        return (jax.device_put(f, self._batch_sharding),
                jax.device_put(l, lm_sh), jax.device_put(m, lm_sh))

    def train_step(self, batch: RankingBatch) -> float:
        self._key, sub = jax.random.split(self._key)
        f, l, m = self._put(batch)
        self.params, self.opt_state, loss = self._step(self.params, self.opt_state, sub, f, l, m)
        return float(loss)

    def train_epoch(self, batches, epoch_k: int = 1):
        from ptranking_tpu.train.optimizer import epoch_lr, set_lr

        from ptranking_tpu.utils.chunking import iter_shape_chunks

        self.opt_state = set_lr(self.opt_state, epoch_lr(self.opt_cfg, epoch_k))
        losses, num_queries = [], 0
        for chunk, fused in iter_shape_chunks(batches, self.scan_steps):
            for b in chunk:
                num_queries += int(np.sum(np.asarray(b.mask).any(axis=-1)))
            if fused:
                f, l, m = self._mesh_pad(
                    np.stack([np.asarray(b.features) for b in chunk]),
                    np.stack([np.asarray(b.labels) for b in chunk]),
                    np.stack([np.asarray(b.mask) for b in chunk]))
                self._key, sub = jax.random.split(self._key)
                self.params, self.opt_state, loss = self._scan_step(
                    self.params, self.opt_state, sub, f, l, m)
                losses.append(loss)
            else:
                for b in chunk:
                    self._key, sub = jax.random.split(self._key)
                    f, l, m = self._put(b)
                    self.params, self.opt_state, loss = self._step(
                        self.params, self.opt_state, sub, f, l, m)
                    losses.append(loss)  # device-side; one sync at epoch end
        total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        # NaN guard, reference stop_training parity (base/ranker.py:547-561).
        # `total` is already fetched to host every epoch, so the check is free
        if not np.isfinite(total):
            return float("nan"), True
        # mean per REAL query, matching AdhocRanker.train_epoch
        return total / max(num_queries, 1), False

    # --------------------------------------------------- device-resident path

    def _mesh_resident(self, res):
        """Upload a DeviceResidentDataset's bucket arrays onto the mesh with
        the resident shardings, once per (trainer, dataset) pair."""
        import weakref

        cache = getattr(self, "_res_cache", None)
        if cache is None:
            cache = self._res_cache = {}
        # evict entries whose dataset died, or whose id() was reused by a
        # NEW dataset — otherwise the sharded arrays stay pinned in HBM for
        # the trainer's lifetime
        for k in [k for k, v in cache.items() if v[0]() is None]:
            del cache[k]
        key = id(res)
        hit = cache.get(key)
        if hit is not None and hit[0]() is res:
            return hit[1]
        cache.pop(key, None)  # id reuse by a different object
        from ptranking_tpu.data.device_cache import padded_host_arrays

        f_sh, lm_sh = self._resident_shardings()
        arrs = {}
        for b in res.buckets:
            # build the mesh copy from the HOST-side packed arrays: no
            # single-device fp32 transient, no dequant round-trip for int8
            # residents (the mesh jits declare dense in_shardings — int8
            # residency is a single-chip HBM lever), and device_put ships
            # each device only its shard
            f, l, m = padded_host_arrays(res.ds, b)
            arrs[b] = (jax.device_put(f, f_sh), jax.device_put(l, lm_sh),
                       jax.device_put(m, lm_sh))
        cache[key] = (weakref.ref(res), arrs)
        return arrs

    def train_epoch_resident(self, res, epoch_k: int = 1, shuffle: bool = True):
        """One epoch over a DeviceResidentDataset under mesh shardings —
        mirrors train/ranker.py train_epoch_resident: one dispatch per
        K-batch chunk, index-only host traffic, per-check-epoch NaN/zero
        stop guard (reference stop_training, base/ranker.py:547-561)."""
        from ptranking_tpu.train.optimizer import epoch_lr, set_lr

        self.opt_state = set_lr(self.opt_state, epoch_lr(self.opt_cfg, epoch_k))
        arrs = self._mesh_resident(res)
        losses = []
        checked = (epoch_k % self.stop_check_freq) != 0
        for bucket, idx_k, _n_real in res.epoch_index_chunks(
                shuffle, epoch_k, self.scan_steps):
            feats_all, labels_all, mask_all = arrs[bucket]
            sentinel = mask_all.shape[0] - 1  # the all-masked pad row
            idx_k = self._pad_idx(idx_k, sentinel)
            if not checked:
                idx0 = jnp.asarray(idx_k[0])
                # eager host-side gathers come out replicated; commit them to
                # the batch sharding the predict jit declares
                f0 = jax.device_put(jnp.take(feats_all, idx0, axis=0),
                                    self._batch_sharding)
                m0 = jax.device_put(
                    jnp.take(mask_all, idx0, axis=0),
                    jax.sharding.NamedSharding(self.mesh,
                                               self._batch_sharding.spec))
                scores = self._predict(self.params, f0, m0)
                masked = jnp.where(m0, scores, 0.0)
                if (not bool(jnp.all(jnp.isfinite(masked)))
                        or not bool(jnp.any(masked != 0.0))):
                    return float("nan"), True
                checked = True
            self._key, sub = jax.random.split(self._key)
            self.params, self.opt_state, loss = self._gather_scan(
                self.params, self.opt_state, sub, feats_all, labels_all,
                mask_all, jnp.asarray(idx_k))
            losses.append(loss)
        total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        if not np.isfinite(total):
            return float("nan"), True
        return total / max(res.num_queries, 1), False

    def _evaluate_resident(self, res, ks):
        from ptranking_tpu.train.ranker import _reduce_packed_rows

        arrs = self._mesh_resident(res)
        packed_rows = []
        for bucket, idx_k, _ in res.epoch_index_chunks(False, 0, self.eval_chunk):
            f, l, m = arrs[bucket]
            idx_k = self._pad_idx(idx_k, m.shape[0] - 1)
            packed_rows.append(self._eval_gather(
                self.params, f, l, m, jnp.asarray(idx_k), ks))
        return _reduce_packed_rows(packed_rows, len(ks))

    # ------------------------------------------------------------- checkpoint

    def checkpoint(self) -> Dict[str, Any]:
        """Self-describing state for mid-training resume (mirrors
        train/ranker.py checkpoint; shardings are re-derived on restore)."""
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
        return {
            "model_id": self.model_id,
            "scorer_cfg": self.scorer_cfg,
            "model_paras": self.model_paras,
            "opt_cfg": self.opt_cfg,
            "label_type": self.label_type,
            "params": to_np(self.params),
            "opt_state": to_np(self.opt_state),
            "key": np.asarray(self._key),
        }

    def restore(self, ckpt: Dict[str, Any]):
        """Repopulate params/opt-state/key under this trainer's mesh
        shardings from a checkpoint() dict (also accepts single-chip
        AdhocRanker checkpoints of the same config)."""
        assert ckpt["model_id"] == self.model_id, (ckpt["model_id"], self.model_id)
        self.params = jax.device_put(ckpt["params"], self.param_shardings)
        self.opt_state = jax.device_put(ckpt["opt_state"],
                                        self._opt_shardings_cached())
        self._key = jnp.asarray(ckpt["key"])
        return self

    def save(self, path: str):
        """Pickle the self-describing checkpoint (same file format as
        AdhocRanker.save — checkpoints are interchangeable between the
        single-chip ranker and the mesh trainer of the same config)."""
        import os
        import pickle

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.checkpoint(), f, protocol=pickle.HIGHEST_PROTOCOL)

    def load(self, path: str):
        import pickle

        with open(path, "rb") as f:
            return self.restore(pickle.load(f))

    def evaluate(self, batches, ks=(1, 3, 5, 10)):
        from ptranking_tpu.utils.chunking import iter_shape_chunks

        ks = tuple(ks)
        from ptranking_tpu.data.device_cache import DeviceResidentDataset

        if isinstance(batches, DeviceResidentDataset):
            return self._evaluate_resident(batches, ks)
        if hasattr(batches, "batches"):
            batches = batches.batches()
        from ptranking_tpu.train.ranker import _reduce_packed_rows

        packed_rows = []
        for chunk, fused in iter_shape_chunks(batches, self.scan_steps):
            if fused:
                f, l, m = self._mesh_pad(
                    np.stack([np.asarray(b.features) for b in chunk]),
                    np.stack([np.asarray(b.labels) for b in chunk]),
                    np.stack([np.asarray(b.mask) for b in chunk]))
                packed_rows.append(self._eval_scan(self.params, f, l, m, ks))
            else:
                for b in chunk:
                    f, l, m = self._put(b)
                    packed_rows.append(self._eval(self.params, f, l, m, ks))
        return _reduce_packed_rows(packed_rows, len(ks))

    def validation(self, batches, k: int = 5, metric: str = "nDCG") -> float:
        """Validation scalar (mirrors AdhocRanker.validation; reference
        base/ranker.py:189-200)."""
        return float(self.evaluate(batches, ks=(k,))[metric][0])

    def evaluate_per_query(self, batches, ks=(1, 3, 5, 10, 20, 50)):
        """Per-query metric matrices for real queries (reproduce mode;
        mirrors AdhocRanker.evaluate_per_query). Scores come off the mesh
        predict jit; the per-query unpack is a host loop, which is fine —
        reproduce runs once per experiment, not per epoch."""
        ks = tuple(ks)
        if hasattr(batches, "batches"):
            batches = batches.batches()
        rows: Dict[str, list] = {m: [] for m in ("nDCG", "nERR", "AP", "P")}
        for batch in batches:
            f, l, m_ = self._put(batch)
            scores = self._predict(self.params, f, m_)
            out = evaluate_all_at_ks(scores, l, m_, ks, self.label_type)
            # from the PADDED mask (DP pads batch rows; pad rows are False)
            real = np.asarray(m_).any(axis=-1)
            for m in rows:
                rows[m].append(np.asarray(out[m])[real])
        return {m: (np.concatenate(v) if v else np.zeros((0, len(ks))))
                for m, v in rows.items()}
