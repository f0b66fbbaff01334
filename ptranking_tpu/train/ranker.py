"""AdhocRanker: the train/predict/evaluate/save/load lifecycle.

TPU-native counterpart of reference NeuralRanker + the Evaluator mixin
(ptranking/base/ranker.py:28-697). Key re-design decisions:

  * One jitted train step serves every model: the loss is a pure function from
    the registry, so `step(state, batch, key) -> (state, loss)` is traced once
    per (bucket shape, model) and cached. Params/opt-state buffers are donated.
  * The reference's per-batch .to(device)/.cpu() metric loops
    (base/ranker.py:31-65) become fully on-device evaluation
    (metrics.adhoc.evaluate_all_at_ks); only [B,K] scalars are fetched.
  * NaN/all-zero stop guard (reference stop_training, base/ranker.py:547-561)
    is computed on-device as one boolean and fetched every stop_check_freq
    epochs.
  * Checkpoints serialize params AND optimizer state (the reference saves only
    state_dict, so it cannot resume mid-training — SURVEY.md §5.4).
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptranking_tpu import LTR_SEED
from ptranking_tpu.data.device_cache import take_features
from ptranking_tpu.losses import DEFAULT_PARAS, REQUIRES_LISTSF, STOCHASTIC, get_loss
from ptranking_tpu.metrics.adhoc import evaluate_all_at_ks
from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer
from ptranking_tpu.train.optimizer import OptimizerConfig, epoch_lr, make_optimizer, set_lr
from ptranking_tpu.types import LabelType, RankingBatch


# Compiled-function cache across ranker instances: grid search and k-fold CV
# rebuild rankers with identical configs per fold/grid point (reference
# ltr.py:318 ranker.init per fold); without this every rebuild re-traced the
# step (~4s each), multiplying across the grid (SURVEY §7.3). Keyed by every
# input that shapes the traced computation.
_COMPILED_CACHE: Dict[Any, Tuple[Any, Any, Any, Any]] = {}

# Fused-dispatch chunk size for gather-fused EVALUATION (batches per device
# dispatch). Fixed by measurement (tools/bench_dispatch.py eval column):
# throughput peaks at 64 and is flat-to-worse beyond, independent of the
# train-side scan_steps.
EVAL_CHUNK = 64


def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _reduce_packed_rows(packed_rows, K: int,
                        names=("nDCG", "nERR", "AP", "P")) -> Dict[str, np.ndarray]:
    """Sum packed [len(names)*K+1] metric rows on DEVICE, fetch once, unpack
    on host (the trailing slot is the real-query count).

    The whole dataset's evaluation reaches the host as a single float-vector
    transfer — on a remote-attached chip per-buffer fetch RPCs (not metric
    compute) dominated evaluation before this (VERDICT r2 weak #1). The
    diversification branch reuses it with its own names tuple.
    """
    if not packed_rows:
        return {m: np.zeros(K) for m in names}
    total = np.asarray(jnp.sum(jnp.stack(packed_rows), axis=0))
    count = float(total[len(names) * K])
    if count == 0:
        return {m: np.zeros(K) for m in names}
    return {m: total[i * K:(i + 1) * K] / count for i, m in enumerate(names)}


class AdhocRanker:
    """A (scorer config, loss fn, optimizer) triple with a compiled step cache."""

    stop_check_freq = 10  # reference base/ranker.py:496

    def __init__(
        self,
        model_id: str,
        scorer_cfg: ScorerConfig,
        model_paras: Optional[Dict[str, Any]] = None,
        opt_cfg: Optional[OptimizerConfig] = None,
        label_type: LabelType = LabelType.MultiLabel,
        seed: int = LTR_SEED,
        scan_steps: int = 32,
    ):
        if model_id in REQUIRES_LISTSF and not scorer_cfg.sf_id.startswith("listsf"):
            scorer_cfg = ScorerConfig.default_listsf(scorer_cfg.num_features)
        # batches per fused device dispatch (lax.scan); 1 = one dispatch per
        # batch (the reference's structure). >1 only changes the PRNG stream
        # assignment, not semantics — see _build_step's scan_step. Default 32
        # by measurement (tools/bench_dispatch.py, BASELINE.md K-sweep): the
        # tunneled chip's 1-8 ms/dispatch still dominates at K=8 (1.7k
        # lists/s) and plateaus from K=32 (6.7k). Streamed tails/boundaries
        # run per-step; resident tails compile one reused smaller-k chunk
        # program per bucket (device_cache.py epoch_index_chunks).
        self.scan_steps = max(int(scan_steps), 1)
        self.model_id = model_id
        self.scorer_cfg = scorer_cfg
        self.loss_fn = get_loss(model_id)
        self.model_paras = {**DEFAULT_PARAS[model_id], **(model_paras or {})}
        self.opt_cfg = opt_cfg or OptimizerConfig()
        self.label_type = label_type
        self.seed = seed
        self.stochastic = model_id in STOCHASTIC
        self.params = None
        self.opt_state = None
        self._key = None
        self._optimizer = None

    # ------------------------------------------------------------------ init

    def init(self):
        """(Re)build scorer params and optimizer state — the reference calls
        this per fold (point_ranker.py:17-19)."""
        self._key = jax.random.PRNGKey(self.seed)
        self._key, sub = jax.random.split(self._key)
        self.params = init_scorer(sub, self.scorer_cfg)
        key = (self.model_id, self.scorer_cfg, _freeze(self.model_paras),
               self.opt_cfg, self.label_type)
        cached = _COMPILED_CACHE.get(key)
        if cached is None:
            self._optimizer = make_optimizer(self.opt_cfg)
            cached = (self._optimizer, self._build_step(),
                      self._build_predict(), self._build_eval())
            _COMPILED_CACHE[key] = cached
        (self._optimizer,
         (self._compiled_step, self._compiled_scan_step, self._compiled_gather_scan),
         self._compiled_predict,
         (self._compiled_eval, self._compiled_eval_scan,
          self._compiled_eval_gather)) = cached
        self.opt_state = self._optimizer.init(self.params)
        return self

    def _build_step(self):
        scorer_cfg, loss_fn, paras = self.scorer_cfg, self.loss_fn, self.model_paras
        label_type, stochastic = self.label_type, self.stochastic
        optimizer = self._optimizer

        def step(params, opt_state, key, features, labels, mask):
            k_drop, k_loss = jax.random.split(key)

            def loss_of(p):
                scores = apply_scorer(p, scorer_cfg, features, mask, training=True, key=k_drop)
                kw = {"key": k_loss} if stochastic else {}
                return loss_fn(scores, labels, mask, label_type=label_type, **paras, **kw)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        # scanned K-step variant: ONE dispatch trains K stacked batches of
        # identical shape. On the tunneled TPU a dispatch costs ~1-3 ms; with
        # the reference's ~100-doc rough batches a step computes for ~1 ms,
        # so per-step dispatch dominates — measured 6.5x faster at B=8/N=128
        # (scan_probe, BASELINE.md). K is static per compile via the stacked
        # leading axis; train_epoch only ever uses one K per bucket.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
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

        # gather-fused variant for device-resident data: the K batches are
        # GATHERED inside the program from the resident bucket arrays, so a
        # whole K-batch chunk costs ONE dispatch and ZERO host->device
        # payload beyond the [K, B] index array
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def gather_scan_step(params, opt_state, key, feats_all, labels_all,
                             mask_all, idx_k):
            K = idx_k.shape[0]
            keys = jax.random.split(key, K)

            def body(carry, inp):
                params, opt_state = carry
                sub, idx = inp
                f = take_features(feats_all, idx)
                l = jnp.take(labels_all, idx, axis=0)
                m = jnp.take(mask_all, idx, axis=0)
                params, opt_state, loss = step(params, opt_state, sub, f, l, m)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (keys, idx_k))
            return params, opt_state, jnp.sum(losses)

        return (functools.partial(jax.jit, donate_argnums=(0, 1))(step),
                scan_step, gather_scan_step)

    def _build_predict(self):
        scorer_cfg = self.scorer_cfg

        @jax.jit
        def predict(params, features, mask):
            return apply_scorer(params, scorer_cfg, features, mask, training=False)

        return predict

    def _build_eval(self):
        scorer_cfg, label_type = self.scorer_cfg, self.label_type

        def eval_sums(params, features, labels, mask, ks):
            """One batch -> PACKED [4*len(ks)+1] metric sums (nDCG, nERR, AP,
            P sums at each k, then the real-query count).

            Packed because the epoch loop accumulates one device vector and
            fetches ONCE: a dict result meant 4-5 tiny host fetches per chunk,
            and on a remote-attached chip those RPC round-trips — not the
            metric compute — were ~99% of evaluation wall-clock (the r2 42x
            eval-vs-train gap, VERDICT r2 weak #1).
            """
            scores = apply_scorer(params, scorer_cfg, features, mask, training=False)
            out = evaluate_all_at_ks(scores, labels, mask, ks, label_type)
            # per-batch SUMS (host divides by total query count at the end);
            # count REAL queries only — all-padded remainder rows of a
            # bucketed batch contribute zero metric but must not inflate the
            # denominator (that silently deflated every reported metric)
            sums = [jnp.sum(out[m], axis=0) for m in ("nDCG", "nERR", "AP", "P")]
            count = jnp.sum(jnp.any(mask, axis=-1).astype(jnp.float32))
            return jnp.concatenate(sums + [count[None]])

        eval_batch = jax.jit(eval_sums, static_argnums=(4,))

        # fused K-batch eval: ONE dispatch evaluates K stacked batches with
        # PER-BATCH semantics kept (BN uses batch statistics at eval — the
        # batches must NOT be merged into one larger batch; vmap preserves
        # each batch's normalisation exactly)
        @functools.partial(jax.jit, static_argnums=(4,))
        def eval_batches(params, features_k, labels_k, mask_k, ks):
            rows = jax.vmap(lambda f, l, m: eval_sums(params, f, l, m, ks))(
                features_k, labels_k, mask_k)
            return jnp.sum(rows, axis=0)

        # gather-fused eval for device-resident data (one dispatch per
        # K-batch chunk, index-only input — same win as gather_scan_step)
        @functools.partial(jax.jit, static_argnums=(5,))
        def eval_gather(params, feats_all, labels_all, mask_all, idx_k, ks):
            def one(idx):
                f = take_features(feats_all, idx)
                l = jnp.take(labels_all, idx, axis=0)
                m = jnp.take(mask_all, idx, axis=0)
                return eval_sums(params, f, l, m, ks)

            return jnp.sum(jax.vmap(one)(idx_k), axis=0)

        return eval_batch, eval_batches, eval_gather

    # ----------------------------------------------------------------- train

    def train_epoch(self, batches: Iterable[RankingBatch], epoch_k: int = 1) -> Tuple[float, bool]:
        """One epoch; returns (mean loss per query, stop_training).

        Mirrors reference NeuralRanker.train/train_op (base/ranker.py:565-603):
        per-epoch StepLR lr, per-batch optimizer step, NaN/zero guard every
        stop_check_freq epochs.
        """
        from ptranking_tpu.models.quantize import is_quantized
        from ptranking_tpu.utils.chunking import iter_shape_chunks

        if is_quantized(self.params):
            raise RuntimeError(
                "this ranker holds int8-quantized inference params "
                "(AdhocRanker.quantized()); rounding has no gradient — "
                "train the original ranker instead")
        self.opt_state = set_lr(self.opt_state, epoch_lr(self.opt_cfg, epoch_k))
        check = (epoch_k % self.stop_check_freq) == 0
        losses, num_queries = [], 0
        # in stop-check epochs run per-step so the guard sees every batch
        chunk = 1 if check else self.scan_steps
        for batch_chunk, fused in iter_shape_chunks(batches, chunk):
            if check:
                b0 = batch_chunk[0]
                scores = self._compiled_predict(self.params, b0.features, b0.mask)
                masked = jnp.where(b0.mask, scores, 0.0)
                if not bool(jnp.all(jnp.isfinite(masked))) or not bool(jnp.any(masked != 0.0)):
                    return float("nan"), True
            for b in batch_chunk:
                num_queries += int(np.sum(np.asarray(b.mask).any(axis=-1)))
            # losses stay on device; a float() here would sync every step and
            # stall XLA's async dispatch pipeline
            if fused:
                # device-side stack: prefetched batches already live on-chip,
                # a host np.stack would round-trip them
                f = jnp.stack([jnp.asarray(b.features) for b in batch_chunk])
                l = jnp.stack([jnp.asarray(b.labels) for b in batch_chunk])
                m = jnp.stack([jnp.asarray(b.mask) for b in batch_chunk])
                self._key, sub = jax.random.split(self._key)
                self.params, self.opt_state, loss = self._compiled_scan_step(
                    self.params, self.opt_state, sub, f, l, m)
                losses.append(loss)
            else:
                for b in batch_chunk:
                    self._key, sub = jax.random.split(self._key)
                    self.params, self.opt_state, loss = self._compiled_step(
                        self.params, self.opt_state, sub, b.features, b.labels, b.mask)
                    losses.append(loss)
        total_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return total_loss / max(num_queries, 1), False

    def train_epoch_resident(self, res, epoch_k: int = 1,
                             shuffle: bool = True) -> Tuple[float, bool]:
        """One epoch over a DeviceResidentDataset: the gather-fused step runs
        a whole K-batch chunk per dispatch, reading batches straight out of
        the resident bucket arrays — per-epoch host->device traffic is just
        the [k, B] index chunks."""
        self.opt_state = set_lr(self.opt_state, epoch_lr(self.opt_cfg, epoch_k))
        losses = []
        checked = (epoch_k % self.stop_check_freq) != 0
        for bucket, idx_k, _n_real in res.epoch_index_chunks(
                shuffle, epoch_k, self.scan_steps):
            feats_all, labels_all, mask_all = res.bucket_arrays(bucket)
            if not checked:  # NaN/zero guard once per check epoch
                idx0 = jnp.asarray(idx_k[0])
                f0 = take_features(feats_all, idx0)
                m0 = jnp.take(mask_all, idx0, axis=0)
                scores = self._compiled_predict(self.params, f0, m0)
                masked = jnp.where(m0, scores, 0.0)
                if not bool(jnp.all(jnp.isfinite(masked))) or not bool(jnp.any(masked != 0.0)):
                    return float("nan"), True
                checked = True
            self._key, sub = jax.random.split(self._key)
            self.params, self.opt_state, loss = self._compiled_gather_scan(
                self.params, self.opt_state, sub, feats_all, labels_all,
                mask_all, jnp.asarray(idx_k))
            losses.append(loss)
        total_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        if not np.isfinite(total_loss):
            return float("nan"), True
        return total_loss / max(res.num_queries, 1), False

    def predict(self, batch: RankingBatch) -> jnp.ndarray:
        return self._compiled_predict(self.params, batch.features, batch.mask)

    def quantized(self) -> "AdhocRanker":
        """Inference-only view with per-channel int8 weights
        (models/quantize.py): every dense matmul runs int8 x int8 -> int32
        on the MXU (2x bf16 peak, quarter the weight HBM traffic).
        predict/evaluate work unchanged — the jits retrace for the int8
        tree; training the view is unsupported (rounding has no gradient),
        so opt_state is dropped to make that loud."""
        import copy

        from ptranking_tpu.models.quantize import quantize_scorer_params

        assert self.params is not None, "init()/load() first"
        r = copy.copy(self)
        r.params = quantize_scorer_params(self.params)
        r.opt_state = None
        return r

    def stop_training(self, batch: RankingBatch) -> bool:
        """NaN/all-zero prediction guard on one batch (reference
        stop_training, base/ranker.py:547-561): True = training has failed."""
        scores = self._compiled_predict(self.params, batch.features, batch.mask)
        masked = jnp.where(batch.mask, scores, 0.0)
        finite = bool(jnp.all(jnp.isfinite(masked)))
        nonzero = bool(jnp.any(masked != 0.0))
        return (not finite) or (not nonzero)

    # ------------------------------------------------------------------ eval

    def evaluate(self, batches: Iterable[RankingBatch], ks=(1, 3, 5, 10, 20, 50)) -> Dict[str, np.ndarray]:
        """Dataset-level metric means (reference adhoc_performance_at_ks,
        base/ranker.py:202-268) with everything but the final sums on-device.
        Same-shape batches are evaluated K per dispatch (per-batch BN
        semantics preserved — see _build_eval) to amortize dispatch cost."""
        ks = tuple(ks)
        # a dataset object (has .batches) may be passed directly; the
        # device-resident kind takes the gather-fused path
        if hasattr(batches, "batches"):
            from ptranking_tpu.data.device_cache import DeviceResidentDataset

            if isinstance(batches, DeviceResidentDataset):
                return self._evaluate_resident(batches, ks)
            batches = batches.batches()
        from ptranking_tpu.utils.chunking import iter_shape_chunks

        packed_rows = []  # device-side [4K+1] vectors; ONE host sync at the end
        for batch_chunk, fused in iter_shape_chunks(batches, self.scan_steps):
            if fused:
                f = jnp.stack([jnp.asarray(b.features) for b in batch_chunk])
                l = jnp.stack([jnp.asarray(b.labels) for b in batch_chunk])
                m = jnp.stack([jnp.asarray(b.mask) for b in batch_chunk])
                packed_rows.append(self._compiled_eval_scan(self.params, f, l, m, ks))
            else:
                for b in batch_chunk:
                    packed_rows.append(self._compiled_eval(
                        self.params, b.features, b.labels, b.mask, ks))
        return _reduce_packed_rows(packed_rows, len(ks))

    def _evaluate_resident(self, res, ks) -> Dict[str, np.ndarray]:
        """Gather-fused dataset evaluation over a DeviceResidentDataset.

        Eval chunk size is fixed at 64: evaluation has no donated buffers or
        optimizer state, so fused chunks only cut dispatch count — and the
        K-sweep (tools/bench_dispatch.py) measured eval peaking at chunk 64
        (27.1k lists/s vs 23.6k at 128), independent of the train K."""
        packed_rows = []
        for bucket, idx_k, _ in res.epoch_index_chunks(False, 0, EVAL_CHUNK):
            f, l, m = res.bucket_arrays(bucket)
            packed_rows.append(self._compiled_eval_gather(
                self.params, f, l, m, jnp.asarray(idx_k), ks))
        return _reduce_packed_rows(packed_rows, len(ks))

    def validation(self, batches, k: int = 5, metric: str = "nDCG") -> float:
        """Validation scalar (reference validation, base/ranker.py:189-200).
        Accepts an iterator of batches or a dataset object."""
        return float(self.evaluate(batches, ks=(k,))[metric][0])

    def evaluate_per_query(self, batches: Iterable[RankingBatch],
                           ks=(1, 3, 5, 10, 20, 50)) -> Dict[str, np.ndarray]:
        """Per-query metric matrices [num_queries, len(ks)] for real queries
        (reference reproduce-mode per-query pickles, parameter.py:814-831)."""
        from ptranking_tpu.metrics.adhoc import evaluate_all_at_ks

        ks = tuple(ks)
        rows: Dict[str, list] = {m: [] for m in ("nDCG", "nERR", "AP", "P")}
        for batch in batches:
            scores = self._compiled_predict(self.params, batch.features, batch.mask)
            out = evaluate_all_at_ks(scores, batch.labels, batch.mask, ks, self.label_type)
            real = np.asarray(batch.mask).any(axis=-1)
            for m in rows:
                rows[m].append(np.asarray(out[m])[real])
        return {m: (np.concatenate(v) if v else np.zeros((0, len(ks))))
                for m, v in rows.items()}

    # ----------------------------------------------------------------- io

    def checkpoint(self) -> Dict[str, Any]:
        to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
        return {
            "model_id": self.model_id,
            # self-describing: enough to rebuild the ranker for serving
            "scorer_cfg": self.scorer_cfg,
            "model_paras": self.model_paras,
            "opt_cfg": self.opt_cfg,
            "label_type": self.label_type,
            "params": to_np(self.params),
            "opt_state": to_np(self.opt_state),
            "key": np.asarray(self._key),
        }

    @classmethod
    def from_checkpoint(cls, path: str) -> "AdhocRanker":
        """Rebuild a ranker for inference/resume from a self-describing
        checkpoint (older checkpoints without scorer_cfg are rejected)."""
        with open(path, "rb") as f:
            d = pickle.load(f)
        if "scorer_cfg" not in d:
            raise ValueError(f"checkpoint {path} predates self-describing "
                             "checkpoints; rebuild the ranker manually")
        ranker = cls(d["model_id"], d["scorer_cfg"], model_paras=d["model_paras"],
                     opt_cfg=d["opt_cfg"], label_type=d["label_type"])
        ranker.init()
        ranker.load(path)
        return ranker

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.checkpoint(), f, protocol=pickle.HIGHEST_PROTOCOL)

    def load(self, path: str):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        return self.restore(ckpt)

    def restore(self, ckpt: Dict[str, Any]):
        """Populate params/opt-state/key from an in-memory checkpoint dict
        (lets resume paths read the pickle once for both state and metadata)."""
        assert ckpt["model_id"] == self.model_id, (ckpt["model_id"], self.model_id)
        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.params = to_dev(ckpt["params"])
        self.opt_state = jax.tree_util.tree_map(jnp.asarray, ckpt["opt_state"])
        self._key = jnp.asarray(ckpt["key"])
        return self

    def load_params_only(self, path: str):
        """Reference-style load: scorer weights only (point_ranker.py:69-71)."""
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        return self
