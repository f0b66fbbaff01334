"""Device-resident dataset: upload once, gather batches on-chip.

The per-epoch host->device stream of every batch is the real-training
bottleneck on a remote-attached chip (BASELINE.md dispatch/transfer notes):
the dataset is identical every epoch — only the batch ORDER changes. This
wrapper uploads each bucket's packed arrays to HBM once and reconstitutes
batches as on-device gathers, so per-epoch traffic is just the permutation
indices (a few KB).

Remainder batches are padded with an all-masked sentinel row appended to
each bucket (index Q), matching BucketedDataset.batches' padded-remainder
semantics exactly (same RNG, same order, same shapes).
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple, Optional

import numpy as np

from ptranking_tpu.data.dataset import BucketedDataset
from ptranking_tpu.types import RankingBatch


class QuantFeats(NamedTuple):
    """int8-quantized resident features: data [Q+1, N, F] int8 with a
    per-feature affine dequant (x ~= data * scale + offset, scale/offset
    [F] fp32). Quarter the HBM (and gather bandwidth) of fp32, half of
    bf16; max quantization error is (max-min)/508 per feature. A NamedTuple
    is a pytree, so it passes straight through jit boundaries — the gather
    + dequant fuse into the compiled step (take_features)."""

    data: object   # int8 [Q+1, N, F]
    scale: object  # fp32 [F]
    offset: object # fp32 [F]


def quantize_features(feats: np.ndarray, mask: np.ndarray) -> QuantFeats:
    """Per-feature affine int8 quantization over the REAL (masked-in)
    entries; padded slots quantize to whatever bin 0 lands in (they are
    masked downstream — only finiteness matters)."""
    import jax.numpy as jnp

    real = mask[..., None]
    big = np.float32(np.inf)
    lo = np.where(real, feats, big).min(axis=(0, 1)).astype(np.float32)
    hi = np.where(real, feats, -big).max(axis=(0, 1)).astype(np.float32)
    if np.asarray(mask).any():
        # a non-finite hi/lo means a real feature value is inf/NaN —
        # quantizing would silently destroy the whole column (fp32 residency
        # would at least trip the NaN stop guard), so fail loudly instead
        bad = ~(np.isfinite(lo) & np.isfinite(hi))
        if bad.any():
            raise ValueError(
                f"int8 residency: feature columns "
                f"{np.nonzero(bad)[0].tolist()} contain non-finite values; "
                "clean the data or use fp32/bf16 device_resident_dtype")
    else:  # no real entries at all: quantize the zeros trivially
        lo = np.zeros_like(lo)
        hi = np.zeros_like(hi)
    scale = np.maximum(hi - lo, 1e-12) / 254.0
    offset = (hi + lo) / 2.0
    q = np.clip(np.rint((feats - offset) / scale), -127, 127).astype(np.int8)
    return QuantFeats(jnp.asarray(q), jnp.asarray(scale), jnp.asarray(offset))


def _n_rows(feats) -> int:
    """Row count (incl. the sentinel) of resident features — dense array or
    QuantFeats."""
    return (feats.data if isinstance(feats, QuantFeats) else feats).shape[0]


def take_features(feats, idx):
    """Gather batch rows from resident features — dense array or QuantFeats
    (gather int8, dequantize to fp32 in-program; the scorer casts to its
    compute dtype on entry as usual)."""
    import jax.numpy as jnp

    if isinstance(feats, QuantFeats):
        q = jnp.take(feats.data, idx, axis=0)
        return q.astype(jnp.float32) * feats.scale + feats.offset
    return jnp.take(feats, idx, axis=0)


def padded_host_arrays(ds: BucketedDataset, bucket: int):
    """One bucket's packed HOST arrays with the all-masked sentinel row
    appended (index Q) — the exact layout the resident paths gather from."""
    feats, labels, mask, _ = ds._packed[bucket]
    f = np.concatenate([feats, np.zeros_like(feats[:1])], axis=0)
    l = np.concatenate([labels, np.zeros_like(labels[:1])], axis=0)
    m = np.concatenate([mask, np.zeros_like(mask[:1])], axis=0)
    return f, l, m


def packed_nbytes(ds: BucketedDataset, dtype=None) -> int:
    """HBM bytes needed to host the dataset's packed arrays (features at
    `dtype` when given — e.g. bfloat16 halves the dominant term)."""
    total = 0
    for feats, labels, mask, _ in ds._packed.values():
        f_bytes = feats.nbytes
        if dtype is not None:
            f_bytes = feats.size * np.dtype(
                np.float16 if str(dtype) in ("bfloat16", "float16") else dtype).itemsize
        total += f_bytes + labels.nbytes + mask.nbytes
    return total


class DeviceResidentDataset:
    """Wraps a BucketedDataset; yields batches gathered on-device.

    Drop-in for the `batches()` consumer contract (train_epoch / evaluate):
    identical batch composition and order to the wrapped dataset for the
    same (shuffle, epoch) arguments.
    """

    def __init__(self, ds: BucketedDataset, dtype=None):
        import jax.numpy as jnp

        self.ds = ds
        self.num_queries = ds.num_queries
        self.buckets = ds.buckets
        self.batch_docs = ds.batch_docs
        self._dev = {}
        for b, (_, _, _, qids) in ds._packed.items():
            # one sentinel all-masked row at index Q for padded remainders
            f, l, m = padded_host_arrays(ds, b)
            if str(dtype) == "int8":
                # affine per-feature int8: quarter the fp32 bytes (and
                # gather bandwidth); dequant fuses into the compiled step
                fd = quantize_features(f, m.astype(bool))
            elif dtype is not None:
                # features only (bf16 stays confined to the scorer compute;
                # apply_scorer promotes scores back to fp32). Cast on the
                # HOST so the upload ships half the bytes and HBM never holds
                # a transient fp32 copy
                try:
                    import ml_dtypes

                    np_dtype = (ml_dtypes.bfloat16 if str(dtype) == "bfloat16"
                                else np.dtype(dtype))
                    f = f.astype(np_dtype)
                    fd = jnp.asarray(f)
                except ImportError:  # pragma: no cover - ml_dtypes ships with jax
                    fd = jnp.asarray(f).astype(
                        jnp.bfloat16 if str(dtype) == "bfloat16" else dtype)
            else:
                fd = jnp.asarray(f)
            self._dev[b] = (fd, jnp.asarray(l), jnp.asarray(m), qids)

    def batch_size_for(self, bucket: int) -> int:
        return self.ds.batch_size_for(bucket)

    def qid_for(self, batch: RankingBatch, row: int):
        return self.ds.qid_for(batch, row)

    def batches(self, shuffle: bool = False, epoch: int = 0,
                drop_remainder: bool = False,
                percent: Optional[float] = None) -> Iterator[RankingBatch]:
        """Same iteration contract as BucketedDataset.batches (same RNG
        stream), with features/labels/mask as on-device gathers."""
        import jax.numpy as jnp

        rng = np.random.RandomState(self.ds.seed + epoch)
        for b in self._dev:
            feats, labels, mask, qids = self._dev[b]
            sentinel = _n_rows(feats) - 1  # the all-masked pad row
            Q = sentinel
            B = self.batch_size_for(b)
            idx = rng.permutation(Q) if (shuffle or percent) else np.arange(Q)
            if percent is not None:
                assert 0.0 < percent <= 1.0
                idx = idx[: max(1, int(Q * percent))]
                Q = len(idx)
            n_full = Q // B
            for i in range(n_full):
                sl = idx[i * B:(i + 1) * B]
                sl_d = jnp.asarray(sl)
                yield RankingBatch(take_features(feats, sl_d),
                                   jnp.take(labels, sl_d, axis=0),
                                   jnp.take(mask, sl_d, axis=0),
                                   qids[sl])
            rem = Q - n_full * B
            if rem and not drop_remainder:
                sl = idx[n_full * B:]
                # the SENTINEL index fills the padded tail rows (NOT the
                # post-percent Q, which would gather a real query's row)
                sl_pad = np.full((B,), sentinel, np.int64)
                sl_pad[:rem] = sl
                sl_d = jnp.asarray(sl_pad)
                qi = np.full((B,), -1, np.int32)
                qi[:rem] = qids[sl]
                yield RankingBatch(take_features(feats, sl_d),
                                   jnp.take(labels, sl_d, axis=0),
                                   jnp.take(mask, sl_d, axis=0), qi)

    def epoch_index_chunks(self, shuffle: bool = False, epoch: int = 0,
                           chunk_size: int = 8):
        """Yield (bucket, idx [k, B] int64, num_real_queries) chunks covering
        the exact batch schedule of batches(shuffle, epoch) — the input to
        the gather-fused train step (train/ranker.py gather_scan_step).
        Remainder batches appear as sentinel-padded index rows, so a chunk
        needs no special-casing; tail chunks have k < chunk_size (their
        compiled programs are reused every epoch — the schedule is fixed)."""
        rng = np.random.RandomState(self.ds.seed + epoch)
        for b in self._dev:
            feats, _, _, qids = self._dev[b]
            Q = _n_rows(feats) - 1
            B = self.batch_size_for(b)
            idx = rng.permutation(Q) if shuffle else np.arange(Q)
            n_full = Q // B
            rows = [idx[i * B:(i + 1) * B] for i in range(n_full)]
            real = [B] * n_full
            rem = Q - n_full * B
            if rem:
                pad = np.full((B,), Q, np.int64)
                pad[:rem] = idx[n_full * B:]
                rows.append(pad)
                real.append(rem)
            for lo in range(0, len(rows), chunk_size):
                sub = rows[lo:lo + chunk_size]
                yield b, np.stack(sub).astype(np.int64), int(sum(real[lo:lo + chunk_size]))

    def bucket_arrays(self, bucket: int):
        """(features, labels, mask) device arrays for one bucket (incl. the
        sentinel row)."""
        f, l, m, _ = self._dev[bucket]
        return f, l, m

    def __len__(self):
        return len(self.ds)


def maybe_device_resident(ds: BucketedDataset, budget_bytes: int = 1 << 30,
                          dtype=None):
    """Return a DeviceResidentDataset when the packed arrays fit the HBM
    budget (features stored at `dtype` when given), else the original
    dataset (streamed per epoch)."""
    if packed_nbytes(ds, dtype) <= budget_bytes:
        return DeviceResidentDataset(ds, dtype=dtype)
    return ds


def div_packed_nbytes(ds) -> int:
    """HBM bytes needed to host a DivBucketedDataset's packed arrays."""
    return sum(sum(a.nbytes for a in arrs) for arrs in ds._packed.values())


def maybe_div_device_resident(ds, budget_bytes: int = 1 << 30):
    """Resident when the packed div arrays fit the HBM budget, else streamed
    (same guard as maybe_device_resident)."""
    if div_packed_nbytes(ds) <= budget_bytes:
        return DivDeviceResidentDataset(ds)
    return ds


class DivDeviceResidentDataset:
    """Device-resident twin for the diversification branch (DivBucketedDataset):
    same upload-once + sentinel-row + index-chunk contract as
    DeviceResidentDataset, over (q_repr, doc_reprs, rele_mat, doc_mask,
    subtopic_mask) buckets."""

    def __init__(self, ds):
        import jax.numpy as jnp

        self.ds = ds
        self.num_queries = ds.num_queries
        self.batch_queries = ds.batch_queries
        self._dev = {}
        for b, arrs in ds._packed.items():
            padded = []
            for a in arrs:
                padded.append(jnp.asarray(
                    np.concatenate([a, np.zeros((1, *a.shape[1:]), a.dtype)], axis=0)))
            self._dev[b] = tuple(padded)

    def query_for(self, batch, row: int):
        return self.ds.query_for(batch, row)

    def bucket_arrays(self, bucket: int):
        return self._dev[bucket]

    def epoch_index_chunks(self, shuffle: bool = False, epoch: int = 0,
                           chunk_size: int = 8):
        """(bucket, idx [k, B] int64, num_real) chunks covering the exact
        schedule of batches(shuffle, epoch)."""
        rng = np.random.RandomState(self.ds.seed + epoch)
        B = self.batch_queries
        for b in self._dev:
            Q = self._dev[b][0].shape[0] - 1
            idx = rng.permutation(Q) if shuffle else np.arange(Q)
            rows, real = [], []
            for lo in range(0, Q, B):
                sl = idx[lo:lo + B]
                row = np.full((B,), Q, np.int64)
                row[:len(sl)] = sl
                rows.append(row)
                real.append(len(sl))
            for lo in range(0, len(rows), chunk_size):
                sub = rows[lo:lo + chunk_size]
                yield b, np.stack(sub), int(sum(real[lo:lo + chunk_size]))

    def batches(self, shuffle: bool = False, epoch: int = 0):
        """On-device gathered DivBatch stream, schedule-equivalent to the
        wrapped dataset."""
        import jax.numpy as jnp

        from ptranking_tpu.diversification.data import DivBatch

        for b, idx_k, _ in self.epoch_index_chunks(shuffle, epoch, 1):
            q, d, rm, dm, sm = self._dev[b]
            sl = jnp.asarray(idx_k[0])
            Q = q.shape[0] - 1
            qids = np.where(idx_k[0] < Q, idx_k[0], -1).astype(np.int32)
            yield DivBatch(jnp.take(q, sl, 0), jnp.take(d, sl, 0),
                           jnp.take(rm, sl, 0), jnp.take(dm, sl, 0),
                           jnp.take(sm, sl, 0), qids)

    def __len__(self):
        return len(self.ds)
