"""Device-resident dataset tests: batch-schedule equivalence with the
streamed BucketedDataset, and the gather-fused training path."""

import numpy as np
import jax.numpy as jnp

from ptranking_tpu.data import BucketedDataset, make_synthetic_queries
from ptranking_tpu.data.device_cache import (
    DeviceResidentDataset,
    maybe_device_resident,
    packed_nbytes,
)
from ptranking_tpu.models import ScorerConfig
from ptranking_tpu.train import AdhocRanker, OptimizerConfig


def _ds(n=23, seed=3):
    qs = make_synthetic_queries(num_queries=n, num_features=12, seed=seed,
                                min_docs=5, max_docs=30)
    return BucketedDataset(qs, batch_docs=64, num_features=12)


def test_resident_batches_match_streamed():
    ds = _ds()
    res = DeviceResidentDataset(ds)
    for shuffle, epoch in ((False, 0), (True, 3)):
        for b1, b2 in zip(ds.batches(shuffle=shuffle, epoch=epoch),
                          res.batches(shuffle=shuffle, epoch=epoch)):
            np.testing.assert_allclose(np.asarray(b2.features), b1.features)
            np.testing.assert_allclose(np.asarray(b2.labels), b1.labels)
            np.testing.assert_array_equal(np.asarray(b2.mask), b1.mask)
            np.testing.assert_array_equal(np.asarray(b2.qids), b1.qids)
    assert len(res) == len(ds) and res.num_queries == ds.num_queries


def test_epoch_index_chunks_cover_schedule():
    ds = _ds()
    res = DeviceResidentDataset(ds)
    streamed = list(ds.batches(shuffle=True, epoch=5))
    total_real = sum(int(np.asarray(b.mask).any(axis=-1).sum()) for b in streamed)
    chunk_real = 0
    n_batches = 0
    for bucket, idx_k, n_real in res.epoch_index_chunks(shuffle=True, epoch=5,
                                                        chunk_size=3):
        chunk_real += n_real
        n_batches += idx_k.shape[0]
        f, l, m = res.bucket_arrays(bucket)
        assert idx_k.max() <= f.shape[0] - 1  # sentinel row is the max index
    assert chunk_real == total_real == ds.num_queries
    assert n_batches == len(streamed)


def test_gather_fused_training_matches_streamed_learning():
    ds = _ds(n=48, seed=7)
    res = DeviceResidentDataset(ds)
    cfg = ScorerConfig(sf_id="pointsf", num_features=12, num_layers=2,
                       h_dim=16, dropout=0.0, apply_tl_af=False)

    def run(resident):
        r = AdhocRanker("RankNet", cfg, opt_cfg=OptimizerConfig(opt="Adam", lr=1e-2),
                        scan_steps=4).init()
        for e in range(1, 6):
            if resident:
                loss, stop = r.train_epoch_resident(res, e)
            else:
                loss, stop = r.train_epoch(ds.batches(shuffle=True, epoch=e), e)
            assert not stop and np.isfinite(loss)
        return r.validation(res.batches(), k=5)

    v_res, v_str = run(True), run(False)
    assert v_res > 0.5 and v_str > 0.5, (v_res, v_str)


def test_gather_fused_nan_guard_trips():
    ds = _ds(n=12, seed=9)
    res = DeviceResidentDataset(ds)
    cfg = ScorerConfig(sf_id="pointsf", num_features=12, num_layers=2,
                       h_dim=16, dropout=0.0, apply_tl_af=False)
    r = AdhocRanker("RankNet", cfg, scan_steps=4).init()
    import jax

    r.params = jax.tree_util.tree_map(lambda a: jnp.full_like(a, jnp.nan), r.params)
    loss, stop = r.train_epoch_resident(res, epoch_k=r.stop_check_freq)
    assert stop is True


def test_maybe_device_resident_budget():
    ds = _ds()
    assert isinstance(maybe_device_resident(ds, budget_bytes=packed_nbytes(ds) + 1),
                      DeviceResidentDataset)
    assert maybe_device_resident(ds, budget_bytes=16) is ds


def test_div_resident_matches_streamed():
    from ptranking_tpu.data.device_cache import DivDeviceResidentDataset
    from ptranking_tpu.diversification import (
        DivBucketedDataset, make_synthetic_div_queries)

    qs = make_synthetic_div_queries(num_queries=11, num_features=16,
                                    min_docs=5, max_docs=20, seed=3)
    ds = DivBucketedDataset(qs, batch_queries=4)
    res = DivDeviceResidentDataset(ds)
    for b1, b2 in zip(ds.batches(shuffle=True, epoch=2),
                      res.batches(shuffle=True, epoch=2)):
        np.testing.assert_allclose(np.asarray(b2.q_repr), b1.q_repr)
        np.testing.assert_allclose(np.asarray(b2.doc_reprs), b1.doc_reprs)
        np.testing.assert_allclose(np.asarray(b2.rele_mat), b1.rele_mat)
        np.testing.assert_array_equal(np.asarray(b2.doc_mask), b1.doc_mask)
        np.testing.assert_array_equal(np.asarray(b2.subtopic_mask), b1.subtopic_mask)
        np.testing.assert_array_equal(np.asarray(b2.qids), b1.qids)


def test_div_resident_training_and_eval():
    from ptranking_tpu.data.device_cache import DivDeviceResidentDataset
    from ptranking_tpu.diversification import (
        DivBucketedDataset, DivRanker, DivScorerConfig,
        make_synthetic_div_queries)

    qs = make_synthetic_div_queries(num_queries=12, num_features=16,
                                    min_docs=6, max_docs=12, seed=5)
    ds = DivBucketedDataset(qs, batch_queries=4)
    res = DivDeviceResidentDataset(ds)
    cfg = DivScorerConfig(sf_id="pointsf", num_features=16, h_dim=16,
                          num_layers=2, dropout=0.0)
    r = DivRanker("DALETOR", cfg, scan_steps=2).init()
    for e in range(1, 4):
        loss, stop = r.train_epoch_resident(res, e)
        assert not stop and np.isfinite(loss)
    # resident eval == streamed eval for the same params
    m_res = r.evaluate(res, ks=(1, 5))
    m_str = r.evaluate(ds.batches(), ks=(1, 5))
    for k in m_str:
        np.testing.assert_allclose(m_res[k], m_str[k], atol=1e-5)


def test_iter_shape_chunks_policy():
    from collections import namedtuple

    from ptranking_tpu.utils.chunking import iter_shape_chunks

    B = namedtuple("B", "features")
    mk = lambda shape: B(np.zeros(shape))
    seq = [mk((2, 4))] * 5 + [mk((2, 8))] * 2 + [mk((2, 4))]
    chunks = list(iter_shape_chunks(seq, 2))
    # 5x(2,4): two fused pairs + a tail-of-bucket... boundary flush, then
    # 2x(2,8) fused, then 1x(2,4) tail
    sizes = [(len(c), fused) for c, fused in chunks]
    assert sizes == [(2, True), (2, True), (1, False), (2, True), (1, False)]
    # chunk_size=1 never fuses
    assert all(not fused for _, fused in iter_shape_chunks(seq, 1))
    # all chunks preserve order and cover every batch exactly once
    flat = [b for c, _ in chunks for b in c]
    assert [b.features.shape for b in flat] == [b.features.shape for b in seq]


def test_percent_remainder_uses_sentinel():
    """percent sampling must pad remainders with the all-masked sentinel,
    never a real query's row (review finding r2)."""
    ds = _ds(n=10, seed=1)
    res = DeviceResidentDataset(ds)
    for b_str, b_res in zip(ds.batches(percent=0.5, epoch=4),
                            res.batches(percent=0.5, epoch=4)):
        np.testing.assert_array_equal(np.asarray(b_res.mask), b_str.mask)
        np.testing.assert_array_equal(np.asarray(b_res.qids), b_str.qids)
        real_str = int(np.asarray(b_str.mask).any(axis=-1).sum())
        real_res = int(np.asarray(b_res.mask).any(axis=-1).sum())
        assert real_str == real_res


def test_bf16_resident_features():
    import jax.numpy as jnp

    ds = _ds()
    res = DeviceResidentDataset(ds, dtype="bfloat16")
    b = next(iter(res.batches()))
    assert b.features.dtype == jnp.bfloat16
    assert b.labels.dtype == jnp.float32  # labels stay exact
    # the budget math halves the feature term
    assert packed_nbytes(ds, "bfloat16") < packed_nbytes(ds)
    slim = maybe_device_resident(ds, budget_bytes=packed_nbytes(ds) - 1,
                                 dtype="bfloat16")
    assert isinstance(slim, DeviceResidentDataset)


def test_bf16_features_keep_fp32_loss_math():
    """Scores (and thus loss/grad math) stay fp32 even for bf16-stored
    features — bf16 is confined to the scorer compute (review finding r3)."""
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    cfg = ScorerConfig.default_listsf(12, ff_dims=(16,), encoder_layers=1,
                                      dropout=0.0, compute_dtype="bfloat16")
    params = init_scorer(jax.random.PRNGKey(0), cfg)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12), jnp.float32)
    mask = jnp.ones((2, 8), bool)
    s32 = apply_scorer(params, cfg, x32, mask)
    s16 = apply_scorer(params, cfg, x32.astype(jnp.bfloat16), mask)
    assert s32.dtype == jnp.float32 and s16.dtype == jnp.float32
    # identical compute: the fp32 path casts to bf16 at entry anyway
    np.testing.assert_allclose(np.asarray(s32), np.asarray(s16), atol=1e-6)


def test_int8_resident_features():
    """int8 affine-quantized residency: quarter-size budget math, dequantized
    fp32 batches, and training/eval through the gather-fused path landing at
    the fp32 result (a TPU HBM/bandwidth lever, no reference analogue)."""
    from ptranking_tpu.data.device_cache import (QuantFeats, quantize_features,
                                                 take_features)

    # roundtrip bound: |dequant - x| <= (max-min)/254/2 per feature
    rng = np.random.RandomState(0)
    f = rng.randn(7, 20, 5).astype(np.float32) * np.array(
        [1, 10, 100, 0.01, 1], np.float32)
    m = rng.rand(7, 20) > 0.3
    qf = quantize_features(f, m)
    assert isinstance(qf, QuantFeats) and qf.data.dtype == jnp.int8
    deq = np.asarray(take_features(qf, jnp.arange(7)))
    lo = np.where(m[..., None], f, np.inf).min((0, 1))
    hi = np.where(m[..., None], f, -np.inf).max((0, 1))
    err = np.abs(np.where(m[..., None], deq - f, 0.0))
    assert (err <= ((hi - lo) / 508.0 + 1e-5 * np.abs(f) + 1e-6)).all()

    ds = _ds()
    assert packed_nbytes(ds, "int8") < packed_nbytes(ds) * 0.45
    res8 = DeviceResidentDataset(ds, dtype="int8")
    b8 = next(iter(res8.batches()))
    assert b8.features.dtype == jnp.float32  # dequantized for consumers
    b32 = next(iter(DeviceResidentDataset(ds).batches()))
    diff = jnp.max(jnp.where(b8.mask[..., None],
                             jnp.abs(b8.features - b32.features), 0.0))
    assert float(diff) < 0.05

    def run(res):
        r = AdhocRanker("LambdaRank",
                        ScorerConfig.default_pointsf(num_features=12),
                        opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
        for e in range(1, 7):
            loss, stop = r.train_epoch_resident(res, e)
            assert not stop and np.isfinite(loss)
        return float(r.evaluate(res, ks=(5,))["nDCG"][0])

    assert abs(run(res8) - run(DeviceResidentDataset(ds))) < 0.02
