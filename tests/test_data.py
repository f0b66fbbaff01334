"""Data layer tests: parser semantics, grouping/clipping, scalers, bucketing."""

import numpy as np
import pytest

from ptranking_tpu.data import (
    BucketedDataset,
    group_and_clip,
    load_letor_file,
    make_synthetic_queries,
    parse_letor_lines,
    random_mask_all_labels,
    scale_features,
)

LETOR_SAMPLE = """\
2 qid:10 1:0.5 2:0.3 3:0.0 #docA extra
0 qid:10 1:0.1 2:0.0 3:0.9 #docB
1 qid:10 1:0.4 2:0.4 3:0.4 #docC
0 qid:20 1:0.0 2:0.0 3:0.0 #docD
0 qid:20 1:0.2 2:0.1 3:0.3 #docE
1 qid:30 1:0.9 2:0.9 3:0.9 #docF
"""


def test_parse_letor_with_comments():
    mat, labels, qids, docids = parse_letor_lines(
        LETOR_SAMPLE.splitlines(), has_comment=True
    )
    assert mat.shape == (6, 3)
    assert labels.tolist() == [2.0, 0.0, 1.0, 0.0, 0.0, 1.0]
    assert qids == ["10", "10", "10", "20", "20", "30"]
    assert docids == ["docA", "docB", "docC", "docD", "docE", "docF"]
    np.testing.assert_allclose(mat[0], [0.5, 0.3, 0.0])


def test_parse_letor_sparse_auto_grow():
    # LibSVM style: zero features omitted, width grows to max feature id
    lines = ["1 qid:1 2:0.4 8:0.7", "0 qid:1 5:0.5"]
    mat, labels, qids = parse_letor_lines(lines, has_comment=False)
    assert mat.shape == (2, 8)
    assert mat[0, 1] == pytest.approx(0.4)
    assert mat[0, 7] == pytest.approx(0.7)
    assert mat[1, 4] == pytest.approx(0.5)
    assert mat[1, 7] == 0.0


def test_group_and_clip_drops_irrelevant_queries():
    mat, labels, qids, _ = parse_letor_lines(LETOR_SAMPLE.splitlines(), has_comment=True)
    qs = group_and_clip(mat, labels, qids, min_rele=1, presort=True, scale_data=False)
    # qid 20 has no relevant docs -> dropped (reference clip_query_data)
    assert [q[0] for q in qs] == ["10", "30"]
    # presort: labels descending
    assert qs[0][2].tolist() == [2.0, 1.0, 0.0]


def test_group_and_clip_min_docs():
    mat, labels, qids, _ = parse_letor_lines(LETOR_SAMPLE.splitlines(), has_comment=True)
    qs = group_and_clip(mat, labels, qids, min_docs=2, min_rele=1, presort=True, scale_data=False)
    assert [q[0] for q in qs] == ["10"]  # qid 30 has 1 doc


def test_binary_rele():
    mat, labels, qids, _ = parse_letor_lines(LETOR_SAMPLE.splitlines(), has_comment=True)
    qs = group_and_clip(mat, labels, qids, binary_rele=True, presort=True, scale_data=False)
    assert qs[0][2].max() == 1.0


@pytest.mark.parametrize("scaler", ["MinMaxScaler", "RobustScaler", "StandardScaler", "SLog1P"])
def test_scalers_match_sklearn(scaler):
    x = np.random.RandomState(0).randn(20, 5).astype(np.float64) * 3 + 1
    x[:, 2] = 7.0  # constant column exercises zero-scale handling
    ours = scale_features(x, scaler)
    try:
        from sklearn.preprocessing import MinMaxScaler, RobustScaler, StandardScaler
    except ImportError:
        pytest.skip("sklearn unavailable")
    if scaler == "SLog1P":
        ref = np.sign(x) * np.log1p(np.abs(x))
    else:
        sk = {"MinMaxScaler": MinMaxScaler, "RobustScaler": RobustScaler,
              "StandardScaler": StandardScaler}[scaler]()
        ref = sk.fit_transform(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_letor_file_cache_roundtrip(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(LETOR_SAMPLE)
    qs1 = load_letor_file(str(p), data_id="LETOR", has_comment=True, scale_data=False)
    qs2 = load_letor_file(str(p), data_id="LETOR", has_comment=True, scale_data=False)  # from cache
    assert len(qs1) == len(qs2)
    for a, b in zip(qs1, qs2):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


def test_bucketed_dataset_shapes_and_coverage():
    qs = make_synthetic_queries(num_queries=50, min_docs=3, max_docs=100, seed=1)
    ds = BucketedDataset(qs, batch_docs=256, buckets=(16, 64, 128))
    seen = 0
    shapes = set()
    for batch in ds.batches():
        B, N, F = batch.features.shape
        assert batch.labels.shape == (B, N)
        assert batch.mask.shape == (B, N)
        shapes.add((B, N))
        seen += int(batch.mask.any(axis=1).sum())
        # pads must be zeroed
        assert np.all(batch.features[~batch.mask] == 0.0)
        assert np.all(batch.labels[~batch.mask] == 0.0)
    assert seen == ds.num_queries == 50
    assert len(shapes) <= 3  # few compiled shapes


def test_geometric_buckets_and_occupancy():
    """Denser bucket growth = strictly less padding, same query coverage
    (the round-5 padding-occupancy lever, docs/performance.md)."""
    from ptranking_tpu.data.dataset import geometric_buckets

    assert geometric_buckets(2.0) == (16, 32, 64, 128, 256, 512, 1024, 1536)
    for g in (1.5, 1.25):
        bs = geometric_buckets(g)
        assert all(b % 8 == 0 for b in bs) and bs[-1] == 1536
        assert all(b2 > b1 for b1, b2 in zip(bs, bs[1:]))

    qs = make_synthetic_queries(num_queries=300, min_docs=20, max_docs=250,
                                seed=4)
    total = sum(len(l) for _, _, l in qs)

    def occupancy(ds):
        padded = sum(b * len(items) for b, items in ds._by_bucket.items())
        return total / padded

    occ, seen = {}, {}
    for g in (2.0, 1.25):
        ds = BucketedDataset(qs, batch_docs=512, bucket_growth=g)
        occ[g] = occupancy(ds)
        seen[g] = sum(int(b.mask.any(axis=1).sum()) for b in ds.batches())
    assert seen[2.0] == seen[1.25] == 300
    assert occ[1.25] > occ[2.0]


def test_bucketed_dataset_shuffle_changes_order_not_content():
    qs = make_synthetic_queries(num_queries=30, seed=2)
    ds = BucketedDataset(qs, batch_docs=128)
    a = [b.qids.tolist() for b in ds.batches(shuffle=True, epoch=0)]
    b = [b.qids.tolist() for b in ds.batches(shuffle=True, epoch=1)]
    assert a != b
    flat = lambda xs: sorted(q for batch in xs for q in batch if q >= 0)
    assert flat(a) == flat(b)


def test_masking_keeps_presort():
    qs = make_synthetic_queries(num_queries=10, seed=3)
    masked = random_mask_all_labels(qs, mask_ratio=0.5, seed=4)
    for _, _, l in masked:
        assert np.all(np.diff(l) <= 0)  # still descending


def test_synthetic_is_learnable():
    qs = make_synthetic_queries(num_queries=20, seed=5)
    # the teacher signal must be recoverable: top-labeled doc has high feature norm corr
    assert all((l > 0).sum() >= 1 for _, _, l in qs)


# --- prefetch / multi-host input sharding (data/prefetch.py) ------------------


def test_prefetch_to_device_matches_plain():
    import numpy as np

    from ptranking_tpu.data import prefetch_to_device
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries

    qs = make_synthetic_queries(num_queries=20, num_features=8, seed=0)
    ds = BucketedDataset(qs, batch_docs=256)
    plain = list(ds.batches())
    pre = list(prefetch_to_device(ds.batches()))
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features))
        np.testing.assert_allclose(np.asarray(a.labels), np.asarray(b.labels))


def test_prefetch_propagates_producer_errors():
    import pytest

    from ptranking_tpu.data import prefetch_to_device
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries

    qs = make_synthetic_queries(num_queries=4, num_features=4, seed=1)
    batch = next(iter(BucketedDataset(qs, batch_docs=64).batches()))

    def gen():
        yield batch
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_to_device(gen()))


def test_shard_for_process_partitions_everything():
    from ptranking_tpu.data import shard_for_process

    items = list(range(13))
    shards = [shard_for_process(items, i, 4) for i in range(4)]
    assert sorted(x for s in shards for x in s) == items
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_percent_sampling():
    """percent samples a fraction of each bucket's queries per epoch
    (reference LETORPercentSampler, data_utils.py:744-760)."""
    import numpy as np

    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries

    qs = make_synthetic_queries(num_queries=40, num_features=6, min_docs=12,
                                max_docs=12, seed=3)
    ds = BucketedDataset(qs, batch_docs=16 * 4, buckets=(16,))
    full = sum(int(np.asarray(b.mask).any(-1).sum()) for b in ds.batches())
    half = sum(int(np.asarray(b.mask).any(-1).sum()) for b in ds.batches(percent=0.5))
    assert full == 40 and half == 20
    # different epochs sample different subsets
    e1 = {int(q) for b in ds.batches(percent=0.5, epoch=1) for q in np.asarray(b.qids) if q >= 0}
    e2 = {int(q) for b in ds.batches(percent=0.5, epoch=2) for q in np.asarray(b.qids) if q >= 0}
    assert e1 != e2


# --- native C++ LETOR parser (native/letor_parser.cpp) ------------------------


def _write_letor(path, n_queries=5, F=8, comments=False, zero_indexed=False, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    off = 0 if zero_indexed else 1
    with open(path, "w") as f:
        for q in range(n_queries):
            for d in range(rng.randint(3, 8)):
                label = rng.randint(0, 3)
                feats = rng.randn(F)
                # sparse rows: drop some features to exercise defaults
                toks = " ".join(f"{i+off}:{v:.6f}" for i, v in enumerate(feats)
                                if rng.rand() > 0.2)
                tail = f" #docid = q{q}-d{d} inc = 1 prob = 0.5" if comments else ""
                f.write(f"{label} qid:q{q} {toks}{tail}\n")


def test_native_parser_matches_python(tmp_path):
    import numpy as np
    import pytest

    from ptranking_tpu.data.letor import parse_letor_lines
    from ptranking_tpu.data.native_parser import (
        native_parser_available,
        parse_letor_file_native,
    )

    if not native_parser_available():
        pytest.skip("no C++ toolchain")
    for comments in (False, True):
        for zero_indexed in (False, True):
            p = str(tmp_path / f"f_{comments}_{zero_indexed}.txt")
            _write_letor(p, comments=comments, zero_indexed=zero_indexed,
                         seed=int(comments) * 2 + int(zero_indexed))
            with open(p, encoding="iso-8859-1") as f:
                py = parse_letor_lines(f, has_comment=comments,
                                       one_indexed=not zero_indexed)
            nat = parse_letor_file_native(p, one_indexed=not zero_indexed,
                                          has_comment=comments)
            np.testing.assert_array_equal(py[0], nat[0])
            np.testing.assert_array_equal(py[1], nat[1])
            assert py[2] == nat[2]
            if comments:
                assert py[3] == nat[3]
                assert nat[3][0].startswith("q0-d")  # 'docid = X' -> X


def test_load_letor_file_same_queries_native_or_python(tmp_path, monkeypatch):
    import numpy as np

    from ptranking_tpu.data import letor as letor_mod

    p = str(tmp_path / "train.txt")
    _write_letor(p, n_queries=6, comments=False, seed=3)
    native = letor_mod.load_letor_file(p, data_id="LETOR", min_docs=1,
                                       min_rele=0, presort=True)
    # force the python path and a fresh cache
    import ptranking_tpu.data.native_parser as np_mod

    monkeypatch.setattr(np_mod, "parse_letor_file_native", lambda *a, **k: None)
    p2 = str(tmp_path / "train2.txt")
    import shutil as _sh

    _sh.copy(p, p2)
    python = letor_mod.load_letor_file(p2, data_id="LETOR", min_docs=1,
                                       min_rele=0, presort=True)
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert a[0] == b[0]
        np.testing.assert_allclose(np.sort(a[2]), np.sort(b[2]))
