"""Tree branch tests: objectives (incl. parity vs the reference's loop
implementation), libsvm round-trip, gated LightGBM path."""

import os
import sys

import numpy as np
import pytest

from ptranking_tpu.data import make_synthetic_queries
from ptranking_tpu.tree import (
    HAS_LIGHTGBM,
    cal_metric_at_ks,
    custom_obj_lambdarank,
    custom_obj_listnet,
    custom_obj_ranknet,
    load_libsvm,
    queries_to_flat,
    save_libsvm,
)

RNG = np.random.RandomState(137)
REF_OK = os.path.isdir("/root/reference/ptranking")
if REF_OK:
    sys.path.insert(0, "/root/reference")


def flat_data(n_q=4, docs=8):
    labels = RNG.randint(0, 3, n_q * docs).astype(np.float64)
    preds = RNG.randn(n_q * docs)
    group = np.full(n_q, docs)
    return labels, preds, group


@pytest.mark.parametrize("obj", [custom_obj_ranknet, custom_obj_lambdarank, custom_obj_listnet])
def test_objectives_shapes_and_finite(obj):
    labels, preds, group = flat_data()
    grad, hess = obj(labels, preds, group)
    assert grad.shape == preds.shape and hess.shape == preds.shape
    assert np.all(np.isfinite(grad)) and np.all(np.isfinite(hess))
    # gradient must push higher-labeled docs up (negative grad = score increases)
    best = np.argmax(labels[:8])
    worst = np.argmin(labels[:8])
    assert grad[best] <= grad[worst]


@pytest.mark.skipif(not REF_OK, reason="reference not mounted")
@pytest.mark.parametrize("pair_type", ["All", "NoTies", "No00"])
def test_lambda_grad_parity_with_reference(pair_type):
    """Unweighted parity only: the reference's weighting gate is
    `if weighting and weighting in WEIGHTING_TYPE` where `weighting` is a
    BOOL (lightgbm_util.py:145,160), so `True in ['DeltaNDCG',...]` is always
    False and DeltaNDCG weighting is silently never applied — a reference bug
    we fix (see test_lambda_weighting_actually_applies)."""
    import importlib

    ref_mod = importlib.import_module("ptranking.ltr_tree.util.lightgbm_util")
    from ptranking_tpu.tree.objectives import per_query_grad_hess_lambda

    preds = RNG.randn(10)
    labels = RNG.randint(0, 3, 10).astype(np.float64)
    ref_grad, ref_hess = ref_mod.per_query_gradient_hessian_lambda(
        preds=preds, labels=labels, first_order=False, weighting=False,
        pair_type=pair_type, epsilon=1.0)
    our_grad, our_hess = per_query_grad_hess_lambda(
        preds, labels, first_order=False, weighting=False,
        pair_type=pair_type, epsilon=1.0)
    np.testing.assert_allclose(our_grad, ref_grad, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(our_hess, ref_hess, rtol=1e-6, atol=1e-10)


def test_lambda_weighting_actually_applies():
    from ptranking_tpu.tree.objectives import per_query_grad_hess_lambda

    preds = RNG.randn(10)
    labels = RNG.randint(0, 3, 10).astype(np.float64)
    g0, _ = per_query_grad_hess_lambda(preds, labels, weighting=False, pair_type="NoTies")
    g1, _ = per_query_grad_hess_lambda(preds, labels, weighting=True,
                                       weighting_type="DeltaNDCG", pair_type="NoTies")
    assert not np.allclose(g0, g1)


def test_libsvm_roundtrip(tmp_path):
    qs = make_synthetic_queries(num_queries=5, num_features=7, seed=1)
    data, target, group = queries_to_flat(qs)
    path = str(tmp_path / "data.libsvm")
    save_libsvm(path, data, target, group)
    data2, target2, group2 = load_libsvm(path)
    np.testing.assert_array_equal(group, group2)
    np.testing.assert_array_equal(target.astype(int), target2.astype(int))
    # zero-valued features are omitted in libsvm; non-zeros must round-trip
    nz = data != 0
    np.testing.assert_allclose(data2[:, :data.shape[1]][nz], data[nz], rtol=1e-5)


def test_cal_metric_at_ks_flat():
    labels = np.array([2.0, 1.0, 0.0, 1.0, 0.0, 0.0])
    preds = np.array([3.0, 2.0, 1.0, 0.1, 0.5, 0.3])
    group = np.array([3, 3])
    out = cal_metric_at_ks(preds, labels, group, ks=(1, 3))
    assert out["nDCG"].shape == (2,)
    np.testing.assert_allclose(out["nDCG"][0], 0.5, atol=1e-6)  # q1 perfect, q2 top1 wrong


@pytest.mark.skipif(not HAS_LIGHTGBM, reason="lightgbm not installed")
def test_lightgbm_end_to_end(tmp_path):
    from ptranking_tpu.tree import TreeLTREvaluator

    ev = TreeLTREvaluator()
    cv = ev.point_run(data_id="SyntheticMQ", dir_output=str(tmp_path), debug=True)
    assert cv["nDCG"].shape == (6,)


def test_lightgbm_gated_error():
    if HAS_LIGHTGBM:
        pytest.skip("lightgbm installed")
    from ptranking_tpu.tree import LightGBMLambdaMART

    with pytest.raises(ImportError):
        LightGBMLambdaMART().fit((np.zeros((2, 2)), np.zeros(2), np.array([2])))


# --- native TPU GBDT (jax_gbdt.py) -------------------------------------------


def _synthetic_rank_data(nq, n=16, F=6, seed=0):
    rng = np.random.RandomState(seed)
    w = np.linspace(1.0, 2.0, F)
    data, target, group = [], [], []
    for _ in range(nq):
        X = rng.randn(n, F)
        s = X @ w + 0.3 * rng.randn(n)
        y = np.digitize(s, np.quantile(s, [0.5, 0.75, 0.9]))
        data.append(X)
        target.append(y)
        group.append(n)
    return (np.concatenate(data), np.concatenate(target).astype(float),
            np.asarray(group))


def test_gbdt_grow_tree_finds_exact_split():
    """depth-1 tree on one feature: the split must match brute force and the
    leaves must be the Newton steps -G/(H+l2)."""
    import jax.numpy as jnp

    from ptranking_tpu.tree.jax_gbdt import grow_tree

    rng = np.random.RandomState(3)
    n, B = 64, 8
    bins = rng.randint(0, B, size=(n, 1)).astype(np.int32)
    grad = rng.randn(n).astype(np.float32)
    hess = np.abs(rng.randn(n)).astype(np.float32) + 0.1

    sf, sb, lv = grow_tree(jnp.asarray(bins), jnp.asarray(grad), jnp.asarray(hess),
                           depth=1, num_bins=B, l2=1.0, min_child_hessian=0.0)
    # brute force best bin threshold
    def score(g, h):
        return g * g / (h + 1.0)
    total = score(grad.sum(), hess.sum())
    gains = []
    for t in range(B):
        lm = bins[:, 0] <= t
        gains.append(score(grad[lm].sum(), hess[lm].sum())
                     + score(grad[~lm].sum(), hess[~lm].sum()) - total)
    assert int(sb[0]) == int(np.argmax(gains))
    lm = bins[:, 0] <= int(sb[0])
    np.testing.assert_allclose(float(lv[0]), -grad[lm].sum() / (hess[lm].sum() + 1.0),
                               rtol=1e-5)
    np.testing.assert_allclose(float(lv[1]), -grad[~lm].sum() / (hess[~lm].sum() + 1.0),
                               rtol=1e-5)


def test_gbdt_predict_forest_matches_sum_of_trees():
    import jax.numpy as jnp

    from ptranking_tpu.tree.jax_gbdt import grow_tree, predict_forest, predict_tree

    rng = np.random.RandomState(5)
    n, F, B, D = 50, 4, 8, 3
    bins = jnp.asarray(rng.randint(0, B, size=(n, F)).astype(np.int32))
    trees = []
    for t in range(4):
        g = jnp.asarray(rng.randn(n).astype(np.float32))
        h = jnp.asarray(np.abs(rng.randn(n)).astype(np.float32) + 0.1)
        trees.append(grow_tree(bins, g, h, depth=D, num_bins=B, l2=0.5,
                               min_child_hessian=0.0))
    single = sum(np.asarray(predict_tree(bins, *t, D)) for t in trees)
    stacked = predict_forest(bins,
                             jnp.stack([t[0] for t in trees]),
                             jnp.stack([t[1] for t in trees]),
                             jnp.stack([t[2] for t in trees]), D)
    np.testing.assert_allclose(np.asarray(stacked), single, rtol=1e-5)


def test_gbdt_learns_ranking_and_roundtrips(tmp_path):
    from ptranking_tpu.tree.jax_gbdt import GBDTConfig, TPUGBDTRanker, _ndcg_at_k

    tr = _synthetic_rank_data(60, seed=0)
    va = _synthetic_rank_data(15, seed=1)
    te = _synthetic_rank_data(15, seed=2)
    model = TPUGBDTRanker(GBDTConfig(num_trees=40, max_depth=4, num_bins=16,
                                     learning_rate=0.2, early_stopping_rounds=40))
    model.fit(*tr, vali=va)
    pred = model.predict(te[0])
    ndcg = _ndcg_at_k(pred, te[1], te[2], 5)
    rand = _ndcg_at_k(np.random.RandomState(9).randn(len(te[1])), te[1], te[2], 5)
    assert ndcg > rand + 0.2, (ndcg, rand)

    path = str(tmp_path / "gbdt.model")
    model.save(path)
    from ptranking_tpu.tree.jax_gbdt import TPUGBDTRanker as R
    re = R.load(path)
    np.testing.assert_allclose(re.predict(te[0]), pred, rtol=1e-6)


def test_gbdt_feature_fraction_restricts_splits():
    """With feat_mask, real splits only use allowed features (no-op splits
    — bin == num_bins - 1 — carry feature 0 regardless and don't count)."""
    import jax.numpy as jnp

    from ptranking_tpu.tree.jax_gbdt import grow_tree

    rng = np.random.RandomState(5)
    n, F, B = 256, 8, 16
    bins = rng.randint(0, B, size=(n, F)).astype(np.int32)
    grad = rng.randn(n).astype(np.float32)
    hess = np.abs(rng.randn(n)).astype(np.float32) + 0.1
    allowed = np.zeros(F, bool)
    allowed[[1, 4, 6]] = True
    sf, sb, _ = grow_tree(jnp.asarray(bins), jnp.asarray(grad),
                          jnp.asarray(hess), depth=3, num_bins=B, l2=1.0,
                          min_child_hessian=0.0,
                          feat_mask=jnp.asarray(allowed))
    real = np.asarray(sb) != B - 1
    assert real.any()
    assert set(np.asarray(sf)[real]) <= {1, 4, 6}


def test_gbdt_stochastic_knobs_learn_and_are_deterministic():
    """feature_fraction + group-aware bagging still learn ranking, and the
    same random_state reproduces the identical forest."""
    from ptranking_tpu.tree.jax_gbdt import GBDTConfig, TPUGBDTRanker, _ndcg_at_k

    tr = _synthetic_rank_data(60, seed=0)
    va = _synthetic_rank_data(15, seed=1)
    te = _synthetic_rank_data(15, seed=2)
    cfg = GBDTConfig(num_trees=40, max_depth=4, num_bins=16, learning_rate=0.2,
                     early_stopping_rounds=40, feature_fraction=0.6,
                     bagging_fraction=0.7, bagging_freq=2, random_state=11)
    m1 = TPUGBDTRanker(cfg).fit(*tr, vali=va)
    pred = m1.predict(te[0])
    ndcg = _ndcg_at_k(pred, te[1], te[2], 5)
    rand = _ndcg_at_k(np.random.RandomState(9).randn(len(te[1])), te[1], te[2], 5)
    assert ndcg > rand + 0.2, (ndcg, rand)

    m2 = TPUGBDTRanker(cfg).fit(*tr, vali=va)
    assert len(m1.trees) == len(m2.trees)
    for (f1, b1, v1), (f2, b2, v2) in zip(m1.trees, m2.trees):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_allclose(v1, v2)


def test_gbdt_from_paras_accepts_lightgbm_stochastic_keys():
    from ptranking_tpu.tree.jax_gbdt import GBDTConfig

    cfg = GBDTConfig.from_paras({"feature_fraction": 0.8,
                                 "bagging_fraction": 0.9, "bagging_freq": 3,
                                 "random_state": 42, "num_leaves": 32})
    assert cfg.feature_fraction == 0.8 and cfg.bagging_fraction == 0.9
    assert cfg.bagging_freq == 3 and cfg.random_state == 42
    assert cfg.max_depth == 5


def test_tree_evaluator_native_fallback(tmp_path):
    """kfold_cv_eval runs the native GBDT whether or not lightgbm exists."""
    from ptranking_tpu.tree import TreeLTREvaluator

    ev = TreeLTREvaluator()
    cv = ev.point_run(model_id="TPUGBDTLambdaMART", data_id="SyntheticMQ",
                      dir_output=str(tmp_path), debug=True)
    assert cv["nDCG"].shape == (6,)
    assert cv["nDCG"][2] > 0.3
