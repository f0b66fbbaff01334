"""Loss zoo tests.

The central property is mask correctness, in two strengths:
  1. pad-content invariance (all losses): at fixed shape, mutating padded
     slots' scores/labels never changes the loss;
  2. pad-width invariance (deterministic losses): appending extra padded
     slots never changes the loss. (Stochastic losses draw shape-dependent
     noise, so only property 1 applies to them.)
Plus hand-computed golden values for the simple closed forms.
"""

import math

import jax
import jax.numpy as jnp
import pytest

from ptranking_tpu.losses import DEFAULT_PARAS, LOSSES, STOCHASTIC, get_loss

KEY = jax.random.PRNGKey(137)


def base_batch():
    scores = jnp.array([[2.0, -1.0, 0.5, 1.5], [0.0, 3.0, -2.0, 0.7]])
    labels = jnp.array([[2.0, 1.0, 1.0, 0.0], [3.0, 2.0, 0.0, 0.0]])  # presorted desc
    mask = jnp.array([[True, True, True, True], [True, True, True, False]])
    return scores, labels, mask


def call(model_id, scores, labels, mask, **over):
    params = {**DEFAULT_PARAS[model_id], **over}
    kw = {"key": KEY} if model_id in STOCHASTIC else {}
    return get_loss(model_id)(scores, labels, mask, **params, **kw)


@pytest.mark.parametrize("model_id", sorted(LOSSES))
def test_pad_content_invariance(model_id):
    scores, labels, mask = base_batch()
    v1 = call(model_id, scores, labels, mask)
    junk_scores = jnp.where(mask, scores, 123.0)
    junk_labels = jnp.where(mask, labels, 7.0)
    v2 = call(model_id, junk_scores, junk_labels, mask)
    assert jnp.allclose(v1, v2, atol=1e-5), (model_id, v1, v2)
    assert bool(jnp.isfinite(v1)), model_id


@pytest.mark.parametrize("model_id", sorted(set(LOSSES) - STOCHASTIC))
def test_pad_width_invariance(model_id):
    scores, labels, mask = base_batch()
    v1 = call(model_id, scores, labels, mask)
    pad = jnp.zeros((2, 3))
    v2 = call(
        model_id,
        jnp.concatenate([scores, pad - 4.2], axis=1),
        jnp.concatenate([labels, pad + 1.0], axis=1),
        jnp.concatenate([mask, jnp.zeros((2, 3), bool)], axis=1),
    )
    assert jnp.allclose(v1, v2, atol=2e-4), (model_id, v1, v2)


@pytest.mark.parametrize("model_id", sorted(LOSSES))
def test_grads_finite_and_masked(model_id):
    scores, labels, mask = base_batch()

    def f(s):
        return call(model_id, s, labels, mask)

    g = jax.grad(f)(scores)
    assert bool(jnp.all(jnp.isfinite(g))), model_id
    # no gradient may reach padded slots
    assert bool(jnp.all(jnp.where(mask, 0.0, g) == 0.0)), (model_id, g)


def test_rank_mse_golden():
    scores = jnp.array([[1.0, 0.0], [2.0, 2.0]])
    labels = jnp.array([[2.0, 0.0], [0.0, 1.0]])
    mask = jnp.ones((2, 2), bool)
    # q1: (1-2)^2 + 0 = 1 ; q2: 4 + 1 = 5 ; mean = 3
    assert jnp.allclose(call("RankMSE", scores, labels, mask), 3.0)


def test_ranknet_golden_two_docs():
    scores = jnp.array([[1.0, 0.0]])
    labels = jnp.array([[2.0, 0.0]])
    mask = jnp.ones((1, 2), bool)
    # one pair, S_ij=1, target=1: loss = -log sigmoid(1)
    expect = -math.log(1.0 / (1.0 + math.exp(-1.0)))
    assert jnp.allclose(call("RankNet", scores, labels, mask), expect, atol=1e-6)


def test_listnet_golden():
    scores = jnp.array([[1.0, 1.0]])
    labels = jnp.array([[1.0, 0.0]])
    mask = jnp.ones((1, 2), bool)
    # softmax(labels) = [e/(e+1), 1/(e+1)]; log_softmax(scores) = [-log2, -log2]
    e = math.e
    expect = (e / (e + 1) + 1 / (e + 1)) * math.log(2.0)
    assert jnp.allclose(call("ListNet", scores, labels, mask), expect, atol=1e-6)


def test_rank_cosine_golden():
    scores = jnp.array([[1.0, 2.0]])
    labels = jnp.array([[1.0, 2.0]])
    mask = jnp.ones((1, 2), bool)
    assert jnp.allclose(call("RankCosine", scores, labels, mask), 0.0, atol=1e-5)


def test_approx_ndcg_perfect_order_near_optimal():
    labels = jnp.array([[3.0, 2.0, 1.0, 0.0]])
    mask = jnp.ones((1, 4), bool)
    good = call("ApproxNDCG", labels * 10.0, labels, mask, alpha=50.0)
    bad = call("ApproxNDCG", -labels * 10.0, labels, mask, alpha=50.0)
    assert good < bad
    assert jnp.allclose(good, -1.0, atol=0.02)  # approx nDCG ~ 1


def test_lambdarank_prefers_correct_order():
    labels = jnp.array([[2.0, 1.0, 0.0]])
    mask = jnp.ones((1, 3), bool)
    good = call("LambdaRank", jnp.array([[3.0, 2.0, 1.0]]), labels, mask)
    bad = call("LambdaRank", jnp.array([[1.0, 2.0, 3.0]]), labels, mask)
    assert good < bad


def test_listmle_prefers_correct_order():
    labels = jnp.array([[3.0, 2.0, 1.0]])  # no ties: shuffle is deterministic
    mask = jnp.ones((1, 3), bool)
    good = call("ListMLE", jnp.array([[3.0, 2.0, 1.0]]), labels, mask)
    bad = call("ListMLE", jnp.array([[1.0, 2.0, 3.0]]), labels, mask)
    assert good < bad


@pytest.mark.parametrize("loss_type", ["NDCG_Loss1", "NDCG_Loss2", "NDCG_Loss2++"])
def test_lambdaloss_variants(loss_type):
    scores, labels, mask = base_batch()
    v = call("LambdaLoss", scores, labels, mask, loss_type=loss_type)
    assert bool(jnp.isfinite(v))
    if loss_type != "NDCG_Loss1":  # Loss1 sums ALL kxk pairs incl. inverted ones
        good = call("LambdaLoss", labels * 5.0, labels, mask, loss_type=loss_type)
        assert good <= v + 1e-6


def test_softrank_prefers_correct_order():
    labels = jnp.array([[2.0, 1.0, 0.0]])
    mask = jnp.ones((1, 3), bool)
    good = call("SoftRank", jnp.array([[4.0, 2.0, 0.0]]), labels, mask)
    bad = call("SoftRank", jnp.array([[0.0, 2.0, 4.0]]), labels, mask)
    assert good < bad


@pytest.mark.parametrize("distribution", ["PL", "STPL"])
def test_mdprank_runs_both_distributions(distribution):
    scores, labels, mask = base_batch()
    v = call("MDPRank", scores, labels, mask, distribution=distribution)
    assert bool(jnp.isfinite(v))


@pytest.mark.parametrize("mode", ["SinkhornOT", "EntropicOT"])
@pytest.mark.parametrize("cost_type", ["p1", "p2", "eg", "dg", "ddg"])
def test_wassrank_modes_and_costs(mode, cost_type):
    scores, labels, mask = base_batch()
    v = call("WassRank", jax.nn.sigmoid(scores), labels, mask, mode=mode, cost_type=cost_type)
    assert bool(jnp.isfinite(v)), (mode, cost_type)


def test_sinkhorn_identity_transport_is_cheap():
    from ptranking_tpu.ops.sinkhorn import sinkhorn_distance

    mu = jnp.array([[0.5, 0.3, 0.2]])
    cost = jnp.array([[[0.0, 5.0, 5.0], [5.0, 0.0, 5.0], [5.0, 5.0, 0.0]]])
    d_same = sinkhorn_distance(mu, mu, cost, None, 0.05, 50)
    nu = jnp.array([[0.2, 0.3, 0.5]])
    d_diff = sinkhorn_distance(mu, nu, cost, None, 0.05, 50)
    assert d_same < d_diff


def test_unknown_model_id_raises():
    with pytest.raises(KeyError):
        get_loss("TwinRank")  # phantom id from reference ltr.py:166-171


@pytest.mark.parametrize("model_id", sorted(LOSSES))
def test_grads_finite_with_degenerate_queries(model_id):
    """All-padded and single-doc queries in the batch must not poison grads
    (companion to the LayerNorm var=0 regression in test_scorers)."""
    scores, labels, mask = base_batch()
    mask = mask.at[0].set(False)        # query 0 fully padded
    mask = mask.at[1, 1:].set(False)    # query 1 has a single real doc
    labels = jnp.where(mask, labels, 0.0)

    def f(s):
        return call(model_id, s, labels, mask)

    v = f(scores)
    g = jax.grad(f)(scores)
    assert bool(jnp.isfinite(v)), model_id
    assert bool(jnp.all(jnp.isfinite(jnp.where(mask, g, 0.0)))), model_id
    assert bool(jnp.all(jnp.where(mask, 0.0, g) == 0.0)), model_id


def test_wassrank_entropic_ot_mode_is_differentiable():
    """Regression: EntropicOT used lax.while_loop, which rejects reverse-mode
    AD; the convergence-freeze scan must produce finite grads."""
    scores, labels, mask = base_batch()

    def f(s):
        return call("WassRank", s, labels, mask, mode="EntropicOT", sh_itr=30)

    g = jax.grad(f)(scores)
    assert bool(jnp.all(jnp.isfinite(jnp.where(mask, g, 0.0))))


def test_wassrank_padded_rows_do_not_dilute():
    """All-padded remainder rows must not shrink the WassRank loss mean."""
    scores, labels, mask = base_batch()
    v1 = call("WassRank", scores, labels, mask)
    pad_rows = jnp.zeros((3, scores.shape[1]))
    v2 = call(
        "WassRank",
        jnp.concatenate([scores, pad_rows], axis=0),
        jnp.concatenate([labels, pad_rows], axis=0),
        jnp.concatenate([mask, jnp.zeros((3, scores.shape[1]), bool)], axis=0),
    )
    assert jnp.allclose(v1, v2, rtol=1e-5), (v1, v2)


def test_lambda_loss1_weights_match_reference_formula():
    """NDCG_Loss1 weights are n_gains * log2(r+2) (reference
    ndcg_loss1_power_weights = n_gains / dists with dists = 1/log2(r+2))."""
    import numpy as np

    scores = jnp.asarray([[0.5, 2.0, 1.0, -0.3]])
    labels = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    mask = jnp.ones((1, 4), bool)
    ours = float(call("LambdaLoss", scores, labels, mask, loss_type="NDCG_Loss1", k=4))

    # reference formula rebuilt in numpy on the same presorted inputs
    s = np.asarray(scores[0])
    desc = np.argsort(-s, kind="stable")
    sorted_s, sorted_l = s[desc], np.asarray(labels[0])[desc]
    disc = 1.0 / np.log2(np.arange(4) + 2.0)
    idcg = np.sum((2.0 ** np.asarray(labels[0]) - 1.0) * disc)
    n_gains = (2.0 ** sorted_l - 1.0) / idcg
    w = n_gains / disc  # = n_gains * log2(r+2)
    diffs = sorted_s[:, None] - sorted_s[None, :]
    p = np.clip(1.0 / (1.0 + np.exp(-diffs)), 1e-8, None)
    logp = np.log2(np.clip(p ** w[None, :], 1e-8, None))
    # reference Loss1 selects the FULL k x k block (lambdaloss.py:130:
    # log_weighted_probas[trunc_mask], no pair filter, diagonal included)
    ref = -np.sum(logp)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_neural_ndcg_low_temperature_matches_hard_ndcg():
    """As tau -> 0 NeuralSort's relaxation hardens: the loss must equal
    -sum of exact nDCG of the score-sorted lists (the metric it relaxes)."""
    import numpy as np

    scores, labels, mask = base_batch()
    v = float(call("NeuralNDCG", scores, labels, mask,
                   temperature=1e-4, sinkhorn_iters=0))
    hard = 0.0
    for b in range(scores.shape[0]):
        n = int(mask[b].sum())
        if n == 0:
            continue
        s = np.asarray(scores[b][:n])
        l = np.asarray(labels[b][:n])
        order = np.argsort(-s, kind="stable")
        d = 1.0 / np.log2(np.arange(n) + 2)
        dcg = float(((2.0 ** l[order] - 1) * d).sum())
        idcg = float(((2.0 ** np.sort(l)[::-1] - 1) * d).sum())
        if idcg > 0:
            hard += dcg / idcg
    assert abs(v + hard) < 1e-3, (v, hard)


def test_neural_ndcg_top_k_truncates():
    scores, labels, mask = base_batch()
    full = float(call("NeuralNDCG", scores, labels, mask))
    top1 = float(call("NeuralNDCG", scores, labels, mask, top_k=1))
    assert full != top1
    # top_k beyond the longest list is a no-op
    same = float(call("NeuralNDCG", scores, labels, mask,
                      top_k=scores.shape[1] + 10))
    assert abs(full - same) < 1e-6
