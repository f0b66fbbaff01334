"""SRD metric tests: parity vs the reference torch implementations + masking."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from ptranking_tpu.metrics.srd import (
    alpha_dcg_rankwise,
    alpha_ndcg_at_ks,
    delta_alpha_dcg,
    err_ia_at_ks,
    greedy_ideal_ranking,
    nerr_ia_at_ks,
    np_greedy_ideal_ranking,
)

RNG = np.random.RandomState(137)
REF_OK = os.path.isdir("/root/reference/ptranking")
if REF_OK:
    sys.path.insert(0, "/root/reference")


def rand_rele_mat(S=6, N=12, graded=False):
    m = (RNG.rand(S, N) < 0.3).astype(np.float32)
    if graded:
        m *= RNG.randint(1, 3, (S, N))
    m[:, 0] = (RNG.rand(S) < 0.5).astype(np.float32)  # ensure some coverage
    if m.sum() == 0:
        m[0, 0] = 1.0
    return m


@pytest.mark.skipif(not REF_OK, reason="reference not mounted")
def test_alpha_ndcg_parity_with_reference():
    import torch
    from ptranking.metric.srd.diversity_metric import torch_alpha_ndcg_at_ks

    m_sys = rand_rele_mat()
    order = np_greedy_ideal_ranking(m_sys)
    m_ideal = m_sys[:, order]
    ks = [1, 3, 5, 10]
    ref = torch_alpha_ndcg_at_ks(torch.from_numpy(m_sys), torch.from_numpy(m_ideal), ks=ks).numpy()
    ours = np.asarray(alpha_ndcg_at_ks(jnp.asarray(m_sys), jnp.asarray(m_ideal),
                                       jnp.ones(12, bool), ks))
    np.testing.assert_allclose(ours, ref.squeeze(), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not REF_OK, reason="reference not mounted")
def test_err_ia_parity_with_reference():
    import torch
    from ptranking.metric.srd.diversity_metric import torch_err_ia_at_ks, torch_nerr_ia_at_ks

    m_sys = rand_rele_mat(graded=True)
    order = np_greedy_ideal_ranking(m_sys)
    m_ideal = m_sys[:, order]
    ks = [1, 3, 5, 10]
    max_label = float(m_sys.max())
    ref = torch_err_ia_at_ks(torch.from_numpy(m_sys), max_label=torch.tensor([max_label]), ks=ks).numpy()
    ours = np.asarray(err_ia_at_ks(jnp.asarray(m_sys), jnp.ones(12, bool), max_label, ks))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    ref_n = torch_nerr_ia_at_ks(torch.from_numpy(m_sys), torch.from_numpy(m_ideal),
                                max_label=torch.tensor([max_label]), ks=ks).numpy()
    ours_n = np.asarray(nerr_ia_at_ks(jnp.asarray(m_sys), jnp.asarray(m_ideal),
                                      jnp.ones(12, bool), max_label, ks))
    np.testing.assert_allclose(ours_n, ref_n, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not REF_OK, reason="reference not mounted")
def test_delta_alpha_dcg_parity_with_reference():
    import torch
    from ptranking.metric.srd.diversity_metric import get_delta_alpha_dcg

    m_sys = rand_rele_mat()
    order = np_greedy_ideal_ranking(m_sys)
    m_ideal = m_sys[:, order]
    ref = get_delta_alpha_dcg(torch.from_numpy(m_ideal), torch.from_numpy(m_sys)).numpy()
    ours = np.asarray(delta_alpha_dcg(jnp.asarray(m_ideal), jnp.asarray(m_sys), jnp.ones(12, bool)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_greedy_ideal_jax_matches_numpy():
    m = rand_rele_mat(S=5, N=9)
    np_order = np_greedy_ideal_ranking(m)
    jx_order = np.asarray(greedy_ideal_ranking(jnp.asarray(m), jnp.ones(9, bool)))
    # orders may differ among exact ties; compare achieved alpha-DCG instead
    a = alpha_dcg_rankwise(jnp.asarray(m[:, np_order]), jnp.ones(9, bool))[-1]
    b = alpha_dcg_rankwise(jnp.asarray(m[:, jx_order]), jnp.ones(9, bool))[-1]
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    assert sorted(jx_order.tolist()) == list(range(9))


def test_greedy_ideal_beats_random_order():
    m = rand_rele_mat(S=5, N=10)
    order = np_greedy_ideal_ranking(m)
    ideal_dcg = float(alpha_dcg_rankwise(jnp.asarray(m[:, order]), jnp.ones(10, bool))[-1])
    for _ in range(5):
        perm = RNG.permutation(10)
        rand_dcg = float(alpha_dcg_rankwise(jnp.asarray(m[:, perm]), jnp.ones(10, bool))[-1])
        assert ideal_dcg >= rand_dcg - 1e-6


def test_alpha_ndcg_pad_invariance():
    m = rand_rele_mat(S=4, N=8)
    order = np_greedy_ideal_ranking(m)
    m_ideal = m[:, order]
    ks = [1, 3, 5]
    base = np.asarray(alpha_ndcg_at_ks(jnp.asarray(m), jnp.asarray(m_ideal), jnp.ones(8, bool), ks))
    # append junk padded docs
    pad = np.ones((4, 3), np.float32) * 9
    m2 = np.concatenate([m, pad], axis=1)
    mi2 = np.concatenate([m_ideal, pad], axis=1)
    mask = np.concatenate([np.ones(8, bool), np.zeros(3, bool)])
    padded = np.asarray(alpha_ndcg_at_ks(jnp.asarray(m2), jnp.asarray(mi2), jnp.asarray(mask), ks))
    np.testing.assert_allclose(base, padded, atol=1e-6)


def test_batched_shapes():
    B, S, N = 3, 4, 8
    mats = []
    for _ in range(B):
        m = rand_rele_mat(S, N)
        mats.append(m[:, np_greedy_ideal_ranking(m)])  # ideal order: DCG@k > 0
    mats = np.stack(mats)
    mask = np.ones((B, N), bool)
    out = alpha_ndcg_at_ks(jnp.asarray(mats), jnp.asarray(mats), jnp.asarray(mask), [1, 5])
    assert out.shape == (B, 2)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)  # sys == ideal


def test_smooth_objectives_prefer_better_rankings():
    from ptranking_tpu.metrics.smooth import SMOOTH_OBJECTIVES
    from ptranking_tpu.losses.listwise import approx_ranks

    labels = jnp.asarray([[3.0, 2.0, 1.0, 0.0, 0.0]])
    mask = jnp.ones((1, 5), bool)
    good_ranks = approx_ranks(labels * 4.0, mask, alpha=20.0)
    bad_ranks = approx_ranks(-labels * 4.0, mask, alpha=20.0)
    for name, fn in SMOOTH_OBJECTIVES.items():
        lg = float(fn(good_ranks, labels, mask))
        lb = float(fn(bad_ranks, labels, mask))
        assert lg < lb, (name, lg, lb)


# --- smooth metric-as-objective regressions (metrics/smooth.py) ---------------


def test_nerr_objective_penalizes_inverted_ranking():
    """Regression: with opt_ideal=False the ideal ERR must come from the
    PRESORTED labels, not the resorted ones — otherwise a fully inverted
    prediction scores 'perfect'."""
    import jax.numpy as jnp

    from ptranking_tpu.metrics.smooth import nerr_as_objective

    labels = jnp.asarray([[2.0, 1.0, 0.0]])
    mask = jnp.ones((1, 3), bool)
    ideal_ranks = jnp.asarray([[1.0, 2.0, 3.0]])
    inverted_ranks = jnp.asarray([[3.0, 2.0, 1.0]])
    good = -float(nerr_as_objective(ideal_ranks, labels, mask, opt_ideal=False))
    bad = -float(nerr_as_objective(inverted_ranks, labels, mask, opt_ideal=False))
    assert good > bad, (good, bad)
    assert abs(good - 1.0) < 1e-5   # perfect prediction -> nERR 1
    assert bad < 0.99               # inverted must NOT look perfect


def test_ap_objective_adopted_formulation():
    """opt_ideal=True uses the reference's ADOPTED AP formulation
    (metric_as_opt_objective.py:88-92): perfect smooth ranks give AP=1."""
    import jax.numpy as jnp

    from ptranking_tpu.metrics.smooth import ap_as_objective

    labels = jnp.asarray([[1.0, 0.0, 1.0]])
    mask = jnp.ones((1, 3), bool)
    natural = jnp.asarray([[1.0, 2.0, 3.0]])
    ap = -float(ap_as_objective(natural, labels, mask, opt_ideal=True))
    assert abs(ap - 1.0) < 1e-5, ap
