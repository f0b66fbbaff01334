"""Golden-value metric tests.

Expected values come from the reference's hand-computed oracles
(reference testing/metric/testing_metric.py:20-101) — the only numeric
correctness anchors the reference ships. Padding-invariance tests are new:
the reference never pads, we always may.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ptranking_tpu.metrics.adhoc import (
    ap_at_ks,
    ndcg_at_ks,
    nerr_at_ks,
    precision_at_ks,
    kendall_tau,
    evaluate_all_at_ks,
)


def _batch(vals):
    return jnp.asarray([vals], dtype=jnp.float32)


def _n(vals):
    return jnp.asarray([len(vals)])


class TestGoldenValues:
    def test_ap_all_relevant(self):
        sys = [1.0, 0.0, 1.0, 0.0, 1.0]
        ideal = [1.0, 1.0, 1.0, 1.0, 1.0]
        got = ap_at_ks(_batch(sys), _batch(ideal), _n(sys), ks=(1, 3, 5))
        np.testing.assert_allclose(np.asarray(got[0]), [1.0, 0.5556, 0.4533], atol=1e-4)

    def test_ap_three_relevant(self):
        sys = [1.0, 0.0, 1.0, 0.0, 1.0]
        ideal = [1.0, 1.0, 1.0, 0.0, 0.0]
        got = ap_at_ks(_batch(sys), _batch(ideal), _n(sys), ks=(1, 3, 5))
        np.testing.assert_allclose(np.asarray(got[0]), [1.0, 0.5556, 0.7556], atol=1e-4)

    def test_ap_seven(self):
        sys = [1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
        ideal = [1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
        got = ap_at_ks(_batch(sys), _batch(ideal), _n(sys), ks=(1, 2, 3, 5, 7))
        np.testing.assert_allclose(
            np.asarray(got[0]), [1.0, 1.0, 0.6667, 0.6875, 0.8304], atol=1e-4
        )

    def test_ndcg(self):
        sys = [1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
        ideal = [1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
        got = ndcg_at_ks(_batch(sys), _batch(ideal), _n(sys), ks=(1, 2, 3, 4, 5, 6, 7))
        np.testing.assert_allclose(
            np.asarray(got[0]),
            [1.0, 1.0, 0.7654, 0.8048, 0.8048, 0.8048, 0.9349],
            atol=1e-4,
        )

    def test_nerr(self):
        sys = [3.0, 2.0, 4.0]
        ideal = [4.0, 3.0, 2.0]
        got = nerr_at_ks(_batch(sys), _batch(ideal), _n(sys), ks=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(got[0]), [0.4667, 0.5154, 0.6640], atol=1e-4)

    def test_kendall_tau_vs_scipy(self):
        from scipy import stats

        reference = np.arange(1.0, 11.0)
        sys_1 = np.asarray([2.0, 1.0, 5.0, 3.0, 4.0, 6.0, 7.0, 9.0, 8.0, 10.0])
        sys_2 = np.asarray([10.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1.0])
        for sys in (sys_1, sys_2):
            expect, _ = stats.kendalltau(reference, sys)
            got = kendall_tau(jnp.asarray(sys), natural_ascending_as_reference=True)
            np.testing.assert_allclose(float(got), expect, atol=1e-6)

    def test_precision_graded_counts_as_binary(self):
        sys = [2.0, 0.0, 1.0, 0.0]
        got = precision_at_ks(_batch(sys), _n(sys), ks=(1, 2, 4))
        np.testing.assert_allclose(np.asarray(got[0]), [1.0, 0.5, 0.5], atol=1e-6)


class TestPaddingAndCutoffs:
    def test_k_beyond_n_is_zero(self):
        sys = [1.0, 0.0, 1.0]
        ideal = [1.0, 1.0, 0.0]
        got = ndcg_at_ks(_batch(sys), _batch(ideal), _n(sys), ks=(1, 3, 5, 10))
        assert float(got[0, 2]) == 0.0 and float(got[0, 3]) == 0.0
        assert float(got[0, 0]) > 0.0

    def test_padding_invariance_end_to_end(self):
        rng = np.random.default_rng(0)
        n, pad_to = 7, 16
        scores = rng.normal(size=n).astype(np.float32)
        labels = rng.integers(0, 3, size=n).astype(np.float32)
        ks = (1, 3, 5, 7)

        s1 = jnp.asarray(scores)[None, :]
        l1 = jnp.asarray(labels)[None, :]
        m1 = jnp.ones((1, n), dtype=bool)
        r1 = evaluate_all_at_ks(s1, l1, m1, ks, max_label=2.0)

        s2 = jnp.zeros((1, pad_to), jnp.float32).at[0, :n].set(scores)
        l2 = jnp.zeros((1, pad_to), jnp.float32).at[0, :n].set(labels)
        m2 = jnp.zeros((1, pad_to), bool).at[0, :n].set(True)
        r2 = evaluate_all_at_ks(s2, l2, m2, ks, max_label=2.0)

        for key in ("nDCG", "nERR", "AP", "P"):
            np.testing.assert_allclose(
                np.asarray(r1[key]), np.asarray(r2[key]), atol=1e-5, err_msg=key
            )

    def test_batch_of_mixed_lengths(self):
        # two queries padded to the same bucket; each must match its solo result
        scores = np.asarray(
            [[0.9, 0.1, 0.5, 0.0, 0.0], [0.2, 0.8, 0.4, 0.6, 0.3]], np.float32
        )
        labels = np.asarray(
            [[2.0, 0.0, 1.0, 0.0, 0.0], [0.0, 2.0, 1.0, 1.0, 0.0]], np.float32
        )
        mask = np.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
        ks = (1, 3, 5)
        both = evaluate_all_at_ks(
            jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask), ks, max_label=2.0
        )
        for b in range(2):
            n = int(mask[b].sum())
            solo = evaluate_all_at_ks(
                jnp.asarray(scores[b : b + 1, :n]),
                jnp.asarray(labels[b : b + 1, :n]),
                jnp.asarray(mask[b : b + 1, :n]),
                ks,
                max_label=2.0,
            )
            for key in ("nDCG", "nERR", "AP", "P"):
                np.testing.assert_allclose(
                    np.asarray(both[key][b]), np.asarray(solo[key][0]), atol=1e-5,
                    err_msg=f"{key} q{b}",
                )
