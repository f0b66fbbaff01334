"""Numerics parity against the actual reference implementation.

These tests import pure functions from the reference repo (mounted read-only
at /root/reference) and compare them on identical unpadded inputs against our
masked JAX implementations with an all-true mask. They skip automatically when
the reference or torch is unavailable, so the suite stays self-contained.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "ptranking")):
    pytest.skip("reference repo not mounted", allow_module_level=True)
torch = pytest.importorskip("torch")
sys.path.insert(0, REF)

from ptranking.ltr_adhoc.util.lambda_utils import get_pairwise_comp_probs  # noqa: E402
from ptranking.metric.adhoc.adhoc_metric import (  # noqa: E402
    torch_ap_at_ks,
    torch_ndcg_at_ks,
    torch_nerr_at_ks,
    torch_precision_at_ks,
)
from ptranking.metric.metric_utils import get_delta_ndcg  # noqa: E402
from ptranking.data.data_utils import LABEL_TYPE as REF_LABEL_TYPE  # noqa: E402

from ptranking_tpu.types import LabelType  # noqa: E402
from ptranking_tpu.ops import delta_ndcg, pairwise_comp_probs  # noqa: E402
from ptranking_tpu.metrics.adhoc import (  # noqa: E402
    ap_at_ks,
    ndcg_at_ks,
    nerr_at_ks,
    precision_at_ks,
)

RNG = np.random.RandomState(137)
KS = [1, 3, 5, 10]


def rand_batch(B=5, N=12, max_label=4):
    preds = RNG.randn(B, N).astype(np.float32)
    labels = RNG.randint(0, max_label + 1, (B, N)).astype(np.float32)
    return preds, labels


def sort_by(preds, labels):
    order = np.argsort(-preds, axis=1, kind="stable")
    return np.take_along_axis(labels, order, axis=1)


def ideal(labels):
    return -np.sort(-labels, axis=1)


def test_metrics_parity():
    preds, labels = rand_batch()
    pred_sorted = sort_by(preds, labels)
    ideal_sorted = ideal(labels)
    t_pred = torch.from_numpy(pred_sorted)
    t_ideal = torch.from_numpy(ideal_sorted)
    mask_n = jnp.full((5,), 12)

    ref_ndcg = torch_ndcg_at_ks(t_pred, t_ideal, ks=KS, label_type=REF_LABEL_TYPE.MultiLabel).numpy()
    ours_ndcg = np.asarray(ndcg_at_ks(jnp.asarray(pred_sorted), jnp.asarray(ideal_sorted), mask_n, KS))
    np.testing.assert_allclose(ours_ndcg, ref_ndcg, rtol=1e-5, atol=1e-6)

    ref_p = torch_precision_at_ks(t_pred, ks=KS).numpy()
    ours_p = np.asarray(precision_at_ks(jnp.asarray(pred_sorted), mask_n, KS))
    np.testing.assert_allclose(ours_p, ref_p, rtol=1e-5, atol=1e-6)

    ref_ap = torch_ap_at_ks(t_pred, t_ideal, ks=KS).numpy()
    ours_ap = np.asarray(ap_at_ks(jnp.asarray(pred_sorted), jnp.asarray(ideal_sorted), mask_n, KS))
    np.testing.assert_allclose(ours_ap, ref_ap, rtol=1e-5, atol=1e-6)

    ref_nerr = torch_nerr_at_ks(t_pred, t_ideal, ks=KS).numpy()
    ours_nerr = np.asarray(nerr_at_ks(jnp.asarray(pred_sorted), jnp.asarray(ideal_sorted), mask_n, KS))
    np.testing.assert_allclose(ours_nerr, ref_nerr, rtol=1e-5, atol=1e-6)


def test_pairwise_comp_probs_parity():
    preds, labels = rand_batch(B=3, N=8)
    ref_p, ref_std = get_pairwise_comp_probs(torch.from_numpy(preds), torch.from_numpy(labels), sigma=1.5)
    ours_p, ours_std = pairwise_comp_probs(jnp.asarray(preds), jnp.asarray(labels), sigma=1.5)
    np.testing.assert_allclose(np.asarray(ours_p), ref_p.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_std), ref_std.numpy(), rtol=1e-5, atol=1e-6)


def test_delta_ndcg_parity():
    preds, labels = rand_batch(B=4, N=10)
    ideal_sorted = ideal(labels)
    pred_order_labels = sort_by(preds, ideal_sorted)  # labels in predicted order
    ref = get_delta_ndcg(
        torch.from_numpy(ideal_sorted), torch.from_numpy(pred_order_labels),
        label_type=REF_LABEL_TYPE.MultiLabel, device="cpu",
    ).numpy()
    ours = np.asarray(
        delta_ndcg(jnp.asarray(ideal_sorted), jnp.asarray(pred_order_labels),
                   jnp.ones((4, 10), bool), LabelType.MultiLabel)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_ranknet_loss_parity():
    """Reference RankNet loss (ranknet.py:36-40) rebuilt from its own
    get_pairwise_comp_probs, vs our masked ranknet with full mask."""
    from ptranking_tpu.losses import get_loss

    preds, labels = rand_batch(B=3, N=7)
    t_p, t_std = get_pairwise_comp_probs(torch.from_numpy(preds), torch.from_numpy(labels), sigma=1.0)
    ref_loss = torch.nn.functional.binary_cross_entropy(
        input=torch.triu(t_p, diagonal=1), target=torch.triu(t_std, diagonal=1), reduction="none"
    ).sum().item()
    ours = float(get_loss("RankNet")(jnp.asarray(preds), jnp.asarray(labels), jnp.ones((3, 7), bool), sigma=1.0))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-4)


def test_listnet_loss_parity():
    from ptranking_tpu.losses import get_loss

    preds, labels = rand_batch(B=4, N=9)
    ref = torch.sum(
        -torch.sum(
            torch.softmax(torch.from_numpy(labels), dim=1)
            * torch.log_softmax(torch.from_numpy(preds), dim=1),
            dim=1,
        )
    ).item()
    ours = float(get_loss("ListNet")(jnp.asarray(preds), jnp.asarray(labels), jnp.ones((4, 9), bool)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_approx_ndcg_parity():
    from ptranking.ltr_adhoc.listwise.approxNDCG import approxNDCG_loss

    from ptranking_tpu.losses import get_loss

    # B=1 only: at B>1 the reference broadcasts a [B] dcg against a [B,1]
    # idcg into a [B,B] matrix (approxNDCG.py:58-60) — a bug we fix; the two
    # implementations agree exactly on single-query batches.
    preds, labels = rand_batch(B=1, N=8)
    ideal_sorted = ideal(labels)
    ref = approxNDCG_loss(
        batch_preds=torch.from_numpy(preds), batch_ideal_rankings=torch.from_numpy(ideal_sorted),
        alpha=10.0, label_type=REF_LABEL_TYPE.MultiLabel, device="cpu",
    ).item()
    ours = float(
        get_loss("ApproxNDCG")(jnp.asarray(preds), jnp.asarray(ideal_sorted), jnp.ones((1, 8), bool), alpha=10.0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
