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


def _copy_ffn(dst_layers, torch_seq):
    tlin = [m for m in torch_seq if isinstance(m, torch.nn.Linear)]
    assert len(tlin) == len(dst_layers)
    for lp, tl in zip(dst_layers, tlin):
        lp["linear"]["w"] = jnp.asarray(tl.weight.detach().numpy().T)
        lp["linear"]["b"] = jnp.asarray(tl.bias.detach().numpy())
    return [m for m in torch_seq if m.__class__.__name__ == "LTRBatchNorm"]


def test_pointsf_forward_and_grad_parity_with_transplanted_weights():
    """Copy the reference pointsf's torch weights into our pytree: forward and
    RankMSE gradients must agree (eval mode; GELU approximation tolerance)."""
    import jax

    from ptranking.base.point_ranker import PointNeuralRanker

    from ptranking_tpu.losses import get_loss
    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    class P(PointNeuralRanker):
        def custom_loss_function(self, *a, **k):
            pass

    torch.manual_seed(0)
    sf_para = {"sf_id": "pointsf", "opt": "Adam", "lr": 1e-4,
               "pointsf": dict(num_features=12, h_dim=16, out_dim=1, num_layers=3,
                               AF="GE", TL_AF="S", apply_tl_af=True, BN=True,
                               bn_type="BN", bn_affine=True, dropout=0.1)}
    r = P(sf_para_dict=sf_para)
    r.init()
    net = r.point_sf
    net.eval()

    cfg = ScorerConfig.default_pointsf(num_features=12, h_dim=16, num_layers=3)
    params = init_scorer(jax.random.PRNGKey(0), cfg)
    layers = params["point_sf"]["layers"]
    tbn = _copy_ffn(layers, net)
    for lp, tb in zip([l for l in layers if "bn" in l], tbn):
        lp["bn"]["gamma"] = jnp.asarray(tb.bn.weight.detach().numpy())
        lp["bn"]["beta"] = jnp.asarray(tb.bn.bias.detach().numpy())

    rng = np.random.RandomState(1)
    B, N = 3, 9
    x = rng.randn(B, N, 12).astype(np.float32)
    y = np.sort(rng.randint(0, 3, (B, N)).astype(np.float32))[:, ::-1].copy()
    mask = jnp.ones((B, N), bool)

    tscores = net(torch.tensor(x)).view(B, N)
    ours = apply_scorer(params, cfg, jnp.asarray(x), mask, training=False)
    np.testing.assert_allclose(np.asarray(ours), tscores.detach().numpy(),
                               atol=6e-3)

    loss_t = torch.mean(torch.sum(
        torch.nn.functional.mse_loss(tscores, torch.tensor(y), reduction="none"),
        dim=1))
    loss_t.backward()
    tlin0 = [m for m in net if isinstance(m, torch.nn.Linear)][0]
    g_t = tlin0.weight.grad.detach().numpy().T

    lf = get_loss("RankMSE")

    def f(p):
        s = apply_scorer(p, cfg, jnp.asarray(x), mask, training=False)
        return lf(s, jnp.asarray(y), mask)

    np.testing.assert_allclose(float(f(params)), float(loss_t.detach()), rtol=2e-3)
    g_o = jax.grad(f)(params)["point_sf"]["layers"][0]["linear"]["w"]
    np.testing.assert_allclose(np.asarray(g_o), g_t, atol=3e-2)


def test_listsf_dasalc_forward_parity_with_transplanted_weights():
    """Copy the reference DASALC listsf's torch weights (head/encoder/tail,
    fused-QKV mapping) into our pytree: forwards must agree to ~1%."""
    import jax

    from ptranking.base.list_ranker import ListNeuralRanker

    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    class L(ListNeuralRanker):
        def custom_loss_function(self, *a, **k):
            pass

    torch.manual_seed(0)
    sf_para = {"sf_id": "listsf", "opt": "Adagrad", "lr": 1e-3,
               "listsf": dict(num_features=12, ff_dims=[16, 24], out_dim=1,
                              AF="R", TL_AF="GE", apply_tl_af=False, BN=False,
                              bn_type="BN2", bn_affine=False, n_heads=2,
                              encoder_layers=2, dropout=0.1,
                              encoder_type="DASALC")}
    r = L(sf_para_dict=sf_para)
    r.init()
    for m in r.list_sf.values():
        m.eval()

    cfg = ScorerConfig.default_listsf(num_features=12, ff_dims=(16, 24),
                                      encoder_layers=2)
    params = init_scorer(jax.random.PRNGKey(0), cfg)
    _copy_ffn(params["head_ffnns"]["layers"], r.list_sf["head_ffnns"])
    _copy_ffn(params["tail_ffnns"]["layers"], r.list_sf["tail_ffnns"])
    for ours_l, ref_l in zip(params["encoder"]["layers"], r.list_sf["encoder"].layers):
        mh = ref_l.mhsa
        wq, wk, wv = (m.weight.detach().numpy().T for m in (mh.w_q, mh.w_k, mh.w_v))
        bq, bk, bv = (m.bias.detach().numpy() for m in (mh.w_q, mh.w_k, mh.w_v))
        ours_l["mhsa"]["qkv"]["w"] = jnp.asarray(np.concatenate([wq, wk, wv], axis=1))
        ours_l["mhsa"]["qkv"]["b"] = jnp.asarray(np.concatenate([bq, bk, bv]))
        ours_l["mhsa"]["fc"]["w"] = jnp.asarray(mh.fc.weight.detach().numpy().T)
        ours_l["mhsa"]["fc"]["b"] = jnp.asarray(mh.fc.bias.detach().numpy())
        names = dict(ref_l.sublayer_cont.norm.named_parameters())
        akey = "a_2" if "a_2" in names else "weight"
        bkey = "b_2" if "b_2" in names else "bias"
        ours_l["ln"]["a"] = jnp.asarray(names[akey].detach().numpy())
        ours_l["ln"]["b"] = jnp.asarray(names[bkey].detach().numpy())

    rng = np.random.RandomState(1)
    B, N = 3, 11
    x = rng.randn(B, N, 12).astype(np.float32)
    with torch.no_grad():
        ref_scores = r.forward(torch.tensor(x)).numpy()
    ours = np.asarray(apply_scorer(params, cfg, jnp.asarray(x),
                                   jnp.ones((B, N), bool), training=False))
    scale = max(float(np.abs(ref_scores).max()), 1e-3)
    assert float(np.max(np.abs(ref_scores - ours))) / scale < 0.02


def test_lambdaloss_ndcg_loss2_parity():
    """Reference LambdaLoss NDCG_Loss2 (lambdaloss.py:73-132) rebuilt from its
    own power-weight helper, vs our lambda_loss with a full mask."""
    from ptranking.ltr_adhoc.listwise.lambdaloss import ndcg_loss2_power_weights
    from ptranking.metric.adhoc.adhoc_metric import torch_dcg_at_k

    from ptranking_tpu.losses import get_loss

    preds, labels = rand_batch(B=3, N=8)
    ideal_sorted = ideal(labels)  # presort=True: labels ideally ordered
    t_preds = torch.from_numpy(preds)
    t_ideal = torch.from_numpy(ideal_sorted)
    k, sigma, eps = 5, 1.0, 1e-8

    desc_preds, desc_inds = torch.sort(t_preds, dim=1, descending=True)
    pred_rankings = torch.gather(t_ideal, dim=1, index=desc_inds)
    dists = 1.0 / torch.log2(torch.arange(8, dtype=torch.float) + 2.0)
    idcgs = torch_dcg_at_k(batch_rankings=t_ideal, device="cpu")
    n_gains = (torch.pow(2.0, pred_rankings) - 1.0) / idcgs
    power_w = ndcg_loss2_power_weights(batch_n_gains=n_gains, discounts=dists)
    diffs = (desc_preds.unsqueeze(2) - desc_preds.unsqueeze(1)).clamp(-1e8, 1e8)
    probas = (torch.sigmoid(sigma * diffs).clamp(min=eps) ** power_w).clamp(min=eps)
    logp = torch.log2(probas)
    trunc = torch.zeros((8, 8), dtype=torch.bool)
    trunc[:k, :k] = 1
    std_diffs = pred_rankings.unsqueeze(2) - pred_rankings.unsqueeze(1)
    ref = -torch.sum(logp[(std_diffs > 0) & trunc]).item()

    ours = float(get_loss("LambdaLoss")(
        jnp.asarray(preds), jnp.asarray(ideal_sorted), jnp.ones((3, 8), bool),
        loss_type="NDCG_Loss2", k=k, sigma=sigma))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_softrank_parity():
    """Reference SoftRank expected-nDCG loss (softrank.py:33-77) rebuilt
    inline, vs our soft_rank with a full mask."""
    from ptranking.metric.adhoc.adhoc_metric import torch_dcg_at_k

    from ptranking_tpu.losses import get_loss

    preds, labels = rand_batch(B=3, N=8)
    ideal_sorted = ideal(labels)
    t_preds = torch.from_numpy(preds)
    t_labels = torch.from_numpy(ideal_sorted)
    delta = 1.0

    pairsub_mus = t_preds.unsqueeze(2) - t_preds.unsqueeze(1)
    pairsub_vars = 2 * delta ** 2
    phi0 = 0.5 * torch.erfc(pairsub_mus / np.sqrt(2 * pairsub_vars))
    phi0_subdiag = torch.triu(phi0, diagonal=1) + torch.tril(phi0, diagonal=-1)
    expt_ranks = torch.sum(phi0_subdiag, dim=2) + 1.0
    gains = torch.pow(2.0, t_labels) - 1.0
    dists = 1.0 / torch.log2(expt_ranks + 1.0)
    idcgs = torch_dcg_at_k(batch_rankings=t_labels, device="cpu")
    ref = float(-torch.sum(torch.sum(dists * gains / idcgs, dim=1)))

    ours = float(get_loss("SoftRank")(
        jnp.asarray(preds), jnp.asarray(ideal_sorted), jnp.ones((3, 8), bool),
        delta=delta, top_k=None))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_rank_cosine_parity():
    from ptranking_tpu.losses import get_loss

    preds, labels = rand_batch(B=4, N=9)
    cos = torch.nn.functional.cosine_similarity(
        torch.from_numpy(preds), torch.from_numpy(labels), dim=1)
    ref = float(torch.sum((1.0 - cos) / 0.5))
    ours = float(get_loss("RankCosine")(
        jnp.asarray(preds), jnp.asarray(labels), jnp.ones((4, 9), bool)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_wassrank_cost_matrices_parity():
    """Our WassRank cost matrices vs reference wasserstein_cost_mat.py on
    identical labels."""
    from ptranking.ltr_adhoc.listwise.wassrank.wasserstein_cost_mat import (
        get_delta_gains,
        torch_cost_mat_dist,
        torch_cost_mat_group,
    )

    from ptranking_tpu.losses.wassrank import (
        cost_mat_delta_gains,
        cost_mat_group,
        cost_mat_positions,
    )

    _, labels = rand_batch(B=2, N=7)
    t = torch.from_numpy(labels)
    mask = jnp.ones((2, 7), bool)

    ref = torch_cost_mat_dist(t, exponent=2.0).numpy()
    ours = np.asarray(cost_mat_positions(jnp.asarray(labels), mask, exponent=2.0))
    np.testing.assert_allclose(ours, np.broadcast_to(ref, ours.shape), rtol=1e-5)

    ref = get_delta_gains(t, discount=True).numpy()
    ours = np.asarray(cost_mat_delta_gains(jnp.asarray(labels), mask, discount=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    ref = torch_cost_mat_group(t, non_rele_gap=10.0, var_penalty=0.01,
                               gain_base=2.0).numpy()
    ours = np.asarray(cost_mat_group(jnp.asarray(labels), mask,
                                     non_rele_gap=10.0, var_penalty=0.01,
                                     gain_base=2.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sinkhorn_ot_parity():
    """Our custom-VJP sinkhorn_distance vs reference OldSinkhornOT
    (pytorch_wasserstein.py:325-393) on identical histograms and a shared
    cost matrix: forward transport cost and the analytic dual gradient."""
    import jax

    from ptranking.ltr_adhoc.listwise.wassrank.pytorch_wasserstein import OldSinkhornOT

    from ptranking_tpu.ops.sinkhorn import sinkhorn_distance

    rng = np.random.RandomState(0)
    B, N = 3, 6
    mu = rng.rand(B, N) + 0.1
    mu = mu / mu.sum(axis=1, keepdims=True)
    nu = rng.rand(B, N) + 0.1
    nu = nu / nu.sum(axis=1, keepdims=True)
    cost = np.abs(rng.rand(N, N)).astype(np.float64)
    lam, iters = 0.5, 200  # enough iterations that both converge

    t_mu = torch.tensor(mu, requires_grad=True)
    ref = OldSinkhornOT.apply(t_mu, torch.tensor(nu), torch.tensor(cost), lam, iters)
    ref.backward()
    ref_val = float(ref)
    ref_grad = t_mu.grad.numpy()

    cost_b = jnp.broadcast_to(jnp.asarray(cost, jnp.float32), (B, N, N))
    f = lambda m: sinkhorn_distance(m, jnp.asarray(nu, jnp.float32), cost_b,
                                    None, lam, iters)
    ours_val = float(f(jnp.asarray(mu, jnp.float32)))
    ours_grad = np.asarray(jax.grad(f)(jnp.asarray(mu, jnp.float32)))

    np.testing.assert_allclose(ours_val, ref_val, rtol=1e-3)
    np.testing.assert_allclose(ours_grad, ref_grad, rtol=1e-3, atol=1e-5)
