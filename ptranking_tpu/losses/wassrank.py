"""WassRank: listwise ranking as entropic optimal transport.

TPU-native redesign of reference ptranking/ltr_adhoc/listwise/wassrank/
(wassRank.py, wasserstein_cost_mat.py, pytorch_wasserstein.py). The Sinkhorn
iteration — the reference's only CUDA kernel (§2.9.2 of SURVEY.md) — lives in
ops/sinkhorn.py as fused XLA (Pallas variant in ops/pallas/). Cost matrices
and histograms are masked so padded documents carry zero mass and infinite-ish
transport cost to real slots.
"""

from typing import Optional

import jax.numpy as jnp

from ptranking_tpu.ops.sinkhorn import entropic_ot, sinkhorn_distance
from ptranking_tpu.ops import masked_softmax


def cost_mat_positions(labels, mask, exponent: float = 1.0):
    """|pos_i - pos_j|^exponent (reference torch_cost_mat_dist,
    wasserstein_cost_mat.py:48-61)."""
    n = labels.shape[-1]
    pos = jnp.arange(1, n + 1, dtype=labels.dtype)
    c = jnp.abs(pos[:, None] - pos[None, :])
    if exponent > 1.0:
        c = jnp.power(c, exponent)
    return jnp.broadcast_to(c, (*labels.shape, n))


def cost_mat_delta_gains(labels, mask, discount: bool = False):
    """|gain_i - gain_j| (optionally x |disc_i - disc_j|) (reference
    get_delta_gains, wasserstein_cost_mat.py:64-81)."""
    gains = jnp.power(2.0, jnp.where(mask, labels, 0.0)) - 1.0
    g_diffs = jnp.abs(gains[..., :, None] - gains[..., None, :])
    if discount:
        n = labels.shape[-1]
        d = 1.0 / jnp.log2(jnp.arange(n, dtype=labels.dtype) + 2.0)
        d_diffs = jnp.abs(d[:, None] - d[None, :])
        return g_diffs * d_diffs[None]
    return g_diffs


def cost_mat_group(labels, mask, non_rele_gap: float = 100.0,
                   var_penalty: float = float(jnp.e), gain_base: float = 4.0):
    """Relevance-group cost (reference torch_cost_mat_group,
    wasserstein_cost_mat.py:84-112): gains with non-relevant docs pushed to
    -gap, |c_i - c_j| with same-group moves charged var_penalty, zero diag."""
    g = jnp.power(gain_base, jnp.where(mask, labels, 0.0)) - 1.0
    g = jnp.where(g < 1.0, -non_rele_gap, g)
    c = jnp.abs(g[..., :, None] - g[..., None, :])
    c = jnp.where(c < 1.0, var_penalty, c)
    n = labels.shape[-1]
    return jnp.where(jnp.eye(n, dtype=bool)[None], 0.0, c)


def get_cost_mat(labels, mask, cost_type: str = "eg", non_rele_gap: float = 100.0,
                 var_penalty: float = float(jnp.e), gain_base: float = 4.0):
    """Dispatch mirroring reference get_explicit_cost_mat
    (wasserstein_cost_mat.py:115-135)."""
    if cost_type == "p1":
        return cost_mat_positions(labels, mask, 1.0)
    if cost_type == "p2":
        return cost_mat_positions(labels, mask, 2.0)
    if cost_type == "eg":
        return cost_mat_group(labels, mask, non_rele_gap, var_penalty, gain_base)
    if cost_type == "dg":
        return cost_mat_delta_gains(labels, mask, discount=False)
    if cost_type == "ddg":
        return cost_mat_delta_gains(labels, mask, discount=True)
    raise NotImplementedError(cost_type)


def std_histogram_st(labels, mask):
    """softmax(labels) over valid docs (reference
    get_standard_normalized_histogram_ST with adjust_softmax=False,
    wasserstein_cost_mat.py:142-167 — WassRank calls it with False,
    wasserstein_cost_mat.py:191)."""
    return masked_softmax(labels, mask)


def std_histogram_gn(labels, mask, gain_base: float = 2.0):
    """gain / sum(gain) (reference get_standard_normalized_histogram_GN,
    wasserstein_cost_mat.py:170-178)."""
    gains = jnp.where(mask, jnp.power(gain_base, labels) - 1.0, 0.0)
    return gains / jnp.maximum(jnp.sum(gains, axis=-1, keepdims=True), 1e-12)


def pred_histogram(scores, labels, mask, smooth_type: str = "ST",
                   tl_af: str = "S", max_rele_level: Optional[float] = None):
    """Normalize predictions into a histogram (reference
    get_normalized_histograms, wasserstein_cost_mat.py:181-241)."""
    if smooth_type == "ST":
        if tl_af in ("S", "ST"):  # sigmoid outputs in [0,1]: rescale to label range
            if max_rele_level is None:
                max_rele_level = jnp.max(jnp.where(mask, labels, 0.0))
            scores = scores * max_rele_level
        return masked_softmax(scores, mask)
    elif smooth_type == "NG":
        s = jnp.where(mask, scores, 0.0)
        mini = jnp.min(jnp.where(mask, scores, jnp.inf))
        s = jnp.where(mask, jnp.where(mini > 0, s, s - mini), 0.0)
        return s / jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-12)
    raise NotImplementedError(smooth_type)


def wass_rank(scores, labels, mask, mode: str = "SinkhornOT", sh_itr: int = 20,
              lam: float = 0.1, smooth_type: str = "ST", norm_type: str = "BothST",
              cost_type: str = "eg", non_rele_gap: float = 100.0,
              var_penalty: float = float(jnp.e), gain_base: float = 4.0,
              tl_af: str = "S", **_):
    """OT distance between prediction and label histograms under a
    relevance-aware ground cost (reference WassRank.custom_loss_function,
    wassRank.py:43-88; defaults wassRank.py:102-103)."""
    cost = get_cost_mat(labels, mask, cost_type, non_rele_gap, var_penalty, gain_base)
    if smooth_type == "ST":
        std_hists = std_histogram_st(labels, mask)
    else:
        std_hists = std_histogram_gn(labels, mask)
    pred_hists = pred_histogram(scores, labels, mask, smooth_type, tl_af)

    real = jnp.any(mask, axis=-1)  # exclude all-padded remainder rows
    if mode == "SinkhornOT":
        return sinkhorn_distance(pred_hists, std_hists, cost, real, lam, sh_itr)
    elif mode == "EntropicOT":
        loss, _ = entropic_ot(pred_hists, std_hists, cost, eps=lam,
                              max_iters=sh_itr, row_mask=real)
        return loss
    raise NotImplementedError(mode)
