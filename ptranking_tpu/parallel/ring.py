"""Context parallelism over the document axis: ring + Ulysses attention.

SURVEY §5.7: candidate lists reach ~1,300 docs (MSLR-WEB30K) and the listwise
scorer's MHSA builds an n x n matrix per head (reference list_ranker.py:
232-245) — on one device that caps n by HBM. These primitives shard the doc
axis across the mesh's `seq` axis:

  * ring_attention — exact blockwise attention: each device keeps its local
    query block and rotates (k, v, mask) blocks around the ring with
    `jax.lax.ppermute`, maintaining a running-max online softmax
    (flash-attention style), so only n/P-sized blocks ever exist per device
    and the communication rides ICI neighbor links.
  * ulysses_attention — all-to-all alternative: swap the sharded axis from
    docs to heads, run ordinary full-length attention on each device's head
    subset, swap back. One collective each way, best when H >= P.

Both match the single-device masked softmax attention exactly (tests compare
against models/scorers/listsf.mhsa_apply's core on a CPU mesh).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from ptranking_tpu.parallel._compat import SM_NOCHECK as _SM_NOCHECK, shard_map
from jax.sharding import Mesh, PartitionSpec as P

# block math shared with the single-chip blockwise path (ops/attention.py)
from ptranking_tpu.ops.attention import online_combine, sdpa_block as _sdpa_block


class CPPlan(NamedTuple):
    """Context-parallel plan threaded through apply_scorer into the MHSA
    blocks (and picked up by DistributedTrainer's pairwise-loss path): which
    mesh, which mesh axis shards the doc axis, which attention exchange to
    use, and which axis (if any) shards the batch (so the shard_map specs
    keep DP intact instead of gathering the batch)."""

    mesh: Mesh
    axis_name: str = "seq"
    impl: str = "ring"  # 'ring' | 'ulysses'
    batch_axis: Optional[str] = "data"


def ring_attention(
    q: jnp.ndarray,   # [B, H, N, d] — N sharded over `axis_name`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, N] — sharded like N
    mesh: Mesh,
    axis_name: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Exact doc-axis-sharded attention; output sharded like q."""
    P_ = mesh.shape[axis_name]
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    perm = [(i, (i + 1) % P_) for i in range(P_)]

    def per_device(q_l, k_l, v_l, m_l):
        def step(carry, _):
            k_c, v_c, m_c, num, denom, mx = carry
            part = _sdpa_block(q_l, k_c, v_c, m_c, scale)
            num, denom, new_mx = online_combine(num, denom, mx, *part)
            k_n = jax.lax.ppermute(k_c, axis_name, perm)
            v_n = jax.lax.ppermute(v_c, axis_name, perm)
            m_n = jax.lax.ppermute(m_c, axis_name, perm)
            return (k_n, v_n, m_n, num, denom, new_mx), None

        B, H, nq, d = q_l.shape
        init = (
            k_l, v_l, m_l,
            jnp.zeros((B, H, nq, d), jnp.float32),
            jnp.zeros((B, H, nq), jnp.float32),
            jnp.full((B, H, nq), -jnp.inf, jnp.float32),
        )
        (k_c, v_c, m_c, num, denom, mx), _ = jax.lax.scan(
            step, init, None, length=P_)
        out = num / jnp.maximum(denom, 1e-30)[..., None]
        return out.astype(q_l.dtype)

    spec_qkv = P(batch_axis, None, axis_name, None)
    spec_m = P(batch_axis, axis_name)
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_m),
        out_specs=spec_qkv, **_SM_NOCHECK,
    )(q, k, v, mask)


def ulysses_attention(
    q: jnp.ndarray,   # [B, H, N, d] — N sharded over `axis_name`; H % P == 0
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, N]
    mesh: Mesh,
    axis_name: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """All-to-all CP: swap shard axis docs->heads, full attention, swap back."""
    P_ = mesh.shape[axis_name]
    assert q.shape[1] % P_ == 0, "heads must divide the seq-parallel degree"
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))

    def per_device(q_l, k_l, v_l, m_l):
        # [B, H, n_loc, d] -> all_to_all -> [B, H/P, N, d]
        def swap_in(t):
            return jax.lax.all_to_all(t, axis_name, split_axis=1,
                                      concat_axis=2, tiled=True)

        def swap_out(t):
            return jax.lax.all_to_all(t, axis_name, split_axis=2,
                                      concat_axis=1, tiled=True)

        qh, kh, vh = swap_in(q_l), swap_in(k_l), swap_in(v_l)
        m_full = jax.lax.all_gather(m_l, axis_name, axis=1, tiled=True)  # [B, N]
        num, denom, mx = _sdpa_block(qh, kh, vh, m_full, scale)
        out = num / jnp.maximum(denom, 1e-30)[..., None]
        return swap_out(out.astype(q_l.dtype))

    spec_qkv = P(batch_axis, None, axis_name, None)
    spec_m = P(batch_axis, axis_name)
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_m),
        out_specs=spec_qkv, **_SM_NOCHECK,
    )(q, k, v, mask)


def reference_attention(q, k, v, mask):
    """Single-device oracle with the same masking semantics."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    num, denom, _ = _sdpa_block(q, k, v, mask, scale)
    return (num / jnp.maximum(denom, 1e-30)[..., None]).astype(q.dtype)


def ring_lambda_loss(
    sorted_scores: jnp.ndarray,   # [B, N] sorted desc by score; N sharded
    sorted_labels: jnp.ndarray,   # [B, N] labels in that order
    n_gains: jnp.ndarray,         # [B, N] gain/IDCG, zero at pads
    mask: jnp.ndarray,            # [B, N]
    mesh: Mesh,
    sigma: float = 1.0,
    weighted: bool = True,
    axis_name: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Doc-axis-sharded LambdaRank/RankNet pairwise loss.

    The n x n pair space (reference lambdarank.py:27-62 + ΔnDCG weights,
    metric_utils.py:19-45) is computed blockwise: each device keeps its local
    row block and rotates the column block around the ring, accumulating the
    masked upper-triangle (global rank i < j) BCE sum. Only n/P-sized blocks
    exist per device — the n x n matrix never does (SURVEY §5.7's "blockwise
    ΔnDCG/BCE with running reductions across shards").
    """
    P_ = mesh.shape[axis_name]
    perm = [(i, (i + 1) % P_) for i in range(P_)]

    def per_device(s_l, l_l, g_l, m_l):
        idx = jax.lax.axis_index(axis_name)
        B, n_loc = s_l.shape
        local_ranks = jnp.arange(n_loc)

        def pair_block(si, li, gi, di, mi, ri, sj, lj, gj, dj, mj, rj):
            # si/li/gi/mi: [B, n_loc] rows; di/ri: [n_loc] global discount/rank
            diffs = sigma * (si[:, :, None] - sj[:, None, :])
            targets = 0.5 * (1.0 + jnp.clip(li[:, :, None] - lj[:, None, :], -1.0, 1.0))
            bce = jnp.logaddexp(0.0, diffs) - targets * diffs
            if weighted:
                w = (jnp.abs(gi[:, :, None] - gj[:, None, :])
                     * jnp.abs(di[:, None] - dj[None, :])[None])
            else:
                w = 1.0
            valid = (mi[:, :, None] & mj[:, None, :]
                     & (ri[:, None] < rj[None, :])[None])
            return jnp.sum(jnp.where(valid, w * bce, 0.0))

        def step(carry, r):
            s_c, l_c, g_c, m_c, acc = carry
            src = (idx - r) % P_                       # block's home device
            rank_i = idx * n_loc + local_ranks         # global ranks, rows
            rank_j = src * n_loc + local_ranks         # global ranks, cols
            d_i = 1.0 / jnp.log2(rank_i.astype(jnp.float32) + 2.0)
            d_j = 1.0 / jnp.log2(rank_j.astype(jnp.float32) + 2.0)
            acc = acc + pair_block(s_l, l_l, g_l, d_i, m_l, rank_i,
                                   s_c, l_c, g_c, d_j, m_c, rank_j)
            s_n = jax.lax.ppermute(s_c, axis_name, perm)
            l_n = jax.lax.ppermute(l_c, axis_name, perm)
            g_n = jax.lax.ppermute(g_c, axis_name, perm)
            m_n = jax.lax.ppermute(m_c, axis_name, perm)
            return (s_n, l_n, g_n, m_n, acc), None

        init = (s_l, l_l, g_l, m_l, jnp.zeros((), jnp.float32))
        acc = jax.lax.scan(step, init, jnp.arange(P_))[0][-1]
        # total over the pair space AND, when the batch is data-sharded, over
        # the batch shards — every device then holds the identical scalar
        return jax.lax.psum(acc, _loss_psum_axes(axis_name, batch_axis))[None]

    spec = P(batch_axis, axis_name)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(axis_name), **_SM_NOCHECK,
    )(sorted_scores, sorted_labels, n_gains, mask)
    return out[0]


def _loss_psum_axes(axis_name, batch_axis):
    """The axes a CP loss scalar reduces over: seq + any batch shards."""
    if batch_axis is None:
        return (axis_name,)
    if isinstance(batch_axis, (tuple, list)):
        return (axis_name, *batch_axis)
    return (axis_name, batch_axis)


def ring_lambdaloss(
    sorted_scores: jnp.ndarray,   # [B, N] sorted desc by score; N sharded
    sorted_labels: jnp.ndarray,   # [B, N] labels in that order
    n_gains: jnp.ndarray,         # [B, N] gain/IDCG of the sorted order
    mask: jnp.ndarray,            # [B, N] sorted mask
    mesh: Mesh,
    loss_type: str = "NDCG_Loss2",
    k: int = 5,
    sigma: float = 1.0,
    mu: float = 5.0,
    eps: float = 1e-8,  # EPSILON — MUST match the dense lambda_loss clip
    # (losses/listwise.py) or CP loss/grad saturation behavior diverges
    axis_name: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Doc-axis-sharded LambdaLoss (losses/listwise.py::lambda_loss blockwise).

    The N x N power-weighted pair space (reference lambdaloss.py:33-138)
    rotates column blocks around the ring exactly like ring_lambda_loss;
    every weight/clamp/truncation quirk of the dense path is reproduced on
    global positions (rank_i = device_idx * n_loc + local), so the CP loss
    equals the dense loss bit-for-bit up to reduction order.
    """
    P_ = mesh.shape[axis_name]
    perm = [(i, (i + 1) % P_) for i in range(P_)]
    log2_eps = jnp.log2(jnp.asarray(eps, jnp.float32))

    def per_device(s_l, l_l, g_l, m_l):
        idx = jax.lax.axis_index(axis_name)
        n_loc = s_l.shape[-1]
        local_ranks = jnp.arange(n_loc)

        def pair_block(si, li, gi, mi, ri, sj, lj, gj, mj, rj):
            diffs = jnp.clip(si[:, :, None] - sj[:, None, :], -1e8, 1e8)
            log_probas = jnp.log2(jnp.clip(jax.nn.sigmoid(sigma * diffs), eps, None))
            pi = ri.astype(jnp.float32)[:, None]   # global positions, rows
            pj = rj.astype(jnp.float32)[None, :]
            if loss_type == "NDCG_Loss1":
                # column-aligned reference broadcast: w_ij = nG_j * log2(j+2)
                w = (gj * jnp.log2(rj.astype(jnp.float32) + 2.0))[:, None, :]
            else:
                d = jnp.abs(pi - pj)
                delta_ij = jnp.abs(jnp.log2(d + 2.0) - jnp.log2(d + 1.0))
                delta_ij = jnp.where(pi == pj, 0.0, delta_ij)
                ng_diffs = jnp.abs(gi[:, :, None] - gj[:, None, :])
                if loss_type == "NDCG_Loss2":
                    w = delta_ij[None] * ng_diffs
                elif loss_type == "NDCG_Loss2++":
                    rho_ij = jnp.abs(jnp.log2(pi + 2.0) - jnp.log2(pj + 2.0))
                    w = (rho_ij[None] + mu * delta_ij[None]) * ng_diffs
                else:
                    raise NotImplementedError(loss_type)
            log_weighted = jnp.maximum(w * log_probas, log2_eps)
            select = ((mi[:, :, None] & mj[:, None, :])
                      & ((ri[:, None] < k) & (rj[None, :] < k))[None])
            if loss_type in ("NDCG_Loss2", "NDCG_Loss2++"):
                select = select & (li[:, :, None] - lj[:, None, :] > 0)
            return jnp.sum(jnp.where(select, log_weighted, 0.0))

        def step(carry, r):
            s_c, l_c, g_c, m_c, acc = carry
            src = (idx - r) % P_
            rank_i = idx * n_loc + local_ranks
            rank_j = src * n_loc + local_ranks
            acc = acc + pair_block(s_l, l_l, g_l, m_l, rank_i,
                                   s_c, l_c, g_c, m_c, rank_j)
            s_n = jax.lax.ppermute(s_c, axis_name, perm)
            l_n = jax.lax.ppermute(l_c, axis_name, perm)
            g_n = jax.lax.ppermute(g_c, axis_name, perm)
            m_n = jax.lax.ppermute(m_c, axis_name, perm)
            return (s_n, l_n, g_n, m_n, acc), None

        init = (s_l, l_l, g_l, m_l, jnp.zeros((), jnp.float32))
        acc = jax.lax.scan(step, init, jnp.arange(P_))[0][-1]
        return -jax.lax.psum(acc, _loss_psum_axes(axis_name, batch_axis))[None]

    spec = P(batch_axis, axis_name)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(axis_name), **_SM_NOCHECK,
    )(sorted_scores, sorted_labels, n_gains, mask)
    return out[0]


def ring_approx_ndcg(
    scores: jnp.ndarray,    # [B, N] raw scores; N sharded over axis_name
    n_gains: jnp.ndarray,   # [B, N] gain/IDCG of the (presorted-ideal) labels
    mask: jnp.ndarray,      # [B, N]
    mesh: Mesh,
    alpha: float = 10.0,
    axis_name: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Doc-axis-sharded ApproxNDCG (losses/listwise.py::approx_ndcg blockwise).

    The smooth ranks pi_i = 0.5 + sum_j sigmoid(alpha (s_j - s_i)) reduce the
    N x N pair space ALONG j — a running row-sum while column blocks rotate
    around the ring — so only n/P-sized blocks exist per device. No sort is
    needed (labels are the ideal order thanks to presort), making this loss
    fully gather-free under CP.
    """
    P_ = mesh.shape[axis_name]
    perm = [(i, (i + 1) % P_) for i in range(P_)]

    def per_device(s_l, g_l, m_l):
        def step(carry, _):
            s_c, m_c, rank_acc = carry
            indicators = jax.nn.sigmoid(alpha * (s_c[:, None, :] - s_l[:, :, None]))
            valid = m_l[:, :, None] & m_c[:, None, :]
            rank_acc = rank_acc + jnp.sum(jnp.where(valid, indicators, 0.0), axis=-1)
            s_n = jax.lax.ppermute(s_c, axis_name, perm)
            m_n = jax.lax.ppermute(m_c, axis_name, perm)
            return (s_n, m_n, rank_acc), None

        init = (s_l, m_l, jnp.zeros(s_l.shape, jnp.float32))
        (_, _, rank_sums), _ = jax.lax.scan(step, init, None, length=P_)
        hat_pi = rank_sums + 0.5
        # local partial of each query's smooth DCG; n_gains already carries
        # the 1/IDCG normalization (computed rowwise outside the shard_map)
        local = jnp.sum(jnp.where(m_l, g_l / jnp.log2(hat_pi + 1.0), 0.0), axis=-1)
        total = jnp.sum(jax.lax.psum(local, axis_name))
        if batch_axis is not None:
            axes = (tuple(batch_axis) if isinstance(batch_axis, (tuple, list))
                    else (batch_axis,))
            total = jax.lax.psum(total, axes)
        return -total[None]

    spec = P(batch_axis, axis_name)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(axis_name), **_SM_NOCHECK,
    )(scores, n_gains, mask)
    return out[0]


def ring_soft_rank(
    scores: jnp.ndarray,    # [B, N] raw scores; N sharded over axis_name
    n_gains: jnp.ndarray,   # [B, N] gain/IDCG of the labels (given order)
    mask: jnp.ndarray,      # [B, N]
    mesh: Mesh,
    delta: float = 1.0,
    top_k: Optional[int] = None,
    axis_name: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Doc-axis-sharded SoftRank (losses/listwise.py::soft_rank blockwise).

    The expected ranks E[rank_i] = 1 + sum_{j != i} Phi0((s_i - s_j) /
    sqrt(2 * 2 delta^2)) reduce the N x N pair space ALONG j — the same
    running row-sum shape as ring_approx_ndcg, with the Gaussian pairwise
    CDF in place of the sigmoid. The diagonal (j == i, Phi0(0) = 0.5) is
    accumulated when a device's own block visits and subtracted once at the
    end, keeping the ring body branch-free. top_k masks GLOBAL doc positions
    (each shard offsets its local arange by axis_index * n_local), exactly
    the dense loss's `arange(N) < top_k` over the given order.
    """
    P_ = mesh.shape[axis_name]
    perm = [(i, (i + 1) % P_) for i in range(P_)]
    inv_std = 1.0 / jnp.sqrt(2.0 * 2.0 * delta * delta)

    def per_device(s_l, g_l, m_l):
        def step(carry, _):
            s_c, m_c, rank_acc = carry
            phi0 = 0.5 * jax.lax.erfc((s_l[:, :, None] - s_c[:, None, :]) * inv_std)
            valid = m_l[:, :, None] & m_c[:, None, :]
            rank_acc = rank_acc + jnp.sum(jnp.where(valid, phi0, 0.0), axis=-1)
            s_n = jax.lax.ppermute(s_c, axis_name, perm)
            m_n = jax.lax.ppermute(m_c, axis_name, perm)
            return (s_n, m_n, rank_acc), None

        init = (s_l, m_l, jnp.zeros(s_l.shape, jnp.float32))
        (_, _, rank_sums), _ = jax.lax.scan(step, init, None, length=P_)
        # remove the self-pair Phi0(0) = 0.5 the rotation accumulated once
        expt_ranks = rank_sums - jnp.where(m_l, 0.5, 0.0) + 1.0
        terms = jnp.where(m_l, g_l / jnp.log2(expt_ranks + 1.0), 0.0)
        if top_k is not None:
            n_local = s_l.shape[-1]
            pos = jax.lax.axis_index(axis_name) * n_local + jnp.arange(n_local)
            terms = jnp.where((pos < top_k)[None], terms, 0.0)
        local = jnp.sum(terms, axis=-1)
        total = jnp.sum(jax.lax.psum(local, axis_name))
        if batch_axis is not None:
            axes = (tuple(batch_axis) if isinstance(batch_axis, (tuple, list))
                    else (batch_axis,))
            total = jax.lax.psum(total, axes)
        return -total[None]

    spec = P(batch_axis, axis_name)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(axis_name), **_SM_NOCHECK,
    )(scores, n_gains, mask)
    return out[0]


def ring_neural_ndcg(
    scores: jnp.ndarray,    # [B, N] raw scores; N sharded over axis_name
    labels: jnp.ndarray,    # [B, N]
    mask: jnp.ndarray,      # [B, N]
    mesh: Mesh,
    temperature: float = 1.0,
    top_k=None,
    sinkhorn_iters: int = 10,
    label_type=None,
    axis_name: str = "seq",
    batch_axis=None,
) -> jnp.ndarray:
    """Doc-axis-sharded NeuralNDCG (losses/listwise.py::neural_ndcg).

    The [N, N] relaxed permutation P is sharded over its RANK axis (the
    same shards as the doc axis): each device holds its rank-row block
    [B, n/P, N]. The O(N) vectors (scores, labels, the |s_j - s_k| row
    sums) are all_gathered; the pairwise |s_j - s_k| reduction itself is
    computed blockwise per device then gathered as a vector. Per Sinkhorn
    scaling round the column normalisation costs one stop-gradiented pmax
    + one psum across shards (the loss reverse-mode differentiates through
    the scaling, so the LSE max-shift must carry no tangent); everything
    else is device-local. Matches the dense loss exactly
    (equivalence-tested in tests/test_parallel.py).
    """
    from ptranking_tpu import EPSILON
    from ptranking_tpu.ops import gain as label_gain, masked_log_softmax
    from ptranking_tpu.ops.sinkhorn import _NEG, _lse
    from ptranking_tpu.parallel.ot import _plse_sg
    from ptranking_tpu.types import LabelType

    lt = LabelType.MultiLabel if label_type is None else label_type
    P_ = mesh.shape[axis_name]  # noqa: F841  (documents the shard count)

    def per_device(s_l, l_l, m_l):
        n_l = s_l.shape[-1]
        rows0 = jax.lax.axis_index(axis_name) * n_l + jnp.arange(n_l)
        s_full = jax.lax.all_gather(s_l, axis_name, axis=1, tiled=True)
        l_full = jax.lax.all_gather(l_l, axis_name, axis=1, tiled=True)
        m_full = jax.lax.all_gather(m_l, axis_name, axis=1, tiled=True)
        N = s_full.shape[-1]
        n = jnp.sum(m_full, axis=-1, keepdims=True).astype(s_l.dtype)  # [B,1]

        s_lm = jnp.where(m_l, s_l, 0.0)
        s_fm = jnp.where(m_full, s_full, 0.0)
        # A_j = sum_k |s_j - s_k|: local j block vs full k, then gather
        blk = jnp.abs(s_lm[..., :, None] - s_fm[..., None, :])
        valid_jk = m_l[..., :, None] & m_full[..., None, :]
        A_l = jnp.sum(jnp.where(valid_jk, blk, 0.0), axis=-1)  # [B, n/P]
        A_full = jax.lax.all_gather(A_l, axis_name, axis=1, tiled=True)

        ranks_l = (rows0 + 1).astype(s_l.dtype)                 # global ranks
        c_l = n + 1.0 - 2.0 * ranks_l[None, :]                  # [B, n/P]
        logits = (c_l[..., :, None] * s_fm[..., None, :]
                  - A_full[..., None, :]) / temperature
        row_ok = ranks_l[None, :] <= n                          # [B, n/P]
        cell = row_ok[..., :, None] & m_full[..., None, :]
        log_p = masked_log_softmax(logits, cell)
        log_p = jnp.where(cell, log_p, _NEG)
        for _ in range(int(sinkhorn_iters)):
            # column norm: LSE over the SHARDED rank axis
            log_p = log_p - _plse_sg(log_p, -2, axis_name)[..., None, :]
            log_p = jnp.where(cell, log_p, _NEG)
            log_p = log_p - _lse(log_p, -1)[..., :, None]       # row norm
            log_p = jnp.where(cell, log_p, _NEG)
        Pm = jnp.where(cell, jnp.exp(log_p), 0.0)

        gains_full = label_gain(jnp.where(m_full, l_full, 0.0), lt)
        ghat = jnp.einsum("bij,bj->bi", Pm, gains_full)         # [B, n/P]
        disc_l = 1.0 / jnp.log2(ranks_l + 1.0)
        kmask_l = (row_ok if top_k is None
                   else row_ok & (ranks_l <= min(int(top_k), N))[None])
        dcg = jax.lax.psum(
            jnp.sum(jnp.where(kmask_l, ghat * disc_l[None], 0.0), -1),
            axis_name)                                          # [B] replicated

        ranks_f = jnp.arange(1, N + 1, dtype=s_l.dtype)
        disc_f = 1.0 / jnp.log2(ranks_f + 1.0)
        krow_f = ((ranks_f[None, :] <= n) if top_k is None
                  else (ranks_f[None, :] <= n)
                  & (ranks_f <= min(int(top_k), N))[None])
        ideal = jnp.where(krow_f & m_full, gains_full * disc_f[None], 0.0)
        idcg = jnp.maximum(jnp.sum(ideal, axis=-1), EPSILON)

        total = jnp.sum(dcg / idcg)
        if batch_axis is not None:
            axes = (tuple(batch_axis) if isinstance(batch_axis, (tuple, list))
                    else (batch_axis,))
            total = jax.lax.psum(total, axes)
        return -total[None]

    spec = P(batch_axis, axis_name)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(axis_name), **_SM_NOCHECK,
    )(scores, labels, mask)
    return out[0]
