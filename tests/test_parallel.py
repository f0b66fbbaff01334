"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8).

The key property: DP/TP/CP-sharded training must be numerically equivalent to
single-device training — sharding is an execution detail, not a model change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptranking_tpu.data import BucketedDataset, make_synthetic_queries
from ptranking_tpu.models import ScorerConfig
from ptranking_tpu.parallel import DistributedTrainer, MeshConfig, make_mesh
from ptranking_tpu.train import AdhocRanker, OptimizerConfig


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1, "seq": 1}
    mesh2 = make_mesh(MeshConfig(data=2, model=2, seq=2))
    assert mesh2.shape == {"data": 2, "model": 2, "seq": 2}


def _pointsf_cfg(dropout=0.0):
    return ScorerConfig(sf_id="pointsf", num_features=24, num_layers=2, h_dim=32,
                        dropout=dropout, apply_tl_af=False)


def _run_trainer(mesh_cfg, tp=False, shard_docs=False, sf=None, steps=5, model="LambdaRank"):
    qs = make_synthetic_queries(num_queries=64, num_features=24, seed=3, min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    mesh = make_mesh(mesh_cfg)
    tr = DistributedTrainer(model, sf or _pointsf_cfg(), mesh, tp=tp,
                            shard_docs=shard_docs,
                            opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
    losses = []
    batches = list(ds.batches())
    for i in range(steps):
        losses.append(tr.train_step(batches[i % len(batches)]))
    metrics = tr.evaluate(batches, ks=(1, 5))
    return losses, metrics, tr


def test_dp_matches_single_device():
    losses8, metrics8, _ = _run_trainer(MeshConfig(data=8))
    losses1, metrics1, _ = _run_trainer(MeshConfig(data=1))
    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    np.testing.assert_allclose(metrics8["nDCG"], metrics1["nDCG"], atol=1e-5)


def test_tp_matches_single_device():
    losses_tp, metrics_tp, tr = _run_trainer(MeshConfig(data=2, model=4), tp=True)
    losses1, metrics1, _ = _run_trainer(MeshConfig(data=1))
    np.testing.assert_allclose(losses_tp, losses1, rtol=1e-3)
    np.testing.assert_allclose(metrics_tp["nDCG"], metrics1["nDCG"], atol=1e-4)
    # weights must actually be sharded over the model axis
    sharded = [
        p for p in jax.tree_util.tree_leaves(tr.params)
        if p.ndim == 2 and len(p.sharding.device_set) > 1
    ]
    assert sharded, "TP requested but no weight matrix is sharded"


def test_tp_listsf_runs_sharded():
    sf = ScorerConfig.default_listsf(24, ff_dims=(32,), encoder_layers=2, dropout=0.0)
    losses, metrics, tr = _run_trainer(MeshConfig(data=2, model=4), tp=True, sf=sf, steps=3)
    assert all(np.isfinite(losses))
    losses1, metrics1, _ = _run_trainer(MeshConfig(data=1), sf=sf, steps=3)
    np.testing.assert_allclose(losses, losses1, rtol=1e-3)


def test_cp_doc_axis_sharding_matches():
    losses_cp, metrics_cp, _ = _run_trainer(MeshConfig(data=2, seq=4), shard_docs=True)
    losses1, metrics1, _ = _run_trainer(MeshConfig(data=1))
    np.testing.assert_allclose(losses_cp, losses1, rtol=1e-3)
    np.testing.assert_allclose(metrics_cp["nDCG"], metrics1["nDCG"], atol=1e-4)


def test_dp_training_learns():
    losses, metrics, _ = _run_trainer(MeshConfig(data=8), steps=20)
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("impl,mesh_cfg,heads", [
    ("ring", MeshConfig(data=2, seq=4), 2),
    ("ulysses", MeshConfig(data=2, seq=2), 2),
])
def test_cp_integrated_listsf_matches_single_device(impl, mesh_cfg, heads):
    """shard_docs=True routes the listsf MHSA through ring/Ulysses attention
    AND the LambdaRank loss through the blockwise ring pair loss — and the
    integrated step still matches single-device training exactly."""
    sf = ScorerConfig.default_listsf(24, ff_dims=(32,), encoder_layers=2,
                                     n_heads=heads, dropout=0.0)
    qs = make_synthetic_queries(num_queries=32, num_features=24, seed=3,
                                min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    batches = list(ds.batches())

    def run(mesh_cfg, shard_docs):
        mesh = make_mesh(mesh_cfg)
        tr = DistributedTrainer("LambdaRank", sf, mesh, shard_docs=shard_docs,
                                cp_impl=impl,
                                opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
        losses = [tr.train_step(batches[i % len(batches)]) for i in range(4)]
        return losses, tr.evaluate(batches, ks=(1, 5))

    losses_cp, metrics_cp = run(mesh_cfg, True)
    losses1, metrics1 = run(MeshConfig(data=1), False)
    np.testing.assert_allclose(losses_cp, losses1, rtol=2e-3)
    np.testing.assert_allclose(metrics_cp["nDCG"], metrics1["nDCG"], atol=1e-4)


def test_cp_step_never_materialises_full_attention():
    """With shard_docs=True the compiled train step must hold no full
    [B, H, N, N] attention buffer — only N/P blocks (VERDICT r1 #3: absence
    of a full-N gather for the quadratic blocks in the HLO)."""
    sf = ScorerConfig.default_listsf(24, ff_dims=(32,), encoder_layers=1,
                                     n_heads=2, dropout=0.0)
    qs = make_synthetic_queries(num_queries=16, num_features=24, seed=3,
                                min_docs=16, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    batch = next(iter(ds.batches()))

    def hlo_for(shard_docs, mesh_cfg):
        mesh = make_mesh(mesh_cfg)
        tr = DistributedTrainer("LambdaRank", sf, mesh, shard_docs=shard_docs,
                                opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
        f, l, m = tr._put(batch)
        sub = jax.random.PRNGKey(0)
        lowered = tr._step.lower(tr.params, tr.opt_state, sub, f, l, m)
        return lowered.compile().as_text()

    B, H, N = batch.features.shape[0], 2, 16
    full_attn = f"{B},{H},{N},{N}]"  # e.g. f32[16,2,16,16]
    dense_hlo = hlo_for(False, MeshConfig(data=1))
    assert full_attn in dense_hlo, "oracle: dense path should materialise it"
    cp_hlo = hlo_for(True, MeshConfig(data=1, seq=8))
    assert full_attn not in cp_hlo, "CP path still materialises [B,H,N,N]"
    # the [B, N, N] pairwise-loss matrix must be gone too
    full_pairs = f"{B},{N},{N}]"
    assert full_pairs not in cp_hlo, "CP path still materialises [B,N,N] pairs"


def test_expert_parallel_cluster_sharding():
    """EP: cluster-of-K MDN scorer params shard over the model axis; the
    sharded forward matches the single-device one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptranking_tpu.diversification.scorers import (
        DivScorerConfig, div_forward, init_div_scorer)
    from ptranking_tpu.parallel.mesh import MeshConfig, expert_param_sharding, make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4, seq=1))
    K = 4
    cfg = DivScorerConfig(sf_id="pointsf", num_features=10, K=K, cluster=True)
    params = init_div_scorer(jax.random.PRNGKey(0), cfg)
    leading = jax.tree_util.tree_leaves(params)[0].shape[0]
    assert leading == K

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(8, 10), jnp.float32)
    d = jnp.asarray(rng.randn(8, 16, 10), jnp.float32)
    m = jnp.ones((8, 16), bool).at[0, 10:].set(False)

    mus_ref, vars_ref, _ = div_forward(params, cfg, q, d, m)

    shardings = expert_param_sharding(mesh, params)
    sharded = jax.device_put(params, shardings)
    fwd = jax.jit(lambda p: div_forward(p, cfg, q, d, m), in_shardings=(shardings,))
    mus, vars_, _ = fwd(sharded)
    np.testing.assert_allclose(np.asarray(mus), np.asarray(mus_ref), atol=1e-5)
    # the variance head goes through exp/softplus; sharded reduction order
    # shifts the logits by ~1ulp which the exponential amplifies
    np.testing.assert_allclose(np.asarray(vars_), np.asarray(vars_ref),
                               rtol=2e-3, atol=1e-4)


def test_gpipe_matches_sequential_oracle():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.pipeline import gpipe, gpipe_reference

    mesh = make_mesh(MeshConfig(data=2, model=4, seq=1))
    P_, M, B, N, F = 4, 6, 4, 16, 8
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(P_, F, F) * 0.3, jnp.float32)
    xs = jnp.asarray(rng.randn(M, B, N, F), jnp.float32)
    stage_fn = lambda w, x: jnp.tanh(x @ w)
    out = gpipe(stage_fn, W, xs, mesh, axis_name="model")
    ref = gpipe_reference(stage_fn, W, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_encoder_matches_single_device():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptranking_tpu.models.scorers import listsf as _listsf
    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.pipeline import pipeline_encoder_apply

    mesh = make_mesh(MeshConfig(data=2, model=4, seq=1))
    F, B, N = 8, 8, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    mask = jnp.ones((B, N), bool).at[1, 10:].set(False)
    for enc_type in ("DASALC", "AttnDIN"):
        enc = _listsf.encoder_init(jax.random.PRNGKey(0), F, 4, enc_type)
        ref = _listsf.encoder_apply(enc, x, mask, 2, enc_type,
                                    drop_rate=0.0, training=False)
        out = pipeline_encoder_apply(enc, x, mask, 2, enc_type, mesh,
                                     num_microbatches=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=enc_type)


def _attention_fixtures():
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    B, H, N, d = 2, 4, 32, 8
    q = jnp.asarray(rng.randn(B, H, N, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, d), jnp.float32)
    mask = jnp.ones((B, N), bool).at[0, 20:].set(False)
    return q, k, v, mask


def test_ring_attention_matches_single_device():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.ring import reference_attention, ring_attention

    mesh = make_mesh(MeshConfig(data=1, model=2, seq=4))
    q, k, v, mask = _attention_fixtures()
    ref = reference_attention(q, k, v, mask)
    out = ring_attention(q, k, v, mask, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # gradients flow through the ppermute ring
    g1 = jax.grad(lambda x: jnp.sum(ring_attention(x, k, v, mask, mesh) ** 2))(q)
    g2 = jax.grad(lambda x: jnp.sum(reference_attention(x, k, v, mask) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_ulysses_attention_matches_single_device():
    import numpy as np

    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.ring import reference_attention, ulysses_attention

    mesh = make_mesh(MeshConfig(data=1, model=2, seq=4))
    q, k, v, mask = _attention_fixtures()
    ref = reference_attention(q, k, v, mask)
    out = ulysses_attention(q, k, v, mask, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ring_lambda_loss_matches_dense():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.ring import ring_lambda_loss

    mesh = make_mesh(MeshConfig(data=1, model=2, seq=4))
    B, N = 3, 32
    rng = np.random.RandomState(0)
    scores = jnp.asarray(-np.sort(-rng.randn(B, N), axis=1), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, (B, N)), jnp.float32)
    mask = jnp.ones((B, N), bool).at[1, 25:].set(False)
    labels = jnp.where(mask, labels, 0.0)
    gains = jnp.power(2.0, labels) - 1.0
    disc = 1.0 / jnp.log2(jnp.arange(N) + 2.0)
    idcg = jnp.sum(jnp.where(mask, jnp.sort(gains, axis=1)[:, ::-1] * disc, 0.0),
                   axis=1, keepdims=True)
    n_gains = jnp.where(mask, gains / jnp.maximum(idcg, 1e-8), 0.0)

    diffs = scores[:, :, None] - scores[:, None, :]
    targets = 0.5 * (1.0 + jnp.clip(labels[:, :, None] - labels[:, None, :], -1, 1))
    bce = jnp.logaddexp(0.0, diffs) - targets * diffs
    w = (jnp.abs(n_gains[:, :, None] - n_gains[:, None, :])
         * jnp.abs(disc[:, None] - disc[None, :]))
    valid = (mask[:, :, None] & mask[:, None, :]
             & jnp.triu(jnp.ones((N, N), bool), 1)[None])
    dense = jnp.sum(jnp.where(valid, w * bce, 0.0))

    ring = ring_lambda_loss(scores, labels, n_gains, mask, mesh)
    np.testing.assert_allclose(float(ring), float(dense), rtol=1e-5)

    gd = jax.grad(lambda s: jnp.sum(jnp.where(
        valid, w * (jnp.logaddexp(0.0, s[:, :, None] - s[:, None, :])
                    - targets * (s[:, :, None] - s[:, None, :])), 0.0)))(scores)
    gr = jax.grad(lambda s: ring_lambda_loss(s, labels, n_gains, mask, mesh))(scores)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), atol=1e-5)


def test_make_hybrid_mesh_single_process():
    from ptranking_tpu.parallel import MeshConfig, make_hybrid_mesh

    m = make_hybrid_mesh(MeshConfig(data=4, model=2, seq=1))
    assert dict(m.shape) == {"dcn": 1, "data": 4, "model": 2, "seq": 1}
    m2 = make_hybrid_mesh(MeshConfig(data=2, seq=2), dcn=2)
    assert dict(m2.shape) == {"dcn": 2, "data": 2, "model": 1, "seq": 2}


@pytest.mark.parametrize("model,paras", [
    ("LambdaRank", {"sigma": 1.0}),
    ("WassRank", {"mode": "SinkhornOT", "sh_itr": 10}),
])
def test_hybrid_mesh_training_matches_single_device(model, paras):
    """DistributedTrainer over an EMULATED two-host hybrid mesh
    (dcn=2 x data=2 x seq=2): DP spans the dcn axis, CP the seq axis, and
    every CP loss's batch reductions must psum over BOTH batch axes —
    training matches the dense single-device path exactly."""
    from ptranking_tpu.parallel import make_hybrid_mesh

    sf = ScorerConfig(sf_id="pointsf", num_features=24, num_layers=2, h_dim=32,
                      dropout=0.0, apply_tl_af=False, BN=False)
    qs = make_synthetic_queries(num_queries=32, num_features=24, seed=3,
                                min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    batches = list(ds.batches())

    def run(mesh, shard_docs):
        tr = DistributedTrainer(model, sf, mesh, model_paras=paras,
                                shard_docs=shard_docs,
                                opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
        return [tr.train_step(batches[i % len(batches)]) for i in range(4)]

    hybrid = make_hybrid_mesh(MeshConfig(data=2, seq=2), dcn=2)
    losses_h = run(hybrid, True)
    losses_1 = run(make_mesh(MeshConfig(data=1)), False)
    np.testing.assert_allclose(losses_h, losses_1, rtol=2e-3)


def test_pipeline_encoder_allrank():
    """AllRank wiring through the pipeline: per-layer stages must not apply
    the final LN; it is applied once after the pipeline (review regression)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptranking_tpu.models.scorers import listsf as _listsf
    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.pipeline import pipeline_encoder_apply

    mesh = make_mesh(MeshConfig(data=2, model=4, seq=1))
    F, B, N = 8, 8, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, F), jnp.float32)
    mask = jnp.ones((B, N), bool).at[1, 10:].set(False)
    enc = _listsf.encoder_init(jax.random.PRNGKey(0), F, 4, "AllRank")
    ref = _listsf.encoder_apply(enc, x, mask, 2, "AllRank", drop_rate=0.0,
                                training=False)
    out = pipeline_encoder_apply(enc, x, mask, 2, "AllRank", mesh,
                                 num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_prefetch_abandonment_does_not_leak_threads():
    import threading
    import time

    from ptranking_tpu.data import prefetch_to_device
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries

    qs = make_synthetic_queries(num_queries=40, num_features=8, seed=0)
    ds = BucketedDataset(qs, batch_docs=128)
    before = threading.active_count()
    for _ in range(5):
        gen = prefetch_to_device(ds.batches())
        next(gen)
        gen.close()
    time.sleep(1.0)
    assert threading.active_count() <= before + 1


def test_gbdt_config_from_lightgbm_paras():
    from ptranking_tpu.tree.jax_gbdt import GBDTConfig

    cfg = GBDTConfig.from_paras({"num_leaves": 400, "verbosity": -1,
                                 "learning_rate": 0.1},
                                early_stopping_rounds=50)
    assert cfg.max_depth == 9  # ceil(log2(400))
    assert cfg.learning_rate == 0.1
    assert cfg.early_stopping_rounds == 50


def test_distributed_train_epoch_scan_fusion():
    """DistributedTrainer.train_epoch fuses K same-shape batches per dispatch
    under the mesh shardings; the fused epoch trains and learns."""
    qs = make_synthetic_queries(num_queries=64, num_features=24, seed=3,
                                min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=64, buckets=(16,))
    mesh = make_mesh(MeshConfig(data=4, model=1, seq=2))
    tr = DistributedTrainer("LambdaRank", _pointsf_cfg(), mesh, shard_docs=True,
                            scan_steps=4,
                            opt_cfg=OptimizerConfig(opt="Adam", lr=1e-2)).init()
    losses = []
    for e in range(1, 7):
        loss, stop = tr.train_epoch(ds.batches(shuffle=True, epoch=e), e)
        assert not stop and np.isfinite(loss)
        losses.append(loss)
    assert losses[-1] < losses[0]
    m = tr.evaluate(ds.batches(), ks=(1, 5))
    assert np.isfinite(m["nDCG"]).all()


# --------------------------------------------------- device-resident path


def _resident_setup(mesh_cfg, model="LambdaRank", shard_docs=False, **kw):
    from ptranking_tpu.data.device_cache import DeviceResidentDataset

    qs = make_synthetic_queries(num_queries=72, num_features=24, seed=3,
                                min_docs=8, max_docs=16)
    # B=16 per batch (divisible by every data-axis size used below); 72
    # queries -> 4 full batches + a sentinel-padded remainder batch.
    # BN=False: behind batch norm the linear bias is redundant — its ~0
    # gradient is reduction-order noise that Adam amplifies to lr-scale,
    # which would break exact-match assertions without testing anything
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    res = DeviceResidentDataset(ds)
    mesh = make_mesh(mesh_cfg)
    cfg = ScorerConfig(sf_id="pointsf", num_features=24, num_layers=2,
                       h_dim=32, dropout=0.0, apply_tl_af=False, BN=False)
    tr = DistributedTrainer(model, cfg, mesh, shard_docs=shard_docs,
                            scan_steps=2,
                            opt_cfg=OptimizerConfig(opt="Adam", lr=1e-2),
                            **kw).init()
    return ds, res, tr


def test_distributed_resident_epoch_matches_streamed():
    """train_epoch_resident (gather-fused, mesh-sharded) reproduces the
    streamed train_epoch exactly: same schedule, same PRNG stream, same math."""
    ds, res, tr_res = _resident_setup(MeshConfig(data=8))
    _, _, tr_str = _resident_setup(MeshConfig(data=8))
    for e in range(1, 4):
        loss_r, stop_r = tr_res.train_epoch_resident(res, e)
        loss_s, stop_s = tr_str.train_epoch(ds.batches(shuffle=True, epoch=e), e)
        assert not stop_r and not stop_s
        np.testing.assert_allclose(loss_r, loss_s, rtol=1e-5)
    # params match up to degenerate directions: ranking losses are score-
    # shift-invariant, so the FINAL bias has ~0 gradient — reduction-order
    # noise there is amplified to lr-scale by Adam's normalization. The
    # per-epoch loss equality above (rtol 1e-5, losses computed from the
    # full param set) is the semantic-equivalence assertion.
    for a, b in zip(jax.tree_util.tree_leaves(tr_res.params),
                    jax.tree_util.tree_leaves(tr_str.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    m_r = tr_res.evaluate(res, ks=(1, 5))
    m_s = tr_str.evaluate(ds.batches(), ks=(1, 5))
    np.testing.assert_allclose(m_r["nDCG"], m_s["nDCG"], atol=1e-6)


def test_distributed_resident_epoch_under_cp():
    """The resident path under doc-axis CP (seq-sharded resident arrays)
    matches single-device resident training."""
    ds, res, tr_cp = _resident_setup(MeshConfig(data=2, seq=4), shard_docs=True)
    _, res1, tr1 = _resident_setup(MeshConfig(data=1))
    for e in range(1, 3):
        loss_cp, _ = tr_cp.train_epoch_resident(res, e)
        loss_1, _ = tr1.train_epoch_resident(res1, e)
        np.testing.assert_allclose(loss_cp, loss_1, rtol=2e-3)
    m_cp = tr_cp.evaluate(res, ks=(1, 5))
    m_1 = tr1.evaluate(res1, ks=(1, 5))
    np.testing.assert_allclose(m_cp["nDCG"], m_1["nDCG"], atol=1e-4)


def test_distributed_resident_one_dispatch_per_chunk_index_only():
    """The resident epoch issues exactly one _gather_scan call per K-batch
    chunk, and the array arguments are the SAME resident buffers every call
    (host->device traffic is the [K, B] index rows only)."""
    ds, res, tr = _resident_setup(MeshConfig(data=8))
    chunks = list(res.epoch_index_chunks(True, 1, tr.scan_steps))
    calls = []
    orig = tr._gather_scan

    def spy(params, opt_state, key, f, l, m, idx):
        calls.append((id(f), id(l), id(m), np.asarray(idx).shape))
        return orig(params, opt_state, key, f, l, m, idx)

    tr._gather_scan = spy
    tr.train_epoch_resident(res, 1)
    tr._gather_scan = orig
    assert len(calls) == len(chunks)
    arrs = tr._mesh_resident(res)
    expected_ids = {b: tuple(id(a) for a in arrs[b]) for b in arrs}
    for (bucket, idx_k, _), (fid, lid, mid, idx_shape) in zip(chunks, calls):
        assert (fid, lid, mid) == expected_ids[bucket]
        assert idx_shape == idx_k.shape


def test_distributed_resume_roundtrip():
    """checkpoint()/restore() resumes mid-training bit-compatibly."""
    ds, res, tr = _resident_setup(MeshConfig(data=4))
    tr.train_epoch_resident(res, 1)
    ck = tr.checkpoint()
    loss_next, _ = tr.train_epoch_resident(res, 2)

    _, res2, tr2 = _resident_setup(MeshConfig(data=4))
    tr2.restore(ck)
    loss_resumed, _ = tr2.train_epoch_resident(res2, 2)
    np.testing.assert_allclose(loss_resumed, loss_next, rtol=1e-6)


def test_distributed_resident_stop_guard_fires():
    """A poisoned (NaN) parameter set trips the per-check-epoch guard."""
    ds, res, tr = _resident_setup(MeshConfig(data=4))
    tr.params = jax.tree_util.tree_map(lambda p: p * jnp.nan, tr.params)
    loss, stop = tr.train_epoch_resident(res, epoch_k=tr.stop_check_freq)
    assert stop


# ----------------------------------------------------------------- PP knob


def test_pp_stages_predict_matches_dense():
    """DistributedTrainer(pp_stages=k) routes the listsf encoder through the
    GPipe pipeline at inference; scores match the dense path."""
    from ptranking_tpu.data.device_cache import DeviceResidentDataset

    sf = ScorerConfig.default_listsf(24, ff_dims=(32,), encoder_layers=2,
                                     dropout=0.0)
    qs = make_synthetic_queries(num_queries=32, num_features=24, seed=3,
                                min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    batches = list(ds.batches())
    mesh_pp = make_mesh(MeshConfig(data=2, model=2, seq=1))
    tr_pp = DistributedTrainer("LambdaRank", sf, mesh_pp, pp_stages=2,
                               opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
    tr_1 = DistributedTrainer("LambdaRank", sf, make_mesh(MeshConfig(data=1)),
                              opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
    b = batches[0]
    s_pp = np.asarray(tr_pp._predict(tr_pp.params, np.asarray(b.features),
                                     np.asarray(b.mask)))
    s_1 = np.asarray(tr_1._predict(tr_1.params, np.asarray(b.features),
                                   np.asarray(b.mask)))
    mask = np.asarray(b.mask)
    np.testing.assert_allclose(s_pp[mask], s_1[mask], atol=1e-4)
    # the staged path also serves evaluate()
    m_pp = tr_pp.evaluate(batches, ks=(1, 5))
    m_1 = tr_1.evaluate(batches, ks=(1, 5))
    np.testing.assert_allclose(m_pp["nDCG"], m_1["nDCG"], atol=1e-4)


def test_pp_stages_guards():
    sf = ScorerConfig.default_listsf(24, ff_dims=(32,), encoder_layers=2)
    mesh = make_mesh(MeshConfig(data=2, model=2, seq=1))
    with pytest.raises(AssertionError):
        DistributedTrainer("LambdaRank", sf, mesh, pp_stages=2, tp=True)
    with pytest.raises(AssertionError):
        DistributedTrainer("LambdaRank", sf, mesh, pp_stages=4)  # != model axis
    with pytest.raises(AssertionError):
        DistributedTrainer("LambdaRank", _pointsf_cfg(), mesh, pp_stages=2)


# ------------------------------------------- CP loss zoo (LambdaLoss, ApproxNDCG)


@pytest.mark.parametrize("model,paras", [
    ("LambdaLoss", {"loss_type": "NDCG_Loss2", "k": 8, "sigma": 1.0}),
    ("LambdaLoss", {"loss_type": "NDCG_Loss2++", "k": 8, "sigma": 1.0, "mu": 5.0}),
    ("LambdaLoss", {"loss_type": "NDCG_Loss1", "k": 8, "sigma": 1.0}),
    ("ApproxNDCG", {"alpha": 10.0}),
    ("SoftRank", {"delta": 2.0, "top_k": None}),
    ("SoftRank", {"delta": 2.0, "top_k": 5}),
    ("WassRank", {"mode": "SinkhornOT", "sh_itr": 10, "lam": 0.1}),
    ("WassRank", {"mode": "EntropicOT", "sh_itr": 10, "lam": 0.1}),
    ("NeuralNDCG", {"temperature": 1.0, "sinkhorn_iters": 5}),
])
def test_cp_loss_zoo_matches_single_device(model, paras):
    """shard_docs=True routes LambdaLoss/ApproxNDCG/SoftRank through the
    blockwise ring losses; training matches the dense single-device path."""
    sf = ScorerConfig(sf_id="pointsf", num_features=24, num_layers=2, h_dim=32,
                      dropout=0.0, apply_tl_af=False, BN=False)
    qs = make_synthetic_queries(num_queries=32, num_features=24, seed=3,
                                min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    batches = list(ds.batches())

    def run(mesh_cfg, shard_docs):
        mesh = make_mesh(mesh_cfg)
        tr = DistributedTrainer(model, sf, mesh, model_paras=paras,
                                shard_docs=shard_docs,
                                opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
        return [tr.train_step(batches[i % len(batches)]) for i in range(4)]

    losses_cp = run(MeshConfig(data=2, seq=4), True)
    losses_1 = run(MeshConfig(data=1), False)
    np.testing.assert_allclose(losses_cp, losses_1, rtol=2e-3)


@pytest.mark.parametrize("model,paras", [
    ("LambdaLoss", {"loss_type": "NDCG_Loss2", "k": 8}),
    ("ApproxNDCG", {"alpha": 10.0}),
    ("SoftRank", {"delta": 2.0}),
    ("WassRank", {"mode": "SinkhornOT", "sh_itr": 5}),
    ("WassRank", {"mode": "EntropicOT", "sh_itr": 5}),
    ("NeuralNDCG", {"sinkhorn_iters": 3}),
])
def test_cp_loss_zoo_never_materialises_pair_matrix(model, paras):
    """The compiled CP step for the newly ring-routed losses holds no full
    [B, N, N] pair buffer (VERDICT r2 #4)."""
    sf = ScorerConfig.default_listsf(24, ff_dims=(32,), encoder_layers=1,
                                     n_heads=2, dropout=0.0)
    qs = make_synthetic_queries(num_queries=16, num_features=24, seed=3,
                                min_docs=16, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=16 * 16, buckets=(16,))
    batch = next(iter(ds.batches()))
    mesh = make_mesh(MeshConfig(data=1, seq=8))
    tr = DistributedTrainer(model, sf, mesh, model_paras=paras, shard_docs=True,
                            opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3)).init()
    f, l, m = tr._put(batch)
    hlo = tr._step.lower(tr.params, tr.opt_state, jax.random.PRNGKey(0),
                         f, l, m).compile().as_text()
    B, H, N = batch.features.shape[0], 2, 16
    assert f"{B},{H},{N},{N}]" not in hlo, "CP still materialises [B,H,N,N]"
    assert f"{B},{N},{N}]" not in hlo, "CP still materialises [B,N,N] pairs"


def test_cp_no_fallback_warnings():
    """Every O(N^2) loss in the zoo (including both WassRank OT modes)
    constructs under shard_docs without any auto-gather fallback warning."""
    import warnings

    sf = ScorerConfig(sf_id="pointsf", num_features=24, num_layers=2, h_dim=32)
    mesh = make_mesh(MeshConfig(data=1, seq=8))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for model, paras in [("WassRank", {"mode": "SinkhornOT"}),
                             ("WassRank", {"mode": "EntropicOT"}),
                             ("SoftRank", None), ("LambdaLoss", None)]:
            DistributedTrainer(model, sf, mesh, shard_docs=True,
                               model_paras=paras)


def test_ring_neural_ndcg_matches_dense():
    """Rank-row-sharded NeuralNDCG == dense loss: values and
    score-gradients, incl. top_k, raw NeuralSort (0 scaling iters), a
    non-unit temperature, and an all-padded remainder row."""
    from ptranking_tpu.losses.listwise import neural_ndcg
    from ptranking_tpu.parallel.ring import ring_neural_ndcg

    mesh = make_mesh(MeshConfig(data=2, seq=4))
    B, N = 4, 16
    scores = jax.random.normal(jax.random.PRNGKey(0), (B, N))
    labels = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(1), (B, N), 0, 3).astype(jnp.float32), 1)[:, ::-1]
    mask = jnp.arange(N)[None, :] < jnp.asarray([16, 13, 0, 9])[:, None]
    labels = jnp.where(mask, labels, 0.0)

    for kw in [dict(temperature=1.0, top_k=None, sinkhorn_iters=5),
               dict(temperature=1.0, top_k=5, sinkhorn_iters=5),
               dict(temperature=0.5, top_k=None, sinkhorn_iters=0)]:
        dense = neural_ndcg(scores, labels, mask, **kw)
        cp = ring_neural_ndcg(scores, labels, mask, mesh,
                              batch_axis="data", **kw)
        np.testing.assert_allclose(float(cp), float(dense), rtol=1e-5)
        g_dense = jax.grad(
            lambda s: neural_ndcg(s, labels, mask, **kw))(scores)
        g_cp = jax.grad(lambda s: ring_neural_ndcg(
            s, labels, mask, mesh, batch_axis="data", **kw))(scores)
        np.testing.assert_allclose(np.asarray(g_cp), np.asarray(g_dense),
                                   rtol=1e-4, atol=1e-6)


def test_cp_wass_rank_matches_dense():
    """Doc-sharded Sinkhorn == dense wass_rank: values and score-gradients,
    across cost types, both histogram smoothings and both OT modes, with
    ragged masks including an all-padded remainder row (bucketed batches
    produce those; it must stay out of the mean and carry finite grads)."""
    from ptranking_tpu.losses.wassrank import wass_rank
    from ptranking_tpu.parallel.ot import cp_wass_rank

    mesh = make_mesh(MeshConfig(data=2, seq=4))
    B, N = 4, 16
    scores = jax.random.normal(jax.random.PRNGKey(0), (B, N))
    labels = jax.random.randint(
        jax.random.PRNGKey(1), (B, N), 0, 3).astype(jnp.float32)
    mask = jnp.arange(N)[None, :] < jnp.asarray([16, 13, 0, 9])[:, None]
    labels = jnp.where(mask, labels, 0.0)

    for mode, cost_type, smooth_type in [
            ("SinkhornOT", "eg", "ST"), ("SinkhornOT", "eg", "NG"),
            ("SinkhornOT", "p1", "ST"), ("SinkhornOT", "ddg", "ST"),
            ("EntropicOT", "eg", "ST"), ("EntropicOT", "eg", "NG"),
            ("EntropicOT", "dg", "ST")]:
        kw = dict(mode=mode, sh_itr=20, lam=0.1, smooth_type=smooth_type,
                  cost_type=cost_type)
        dense = wass_rank(scores, labels, mask, **kw)
        cp = cp_wass_rank(scores, labels, mask, mesh, batch_axis="data", **kw)
        np.testing.assert_allclose(float(cp), float(dense), rtol=1e-5)
        g_dense = jax.grad(lambda s: wass_rank(s, labels, mask, **kw))(scores)
        g_cp = jax.grad(lambda s: cp_wass_rank(
            s, labels, mask, mesh, batch_axis="data", **kw))(scores)
        np.testing.assert_allclose(np.asarray(g_cp), np.asarray(g_dense),
                                   rtol=1e-4, atol=1e-6)


def test_distributed_resident_accepts_int8_dataset():
    """An int8-quantized DeviceResidentDataset passed to DistributedTrainer
    dequantizes on upload (the mesh jits declare dense in_shardings) and
    trains/evaluates normally."""
    from ptranking_tpu.data.device_cache import DeviceResidentDataset

    ds, _, tr = _resident_setup(MeshConfig(data=8))
    res8 = DeviceResidentDataset(ds, dtype="int8")
    loss, stop = tr.train_epoch_resident(res8, 1)
    assert not stop and np.isfinite(loss)
    nd = tr._evaluate_resident(res8, ks=(5,))
    assert np.isfinite(nd["nDCG"][0])


def test_ring_lambdaloss_matches_dense_at_saturation():
    """The ring eps must equal the dense EPSILON (1e-8): at saturated score
    gaps (sigmoid < 1e-8 and w*log2(p) below the clamp floor) a smaller ring
    eps keeps clamped pair terms live and diverges loss AND gradients from
    the dense path (review finding, round 3)."""
    from ptranking_tpu.losses.listwise import lambda_loss
    from ptranking_tpu.ops import gain as label_gain
    from ptranking_tpu.ops.sorting import sort_labels_by_scores
    from ptranking_tpu.parallel.ring import ring_lambdaloss
    from ptranking_tpu.types import LabelType

    mesh = make_mesh(MeshConfig(seq=8))
    B, N = 2, 16
    key = jax.random.PRNGKey(3)
    # gaps of ~30 saturate sigmoid (sigmoid(-30) ~ 9e-14 << 1e-8)
    scores = jax.random.normal(key, (B, N)) * 30.0
    # ideal-ordered labels (the trainer presorts; _full_dcg assumes it)
    labels = jnp.sort(
        jax.random.randint(key, (B, N), 0, 4).astype(jnp.float32), 1)[:, ::-1]
    mask = jnp.ones((B, N), bool)

    def rowwise_idcg(labels, mask):  # mirrors parallel/train.py:180
        gains = label_gain(jnp.where(mask, labels, 0.0), LabelType.MultiLabel)
        discounts = 1.0 / jnp.log2(jnp.arange(N, dtype=labels.dtype) + 2.0)
        return jnp.maximum(
            jnp.sum(gains * discounts * mask, axis=-1, keepdims=True), 1e-12)

    def ring(s):
        s_sorted, l_sorted, m_sorted = sort_labels_by_scores(s, labels, mask)
        idcg = rowwise_idcg(labels, mask)
        gains = label_gain(jnp.where(m_sorted, l_sorted, 0.0), LabelType.MultiLabel)
        n_gains = jnp.where(m_sorted, gains / idcg, 0.0)
        return ring_lambdaloss(s_sorted, l_sorted, n_gains, m_sorted, mesh,
                               loss_type="NDCG_Loss2", k=10, sigma=1.0)

    def dense(s):
        return lambda_loss(s, labels, mask, loss_type="NDCG_Loss2", k=10,
                           sigma=1.0)

    v_r, g_r = jax.value_and_grad(lambda s: jnp.sum(ring(s)))(scores)
    v_d, g_d = jax.value_and_grad(lambda s: jnp.sum(dense(s)))(scores)
    np.testing.assert_allclose(float(v_r), float(v_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_d),
                               rtol=1e-4, atol=1e-7)


def test_pipeline_microbatches_clamp_to_batch():
    """pp_stages predict works at batch sizes not divisible by the default
    4 microbatches (B=6, 3, 1 arise at ~100-doc eval buckets)."""
    from ptranking_tpu.parallel.pipeline import pipeline_encoder_apply
    from ptranking_tpu.models.scorers import listsf as _listsf

    mesh = make_mesh(MeshConfig(model=2))
    key = jax.random.PRNGKey(0)
    params = _listsf.encoder_init(key, 8, 2, "DASALC")
    for B in (6, 3, 1):
        x = jax.random.normal(key, (B, 5, 8))
        mask = jnp.ones((B, 5), bool).at[0, 3:].set(False)
        out = pipeline_encoder_apply(params, x, mask, 2, "DASALC", mesh)
        ref = _listsf.encoder_apply(params, x, mask, 2, "DASALC",
                                    drop_rate=0.0, training=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
