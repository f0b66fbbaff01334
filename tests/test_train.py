"""Training-layer tests: optimizer parity with torch, ranker end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptranking_tpu.data import BucketedDataset, make_synthetic_queries
from ptranking_tpu.models import ScorerConfig
from ptranking_tpu.train import AdhocRanker, OptimizerConfig, epoch_lr


def test_epoch_lr_steplr():
    cfg = OptimizerConfig(lr=1e-2, lr_step_size=20, lr_gamma=0.5)
    assert epoch_lr(cfg, 1) == 1e-2
    assert epoch_lr(cfg, 20) == 1e-2
    assert epoch_lr(cfg, 21) == 5e-3
    assert epoch_lr(cfg, 41) == 2.5e-3


@pytest.mark.parametrize("opt", ["Adam", "RMS", "Adagrad"])
def test_optimizer_matches_torch(opt):
    """Our optax chain must track torch.optim exactly (incl. coupled L2)."""
    torch = pytest.importorskip("torch")
    from ptranking_tpu.train.optimizer import make_optimizer

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    xs = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]

    # torch side
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = {"Adam": torch.optim.Adam, "RMS": torch.optim.RMSprop,
            "Adagrad": torch.optim.Adagrad}[opt]([tw], lr=1e-2, weight_decay=1e-3)
    for x in xs:
        topt.zero_grad()
        loss = ((tw - torch.from_numpy(x)) ** 2).sum()
        loss.backward()
        topt.step()

    # jax side
    cfg = OptimizerConfig(opt=opt, lr=1e-2, weight_decay=1e-3)
    optimizer = make_optimizer(cfg)
    params = jnp.asarray(w0)
    state = optimizer.init(params)
    for x in xs:
        grads = jax.grad(lambda p: jnp.sum((p - jnp.asarray(x)) ** 2))(params)
        updates, state = optimizer.update(grads, state, params)
        params = params + updates

    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), rtol=2e-4, atol=2e-6)


def make_ranker(model_id="RankMSE", **kw):
    cfg = ScorerConfig(sf_id="pointsf", num_features=46, num_layers=2, h_dim=32,
                       dropout=0.0, apply_tl_af=False)
    return AdhocRanker(model_id, cfg, **kw).init()


def test_ranker_trains_and_improves():
    qs = make_synthetic_queries(num_queries=60, seed=7)
    ds = BucketedDataset(qs, batch_docs=512)
    ranker = make_ranker("LambdaRank", opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3))
    before = ranker.validation(ds.batches(), k=5)
    for epoch in range(1, 11):
        loss, stop = ranker.train_epoch(ds.batches(shuffle=True, epoch=epoch), epoch_k=epoch)
        assert not stop
    after = ranker.validation(ds.batches(), k=5)
    assert after > before + 0.02, (before, after)


def test_ranker_checkpoint_roundtrip(tmp_path):
    qs = make_synthetic_queries(num_queries=20, seed=8)
    ds = BucketedDataset(qs, batch_docs=256)
    ranker = make_ranker("RankNet")
    ranker.train_epoch(ds.batches(), epoch_k=1)
    path = str(tmp_path / "ckpt.pkl")
    ranker.save(path)
    v1 = ranker.validation(ds.batches())

    ranker2 = make_ranker("RankNet")
    ranker2.load(path)
    v2 = ranker2.validation(ds.batches())
    assert v1 == pytest.approx(v2, abs=1e-6)
    # resumed training must continue from identical optimizer state
    b1 = next(iter(ds.batches()))
    ranker.train_epoch([b1], epoch_k=2)
    ranker2.train_epoch([b1], epoch_k=2)
    leaves1 = jax.tree_util.tree_leaves(ranker.params)
    leaves2 = jax.tree_util.tree_leaves(ranker2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_evaluate_matches_per_query_mean():
    qs = make_synthetic_queries(num_queries=17, seed=9)
    ds = BucketedDataset(qs, batch_docs=128)
    ranker = make_ranker("RankMSE")
    out = ranker.evaluate(ds.batches(), ks=(1, 5))
    assert out["nDCG"].shape == (2,)
    assert 0.0 <= out["nDCG"][0] <= 1.0


def test_stop_guard_triggers_on_nan():
    ranker = make_ranker("RankMSE")
    ranker.params = jax.tree_util.tree_map(lambda p: p * jnp.nan, ranker.params)
    qs = make_synthetic_queries(num_queries=4, seed=10)
    ds = BucketedDataset(qs, batch_docs=128)
    loss, stop = ranker.train_epoch(ds.batches(), epoch_k=10)  # checks at k%10==0
    assert stop


def test_full_zoo_trains_two_epochs():
    """Every registered adhoc model trains two epochs on tiny synthetic data
    with finite losses — the smoke net the reference ran by hand via its
    testing/ scripts."""
    import jax.numpy as jnp

    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.losses import LOSSES, REQUIRES_LISTSF
    from ptranking_tpu.models import ScorerConfig

    F = 8
    qs = make_synthetic_queries(num_queries=8, num_features=F, min_docs=6,
                                max_docs=12, seed=0)
    ds = BucketedDataset(qs, batch_docs=128)
    for model_id in sorted(LOSSES):
        cfg = (ScorerConfig.default_listsf(num_features=F, encoder_layers=1)
               if model_id in REQUIRES_LISTSF
               else ScorerConfig.default_pointsf(num_features=F, num_layers=2))
        r = AdhocRanker(model_id, cfg).init()
        for e in (1, 2):
            loss, stop = r.train_epoch(ds.batches(shuffle=True, epoch=e), e)
            assert np.isfinite(loss), (model_id, e, loss)
            assert not stop, model_id
        scores = r.predict(next(iter(ds.batches())))
        assert bool(jnp.all(jnp.isfinite(scores))), model_id


def test_scan_steps_trains_equivalently():
    """scan_steps>1 fuses K batches per dispatch; training remains finite and
    learns, and scan_steps=1 preserves the original per-step behavior."""
    from ptranking_tpu.data import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    qs = make_synthetic_queries(num_queries=48, num_features=12, seed=5,
                                min_docs=8, max_docs=16)
    ds = BucketedDataset(qs, batch_docs=64, num_features=12)

    def run(scan_steps):
        cfg = ScorerConfig(sf_id="pointsf", num_features=12, num_layers=2,
                           h_dim=16, dropout=0.0, apply_tl_af=False)
        r = AdhocRanker("RankNet", cfg, opt_cfg=OptimizerConfig(opt="Adam", lr=1e-2),
                        scan_steps=scan_steps).init()
        for e in range(1, 6):
            loss, stop = r.train_epoch(ds.batches(shuffle=True, epoch=e), e)
            assert not stop and np.isfinite(loss)
        return r.validation(ds.batches(), k=5)

    v1, v4 = run(1), run(4)
    assert np.isfinite(v1) and np.isfinite(v4)
    # same data, same seed, different PRNG chunking: both must learn the task
    assert v1 > 0.5 and v4 > 0.5, (v1, v4)


def test_full_zoo_trains_through_scan_and_resident_paths():
    """Every registered loss (incl. the stochastic ones and WassRank's
    custom-vjp Sinkhorn) must train through BOTH the fused scan step and the
    gather-fused resident step — scan bodies trace the same pure step, but
    custom_vjp/PRNG handling under lax.scan deserves its own coverage."""
    from ptranking_tpu.data import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.data.device_cache import DeviceResidentDataset
    from ptranking_tpu.losses import LOSSES
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    qs = make_synthetic_queries(num_queries=16, num_features=10, seed=11,
                                min_docs=8, max_docs=8)
    ds = BucketedDataset(qs, batch_docs=32, buckets=(8,))  # 4 same-shape batches
    res = DeviceResidentDataset(ds)
    for model_id in sorted(LOSSES):
        cfg = ScorerConfig(sf_id="pointsf", num_features=10, num_layers=2,
                           h_dim=8, dropout=0.0, apply_tl_af=False)
        r = AdhocRanker(model_id, cfg, opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3),
                        scan_steps=2).init()
        loss_s, stop_s = r.train_epoch(ds.batches(shuffle=True, epoch=1), 1)
        loss_r, stop_r = r.train_epoch_resident(res, 2)
        assert not stop_s and not stop_r, model_id
        assert np.isfinite(loss_s) and np.isfinite(loss_r), model_id
