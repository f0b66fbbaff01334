"""Scorer tests: shapes, padding invariance, variant wiring.

Padding invariance is THE invariant the reference never needed (it bins
queries by equal length, reference data_utils.py:683-742): real-document
scores must not change when padded slots are added or their contents mutate.
"""

import jax
import jax.numpy as jnp
import pytest

from ptranking_tpu.models import ScorerConfig, init_scorer, apply_scorer


def make_batch(key, B=3, N=8, F=12):
    kx, km = jax.random.split(key)
    x = jax.random.normal(kx, (B, N, F))
    n_real = jnp.array([N, N - 3, N - 5])
    mask = jnp.arange(N)[None, :] < n_real[:, None]
    return x, mask


@pytest.mark.parametrize("bn_type", ["BN", "BN2"])
def test_pointsf_shapes_and_pad_invariance(bn_type):
    key = jax.random.PRNGKey(0)
    cfg = ScorerConfig(sf_id="pointsf", num_features=12, num_layers=3, h_dim=16, bn_type=bn_type)
    x, mask = make_batch(key)
    params = init_scorer(key, cfg)
    scores = apply_scorer(params, cfg, x, mask)
    assert scores.shape == (3, 8)

    # mutate padded features wildly: real scores must be bit-identical
    x2 = jnp.where(mask[..., None], x, 1e4)
    scores2 = apply_scorer(params, cfg, x2, mask)
    assert jnp.allclose(jnp.where(mask, scores, 0), jnp.where(mask, scores2, 0), atol=1e-5)


@pytest.mark.parametrize("encoder_type", ["DASALC", "AllRank", "AttnDIN"])
def test_listsf_shapes_and_pad_invariance(encoder_type):
    key = jax.random.PRNGKey(1)
    cfg = ScorerConfig.default_listsf(
        num_features=12, ff_dims=(16, 16), encoder_layers=2, encoder_type=encoder_type
    )
    x, mask = make_batch(key)
    params = init_scorer(key, cfg)
    scores = apply_scorer(params, cfg, x, mask)
    assert scores.shape == (3, 8)
    assert bool(jnp.all(jnp.isfinite(jnp.where(mask, scores, 0.0))))

    x2 = jnp.where(mask[..., None], x, -777.0)
    scores2 = apply_scorer(params, cfg, x2, mask)
    assert jnp.allclose(jnp.where(mask, scores, 0), jnp.where(mask, scores2, 0), atol=1e-4)


def test_listsf_with_bn_pad_invariance():
    # listsf grid also enables BN (parameter.py:248 choice_BN=[True] w/ BN2)
    key = jax.random.PRNGKey(2)
    cfg = ScorerConfig.default_listsf(
        num_features=12, ff_dims=(16,), encoder_layers=1, BN=True, bn_type="BN2"
    )
    x, mask = make_batch(key)
    params = init_scorer(key, cfg)
    s1 = apply_scorer(params, cfg, x, mask)
    s2 = apply_scorer(params, cfg, jnp.where(mask[..., None], x, 55.0), mask)
    assert jnp.allclose(jnp.where(mask, s1, 0), jnp.where(mask, s2, 0), atol=1e-4)


def test_dropout_only_active_in_training():
    key = jax.random.PRNGKey(3)
    cfg = ScorerConfig(sf_id="pointsf", num_features=12, num_layers=2, h_dim=16, dropout=0.5)
    x, mask = make_batch(key)
    params = init_scorer(key, cfg)
    eval1 = apply_scorer(params, cfg, x, mask, training=False)
    eval2 = apply_scorer(params, cfg, x, mask, training=False)
    assert jnp.allclose(eval1, eval2)
    tr1 = apply_scorer(params, cfg, x, mask, training=True, key=jax.random.PRNGKey(10))
    tr2 = apply_scorer(params, cfg, x, mask, training=True, key=jax.random.PRNGKey(11))
    assert not jnp.allclose(jnp.where(mask, tr1, 0), jnp.where(mask, tr2, 0))


def test_scorer_is_jittable_and_grads_flow():
    key = jax.random.PRNGKey(4)
    cfg = ScorerConfig.default_listsf(num_features=12, ff_dims=(16,), encoder_layers=1)
    x, mask = make_batch(key)
    params = init_scorer(key, cfg)

    @jax.jit
    def loss(p):
        s = apply_scorer(p, cfg, x, mask)
        return jnp.sum(jnp.where(mask, s, 0.0) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


def test_listsf_grads_finite_with_all_padded_queries():
    """Regression: at init an all-padded query's encoder input is exactly
    zero; LayerNorm's sqrt(var=0) used to emit inf backward and poison every
    parameter gradient (fixed with a grad-safe double-where)."""
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.losses import get_loss
    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    B, N, F = 4, 8, 12
    feats = jnp.zeros((B, N, F))
    feats = feats.at[:2].set(jax.random.normal(jax.random.PRNGKey(0), (2, N, F)))
    labels = jnp.zeros((B, N)).at[:2].set(
        jax.random.randint(jax.random.PRNGKey(1), (2, N), 0, 3).astype(jnp.float32))
    mask = jnp.zeros((B, N), bool).at[:2].set(True)  # queries 2,3 fully padded
    loss_fn = get_loss("LambdaRank")

    for enc in ("DASALC", "AllRank", "AttnDIN"):
        cfg = ScorerConfig.default_listsf(num_features=F, encoder_layers=2,
                                          encoder_type=enc)
        params = init_scorer(jax.random.PRNGKey(137), cfg)

        def f(p):
            s = apply_scorer(p, cfg, feats, mask, training=False)
            return loss_fn(s, labels, mask)

        grads = jax.tree_util.tree_leaves(jax.grad(f)(params))
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads), enc


def test_bfloat16_compute_matches_fp32_closely():
    """compute_dtype='bfloat16' keeps fp32 inputs/outputs and tracks the fp32
    scores to bf16 tolerance (master params, norm stats and softmax stay
    fp32)."""
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    B, N, F = 4, 16, 24
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
    mask = jnp.ones((B, N), bool).at[1, 10:].set(False)
    for sf in ("pointsf", "listsf"):
        mk = (ScorerConfig.default_pointsf if sf == "pointsf"
              else ScorerConfig.default_listsf)
        cfg32 = mk(num_features=F)
        cfg16 = mk(num_features=F, compute_dtype="bfloat16")
        params = init_scorer(jax.random.PRNGKey(137), cfg32)
        s32 = apply_scorer(params, cfg32, feats, mask, training=False)
        s16 = apply_scorer(params, cfg16, feats, mask, training=False)
        assert s16.dtype == jnp.float32, sf
        denom = jnp.maximum(jnp.max(jnp.abs(jnp.where(mask, s32, 0.0))), 1e-3)
        rel = jnp.max(jnp.abs(jnp.where(mask, s32 - s16, 0.0))) / denom
        assert float(rel) < 0.15, (sf, float(rel))


def test_remat_grads_identical():
    """remat=True recomputes activations but must produce identical grads."""
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.losses import get_loss
    from ptranking_tpu.models import ScorerConfig, apply_scorer, init_scorer

    B, N, F = 4, 16, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, F))
    y = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 3).astype(jnp.float32)
    m = jnp.ones((B, N), bool).at[0, 10:].set(False)
    lf = get_loss("LambdaRank")
    cfg_a = ScorerConfig.default_listsf(num_features=F, encoder_layers=2)
    cfg_b = ScorerConfig.default_listsf(num_features=F, encoder_layers=2, remat=True)
    params = init_scorer(jax.random.PRNGKey(2), cfg_a)

    def g(cfg):
        return jax.grad(lambda p: lf(apply_scorer(
            p, cfg, x, m, training=True, key=jax.random.PRNGKey(3)), y, m))(params)

    ga, gb = g(cfg_a), g(cfg_b)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        # XLA may re-associate the recomputation; equality holds to fp32 ulps
        assert bool(jnp.allclose(a, b, rtol=1e-5, atol=1e-6))


def test_lane_align_width_pad_invariance_and_grads():
    """lane_align rounds the trunk width up to a 128-lane multiple; the
    padded-feature channels must not break padding invariance or grads."""
    import numpy as np

    key = jax.random.PRNGKey(5)
    cfg = ScorerConfig.default_listsf(
        num_features=12, lane_align=True, ff_dims=(16, 16), encoder_layers=2)
    assert cfg.width == 128
    # aligned widths pass through untouched; pointsf is exempt
    assert ScorerConfig.default_listsf(num_features=128, lane_align=True).width == 128
    assert ScorerConfig(sf_id="pointsf", num_features=12, lane_align=True).width == 12

    x, mask = make_batch(key)
    params = init_scorer(key, cfg)
    scores = apply_scorer(params, cfg, x, mask)
    assert scores.shape == (3, 8)
    assert bool(jnp.all(jnp.isfinite(jnp.where(mask, scores, 0.0))))

    x2 = jnp.where(mask[..., None], x, -777.0)
    scores2 = apply_scorer(params, cfg, x2, mask)
    assert jnp.allclose(jnp.where(mask, scores, 0), jnp.where(mask, scores2, 0), atol=1e-4)

    g = jax.grad(lambda p: jnp.sum(jnp.where(
        mask, apply_scorer(p, cfg, x, mask, training=True, key=key), 0.0)))(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))
