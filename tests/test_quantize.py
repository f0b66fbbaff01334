"""Int8 serving path (models/quantize.py): near-lossless scores, genuine
integer matmuls in the compiled program, and the CLI/export surfaces."""

import os

import jax
import numpy as np
import pytest

from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
from ptranking_tpu.models import ScorerConfig, apply_scorer
from ptranking_tpu.train import AdhocRanker, OptimizerConfig

F = 24


def _trained(sf_id: str):
    cfg = (ScorerConfig(sf_id="pointsf", num_features=F)
           if sf_id == "pointsf" else
           ScorerConfig.default_listsf(F, dropout=0.0))
    tr = BucketedDataset(make_synthetic_queries(96, num_features=F, seed=1),
                         batch_docs=512)
    r = AdhocRanker("LambdaRank", cfg, opt_cfg=OptimizerConfig(lr=1e-3)).init()
    for e in range(5):
        r.train_epoch(tr.batches(shuffle=True, epoch=e))
    return r


@pytest.mark.parametrize("sf_id", ["pointsf", "listsf"])
def test_quantized_scores_near_lossless_and_int8_in_hlo(sf_id):
    r = _trained(sf_id)
    q = r.quantized()
    te = BucketedDataset(make_synthetic_queries(48, num_features=F, seed=2),
                         batch_docs=512)
    batch = next(iter(te.batches()))
    s_f = np.asarray(r.predict(batch))
    s_q = np.asarray(q.predict(batch))
    m = np.asarray(batch.mask)
    corr = np.corrcoef(s_f[m], s_q[m])[0, 1]
    assert corr > 0.999, corr

    # quality: dataset nDCG@5 must move by less than half a point
    nd_f = float(r.evaluate(te, ks=(5,))["nDCG"][0])
    nd_q = float(q.evaluate(te, ks=(5,))["nDCG"][0])
    assert abs(nd_f - nd_q) < 5e-3, (nd_f, nd_q)

    # the program must really run integer matmuls (s8 operands), and the
    # fp32 weight tensors must be gone from the quantized tree
    cfg = r.scorer_cfg
    hlo = (jax.jit(lambda p, f, mk: apply_scorer(p, cfg, f, mk))
           .lower(q.params, batch.features, batch.mask).compile().as_text())
    assert "s8[" in hlo
    flat = jax.tree_util.tree_leaves(q.params)
    assert any(l.dtype == np.int8 for l in flat)


def test_quantized_view_is_inference_only():
    r = _trained("pointsf")
    q = r.quantized()
    assert q.opt_state is None
    tr = BucketedDataset(make_synthetic_queries(32, num_features=F, seed=3),
                         batch_docs=512)
    # training the quantized view fails loudly, not with a gradient of zeros
    with pytest.raises(RuntimeError, match="int8-quantized"):
        q.train_epoch(tr.batches())
    # original keeps training
    loss, stop = r.train_epoch(tr.batches())
    assert np.isfinite(loss) and not stop


def test_score_cli_quantize_flag(tmp_path):
    from ptranking_tpu.score import score_file

    r = _trained("pointsf")
    ckpt = str(tmp_path / "m.pkl")
    r.save(ckpt)
    letor = str(tmp_path / "test.txt")
    with open(letor, "w") as f:
        rng = np.random.RandomState(0)
        for qid in (1, 2):
            for d in range(6):
                feats = " ".join(f"{i + 1}:{rng.randn():.4f}" for i in range(F))
                f.write(f"{rng.randint(0, 3)} qid:{qid} {feats}\n")
    out = str(tmp_path / "run.txt")
    n = score_file(ckpt, letor, out, quantize="int8")
    assert n == 12 and os.path.exists(out)
    with pytest.raises(ValueError, match="unknown -quantize"):
        score_file(ckpt, letor, out, quantize="int4")


def test_export_quantized_artifact_roundtrip(tmp_path):
    """-quantize int8 bakes int8 weights into the .ptx; the scoring CLI
    serves it and the served scores match the quantized ranker's."""
    from ptranking_tpu.export import ExportedScorer, export_scorer

    r = _trained("pointsf")
    ckpt = str(tmp_path / "m.pkl")
    r.save(ckpt)
    art = str(tmp_path / "m.ptx")
    export_scorer(ckpt, art, batch_docs=64, buckets=(8,), quantize="int8")
    served = ExportedScorer(art)
    te = BucketedDataset(make_synthetic_queries(16, num_features=F, seed=4),
                         batch_docs=64, buckets=(8,))
    batch = next(iter(te.batches()))
    got = np.asarray(served.predict(batch))
    want = np.asarray(r.quantized().predict(batch))
    m = np.asarray(batch.mask)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-5, atol=1e-6)
