"""Serving path: self-describing checkpoints + the batch scoring CLI."""

import os

import pytest

import numpy as np

from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
from ptranking_tpu.models import ScorerConfig
from ptranking_tpu.train import AdhocRanker


def _trained_ranker(tmp_path, F=8):
    qs = make_synthetic_queries(num_queries=10, num_features=F, seed=0)
    ds = BucketedDataset(qs, batch_docs=256)
    r = AdhocRanker("RankMSE", ScorerConfig.default_pointsf(num_features=F)).init()
    r.train_epoch(ds.batches(shuffle=True, epoch=1), 1)
    ck = str(tmp_path / "model.pkl")
    r.save(ck)
    return r, qs, ds, ck


def test_from_checkpoint_restores_identical_scores(tmp_path):
    r, qs, ds, ck = _trained_ranker(tmp_path)
    r2 = AdhocRanker.from_checkpoint(ck)
    assert r2.model_id == r.model_id and r2.scorer_cfg == r.scorer_cfg
    b = next(iter(ds.batches()))
    np.testing.assert_allclose(np.asarray(r.predict(b)), np.asarray(r2.predict(b)),
                               atol=1e-6)


def test_score_file_writes_trec_run(tmp_path):
    from ptranking_tpu.score import score_file

    r, qs, ds, ck = _trained_ranker(tmp_path)
    letor = str(tmp_path / "in.txt")
    with open(letor, "w") as f:
        for qid, feats, labels in qs:
            for x, y in zip(feats, labels):
                row = " ".join(f"{i+1}:{v:.5f}" for i, v in enumerate(x))
                f.write(f"{int(y)} qid:{qid} {row}\n")
    out = str(tmp_path / "run.txt")
    n = score_file(ck, letor, out, data_id="GLTR_LETOR")
    lines = open(out).read().splitlines()
    assert n == len(lines) == sum(len(q[2]) for q in qs)
    # TREC format: qid Q0 docid rank score runid; ranks dense from 1 per query
    seen = {}
    for line in lines:
        qid, q0, docid, rank, score, runid = line.split()
        assert q0 == "Q0" and docid.startswith(qid)
        seen.setdefault(qid, []).append(int(rank))
    for qid, ranks in seen.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_export_artifact_matches_checkpoint_scoring(tmp_path):
    """A .ptx StableHLO artifact (ptranking_tpu.export) scores a LETOR file
    byte-identically to the checkpoint it was exported from, and raises a
    clear error for an un-exported batch shape."""
    import jax.numpy as jnp

    from ptranking_tpu.export import ExportedScorer, export_scorer, is_artifact
    from ptranking_tpu.score import score_file

    r, qs, ds, ck = _trained_ranker(tmp_path)
    letor = str(tmp_path / "in.txt")
    with open(letor, "w") as f:
        for qid, feats, labels in qs:
            for x, y in zip(feats, labels):
                row = " ".join(f"{i+1}:{v:.5f}" for i, v in enumerate(x))
                f.write(f"{int(y)} qid:{qid} {row}\n")

    art = str(tmp_path / "m.ptx")
    export_scorer(ck, art, batch_docs=100)
    assert is_artifact(art) and not is_artifact(ck)

    out_ck = str(tmp_path / "run_ck.txt")
    out_art = str(tmp_path / "run_art.txt")
    n1 = score_file(ck, letor, out_ck, data_id="GLTR_LETOR")
    n2 = score_file(art, letor, out_art, data_id="GLTR_LETOR")
    assert n1 == n2 and open(out_ck).read() == open(out_art).read()

    es = ExportedScorer(art)

    class Odd:
        features = jnp.ones((99, 7, es.num_features))
        mask = jnp.ones((99, 7), bool)

    with pytest.raises(KeyError, match="no exported entry"):
        es.predict(Odd())


def test_export_artifact_platform_mismatch_error(tmp_path):
    """An artifact exported only for another platform names the fix."""
    import jax.numpy as jnp

    from ptranking_tpu.export import ExportedScorer, export_scorer

    r, qs, ds, ck = _trained_ranker(tmp_path)
    art = str(tmp_path / "m.ptx")
    export_scorer(ck, art, batch_docs=100, buckets=[16], platforms=["tpu"])
    es = ExportedScorer(art)

    class B:
        features = jnp.ones((6, 16, es.num_features))
        mask = jnp.ones((6, 16), bool)

    with pytest.raises(KeyError, match="platforms"):
        es.predict(B())
