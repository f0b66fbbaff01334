"""HTTP scoring server (ptranking_tpu.serve): wire contract and parity with
direct predict."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
from ptranking_tpu.models import ScorerConfig
from ptranking_tpu.train import AdhocRanker, OptimizerConfig

F = 24


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tr = BucketedDataset(make_synthetic_queries(48, num_features=F, seed=1),
                         batch_docs=512)
    # BN=False: batch statistics would make scores depend on which other
    # queries share the padded batch — the parity check needs per-doc scores
    r = AdhocRanker("RankMSE",
                    ScorerConfig(sf_id="pointsf", num_features=F, BN=False),
                    opt_cfg=OptimizerConfig(lr=1e-3)).init()
    for e in range(3):
        r.train_epoch(tr.batches(shuffle=True, epoch=e))
    path = str(tmp_path_factory.mktemp("serve") / "m.pkl")
    r.save(path)
    return path, r


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_scores_and_errors(ckpt):
    from ptranking_tpu.serve import ScoringService, make_server

    path, ranker = ckpt
    service = ScoringService(path)
    server = make_server(service, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as resp:
            info = json.loads(resp.read())
        assert info["ok"] and info["num_features"] == F

        rng = np.random.RandomState(0)
        docs = rng.randn(7, F).astype(np.float32)
        status, out = _post(f"{base}/score", {"queries": [
            {"qid": "qa", "docs": docs.tolist(),
             "docids": [f"doc{j}" for j in range(7)]},
            {"qid": "qb", "docs": rng.randn(3, F).tolist()},
        ]})
        assert status == 200
        ra, rb = out["results"]
        assert ra["qid"] == "qa" and len(ra["docids"]) == 7
        assert rb["qid"] == "qb" and rb["docids"][0].startswith("qb-d")
        # parity with direct predict: same descending order
        from ptranking_tpu.types import RankingBatch

        batch = RankingBatch(docs[None], np.zeros((1, 7), np.float32),
                             np.ones((1, 7), bool))
        direct = np.asarray(ranker.predict(batch))[0]
        want = [f"doc{j}" for j in np.argsort(-direct, kind="stable")]
        assert ra["docids"] == want
        assert ra["scores"] == sorted(ra["scores"], reverse=True)

        # wrong feature width -> 400 with a message
        status, err = _post(f"{base}/score", {"queries": [
            {"qid": "bad", "docs": [[1.0, 2.0]]}]})
        assert status == 400 and "docs must be" in err["error"]
        status, err = _post(f"{base}/score", {"nope": 1})
        assert status == 400

        # non-finite scores become JSON null, never NaN/Infinity tokens
        status, out = _post(f"{base}/score", {"queries": [
            {"qid": "big", "docs": (np.full((2, F), 1e38)).tolist()}]})
        assert status == 200
        for v in out["results"][0]["scores"]:
            assert v is None or np.isfinite(v)
    finally:
        server.shutdown()
        server.server_close()


def test_serve_artifact_batch_docs_contract(ckpt, tmp_path):
    """An artifact only has compiled entries for its exported batch_docs:
    the service defaults to the recorded value and rejects a mismatch at
    startup instead of 400-ing every request."""
    from ptranking_tpu.export import export_scorer
    from ptranking_tpu.serve import ScoringService

    path, _ = ckpt
    art = str(tmp_path / "m.ptx")
    export_scorer(path, art, batch_docs=64, buckets=(8,))
    svc = ScoringService(art)
    assert svc.batch_docs == 64
    rng = np.random.RandomState(1)
    out = svc.score({"queries": [{"qid": "q", "docs": rng.randn(5, F).tolist()}]})
    assert len(out["results"][0]["docids"]) == 5
    with pytest.raises(ValueError, match="exported with batch_docs=64"):
        ScoringService(art, batch_docs=100)
