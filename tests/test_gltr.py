"""Generic GLTR dataset support (LTR_LibSVM / LETOR ids).

Reference contract: ptranking/data/data_utils.py:46-67 — a user dataset in
plain LibSVM (sparse, zero features omitted) or LETOR (dense) format, with
its meta (num_features etc.) declared in the config's data section instead
of the built-in registry.
"""

import json
import os

import numpy as np
import pytest

from ptranking_tpu.data.meta import get_data_meta
from ptranking_tpu.eval import LTREvaluator


def _write_letor(path, rng, n_queries=30, n_feats=8, sparse=False):
    lines = []
    for q in range(n_queries):
        n_docs = rng.randint(5, 15)
        for _ in range(n_docs):
            label = rng.randint(0, 3)
            vals = rng.rand(n_feats)
            if sparse:
                keep = rng.rand(n_feats) > 0.4
                keep[0] = True
                toks = [f"{i + 1}:{vals[i]:.4f}" for i in range(n_feats) if keep[i]]
            else:
                toks = [f"{i + 1}:{vals[i]:.4f}" for i in range(n_feats)]
            lines.append(f"{label} qid:{q} " + " ".join(toks))
    path.write_text("\n".join(lines) + "\n")


def test_gltr_meta_from_json():
    meta = get_data_meta("LTR_LibSVM", json_dict={"num_features": 8})
    assert meta.num_features == 8 and meta.fold_num == 1 and not meta.has_comment
    meta_k = get_data_meta("LETOR_K", json_dict={"num_features": [12], "fold_num": [3],
                                                 "max_rele_level": 2})
    assert meta_k.num_features == 12 and meta_k.fold_num == 3 and meta_k.max_rele_level == 2


def test_gltr_meta_requires_num_features():
    with pytest.raises(ValueError, match="num_features"):
        get_data_meta("LETOR", json_dict={})
    with pytest.raises(ValueError, match="num_features"):
        get_data_meta("LTR_LibSVM")


@pytest.mark.parametrize("data_id,sparse", [("LETOR", False), ("LTR_LibSVM", True)])
def test_gltr_end_to_end_dir_json(tmp_path, data_id, sparse):
    """A generic dataset drives the full -dir_json grid path: folder layout
    Fold1/ (reference ltr.py:116-120) or flat dir_data root."""
    rng = np.random.RandomState(7)
    data_dir = tmp_path / "data"
    if sparse:
        # flat layout (no Fold1/): the convenience fallback
        data_dir.mkdir()
        _write_letor(data_dir / "train.txt", rng, sparse=True)
        _write_letor(data_dir / "vali.txt", rng, n_queries=10, sparse=True)
        _write_letor(data_dir / "test.txt", rng, n_queries=10, sparse=True)
    else:
        fold = data_dir / "Fold1"
        fold.mkdir(parents=True)
        _write_letor(fold / "train.txt", rng)
        _write_letor(fold / "vali.txt", rng, n_queries=10)
        _write_letor(fold / "test.txt", rng, n_queries=10)

    cfg = {
        "DataSetting": {
            "data_id": data_id, "dir_data": str(data_dir),
            "num_features": 8, "max_rele_level": 2, "fold_num": 1,
            "min_docs": [2], "min_rele": [1], "tr_batch_size": [64],
        },
        "EvalSetting": {
            "dir_output": str(tmp_path / "out"), "epochs": 2,
            "do_validation": True, "vali_k": 5, "vali_metric": "nDCG",
            "cutoffs": [1, 3, 5], "do_log": False, "log_step": 1,
            "mask": {"mask_label": False},
        },
        "SFParameter": {
            "sf_id": "pointsf", "opt": ["Adam"], "lr": [0.001],
            "pointsf": {"layers": [2], "AF": ["R"], "TL_AF": ["S"],
                        "apply_tl_af": [False], "BN": [True],
                        "bn_type": ["BN"], "bn_affine": [True]},
        },
    }
    dir_json = tmp_path / "json"
    dir_json.mkdir()
    (dir_json / "Data_Eval_ScoringFunction.json").write_text(json.dumps(cfg))

    ev = LTREvaluator()
    perf = ev.run(debug=False, model_id="RankMSE", sf_id="pointsf",
                  config_with_json=True, dir_json=str(dir_json))
    assert perf is not None and perf["nDCG"].shape == (3,)
    assert 0.0 < float(perf["nDCG"][-1]) <= 1.0


def test_gltr_sparse_width_padding(tmp_path):
    """Sparse rows whose max seen feature id < num_features pad with zeros."""
    p = tmp_path / "train.txt"
    p.write_text("2 qid:1 1:0.5 2:0.25\n0 qid:1 1:0.1\n1 qid:2 1:0.9 3:0.3\n0 qid:2 2:0.2\n")
    from ptranking_tpu.data import BucketedDataset, load_letor_file

    qs = load_letor_file(str(p), data_id="LTR_LibSVM", min_docs=0, min_rele=0)
    ds = BucketedDataset(qs, batch_docs=16, num_features=6)
    batches = list(ds.batches())
    f = np.asarray(batches[0].features)
    assert f.shape[-1] == 6
    assert np.all(f[..., 3:] == 0.0)  # features 5,6 never seen -> zero columns
