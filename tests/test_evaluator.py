"""End-to-end evaluator tests on synthetic data (debug-scale)."""

import json
import os

import numpy as np
import pytest

from ptranking_tpu.eval import LTREvaluator
from ptranking_tpu.eval.settings import DataSetting, EvalSetting, ModelSetting, SFSetting


def test_point_run_end_to_end(tmp_path):
    ev = LTREvaluator()
    perf = ev.point_run(
        debug=True, model_id="RankMSE", sf_id="pointsf",
        data_id="SyntheticMQ", dir_output=str(tmp_path),
    )
    assert perf["nDCG"].shape == (6,)  # cutoffs [1,3,5,10,20,50]
    assert 0.0 < perf["nDCG"][2] <= 1.0
    # run dir encodes the settings
    runs = [r for r, d, f in os.walk(tmp_path) if "Fold-1" in d]
    assert runs and "RankMSE_SF" in os.path.basename(runs[0])


def test_reproduce_matches_original(tmp_path):
    ev = LTREvaluator()
    perf = ev.point_run(debug=True, model_id="RankNet", data_id="SyntheticMQ",
                        dir_output=str(tmp_path))
    perf2 = ev.point_run(debug=True, model_id="RankNet", data_id="SyntheticMQ",
                         dir_output=str(tmp_path), reproduce=True)
    np.testing.assert_allclose(perf["nDCG"], perf2["nDCG"], atol=1e-6)


def test_json_config_run(tmp_path):
    cfg = {
        "DataSetting": {
            "data_id": "SyntheticMQ", "dir_data": "/nonexistent",
            "min_docs": [5], "min_rele": [1], "binary_rele": [False],
            "unknown_as_zero": [False], "tr_batch_size": [256],
        },
        "EvalSetting": {
            "dir_output": str(tmp_path / "out"), "epochs": 2,
            "do_validation": True, "vali_k": 5, "vali_metric": "nDCG",
            "cutoffs": [1, 3, 5, 10], "loss_guided": False,
            "do_log": False, "log_step": 1, "do_summary": False,
            "mask": {"mask_label": False, "mask_type": ["rand_mask_all"], "mask_ratio": [0.2]},
        },
        "SFParameter": {
            "sf_id": "pointsf", "opt": ["Adam"], "lr": [0.001],
            "pointsf": {"BN": [True], "bn_type": ["BN"], "bn_affine": [True],
                        "layers": [2], "AF": ["R"], "TL_AF": ["S"], "apply_tl_af": [False]},
        },
    }
    dir_json = tmp_path / "json"
    dir_json.mkdir()
    (dir_json / "Data_Eval_ScoringFunction.json").write_text(json.dumps(cfg))
    (dir_json / "RankNetParameter.json").write_text(json.dumps({"RankNet": {"sigma": [1.0]}}))

    ev = LTREvaluator()
    perf = ev.run(debug=True, model_id="RankNet", sf_id="pointsf",
                  config_with_json=True, dir_json=str(dir_json))
    assert perf is not None and perf["nDCG"].shape == (4,)
    # grid best-setting record written
    assert any("max.txt" in f for _, _, fs in os.walk(tmp_path / "out") for f in fs)


def test_settings_strings():
    ds = DataSetting(debug=True, data_id="SyntheticMQ", dir_data=None)
    ds.default_setting()
    s = ds.to_data_setting_string()
    assert "SyntheticMQ" in s and "MiD" in s

    es = EvalSetting(debug=True, dir_output="/tmp")
    es.default_setting()
    assert "EP_5" in es.to_eval_setting_string()

    sf = SFSetting(debug=True, sf_id="pointsf")
    sf.default_setting(num_features=46)
    assert "GE5S" in sf.to_para_string()

    ms = ModelSetting("LambdaRank", debug=True)
    ms.default_para_dict()
    assert "sigma" in ms.to_para_string()


def test_model_grid_iterates():
    ms = ModelSetting("LambdaLoss", debug=True)
    grids = list(ms.grid_search())
    assert len(grids) >= 1
    assert all("loss_type" in g for g in grids)
    # reference nuance: mu applies only to NDCG_Loss2++ (lambdaloss.py grid)
    assert all("mu" not in g for g in grids if g["loss_type"] != "NDCG_Loss2++")


def test_reference_grid_choices():
    """Built-in grids carry the reference's actual search axes: debug
    RankNet/LambdaRank sweep sigma [5.0, 1.0] (ranknet.py:73-84), and the SF
    grid sweeps AF/TL_AF over the reference's activation lists
    (parameter.py:185-192)."""
    from ptranking_tpu.eval.settings import SFSetting

    grids = list(ModelSetting("RankNet", debug=True).grid_search())
    assert sorted(g["sigma"] for g in grids) == [1.0, 5.0]
    grids_nd = list(ModelSetting("RankNet", debug=False).grid_search())
    assert [g["sigma"] for g in grids_nd] == [1.0]
    assert list(ModelSetting("MDPRank", debug=False).grid_search())[0]["top_k"] == 10

    sf = SFSetting(debug=False, sf_id="pointsf")
    combos = list(sf.grid_search(num_features=8))
    afs = {(p["scorer"].AF, p["scorer"].TL_AF) for p in combos}
    assert len(combos) == 9 and afs == {(a, b) for a in "R CE S".split()
                                        for b in "R CE S".split()}
    sf_dbg = SFSetting(debug=True, sf_id="pointsf")
    assert len(list(sf_dbg.grid_search(num_features=8))) == 4


def test_listsf_perf_knobs_from_json(tmp_path):
    """The round-3 perf knobs (lane_align, flash_attn, attn_block_size,
    remat) are reachable from the JSON config surface on both the
    default-setting and grid-search paths (reference analogue: every
    listsf hyper-parameter flows through ScoringFunctionParameter,
    parameter.py:152-290)."""
    from ptranking_tpu.eval.settings import SFSetting

    cfg = {"SFParameter": {
        "sf_id": "listsf", "opt": ["Adagrad"], "lr": [0.001],
        "listsf": {"encoder_layers": [2], "n_heads": [2],
                   "ff_dims": [32, 32], "lane_align": [True],
                   "flash_attn": [True], "attn_block_size": [64],
                   "remat": [True]},
    }}
    p = tmp_path / "Data_Eval_ScoringFunction.json"
    p.write_text(json.dumps(cfg))

    sf = SFSetting(debug=True, sf_id="listsf", sf_json=str(p))
    scorer = sf.default_setting(num_features=10)["scorer"]
    assert (scorer.lane_align, scorer.flash_attn,
            scorer.attn_block_size, scorer.remat) == (True, True, 64, True)
    for para in sf.grid_search(num_features=10):
        s = para["scorer"]
        assert s.flash_attn and s.attn_block_size == 64 and s.remat
    # without JSON the knobs default off (reference geometry untouched)
    s0 = SFSetting(debug=True, sf_id="listsf").default_setting(num_features=10)["scorer"]
    assert (s0.lane_align, s0.flash_attn, s0.attn_block_size, s0.remat) == (
        False, False, None, False)


def test_unknown_model_rejected():
    ev = LTREvaluator()
    with pytest.raises(AssertionError):
        ev.run(model_id="TwinRank", data_id="SyntheticMQ")


def test_cli_main(tmp_path):
    from ptranking_tpu.ltr import main

    perf = main(["-model", "RankMSE", "-debug", "-data", "SyntheticMQ",
                 "-dir_output", str(tmp_path)])
    assert perf["nDCG"].shape == (6,)


def test_reproduce_writes_per_query_pickles(tmp_path):
    """Reproduce mode emits per-query metric matrices, one file per metric
    (reference parameter.py:814-831)."""
    import glob
    import pickle

    from ptranking_tpu.eval.evaluator import LTREvaluator

    ev = LTREvaluator()
    ev.run(debug=True, model_id="RankMSE", sf_id="pointsf", data_id="SyntheticMQ",
           dir_output=str(tmp_path), grid_search=False)
    ev.run(debug=True, model_id="RankMSE", sf_id="pointsf", data_id="SyntheticMQ",
           dir_output=str(tmp_path), grid_search=False, reproduce=True)
    files = glob.glob(str(tmp_path) + "/**/RankMSE_all_fold_*_at_ks_per_q.np",
                      recursive=True)
    assert len(files) == 4, files
    with open(files[0], "rb") as f:
        mat = pickle.load(f)
    assert mat.ndim == 2 and mat.shape[0] > 0 and mat.shape[1] == 6


def test_mid_training_resume(tmp_path):
    """train_state.pkl checkpointing resumes a killed run mid-training and
    produces the SAME final result as an uninterrupted run (params, optimizer
    state, PRNG key and epoch counter all restored; SURVEY 5.4)."""
    import numpy as np

    def run(out_dir, epochs, resume):
        ev = LTREvaluator()
        ev.set_settings(True, "RankNet", "pointsf", "SyntheticMQ", None,
                        str(out_dir), None)
        data_dict = ev.data_setting.default_setting()
        data_dict["fold_num"] = 1
        eval_dict = ev.eval_setting.default_setting()
        eval_dict.update(epochs=epochs, do_log=False, do_validation=False,
                         save_train_state=True, resume=resume)
        sf_para = ev.sf_setting.default_setting(data_dict["num_features"])
        return ev.kfold_cv_eval(data_dict, eval_dict, sf_para,
                                {"model_id": "RankNet"})

    # uninterrupted 4-epoch run
    full = run(tmp_path / "full", 4, resume=False)
    # interrupted: 2 epochs, then resume to 4 in a fresh evaluator
    run(tmp_path / "resumed", 2, resume=False)
    resumed = run(tmp_path / "resumed", 4, resume=True)
    np.testing.assert_allclose(resumed["nDCG"], full["nDCG"], atol=1e-5)


def test_builtin_grid_run(tmp_path):
    """-grid without json searches the built-in reference grids end-to-end
    (debug shrinks the SF grid to 4 combos; RankMSE has no model axes)."""
    ev = LTREvaluator()
    perf = ev.run(debug=True, model_id="RankMSE", sf_id="pointsf",
                  data_id="SyntheticMQ", dir_output=str(tmp_path),
                  grid_search=True)
    assert perf is not None and np.isfinite(perf["nDCG"]).all()
    # best-setting record + per-combo run dirs under grid_<model>
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert any(f.endswith("max.txt") for f in files), files
    grid_dirs = [d for _, ds_, _ in os.walk(tmp_path) for d in ds_
                 if d.startswith("grid_RankMSE")]
    assert grid_dirs
