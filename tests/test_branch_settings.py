"""Branch-level config system tests (ad/div/tree): JSON-driven grid runs,
grid iterators, and to_para_string run-dir identifiers — mirroring
test_evaluator.py::test_json_config_run per branch (reference ad_parameter.py
/ div_parameter.py / tree_parameter.py)."""

import json
import os

import numpy as np
import pytest


# ------------------------------------------------------------- adversarial


def _write_ad_json(dir_json, epochs=2):
    cfg = {
        "AdDataSetting": {
            "data_id": "SyntheticMQ", "dir_data": "/nonexistent",
            "min_docs": [10], "min_rele": [1], "scaler_id": None,
            "binary_rele": [False], "unknown_as_zero": [False],
            "tr_batch_size": [256],
        },
        "AdEvalSetting": {
            "dir_output": str(dir_json / "out"), "epochs": epochs,
            "do_validation": True, "vali_k": 5,
            "cutoffs": [1, 3, 5, 10, 20, 50], "loss_guided": False,
            "do_log": False, "log_step": 1, "do_summary": False,
            "mask": {"mask_label": False, "mask_type": ["rand_mask_all"],
                     "mask_ratio": [0.2]},
        },
        "SFParameter": {
            "sf_id": "pointsf", "opt": ["Adam"], "lr": [0.001],
            "pointsf": {"BN": [False], "bn_type": ["BN"], "bn_affine": [True],
                        "layers": [2], "AF": ["R"], "TL_AF": ["R"],
                        "apply_tl_af": [True]},
        },
    }
    (dir_json / "Ad_Data_Eval_ScoringFunction.json").write_text(json.dumps(cfg))
    (dir_json / "IRGAN_PointParameter.json").write_text(json.dumps({
        "d_g_epoch": ["1-1"], "temperature": [0.5],
        "samples_per_query": [5], "ad_training_order": ["DG"],
    }))


def test_ad_json_config_run(tmp_path):
    from ptranking_tpu.adversarial import AdLTREvaluator

    dir_json = tmp_path / "json"
    dir_json.mkdir()
    _write_ad_json(dir_json)
    ev = AdLTREvaluator()
    cv = ev.run(debug=True, model_id="IRGAN_Point", config_with_json=True,
                dir_json=str(dir_json))
    assert cv["G"].shape == (6,) and np.all(np.isfinite(cv["G"]))
    # grid run dir carries the para-string path
    out = tmp_path / "json" / "out"
    hit = [os.path.join(r, d) for r, ds, _ in os.walk(out) for d in ds]
    assert any("IRGAN_Point_SF_" in p for p in hit), hit


def test_ad_model_setting_grid_and_para_string():
    from ptranking_tpu.adversarial import AdModelSetting

    ms = AdModelSetting("IRGAN_Pair")
    grids = list(ms.grid_search())
    assert len(grids) == 1
    assert grids[0]["d_epoches"] == 1 and grids[0]["loss_type"] == "svm"
    s = ms.to_para_string()
    # reference format: d_g_temperature_order_losstype_samples
    assert s == "1_1_0.5_DG_svm_5", s

    ms_list = AdModelSetting("IRGAN_List")
    ms_list.default_para_dict()
    s = ms_list.to_para_string()
    assert "top5" in s and "PLD" in s


def test_ad_d_g_epoch_json_axis(tmp_path):
    from ptranking_tpu.adversarial import AdModelSetting

    p = tmp_path / "IRGAN_PointParameter.json"
    p.write_text(json.dumps({"d_g_epoch": ["2-3", "1-1"], "temperature": [0.5, 1.0],
                             "samples_per_query": [5], "ad_training_order": ["DG"]}))
    ms = AdModelSetting("IRGAN_Point", para_json=str(p))
    grids = list(ms.grid_search())
    assert len(grids) == 4  # 2 d_g x 2 temperature
    assert {(g["d_epoches"], g["g_epoches"]) for g in grids} == {(2, 3), (1, 1)}
    d = ms.default_para_dict()
    assert (d["d_epoches"], d["g_epoches"]) == (2, 3)


# ---------------------------------------------------------- diversification


def _write_div_json(dir_json, epochs=2):
    cfg = {
        "DivDataSetting": {
            "data_id": "SyntheticDiv", "dir_data": "/nonexistent",
            "add_noise": [False], "std_delta": [1.0],
        },
        "DivEvalSetting": {
            "dir_output": str(dir_json / "out"), "epochs": epochs,
            "do_validation": True, "vali_k": 5, "vali_metric": "aNDCG",
            "cutoffs": [1, 3, 5, 10, 20], "loss_guided": False,
            "do_log": False, "log_step": 1, "do_summary": False,
            "rerank": False,
        },
        "DivSFParameter": {
            "sf_id": "pointsf", "opt": ["Adam"], "lr": [0.001],
            "pointsf": {"BN": [True], "bn_type": ["BN"], "bn_affine": [True],
                        "layers": [2], "AF": ["R"], "TL_AF": ["GE"],
                        "apply_tl_af": [False]},
        },
    }
    (dir_json / "Div_Data_Eval_ScoringFunction.json").write_text(json.dumps(cfg))
    (dir_json / "DALETORParameter.json").write_text(
        json.dumps({"rt": [10.0], "top_k": [10]}))


def test_div_json_config_run(tmp_path):
    from ptranking_tpu.diversification import DivLTREvaluator

    dir_json = tmp_path / "json"
    dir_json.mkdir()
    _write_div_json(dir_json)
    ev = DivLTREvaluator()
    cv = ev.run(debug=True, model_id="DALETOR", config_with_json=True,
                dir_json=str(dir_json))
    assert cv["aNDCG"].shape == (5,) and np.all(np.isfinite(cv["aNDCG"]))
    out = tmp_path / "json" / "out"
    hit = [d for _, ds, _ in os.walk(out) for d in ds]
    assert any(d.startswith("DALETOR_SF_") for d in hit), hit
    # the para-string leaf dir (DALETORParameter.to_para_string format)
    assert any(d.startswith("rt_10") for d in hit), hit


def test_div_prob_ranker_nested_grid():
    from ptranking_tpu.diversification import DivModelSetting

    ms = DivModelSetting("DivProbRanker", debug=False)
    grids = list(ms.grid_search())
    # opt_ids x limit_delta{None,0.1}: SuperSoft 2, PairCLS 2, LambdaPairCLS 2
    opt_ids = [g["opt_id"] for g in grids]
    assert opt_ids.count("SuperSoft") == 2
    assert opt_ids.count("PairCLS") == 2
    assert opt_ids.count("LambdaPairCLS") == 2
    # SuperSoft entries carry top_k/metric/opt_ideal; PairCLS entries do not
    # get opt_ideal re-specified beyond the default
    ss = [g for g in grids if g["opt_id"] == "SuperSoft"][0]
    assert ss["top_k"] == 10 and ss["metric"] == "aNDCG"

    ms.para_dict = dict(ms.default_para_dict(), opt_id="SuperSoft", K=1,
                        cluster=False, sort_id="ExpRele", limit_delta=0.01,
                        opt_ideal=True, top_k=10)
    s = ms.to_para_string()
    assert s.startswith("1_SuperSoft_ExpRele_0.01"), s
    assert "OptIdeal" in s and s.endswith("10")


def test_div_eval_setting_rerank_string():
    from ptranking_tpu.diversification import DivEvalSetting

    es = DivEvalSetting(debug=True, dir_output="/tmp/o")
    d = es.default_setting()
    d.update(rerank=True, rerank_k=50, rerank_model_id="DivProbRanker")
    s = es.to_eval_setting_string()
    assert "RR_50_DivProbRanker" in s, s


# -------------------------------------------------------------------- tree


def _write_tree_json(dir_json):
    cfg = {
        "DataSetting": {
            "data_id": "SyntheticMQ", "dir_data": "/nonexistent",
            "min_docs": [10], "min_rele": [1],
            "binary_rele": [False], "unknown_as_zero": [False],
            "train_presort": [False],
        },
        "EvalSetting": {
            "dir_output": str(dir_json / "out"),
            "early_stop_or_boost_round": 50,
            "do_validation": True, "cutoffs": [1, 3, 5, 10, 20, 50],
            "do_log": False,
            "mask": {"mask_label": False, "mask_type": ["rand_mask_all"],
                     "mask_ratio": [0.2]},
        },
        "SFParameter": {},
    }
    (dir_json / "Tree_Data_Eval_ScoringFunction.json").write_text(json.dumps(cfg))
    (dir_json / "LightGBMLambdaMARTParameter.json").write_text(json.dumps({
        "BT": ["gbdt"], "metric": ["ndcg"], "leaves": [31], "trees": [20],
        "MiData": [5], "MSH": [1], "LR": [0.1], "eval_at": 5,
    }))


def test_tree_json_config_run(tmp_path):
    from ptranking_tpu.tree import TreeLTREvaluator

    dir_json = tmp_path / "json"
    dir_json.mkdir()
    _write_tree_json(dir_json)
    ev = TreeLTREvaluator()
    cv = ev.run(debug=True, model_id="LightGBMLambdaMART", config_with_json=True,
                dir_json=str(dir_json))
    assert cv["nDCG"].shape == (6,) and np.all(np.isfinite(cv["nDCG"]))
    out = tmp_path / "json" / "out"
    hit = [d for _, ds, _ in os.walk(out) for d in ds]
    # run dir: identifier + data/eval strings, leaf = lightgbm para string
    assert any("SyntheticMQ" in d and "EarlyStop" in d for d in hit), hit
    assert any(d.startswith("BT_gbdt_Metric_ndcg_Leaves_31") for d in hit), hit


def test_tree_para_string_and_grid():
    from ptranking_tpu.tree import TreeModelSetting

    ms = TreeModelSetting("LightGBMLambdaMART")
    ms.default_para_dict()
    s = ms.to_para_string()
    assert s == "BT_gbdt_Metric_ndcg_Leaves_400_Trees_1000_MiData_50_MSH_200_LR_0.05_EvalAt_5", s
    # the reference non-debug grid iterates LR over [0.05, 0.01]
    grids = list(ms.grid_search())
    assert len(grids) == 2
    assert {g["lightgbm_para_dict"]["learning_rate"] for g in grids} == {0.05, 0.01}
    assert ms.get_identifier() == "LightGBMLambdaMART"


# ---------------------------------------------------------- summary tapes


def test_adhoc_summary_tape_files(tmp_path):
    """do_summary writes the reference's Fold_k_{train,test,vali}_eval.np +
    Fold_k_epoch_loss.np pickles (parameter.py:835-882)."""
    import pickle

    from ptranking_tpu.eval import LTREvaluator

    ev = LTREvaluator()
    ev.set_settings(True, "RankMSE", "pointsf", "SyntheticMQ", None,
                    str(tmp_path), None)
    data_dict = ev.data_setting.default_setting()
    eval_dict = ev.eval_setting.default_setting()
    eval_dict.update(epochs=2, do_summary=True, do_log=False)
    sf_para = ev.sf_setting.default_setting(data_dict["num_features"])
    perf = ev.kfold_cv_eval(data_dict, eval_dict, sf_para,
                            {"model_id": "RankMSE"})
    assert perf is not None
    files = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path) for f in fs]
    for suffix in ("train_eval.np", "test_eval.np", "vali_eval.np", "epoch_loss.np"):
        assert any(f.endswith(suffix) for f in files), (suffix, files)
    train_eval = next(f for f in files if f.endswith("Fold_1_train_eval.np"))
    with open(train_eval, "rb") as f:
        mat = pickle.load(f)
    assert mat.shape == (2, 6)  # epochs x cutoffs
    loss_f = next(f for f in files if f.endswith("Fold_1_epoch_loss.np"))
    with open(loss_f, "rb") as f:
        losses, train_len = pickle.load(f)
    assert losses.shape == (2,) and train_len > 0


def test_cli_dispatch_tree_json(tmp_path):
    """ltr.py main() routes -dir_json to the tree evaluator's json-grid run."""
    from ptranking_tpu.ltr import main

    dir_json = tmp_path / "json"
    dir_json.mkdir()
    _write_tree_json(dir_json)
    cv = main(["-model", "LightGBMLambdaMART", "-debug",
               "-dir_json", str(dir_json)])
    assert cv["nDCG"].shape == (6,)


def test_cli_dispatch_div_json(tmp_path):
    """ltr.py main() routes -dir_json to the div evaluator's json-grid run."""
    from ptranking_tpu.ltr import main

    dir_json = tmp_path / "json"
    dir_json.mkdir()
    _write_div_json(dir_json)
    cv = main(["-model", "DALETOR", "-debug", "-dir_json", str(dir_json)])
    assert cv["aNDCG"].shape == (5,)
