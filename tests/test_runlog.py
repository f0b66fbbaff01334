"""Run-output log capture (reference stdout->file redirect parity,
ltr_adhoc/eval/ltr.py:242-244)."""

import glob
import io
import os
import sys

import numpy as np

from ptranking_tpu.utils.runlog import run_log


def test_run_log_tees_stdout(tmp_path, capsys):
    with run_log(str(tmp_path), enabled=True, debug=False) as path:
        print("hello epoch 1")
    assert path and os.path.exists(path)
    assert "hello epoch 1" in open(path).read()
    assert "hello epoch 1" in capsys.readouterr().out  # still reaches console


def test_run_log_disabled_in_debug(tmp_path):
    with run_log(str(tmp_path), enabled=True, debug=True) as path:
        print("quiet")
    assert path is None
    assert not glob.glob(str(tmp_path / "log_*.txt"))


def test_kfold_cv_eval_writes_log_file(tmp_path):
    """A non-debug point run leaves log_<ts>.txt in the run dir with the
    per-fold throughput line in it."""
    from ptranking_tpu.eval import LTREvaluator
    from ptranking_tpu.eval.settings import DataSetting, EvalSetting, ModelSetting, SFSetting

    ev = LTREvaluator()
    ev.data_setting = DataSetting(debug=False, data_id="SyntheticMQ", dir_data=None)
    ev.eval_setting = EvalSetting(debug=False, dir_output=str(tmp_path))
    ev.sf_setting = SFSetting(debug=False, sf_id="pointsf")
    ev.model_setting = ModelSetting("RankMSE", debug=False)
    data_dict = ev.data_setting.default_setting()
    data_dict["fold_num"] = 1
    eval_dict = ev.eval_setting.default_setting()
    eval_dict.update(epochs=2, do_validation=False, do_log=True, debug=False)
    sf_para = ev.sf_setting.default_setting(data_dict["num_features"])
    perf = ev.kfold_cv_eval(data_dict, eval_dict, sf_para,
                            {"model_id": "RankMSE"})
    assert perf["nDCG"].shape[0] == 6
    logs = glob.glob(str(tmp_path / "**" / "log_*.txt"), recursive=True)
    assert logs, "no log file written in the run dir"
    assert "lists/s" in open(logs[0]).read()
