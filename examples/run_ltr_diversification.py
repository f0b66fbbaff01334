"""Diversification driver — counterpart of reference testing/
ltr_diversification/testing_ltr_diversification.py. Writes TREC run/qrels
files and cross-checks them with the native ndeval oracle."""

from ptranking_tpu.diversification import DivLTREvaluator

debug = True
data_id = "SyntheticDiv"  # or a TREC WebTrack dir with folder*/config.yml
dir_data = None
models_to_run = ["DALETOR", "DivProbRanker"]

if __name__ == "__main__":
    for model_id in models_to_run:
        DivLTREvaluator().point_run(model_id=model_id, data_id=data_id,
                                    dir_data=dir_data, debug=debug,
                                    dir_output="./div_output/",
                                    write_run_files=True)
