"""Adhoc LTR driver — counterpart of reference testing/ltr_adhoc/
testing_ltr_adhoc.py. Edit models_to_run / data_id / dir_data and run:

    JAX_PLATFORMS=cpu python examples/run_ltr_adhoc.py   # quick debug check
"""

from ptranking_tpu.eval import LTREvaluator

debug = True            # shrinks epochs/folds (the reference's test harness)
data_id = "SyntheticMQ"  # or MQ2008_Super / MSLRWEB30K / ... with dir_data
dir_data = None
dir_output = "./output/"
sf_id = "pointsf"        # 'pointsf' | 'listsf'
grid_search = False

models_to_run = [
    "RankMSE",
    "RankNet",
    "LambdaRank",
    "ListNet",
    "ListMLE",
]

if __name__ == "__main__":
    for model_id in models_to_run:
        evaluator = LTREvaluator()
        evaluator.run(debug=debug, model_id=model_id, sf_id=sf_id,
                      data_id=data_id, dir_data=dir_data, dir_output=dir_output,
                      grid_search=grid_search)
