"""GBDT driver — counterpart of reference testing/ltr_tree/testing_ltr_tree.py.
Runs the native TPU GBDT; switches to LightGBM when installed."""

from ptranking_tpu.tree import TreeLTREvaluator

debug = True
data_id = "SyntheticMQ"
dir_data = None

if __name__ == "__main__":
    TreeLTREvaluator().point_run(model_id="TPUGBDTLambdaMART",
                                 data_id=data_id, dir_data=dir_data,
                                 debug=debug, dir_output="./tree_output/")
