"""GBDT branch: LightGBM LambdaMART delegation + custom objectives."""

from ptranking_tpu.tree.objectives import (
    CUSTOM_OBJECTIVES,
    custom_obj_lambdarank,
    custom_obj_listnet,
    custom_obj_ranknet,
    per_query_grad_hess_lambda,
    per_query_grad_hess_listnet,
)
from ptranking_tpu.tree.lambdamart import (
    DEFAULT_LIGHTGBM_PARAS,
    HAS_LIGHTGBM,
    LightGBMLambdaMART,
    load_libsvm,
    queries_to_flat,
    save_libsvm,
)
from ptranking_tpu.tree.settings import (
    TreeDataSetting,
    TreeEvalSetting,
    TreeModelSetting,
)
from ptranking_tpu.tree.evaluator import LTR_TREE_MODELS, TreeLTREvaluator, cal_metric_at_ks

__all__ = [
    "CUSTOM_OBJECTIVES", "custom_obj_lambdarank", "custom_obj_listnet",
    "custom_obj_ranknet", "per_query_grad_hess_lambda", "per_query_grad_hess_listnet",
    "DEFAULT_LIGHTGBM_PARAS", "HAS_LIGHTGBM", "LightGBMLambdaMART",
    "load_libsvm", "queries_to_flat", "save_libsvm",
    "TreeDataSetting", "TreeEvalSetting", "TreeModelSetting",
    "LTR_TREE_MODELS", "TreeLTREvaluator", "cal_metric_at_ks",
]
