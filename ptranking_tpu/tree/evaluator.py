"""TreeLTREvaluator: CV driver for the GBDT branch.

Counterpart of reference TreeLTREvaluator (ltr_tree/eval/ltr_tree.py:23-390):
flat (data, target, group) arrays per fold, LightGBM training with ndcg@5
early stopping, per-query metrics computed from flat pred/group arrays
(cal_metric_at_ks, ltr_tree.py:114-189) — here via the on-device jax metrics.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ptranking_tpu.data import load_letor_file, make_synthetic_queries
from ptranking_tpu.data.meta import get_data_meta
from ptranking_tpu.tree.lambdamart import (
    HAS_LIGHTGBM,
    LightGBMLambdaMART,
    queries_to_flat,
)

LTR_TREE_MODELS = ["LightGBMLambdaMART", "TPUGBDTLambdaMART"]


def cal_metric_at_ks(preds: np.ndarray, labels: np.ndarray, group: np.ndarray,
                     ks=(1, 3, 5, 10, 20, 50)) -> Dict[str, np.ndarray]:
    """Per-query metrics from flat arrays (reference cal_metric_at_ks,
    ltr_tree.py:114-189), computed with the padded on-device metric kernels."""
    import jax.numpy as jnp

    from ptranking_tpu.metrics.adhoc import evaluate_all_at_ks

    group = np.asarray(group).astype(int)
    n_max = int(group.max()) if len(group) else 1
    B = len(group)
    scores = np.full((B, n_max), -1e9, np.float32)
    lab = np.zeros((B, n_max), np.float32)
    mask = np.zeros((B, n_max), bool)
    head = 0
    for i, g in enumerate(group):
        scores[i, :g] = preds[head:head + g]
        lab[i, :g] = labels[head:head + g]
        mask[i, :g] = True
        head += g
    out = evaluate_all_at_ks(jnp.asarray(scores), jnp.asarray(lab), jnp.asarray(mask), tuple(ks))
    return {m: np.asarray(out[m]).mean(axis=0) for m in ("nDCG", "nERR", "AP", "P")}


class TreeLTREvaluator:
    def kfold_cv_eval(self, model_id: str = "LightGBMLambdaMART",
                      data_id: str = "SyntheticMQ", dir_data: Optional[str] = None,
                      dir_output: str = "./tree_output", debug: bool = False,
                      para_dict: Optional[dict] = None,
                      early_stop_rounds: int = 200,
                      cutoffs=(1, 3, 5, 10, 20, 50)) -> Dict[str, np.ndarray]:
        """(reference kfold_cv_eval, ltr_tree.py:223-313)."""
        assert model_id in LTR_TREE_MODELS
        if model_id == "LightGBMLambdaMART" and not HAS_LIGHTGBM:
            # fall back to the native TPU GBDT so the branch always runs
            print(" [tree] lightgbm unavailable -> using the native TPUGBDTLambdaMART")
            model_id = "TPUGBDTLambdaMART"
        meta = get_data_meta(data_id)
        fold_num = 2 if debug else meta.fold_num
        dir_run = os.path.join(dir_output, f"{model_id}_{data_id}")
        os.makedirs(dir_run, exist_ok=True)
        fold_results: List[Dict[str, np.ndarray]] = []
        for fold_k in range(1, fold_num + 1):
            if data_id.startswith("Synthetic"):
                n = 40 if debug else 400
                mk = lambda s: make_synthetic_queries(num_queries=n,
                                                      num_features=meta.num_features, seed=s)
                train_qs, vali_qs, test_qs = mk(fold_k), mk(1000 + fold_k), mk(2000 + fold_k)
            else:
                fold_dir = os.path.join(dir_data, f"Fold{fold_k}")
                ld = lambda name: load_letor_file(os.path.join(fold_dir, name), data_id=data_id)
                train_qs, vali_qs, test_qs = ld("train.txt"), ld("vali.txt"), ld("test.txt")
            if model_id == "TPUGBDTLambdaMART":
                from ptranking_tpu.tree.jax_gbdt import GBDTConfig, TPUGBDTRanker

                cfg = GBDTConfig.from_paras(para_dict,
                                            early_stopping_rounds=early_stop_rounds)
                if debug:
                    cfg.num_trees = min(cfg.num_trees, 50)
                model = TPUGBDTRanker(cfg)
                model.fit(*queries_to_flat(train_qs), vali=queries_to_flat(vali_qs))
                model.save(os.path.join(dir_run, f"fold_{fold_k}.model"))
            else:
                model = LightGBMLambdaMART(para_dict)
                model.fit(queries_to_flat(train_qs), queries_to_flat(vali_qs),
                          early_stopping_rounds=early_stop_rounds)
                model.save_model(os.path.join(dir_run, f"fold_{fold_k}.model"))
            x_test, y_test, g_test = queries_to_flat(test_qs)
            y_pred = model.predict(x_test)
            m = cal_metric_at_ks(y_pred, y_test, g_test, ks=cutoffs)
            fold_results.append(m)
            print(f" Fold-{fold_k} {model_id} test nDCG: "
                  + ", ".join(f"@{k}:{v:.4f}" for k, v in zip(cutoffs, m["nDCG"])))
        cv = {k: np.mean(np.stack([m[k] for m in fold_results]), axis=0)
              for k in fold_results[0]}
        k_rep = 5 if 5 in cutoffs else cutoffs[0]
        print(f"\n{model_id} {fold_num}-fold CV nDCG@{k_rep}: "
              f"{cv['nDCG'][list(cutoffs).index(k_rep)]:.4f}")
        return cv
