"""DivLTREvaluator: 5-fold CV driver for diversified ranking + TREC artifacts.

Counterpart of reference DivLTREvaluator (ltr_diversification/eval/
ltr_diversification.py:28-550): fold splits, per-epoch validation on
aNDCG@5, fold-optimal checkpoints, and the TREC run/qrels writers consumed by
ndeval (reference run writer base/ranker.py:437-443; qrels writer
ltr_diversification.py:114-152).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ptranking_tpu.diversification.data import (
    DIV_SYNTHETIC,
    DivBucketedDataset,
    DivQuery,
    get_div_data_meta,
    load_trec_div_fold,
    make_synthetic_div_queries,
)
from ptranking_tpu.diversification.ranker import DIV_MODELS, DivRanker
from ptranking_tpu.diversification.scorers import DivScorerConfig
from ptranking_tpu.eval.tapes import ValidationTape
from ptranking_tpu.train.optimizer import OptimizerConfig

DIV_DEFAULT_PARAS: Dict[str, dict] = {
    # reference DALETORParameter (daletor.py:73-125): rt=10, top_k=10
    "DALETOR": {"rt": 10.0, "top_k": 10},
    # reference DivProbRankerParameter (div_prob_ranker.py:364-460)
    "DivProbRanker": {"opt_id": "SuperSoft", "metric": "aNDCG", "top_k": 10,
                      "opt_ideal": True, "K": 1, "cluster": False,
                      "sort_id": "ExpRele", "limit_delta": None},
}


def trec_topic_id(qid: str) -> str:
    """TREC qrels topics must be natural numbers (ndeval's qrels parser);
    run-file topics may carry a 'task-' prefix. Extract the trailing digits of
    an arbitrary qid ('divq12' -> '12', 'wt09-3' -> '3'); non-numeric qids
    fall back to a stable hash-derived number."""
    digits = ""
    for c in reversed(str(qid)):
        if c.isdigit():
            digits = c + digits
        elif digits:
            break
    if digits:
        return str(int(digits))
    import zlib
    return str(zlib.crc32(str(qid).encode()) % 100000)


def write_trec_run(path: str, qid: str, docids: Sequence[str], scores: Sequence[float],
                   system: str = "ptranking_tpu"):
    """TREC run rows: qid Q0 docid rank score system (reference
    base/ranker.py:437-443)."""
    with open(path, "a") as f:
        for rank, (d, s) in enumerate(zip(docids, scores), start=1):
            f.write(f"{trec_topic_id(qid)} Q0 {d} {rank} {s:.6f} {system}\n")


def write_div_qrels(path: str, queries: Sequence[DivQuery]):
    """Diversity qrels rows: qid subtopic docid relevance (reference qrels
    writer, ltr_diversification.py:114-152). Requires per-doc ids; we use the
    stored doc order."""
    with open(path, "w") as f:
        for q in queries:
            S, N = q.rele_mat.shape
            for s in range(S):
                for d in range(N):
                    f.write(f"{trec_topic_id(q.qid)} {s + 1} doc{d} {int(q.rele_mat[s, d])}\n")


class DivLTREvaluator:
    def load_fold(self, data_dict, fold_k: int):
        data_id = data_dict["data_id"]
        if data_id in DIV_SYNTHETIC:
            n = 24 if data_dict.get("debug") else 120
            mk = lambda seed: make_synthetic_div_queries(num_queries=n, seed=seed)
            return mk(fold_k), mk(1000 + fold_k), mk(2000 + fold_k)
        # TREC WT: fold qid lists from folder{k}/config.yml (train/vali/test)
        dir_data = data_dict["dir_data"]
        fold_dir = os.path.join(dir_data, f"folder{fold_k}")
        cfg_path = os.path.join(fold_dir, "config.yml")
        split = _load_fold_yaml(cfg_path)
        return tuple(
            load_trec_div_fold(dir_data, split[name], presort=True)
            for name in ("train", "vali", "test")
        )

    def div_cv_eval(self, model_id: str, data_id: str = "SyntheticDiv",
                    dir_data: Optional[str] = None, dir_output: str = "./div_output",
                    debug: bool = False, epochs: Optional[int] = None,
                    model_paras: Optional[dict] = None, sf_id: str = "pointsf",
                    vali_k: int = 5, cutoffs=(1, 3, 5, 10, 20),
                    batch_queries: int = 8, write_run_files: bool = False,
                    rerank_top_k: Optional[int] = None,
                    rerank_discriminator: Optional[str] = None):
        """(reference div_cv_eval, ltr_diversification.py:304-378; epochs
        default 500, div_parameter.py:322-326 — debug shrinks to 5)."""
        assert model_id in DIV_MODELS
        meta = get_div_data_meta(data_id)
        fold_num = 2 if debug else meta["fold_num"]
        epochs = epochs if epochs is not None else (5 if debug else 500)
        paras = {**DIV_DEFAULT_PARAS[model_id], **(model_paras or {})}
        scorer_cfg = DivScorerConfig(
            sf_id=sf_id, num_features=meta["num_features"],
            K=paras.get("K", 1), cluster=paras.get("cluster", False),
            sort_id=paras.get("sort_id", "ExpRele"),
            limit_delta=paras.get("limit_delta"), dropout=0.1,
        )
        data_dict = dict(data_id=data_id, dir_data=dir_data, debug=debug)
        dir_run = os.path.join(dir_output, f"{model_id}_{data_id}_{paras.get('opt_id','')}")
        os.makedirs(dir_run, exist_ok=True)

        fold_metrics: List[Dict[str, np.ndarray]] = []
        for fold_k in range(1, fold_num + 1):
            train_qs, vali_qs, test_qs = self.load_fold(data_dict, fold_k)
            if rerank_top_k is not None:
                # 2-stage mode (reference ltr_diversification.py:296-303,
                # 323-339): a pretrained 1st-stage discriminator keeps only
                # its top-k docs per query before 2nd-stage training
                from ptranking_tpu.diversification.data import rerank_queries

                disc = DivRanker(model_id, scorer_cfg, model_paras=paras,
                                 opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3),
                                 seed=1 + fold_k).init()
                if rerank_discriminator is not None:
                    disc.load(rerank_discriminator.format(fold=fold_k))
                train_qs = rerank_queries(train_qs, disc, rerank_top_k)
                vali_qs = rerank_queries(vali_qs, disc, rerank_top_k)
                test_qs = rerank_queries(test_qs, disc, rerank_top_k)
            train = DivBucketedDataset(train_qs, batch_queries=batch_queries)
            vali = DivBucketedDataset(vali_qs, batch_queries=batch_queries)
            test = DivBucketedDataset(test_qs, batch_queries=batch_queries)
            ranker = DivRanker(model_id, scorer_cfg, model_paras=paras,
                               opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3),
                               seed=137 + fold_k).init()
            tape = ValidationTape(fold_k, epochs, "aNDCG", vali_k, dir_run)
            for epoch_k in range(1, epochs + 1):
                ranker.train_epoch(train.batches(shuffle=True, epoch=epoch_k), epoch_k)
                v = ranker.validation(vali.batches(), k=vali_k)
                tape.epoch_validation(epoch_k, v, ranker)
            opt_path = tape.get_optimal_path()
            if os.path.exists(opt_path):
                ranker.load(opt_path)
            else:
                print("  [warn] no validation checkpoint was saved; "
                      "evaluating the final-epoch params")
            tape.clear_fold_buffer()
            m = ranker.evaluate(test.batches(), ks=cutoffs)
            fold_metrics.append(m)
            andcg_str = ", ".join(f"aNDCG@{k}:{v:.4f}" for k, v in zip(cutoffs, m["aNDCG"]))
            print(f"\n Fold-{fold_k} {model_id} test: {andcg_str}")
            if write_run_files:
                self._write_fold_run(ranker, test_qs, dir_run, fold_k)

        cv = {k: np.mean(np.stack([m[k] for m in fold_metrics]), axis=0)
              for k in fold_metrics[0]}
        print(f"\n{model_id} {fold_num}-fold CV aNDCG: "
              + ", ".join(f"@{k}:{v:.4f}" for k, v in zip(cutoffs, cv["aNDCG"])))
        return cv

    def _write_fold_run(self, ranker, test_qs: Sequence[DivQuery], dir_run: str, fold_k: int):
        """fold_run.txt + qrels for the external ndeval oracle."""
        run_path = os.path.join(dir_run, f"fold_{fold_k}_run.txt")
        if os.path.exists(run_path):
            os.remove(run_path)
        ds = DivBucketedDataset(test_qs, batch_queries=1)
        i = 0
        for batch in ds.batches():
            scores = np.asarray(ranker.predict(batch))[0]
            n = int(batch.doc_mask[0].sum())
            order = np.argsort(-scores[:n])
            q = test_qs_by_bucket_order(ds)[i]
            write_trec_run(run_path, q.qid, [f"doc{j}" for j in order],
                           scores[order].tolist())
            i += 1
        qrels_path = os.path.join(dir_run, f"fold_{fold_k}_qrels.txt")
        write_div_qrels(qrels_path, test_qs)
        self._ndeval_cross_check(qrels_path, run_path)

    @staticmethod
    def _ndeval_cross_check(qrels_path: str, run_path: str):
        """Run the native ndeval oracle (native/ndeval.cpp) over the emitted
        qrels + run, printing its amean row — the off-device cross-check for
        the on-device JAX SRD metrics. No-op if no C++ toolchain exists."""
        try:
            from ptranking_tpu.metrics.ndeval import ndeval_binary, run_ndeval
            if ndeval_binary() is None:
                return
            amean = run_ndeval(qrels_path, run_path)["amean"]
        except Exception as exc:  # oracle is advisory; never fail the run
            print(f" [ndeval oracle unavailable: {exc}]")
            return
        keys = ("alpha-nDCG@5", "alpha-nDCG@10", "ERR-IA@5", "ERR-IA@10",
                "nERR-IA@5", "NRBP", "MAP-IA", "strec@10")
        print(" [ndeval] " + ", ".join(f"{k}:{amean[k]:.4f}" for k in keys))


def test_qs_by_bucket_order(ds: DivBucketedDataset) -> List[DivQuery]:
    out: List[DivQuery] = []
    for b in ds.doc_buckets:
        out.extend(ds._by_bucket[b])
    return out


def _load_fold_yaml(path: str) -> Dict[str, list]:
    """Minimal yaml reader for the fold config {train:[...], vali:[...],
    test:[...]} (reference uses pyyaml, ltr_diversification.py:155-206).
    Accepts either yaml lists or a json file."""
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    out: Dict[str, list] = {}
    current = None
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        if stripped.endswith(":"):
            current = stripped[:-1]
            out[current] = []
        elif stripped.startswith("- "):
            out[current].append(stripped[2:].strip())
        elif ":" in stripped:
            k, v = stripped.split(":", 1)
            out[k.strip()] = [x.strip() for x in v.strip(" []").split(",") if x.strip()]
    return out
