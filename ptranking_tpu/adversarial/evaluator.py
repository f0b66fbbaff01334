"""AdLTREvaluator: adversarial CV driver.

Counterpart of reference AdLTREvaluator (ltr_adversarial/eval/
ltr_adversarial.py:31-393): burn-in, per-epoch minimax training, separate G/D
validation + checkpoints, final fold test on both players. Settings defaults
mirror ad_parameter.py (epochs 50 at :80; 10x burn-in at :126-127).

TPU-first deviation: the reference requires train_rough_batch_size == 1
(ltr_adversarial.py:43) because its machines loop queries in Python; our
machines run batched padded buckets, so any batch size works.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from ptranking_tpu.adversarial.irgan import IRGAN_List, IRGAN_Pair, IRGAN_Point
from ptranking_tpu.adversarial.irfgan import IRFGAN_List, IRFGAN_Pair, IRFGAN_Point
from ptranking_tpu.data import BucketedDataset, make_synthetic_queries
from ptranking_tpu.eval.tapes import ValidationTape
from ptranking_tpu.eval.settings import SFSetting
from ptranking_tpu.data.meta import get_data_meta

LTR_ADVERSARIAL_MODELS = ["IRGAN_Point", "IRGAN_Pair", "IRGAN_List",
                          "IRFGAN_Point", "IRFGAN_Pair", "IRFGAN_List"]

AD_MACHINES = {
    "IRGAN_Point": IRGAN_Point, "IRGAN_Pair": IRGAN_Pair, "IRGAN_List": IRGAN_List,
    "IRFGAN_Point": IRFGAN_Point, "IRFGAN_Pair": IRFGAN_Pair, "IRFGAN_List": IRFGAN_List,
}

AD_DEFAULT_PARAS: Dict[str, dict] = {
    # reference irgan_point.py IRGAN_PointParameter: d/g epochs 1, temp 0.5,
    # DG order, 5 samples
    "IRGAN_Point": {"d_epoches": 1, "g_epoches": 1, "temperature": 0.5,
                    "ad_training_order": "DG", "samples_per_query": 5},
    "IRGAN_Pair": {"d_epoches": 1, "g_epoches": 1, "temperature": 0.5,
                   "ad_training_order": "DG", "samples_per_query": 5, "loss_type": "svm"},
    "IRGAN_List": {"d_epoches": 1, "g_epoches": 1, "temperature": 0.5,
                   "ad_training_order": "DG", "samples_per_query": 5, "top_k": 5,
                   "PL_D": True, "repTrick_D": True, "repTrick_G": False, "dropLog": False},
    "IRFGAN_Point": {"f_div_id": "KL", "d_epoches": 1, "g_epoches": 1,
                     "ad_training_order": "DG", "samples_per_query": 5},
    "IRFGAN_Pair": {"f_div_id": "KL", "d_epoches": 1, "g_epoches": 1,
                    "ad_training_order": "DG", "samples_per_query": 5},
    "IRFGAN_List": {"f_div_id": "KL", "d_epoches": 1, "g_epoches": 1,
                    "ad_training_order": "DG", "samples_per_query": 5, "top_k": 5},
}


class AdLTREvaluator:
    def get_ad_machine(self, model_id: str, sf_para, ad_para_dict, seed: int = 137):
        """(reference get_ad_machine, ltr_adversarial.py:62-78)."""
        return AD_MACHINES[model_id](sf_para=sf_para, ad_para_dict=ad_para_dict, seed=seed)

    def ad_cv_eval(self, model_id: str, data_id: str = "SyntheticMQ",
                   dir_data: Optional[str] = None, dir_output: str = "./ad_output",
                   debug: bool = False, epochs: Optional[int] = None,
                   model_paras: Optional[dict] = None, vali_k: int = 5,
                   cutoffs=(1, 3, 5, 10, 20, 50), batch_docs: int = 512):
        """(reference ad_cv_eval, ltr_adversarial.py:80-246)."""
        assert model_id in LTR_ADVERSARIAL_MODELS
        meta = get_data_meta(data_id)
        fold_num = 2 if debug else meta.fold_num
        epochs = epochs if epochs is not None else (5 if debug else 50)
        paras = {**AD_DEFAULT_PARAS[model_id], **(model_paras or {})}

        sf_setting = SFSetting(debug=debug, sf_id="pointsf")
        sf_para = sf_setting.default_setting(meta.num_features)
        dir_run = os.path.join(dir_output, f"{model_id}_{data_id}")
        os.makedirs(dir_run, exist_ok=True)

        from ptranking_tpu.eval.evaluator import LTREvaluator

        base = LTREvaluator()
        results = {"G": [], "D": []}
        for fold_k in range(1, fold_num + 1):
            if data_id.startswith("Synthetic"):
                n = 40 if debug else 300
                mk = lambda s: make_synthetic_queries(num_queries=n, num_features=meta.num_features,
                                                      seed=s, max_label=meta.max_rele_level or 2)
                train_qs, vali_qs, test_qs = mk(fold_k), mk(1000 + fold_k), mk(2000 + fold_k)
            else:
                data_dict = dict(data_id=data_id, dir_data=dir_data, num_features=meta.num_features,
                                 label_type=meta.label_type, fold_num=fold_num,
                                 train_presort=True, validation_presort=True, test_presort=True,
                                 min_docs=10, min_rele=1, tr_batch_size=batch_docs)
                eval_dict = dict(do_validation=True, do_summary=False, mask_label=False, debug=debug)
                train_ds, test_ds, vali_ds = base.load_data(eval_dict, data_dict, fold_k)
                train_qs = vali_qs = test_qs = None

            if train_qs is not None:
                train_ds = BucketedDataset(train_qs, batch_docs=batch_docs, num_features=meta.num_features)
                vali_ds = BucketedDataset(vali_qs, batch_docs=100, num_features=meta.num_features)
                test_ds = BucketedDataset(test_qs, batch_docs=100, num_features=meta.num_features)

            machine = self.get_ad_machine(model_id, sf_para, paras, seed=137 + fold_k)
            machine.fill_global_buffer(train_ds.batches())
            # burn-in (reference ltr_adversarial.py:126-127: 10 epochs)
            burn = 2 if debug else 10
            for _ in range(burn):
                machine.burn_in(train_data=list(train_ds.batches()))

            g_tape = ValidationTape(fold_k, epochs, "nDCG", vali_k, os.path.join(dir_run, "G"))
            d_tape = ValidationTape(fold_k, epochs, "nDCG", vali_k, os.path.join(dir_run, "D"))
            for epoch_k in range(1, epochs + 1):
                stop = machine.mini_max_train(train_data=list(train_ds.batches(shuffle=True, epoch=epoch_k)))
                if stop:
                    print("adversarial training failed (nan)")
                    break
                g_v = machine.get_generator().validation(vali_ds.batches(), k=vali_k)
                d_v = machine.get_discriminator().validation(vali_ds.batches(), k=vali_k)
                g_tape.epoch_validation(epoch_k, g_v, machine.get_generator())
                d_tape.epoch_validation(epoch_k, d_v, machine.get_discriminator())

            for player, tape, name in ((machine.get_generator(), g_tape, "G"),
                                       (machine.get_discriminator(), d_tape, "D")):
                if os.path.exists(tape.get_optimal_path()):
                    player.load(tape.get_optimal_path())
                tape.clear_fold_buffer()
                m = player.evaluate(test_ds.batches(), ks=cutoffs)
                results[name].append(m["nDCG"])
                print(f" Fold-{fold_k} {model_id} {name} test nDCG: "
                      + ", ".join(f"@{k}:{v:.4f}" for k, v in zip(cutoffs, m["nDCG"])))

        cv = {name: np.mean(np.stack(v), axis=0) for name, v in results.items()}
        print(f"\n{model_id} {fold_num}-fold CV: "
              + " | ".join(f"{n} nDCG@5: {cv[n][2]:.4f}" for n in ("G", "D")))
        return cv
