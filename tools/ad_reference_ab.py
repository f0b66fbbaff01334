"""Adversarial pair-machine A/B against the reference (VERDICT r3 #4).

Round 3 recorded that IRGAN_Pair/IRFGAN_Pair do not learn on the synthetic
protocol (and on seed 7 end BELOW their random init), with the excuse "the
IRGAN literature reports this sensitivity" — unverified. This tool runs the
REFERENCE's own pair machines (torch CPU, imported from /root/reference,
ltr_adversarial/pairwise/irgan_pair.py:14-308 + irfgan_pair.py) on the SAME
synthetic LETOR files and protocol as tools/ad_quality.py, tracking both
frameworks' G/D test nDCG@5 curves side by side. Either both stagnate (the
excuse becomes evidence) or the divergence localises a porting bug.

Protocol (matching tools/ad_quality.py, adapted to MQ2008 meta so the
reference's loaders accept the files): 96 train / 32 test queries, 46
features, graded 0-2, pointsf 3 layers h_dim 64 (GE/BN), Adam 1e-3,
reference default ad-paras (DG order, d/g_epoches 1, 5 samples/query;
temperature 0.5 / f_div KL), 20 minimax epochs, no burn-in (the reference's
pair burn_in is a no-op, ad_machine.py:19-20 — ours too).

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m tools.ad_reference_ab
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

REF = "/root/reference"
F = 46
TRACK = (1, 2, 4, 6, 8, 10, 14, 20)


def write_protocol_files(seed: int, dir_data: str):
    from ptranking_tpu.data import make_synthetic_queries
    from ptranking_tpu.data.letor import write_letor_file

    mk = lambda n, s: make_synthetic_queries(
        num_queries=n, num_features=F, min_docs=10, max_docs=40,
        max_label=2, seed=s)
    fold = os.path.join(dir_data, "Fold1")
    write_letor_file(mk(96, seed), os.path.join(fold, "train.txt"))
    write_letor_file(mk(32, seed + 2000), os.path.join(fold, "test.txt"))
    return (os.path.join(fold, "train.txt"), os.path.join(fold, "test.txt"))


# ------------------------------------------------------------------- ours

def run_ours(model_id: str, f_train: str, f_test: str, seed: int,
             epochs: int = 20) -> dict:
    from ptranking_tpu.adversarial.evaluator import AD_MACHINES
    from ptranking_tpu.data import BucketedDataset, load_letor_file
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import OptimizerConfig

    common = dict(data_id="MQ2008_Super", min_docs=10, min_rele=1, presort=True)
    train_ds = BucketedDataset(load_letor_file(f_train, **common), batch_docs=512)
    test_ds = BucketedDataset(load_letor_file(f_test, **common), batch_docs=512)
    sf_para = {"scorer": ScorerConfig(sf_id="pointsf", num_features=F,
                                      num_layers=3, h_dim=64),
               "optimizer": OptimizerConfig(opt="Adam", lr=1e-3)}
    machine = AD_MACHINES[model_id](sf_para=sf_para, ad_para_dict={}, seed=seed)
    machine.fill_global_buffer(train_ds.batches())

    def score():
        return {n: round(float(p.evaluate(test_ds, ks=(5,))["nDCG"][0]), 4)
                for n, p in (("G", machine.get_generator()),
                             ("D", machine.get_discriminator()))}

    curve = {0: score()}
    for epoch_k in range(1, epochs + 1):
        machine.mini_max_train(
            train_data=list(train_ds.batches(shuffle=True, epoch=epoch_k)))
        if epoch_k in TRACK:
            curve[epoch_k] = score()
    return curve


# -------------------------------------------------------------- reference

def run_reference(model_id: str, f_train: str, f_test: str, seed: int,
                  epochs: int = 20) -> dict:
    sys.path.insert(0, REF)
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    from ptranking.data.data_utils import (LABEL_TYPE, SPLIT_TYPE, LETORSampler,
                                           LTRDataset)
    from ptranking.ltr_adversarial.pairwise.irfgan_pair import (
        IRFGAN_Pair, IRFGAN_PairParameter)
    from ptranking.ltr_adversarial.pairwise.irgan_pair import (
        IRGAN_Pair, IRGAN_PairParameter)

    data_dict = dict(data_id="MQ2008_Super", num_features=F, has_comment=True,
                     label_type=LABEL_TYPE.MultiLabel, max_rele_level=2,
                     min_docs=10, min_rele=1, binary_rele=False,
                     unknown_as_zero=False, train_presort=True,
                     test_presort=True, validation_presort=True,
                     scale_data=False, scaler_id=None, scaler_level=None,
                     train_rough_batch_size=1, test_rough_batch_size=100)
    eval_dict = dict(mask_label=False)

    def loader(path, split, rough):
        ds = LTRDataset(split_type=split, file=path, data_dict=data_dict,
                        eval_dict=None, presort=True, buffer=False)
        sampler = LETORSampler(data_source=ds, rough_batch_size=rough)
        return torch.utils.data.DataLoader(ds, batch_sampler=sampler,
                                           num_workers=0)

    train = loader(f_train, SPLIT_TYPE.Train, 1)
    test = loader(f_test, SPLIT_TYPE.Test, 100)

    sf_para = {"sf_id": "pointsf", "opt": "Adam", "lr": 1e-3,
               "pointsf": dict(num_features=F, h_dim=64, num_layers=3,
                               AF="GE", TL_AF="S", apply_tl_af=True,
                               BN=True, bn_type="BN", bn_affine=True)}
    if model_id == "IRGAN_Pair":
        ad_para = IRGAN_PairParameter().default_para_dict()
        machine = IRGAN_Pair(eval_dict=eval_dict, data_dict=data_dict,
                             sf_para_dict=sf_para, ad_para_dict=ad_para)
    else:
        ad_para = IRFGAN_PairParameter().default_para_dict()
        machine = IRFGAN_Pair(eval_dict=eval_dict, data_dict=data_dict,
                              sf_para_dict=sf_para, ad_para_dict=ad_para)

    # the reference evaluator resets the players before each fold — without
    # this the players have no point_sf and first scoring raises
    # (ltr_adversarial/eval/ltr_adversarial.py:112, base/point_ranker.py:58)
    machine.reset_generator_discriminator()
    g, d = machine.get_generator(), machine.get_discriminator()
    buffer = {}
    machine.fill_global_buffer(train, dict_buffer=buffer)

    def score():
        with torch.no_grad():
            return {n: round(float(p.ndcg_at_ks(
                        test_data=test, ks=[5],
                        label_type=LABEL_TYPE.MultiLabel,
                        presort=True)[0]), 4)
                    for n, p in (("G", g), ("D", d))}

    curve = {0: score()}
    for epoch_k in range(1, epochs + 1):
        machine.mini_max_train(train_data=train, generator=g,
                               discriminator=d, global_buffer=buffer)
        if epoch_k in TRACK:
            curve[epoch_k] = score()
    return curve


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("ad_reference_ab")
    p.add_argument("-seeds", default="137,7")
    p.add_argument("-models", default="IRGAN_Pair,IRFGAN_Pair")
    p.add_argument("-epochs", type=int, default=20)
    p.add_argument("-out", default=None, help="JSON report path")
    args = p.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",")]
    track = [e for e in TRACK if e <= args.epochs]
    report = {}
    for seed in seeds:
        dir_data = tempfile.mkdtemp(prefix=f"ad_ab_{seed}_")
        f_train, f_test = write_protocol_files(seed, dir_data)
        for model_id in args.models.split(","):
            ours = run_ours(model_id, f_train, f_test, seed,
                            epochs=args.epochs)
            ref = run_reference(model_id, f_train, f_test, seed,
                                epochs=args.epochs)
            report[f"{model_id}@{seed}"] = {"ours": ours, "reference": ref}
            print(f"\nseed {seed} {model_id} (test nDCG@5 per minimax epoch):")
            print("| epoch | ours G | ref G | ours D | ref D |")
            print("|---|---|---|---|---|")
            for e in [0] + track:
                o, r = ours.get(e), ref.get(e)
                if o and r:
                    print(f"| {e} | {o['G']:.4f} | {r['G']:.4f} "
                          f"| {o['D']:.4f} | {r['D']:.4f} |")
            sys.stdout.flush()
    print("\n" + json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
