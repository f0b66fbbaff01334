"""Diversification-branch quality experiment (companion of tree_quality.py).

Trains the SRD models on learnable synthetic diversity data
(diversification/data.py::make_synthetic_div_queries: subtopics live in
feature subspaces) and reports test alpha-nDCG@5 against an untrained
scorer — the branch's "quality-verified, not just code-complete" number
for BASELINE.md.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m tools.div_quality
"""

from __future__ import annotations


def protocol_data(seed: int, F: int = 32):
    from ptranking_tpu.diversification.data import (
        DivBucketedDataset, make_synthetic_div_queries)

    mk = lambda n, s: make_synthetic_div_queries(
        num_queries=n, num_features=F, min_docs=10, max_docs=30, seed=s)
    return (DivBucketedDataset(mk(80, seed), batch_queries=8),
            DivBucketedDataset(mk(24, seed + 2000), batch_queries=8))


def run_model(model_id: str, paras, train_ds, test_ds, seed: int,
              epochs: int = 30, F: int = 32):
    from ptranking_tpu.diversification.ranker import DivRanker
    from ptranking_tpu.diversification.scorers import DivScorerConfig
    from ptranking_tpu.train import OptimizerConfig

    cfg = DivScorerConfig(sf_id="pointsf", num_features=F, h_dim=64,
                          num_layers=3)
    r = DivRanker(model_id, cfg, model_paras=paras,
                  opt_cfg=OptimizerConfig(opt="Adam", lr=1e-3), seed=seed).init()
    init_perf = float(r.evaluate(test_ds, ks=(5,))["aNDCG"][0])
    for e in range(1, epochs + 1):
        r.train_epoch(train_ds.batches(shuffle=True, epoch=e), e)
    final = float(r.evaluate(test_ds, ks=(5,))["aNDCG"][0])
    return init_perf, final


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("div_quality")
    p.add_argument("-seeds", default="137,7")
    p.add_argument("-epochs", type=int, default=30)
    args = p.parse_args(argv)

    rows = []
    MODELS = [
        ("DALETOR", {}),
        ("DivProbRanker", {"opt_id": "SuperSoft", "metric": "aNDCG"}),
    ]
    for seed in [int(s) for s in args.seeds.split(",")]:
        train_ds, test_ds = protocol_data(seed)
        for model_id, paras in MODELS:
            label = model_id if not paras else f"{model_id}/{paras['opt_id']}"
            init_perf, final = run_model(model_id, paras, train_ds, test_ds,
                                         seed, epochs=args.epochs)
            rows.append((seed, label, init_perf, final))
            print(f"seed {seed} {label}: aNDCG@5 untrained={init_perf:.4f} "
                  f"trained={final:.4f}", flush=True)
    print("\n| seed | model | untrained aNDCG@5 | trained aNDCG@5 |")
    print("|---|---|---|---|")
    for seed, label, i, f in rows:
        print(f"| {seed} | {label} | {i:.4f} | {f:.4f} |")


if __name__ == "__main__":
    main()
