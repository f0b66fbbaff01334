"""Tree-branch quality experiment (VERDICT r3 task 7).

Runs the BASELINE.md synthetic parity protocol (MQ2008-shaped data: 46
features, graded labels, 120/40/40 train/vali/test queries) through:

  * TPUGBDTLambdaMART  (tree/jax_gbdt.py, the native TPU GBDT)
  * LambdaRank + DASALC listsf (the flagship neural config)
  * LightGBM LambdaMART when the package is importable (it is not in this
    image — the guarded row simply reports "unavailable")

and prints a per-seed nDCG@5 table for BASELINE.md.

Usage: JAX_PLATFORMS=cpu python -m tools.tree_quality
"""

from __future__ import annotations

import numpy as np


def protocol_data(seed: int):
    from ptranking_tpu.data.dataset import make_synthetic_queries

    mk = lambda n, s: make_synthetic_queries(
        num_queries=n, num_features=46, seed=s, max_label=3,
        min_docs=10, max_docs=40)
    return mk(120, seed), mk(40, seed + 1000), mk(40, seed + 2000)


def eval_ndcg5(scores_per_query, labels_per_query) -> float:
    """Plain-numpy nDCG@5 mean over queries (oracle-simple on purpose)."""
    vals = []
    for s, l in zip(scores_per_query, labels_per_query):
        order = np.argsort(-s, kind="stable")
        gains = (2.0 ** l[order] - 1.0)[:5]
        disc = 1.0 / np.log2(np.arange(len(gains)) + 2.0)
        dcg = float((gains * disc).sum())
        ig = (2.0 ** np.sort(l)[::-1] - 1.0)[:5]
        idcg = float((ig * disc[:len(ig)]).sum())
        if idcg > 0:
            vals.append(dcg / idcg)
    return float(np.mean(vals))


# nDCG@5-tuned small-data settings (sweep recorded in BASELINE.md): shallow
# trees + fine bins + per-tree feature subsets counter the 120-query
# protocol's overfit; big-data runs should keep the LightGBM-shaped defaults
SMALL_DATA_RECIPE = dict(feature_fraction=0.7, max_depth=4, num_bins=255)


def run_gbdt(train, vali, test, seed: int, **overrides) -> float:
    from ptranking_tpu.tree.jax_gbdt import GBDTConfig, TPUGBDTRanker
    from ptranking_tpu.tree.lambdamart import queries_to_flat

    x_tr, y_tr, g_tr = queries_to_flat(train)
    x_va, y_va, g_va = queries_to_flat(vali)
    x_te, y_te, g_te = queries_to_flat(test)
    cfg = GBDTConfig.from_paras(None, early_stopping_rounds=50, **overrides)
    model = TPUGBDTRanker(cfg)
    model.fit(x_tr, y_tr, g_tr, vali=(x_va, y_va, g_va))
    preds = model.predict(x_te)
    off = np.cumsum(np.concatenate([[0], g_te]))
    return eval_ndcg5(
        [preds[off[i]:off[i + 1]] for i in range(len(g_te))],
        [y_te[off[i]:off[i + 1]] for i in range(len(g_te))])


def run_neural(train, vali, test, seed: int, epochs: int = 30) -> float:
    from ptranking_tpu.data.dataset import BucketedDataset
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    tr_ds = BucketedDataset(train, batch_docs=100, num_features=46)
    te_ds = BucketedDataset(test, batch_docs=100, num_features=46)
    cfg = ScorerConfig.default_listsf(46, dropout=0.1)
    r = AdhocRanker("LambdaRank", cfg,
                    opt_cfg=OptimizerConfig(opt="Adagrad", lr=1e-3), seed=seed)
    r.init()
    for e in range(1, epochs + 1):
        r.train_epoch(tr_ds.batches(shuffle=True, epoch=e), e)
    return float(r.evaluate(te_ds, ks=(5,))["nDCG"][0])


def run_lightgbm(train, vali, test, seed: int):
    try:
        import lightgbm  # noqa: F401
    except ImportError:
        return None
    from ptranking_tpu.tree.lambdamart import LightGBMLambdaMART, queries_to_flat

    model = LightGBMLambdaMART()
    model.fit(queries_to_flat(train), vali=queries_to_flat(vali))
    x_te, y_te, g_te = queries_to_flat(test)
    preds = model.predict(x_te)
    off = np.cumsum(np.concatenate([[0], g_te]))
    return eval_ndcg5(
        [preds[off[i]:off[i + 1]] for i in range(len(g_te))],
        [y_te[off[i]:off[i + 1]] for i in range(len(g_te))])


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("tree_quality")
    p.add_argument("-seeds", default="137,7")
    p.add_argument("-epochs", type=int, default=30, help="neural-row epochs")
    p.add_argument("-trees", type=int, default=None,
                   help="override GBDT num_trees (smoke tests)")
    args = p.parse_args(argv)
    overrides = {"num_trees": args.trees} if args.trees else {}

    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        train, vali, test = protocol_data(seed)
        g = run_gbdt(train, vali, test, seed, **overrides)
        gr = run_gbdt(train, vali, test, seed, **SMALL_DATA_RECIPE, **overrides)
        n = run_neural(train, vali, test, seed, epochs=args.epochs)
        l = run_lightgbm(train, vali, test, seed)
        rows.append((seed, g, gr, n, l))
        print(f"seed {seed}: TPUGBDT(defaults) nDCG@5={g:.4f}  "
              f"TPUGBDT(small-data) nDCG@5={gr:.4f}  "
              f"LambdaRank+DASALC nDCG@5={n:.4f}  "
              f"LightGBM={'%.4f' % l if l is not None else 'unavailable'}",
              flush=True)
    print("\n| seed | TPUGBDT (defaults) | TPUGBDT (small-data recipe) "
          "| LambdaRank+DASALC | LightGBM |")
    print("|---|---|---|---|---|")
    for seed, g, gr, n, l in rows:
        print(f"| {seed} | {g:.4f} | {gr:.4f} | {n:.4f} | "
              f"{'%.4f' % l if l is not None else 'unavailable'} |")


if __name__ == "__main__":
    main()
