"""Dispatch-fusion sweep: real-epoch throughput vs scan_steps (K).

The tunneled TPU pays ~1-8 ms per dispatch; the resident gather-fused epoch
issues one dispatch per K-batch chunk, so K sets the dispatch share of epoch
wall-clock. K=8 (the default) was chosen at the streamed-fusion stage
(BASELINE.md dispatch-fusion table) and never re-swept after the resident
path removed per-chunk transfers. This sweep measures the remaining
headroom — run on the real chip:

    python -m tools.bench_dispatch            # K in 4 8 16 32 64
    python -m tools.bench_dispatch 8 128      # custom K list

Prints one row per K (train/eval lists/s on the bench.py real-epoch
protocol: 2000 ragged synthetic queries, 136 features, 512-doc buckets,
LambdaRank bf16) and a final JSON line with the best K.
"""

from __future__ import annotations

import json
import sys
import time


F = 136


def bench_k(scan_steps: int, num_queries: int = 2000) -> dict:
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.data.device_cache import DeviceResidentDataset
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    qs = make_synthetic_queries(num_queries=num_queries, num_features=F, seed=3,
                                min_docs=20, max_docs=250)
    ds = BucketedDataset(qs, batch_docs=512)
    res = DeviceResidentDataset(ds)
    cfg = ScorerConfig.default_listsf(num_features=F, dropout=0.1,
                                      compute_dtype="bfloat16")
    r = AdhocRanker("LambdaRank", cfg, opt_cfg=OptimizerConfig(opt="Adagrad", lr=1e-3),
                    scan_steps=scan_steps).init()
    r.train_epoch_resident(res, 1)  # compile
    t0 = time.perf_counter()
    for e in (2, 3):
        r.train_epoch_resident(res, e)
    dt = time.perf_counter() - t0
    r.evaluate(res, ks=(1, 5))  # compile
    t1 = time.perf_counter()
    r.evaluate(res, ks=(1, 5))
    dt_eval = time.perf_counter() - t1
    return {"K": scan_steps,
            "train_lists_per_s": round(2 * ds.num_queries / dt, 1),
            "eval_lists_per_s": round(ds.num_queries / dt_eval, 1)}


def main(argv=None):
    from ptranking_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    args = list(argv or sys.argv[1:])
    num_queries = 2000
    if args and args[0].startswith("--queries="):  # smoke-test escape hatch
        num_queries = int(args.pop(0).split("=", 1)[1])
    ks = [int(a) for a in args] or [4, 8, 16, 32, 64]
    rows = []
    for k in ks:
        row = bench_k(k, num_queries)
        rows.append(row)
        print(f"K={row['K']:>3}  train {row['train_lists_per_s']:>9} lists/s"
              f"  eval {row['eval_lists_per_s']:>9} lists/s", flush=True)
    best = max(rows, key=lambda r: r["train_lists_per_s"])
    print(json.dumps({"sweep": rows, "best": best}))


if __name__ == "__main__":
    main()
