"""Decompose train-step wall-clock: what actually binds throughput?

Two questions from the round-3 verdict, one tool (run on the real chip):

1. Why does the real-epoch train rate plateau at ~1/3 of the steady-state
   best point (6.8k vs 20.1k lists/s) once dispatch is amortised (K=32)?
   Hypothesis: batch_docs=512 bucketing makes each optimizer step process
   only ~512 docs (B=2..16 lists at N=20..250), so the per-step FIXED work —
   weight-gradient matmuls with a tiny contraction dim, the optimizer
   update over every parameter, scan carry traffic — dominates, and docs/s
   collapses relative to B=512 full batches. Test: sweep batch_docs at
   fixed data; if docs/s rises ~linearly until it approaches the best
   point, the constraint is per-step fixed cost, not dispatch or HBM.

2. Why is bf16 only ~1.26x over fp32 at the best point when the MXU peak
   ratio is 2x? Test: ablate the step into forward / forward+backward /
   +optimizer at both dtypes. The forward is the MXU-bound fraction; the
   backward adds weight-grad matmuls (small-M, tile-starved); the optimizer
   update is dtype-independent fp32 elementwise (HBM-bound). The observed
   ratio is the FLOP-weighted mix.

Usage (real chip; ~2-4 min per experiment):
    python -m tools.profile_step              # all experiments
    python -m tools.profile_step sweep        # batch_docs sweep only
    python -m tools.profile_step growth       # bucket_growth (padding) sweep
    python -m tools.profile_step ablate       # dtype ablation only

Prints markdown tables (pasted into docs/performance.md + BASELINE.md) and
one final JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

F = 136


def _timed(fn, *args, reps=20, warmup=3, fetch=lambda out: None):
    """Median wall-clock of fn(*args) with a device->host value fetch to
    defeat the axon queue-ahead (CLAUDE.md timing note)."""
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_batch(B, N, dtype="bfloat16"):
    import jax.numpy as jnp

    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    cfg = ScorerConfig.default_listsf(num_features=F, dropout=0.1,
                                      compute_dtype=dtype)
    r = AdhocRanker("LambdaRank", cfg,
                    opt_cfg=OptimizerConfig(opt="Adagrad", lr=1e-3)).init()
    nq = min(B, 256)
    qs = make_synthetic_queries(num_queries=nq, num_features=F,
                                min_docs=N, max_docs=N, seed=1)
    ds = BucketedDataset(qs, batch_docs=nq * N, buckets=(N,))
    b = next(iter(ds.batches()))
    reps = max(B // nq, 1)
    feats = jnp.asarray(np.tile(np.asarray(b.features)[:nq], (reps, 1, 1)))
    labels = jnp.asarray(np.tile(np.asarray(b.labels)[:nq], (reps, 1)))
    mask = jnp.asarray(np.tile(np.asarray(b.mask)[:nq], (reps, 1)))
    return r, cfg, feats, labels, mask


# ------------------------------------------------------------ experiment 1

def sweep_batch_docs(batch_docs_list=(512, 1024, 2048, 4096, 8192),
                     num_queries=2000) -> list:
    """Real-epoch protocol (bench.py bench_real_epoch data: 2000 ragged
    queries, 20-250 docs), device-resident gather-fused path, varying only
    the bucketing batch_docs. Reports lists/s, docs/step, steps/epoch."""
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.data.device_cache import DeviceResidentDataset
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    qs = make_synthetic_queries(num_queries=num_queries, num_features=F,
                                seed=3, min_docs=20, max_docs=250)
    cfg = ScorerConfig.default_listsf(num_features=F, dropout=0.1,
                                      compute_dtype="bfloat16")
    rows = []
    for bd in batch_docs_list:
        ds = BucketedDataset(qs, batch_docs=bd)
        res = DeviceResidentDataset(ds)
        r = AdhocRanker("LambdaRank", cfg,
                        opt_cfg=OptimizerConfig(opt="Adagrad", lr=1e-3)).init()
        n_steps = sum(idx.shape[0] for _, idx, _ in
                      res.epoch_index_chunks(True, 2, r.scan_steps))
        r.train_epoch_resident(res, 1)  # compile
        t0 = time.perf_counter()
        for e in (2, 3):
            r.train_epoch_resident(res, e)
        dt = time.perf_counter() - t0
        total_docs = sum(len(l) for _, f, l in qs)
        rows.append({
            "batch_docs": bd,
            "train_lists_per_s": round(2 * ds.num_queries / dt, 1),
            "steps_per_epoch": int(n_steps),
            "docs_per_step": round(total_docs / n_steps, 1),
            "ms_per_step": round(1000 * dt / (2 * n_steps), 3),
        })
        print(f"batch_docs={bd}: {rows[-1]['train_lists_per_s']} lists/s, "
              f"{n_steps} steps/epoch, {rows[-1]['docs_per_step']} docs/step, "
              f"{rows[-1]['ms_per_step']} ms/step", flush=True)
    return rows


# ----------------------------------------------------------- experiment 1b

def sweep_bucket_growth(growths=(2.0, 1.5, 1.25), batch_docs_list=(512, 2048),
                        num_queries=2000) -> list:
    """Padding-occupancy lever (round 5): denser bucket widths cut padded
    FLOPs (~0.75 -> ~0.89 occupancy on 20-250-doc ragged data at growth
    1.25) at the cost of more compiled shapes. Same protocol as
    sweep_batch_docs."""
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.data.device_cache import DeviceResidentDataset
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    qs = make_synthetic_queries(num_queries=num_queries, num_features=F,
                                seed=3, min_docs=20, max_docs=250)
    total_docs = sum(len(l) for _, f, l in qs)
    cfg = ScorerConfig.default_listsf(num_features=F, dropout=0.1,
                                      compute_dtype="bfloat16")
    rows = []
    for bd in batch_docs_list:
        for g in growths:
            ds = BucketedDataset(qs, batch_docs=bd, bucket_growth=g)
            res = DeviceResidentDataset(ds)
            padded = sum(b * len(items)
                         for b, items in ds._by_bucket.items() if items)
            r = AdhocRanker("LambdaRank", cfg,
                            opt_cfg=OptimizerConfig(opt="Adagrad", lr=1e-3)).init()
            r.train_epoch_resident(res, 1)  # compile
            ts = []
            for e in (2, 3, 4, 5):
                t0 = time.perf_counter()
                r.train_epoch_resident(res, e)
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[len(ts) // 2]
            rows.append({
                "batch_docs": bd, "growth": g,
                "buckets": len(ds.buckets),
                "occupancy": round(total_docs / padded, 3),
                "train_lists_per_s": round(ds.num_queries / dt, 1),
            })
            print(f"bd={bd} growth={g}: {rows[-1]['train_lists_per_s']} "
                  f"lists/s, occupancy {rows[-1]['occupancy']}, "
                  f"{rows[-1]['buckets']} bucket shapes", flush=True)
    return rows


# ------------------------------------------------------------ experiment 2

def ablate_step(B=512, N=128) -> dict:
    """Forward / forward+backward / full-step times at bf16 and fp32."""
    import jax

    out = {}
    for dtype in ("bfloat16", "float32"):
        r, cfg, feats, labels, mask = make_batch(B, N, dtype)
        key = jax.random.PRNGKey(0)

        fwd = r._compiled_predict
        t_fwd = _timed(fwd, r.params, feats, mask,
                       fetch=lambda o: float(o[0, 0]))

        # training-mode forward (dropout on), isolated from backward
        from ptranking_tpu.models import apply_scorer

        @jax.jit
        def fwd_train(params, key, f, m):
            return apply_scorer(params, cfg, f, m, training=True, key=key)

        t_fwd_train = _timed(fwd_train, r.params, key, feats, mask,
                             fetch=lambda o: float(o[0, 0]))

        from ptranking_tpu.losses import get_loss

        loss_fn = get_loss("LambdaRank")
        paras = r.model_paras

        @jax.jit
        def grad_only(params, key, f, l, m):
            def loss_of(p):
                s = apply_scorer(p, cfg, f, m, training=True, key=key)
                return loss_fn(s, l, m, label_type=r.label_type, **paras)
            return jax.value_and_grad(loss_of)(params)

        t_grad = _timed(grad_only, r.params, key, feats, labels, mask,
                        fetch=lambda o: float(o[0]))

        def full(params, opt_state, key, f, l, m):
            return r._compiled_step(params, opt_state, key, f, l, m)

        # non-donating wrapper would retrace; time the real step on rotating
        # state instead (donation makes reuse of old buffers illegal)
        state = {"p": r.params, "o": r.opt_state}

        def step_closure(_):
            nonlocal state
            p, o, loss = r._compiled_step(state["p"], state["o"], key,
                                          feats, labels, mask)
            state = {"p": p, "o": o}
            return loss

        t_full = _timed(step_closure, None, fetch=lambda o: float(o))

        out[dtype] = {
            "fwd_ms": round(1e3 * t_fwd, 3),
            "fwd_train_ms": round(1e3 * t_fwd_train, 3),
            "fwd_bwd_ms": round(1e3 * t_grad, 3),
            "full_step_ms": round(1e3 * t_full, 3),
            "bwd_ms": round(1e3 * (t_grad - t_fwd_train), 3),
            "opt_ms": round(1e3 * (t_full - t_grad), 3),
        }
        print(f"{dtype}: fwd {out[dtype]['fwd_ms']} ms, fwd(train) "
              f"{out[dtype]['fwd_train_ms']} ms, fwd+bwd {out[dtype]['fwd_bwd_ms']} ms, "
              f"full {out[dtype]['full_step_ms']} ms", flush=True)
    for k in ("fwd_ms", "fwd_bwd_ms", "full_step_ms"):
        a, b = out["float32"][k], out["bfloat16"][k]
        out.setdefault("fp32_over_bf16", {})[k] = round(a / b, 2) if b else None
    return out


def main(argv=None):
    from ptranking_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args = list(argv or sys.argv[1:])
    which = args[0] if args else "both"
    report = {}
    if which in ("both", "sweep"):
        print("## batch_docs sweep (real-epoch protocol, resident, bf16)")
        report["sweep"] = sweep_batch_docs()
    if which in ("both", "growth"):
        print("## bucket_growth sweep (padding-occupancy lever)")
        report["growth"] = sweep_bucket_growth()
    if which in ("both", "ablate"):
        print("## step ablation at the best point (B=512, N=128)")
        report["ablate"] = ablate_step()
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
