"""Pallas-vs-lax kernel benchmark across (B, N) operating points.

Run on the real TPU chip (default jax platform):

    python tools/bench_kernels.py

Measures the fused pairwise kernels (ops/pallas/pairwise.py:
lambda_rank_pallas / ranknet_pallas, forward+grad) and the Sinkhorn
half-step (ops/pallas/sinkhorn.py) against their lax counterparts, prints a
markdown table, and emits the winner map consumed by
ops/pallas/select.py (docs/kernel_bench.md records the results).
"""

import argparse
import json
import time

import numpy as np


K_INNER = 50  # kernel applications per dispatch: amortizes the remote-TPU
# (axon tunnel) per-call overhead (~3 ms) that would otherwise dominate


def _loop_vg(vg_fn, k=K_INNER):
    """jit a scan that applies value_and_grad k times with a serializing data
    dependency, so ONE dispatch measures k kernel executions."""
    import jax
    import jax.numpy as jnp

    def run(s):
        def body(carry, _):
            v, g = vg_fn(carry)
            return carry + 1e-30 * g, v  # dependency chain, value unchanged

        _, vs = jax.lax.scan(body, s, None, length=k)
        return vs[-1]

    return jax.jit(run)


def _timed(fn, *args, steps=3, warmup=1, inner=K_INNER):
    """Times a jitted fn whose body already loops `inner` kernel steps."""
    for _ in range(warmup):
        out = fn(*args)
    # force a value fetch: on the remote-TPU (axon) backend block_until_ready
    # can return early for queued work (see bench.py)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / (steps * inner)


def bench_pair_losses(points):
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.losses.listwise import lambda_rank
    from ptranking_tpu.losses.pairwise import ranknet
    from ptranking_tpu.ops.pallas import lambda_rank_pallas, ranknet_pallas

    rows = []
    for B, N in points:
        key = jax.random.PRNGKey(0)
        ks, kl = jax.random.split(key)
        scores = jax.random.normal(ks, (B, N))
        labels = jnp.sort(jax.random.randint(kl, (B, N), 0, 5).astype(jnp.float32),
                          axis=1)[:, ::-1]
        mask = jnp.ones((B, N), bool)
        for name, lax_fn, pl_fn in (
            ("lambda_rank", lambda_rank, lambda_rank_pallas),
            ("ranknet", ranknet, ranknet_pallas),
        ):
            lax_vg = jax.value_and_grad(lambda s: lax_fn(s, labels, mask))
            pl_vg = jax.value_and_grad(lambda s: pl_fn(s, labels, mask))
            try:
                t_lax = _timed(_loop_vg(lax_vg), scores)
                t_pl = _timed(_loop_vg(pl_vg), scores)
                v1, _ = jax.jit(lax_vg)(scores)
                v2, _ = jax.jit(pl_vg)(scores)
                ok = bool(jnp.allclose(v1, v2, rtol=1e-3))
            except Exception as exc:
                rows.append(dict(kernel=name, B=B, N=N, error=type(exc).__name__))
                continue
            rows.append(dict(kernel=name, B=B, N=N, lax_us=t_lax * 1e6,
                             pallas_us=t_pl * 1e6,
                             speedup=t_lax / t_pl, match=ok))
    return rows


def bench_sinkhorn(points):
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.ops.pallas import sinkstep_pallas
    from ptranking_tpu.ops.sinkhorn import _safe_log, log_sinkstep

    rows = []
    lam = 0.1
    for B, N in points:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        cost = jnp.abs(jax.random.normal(k1, (B, N, N)))
        mu = jax.nn.softmax(jax.random.normal(k2, (B, N)))
        log_u = _safe_log(jax.nn.softmax(jax.random.normal(k3, (B, N))))
        log_mu = _safe_log(mu)

        def sink_loop(step_fn):
            # the REAL Sinkhorn iteration: feed log_v back as the next log_u —
            # a natural serial chain, one dispatch = K_INNER half-steps
            def run(u0):
                def body(u, _):
                    v = step_fn(u)
                    return v, v[0, 0]

                u, _ = jax.lax.scan(body, u0, None, length=K_INNER)
                return u

            return jax.jit(run)

        lax_loop = sink_loop(lambda u: log_sinkstep(-cost / lam, log_mu, u))
        pl_loop = sink_loop(lambda u: sinkstep_pallas(cost, log_mu, u, lam))
        try:
            t_lax = _timed(lax_loop, log_u)
            t_pl = _timed(pl_loop, log_u)
            ok = bool(jnp.allclose(lax_loop(log_u), pl_loop(log_u),
                                   rtol=1e-3, atol=1e-4))
        except Exception as exc:
            rows.append(dict(kernel="sinkstep", B=B, N=N, error=type(exc).__name__))
            continue
        rows.append(dict(kernel="sinkstep", B=B, N=N, lax_us=t_lax * 1e6,
                         pallas_us=t_pl * 1e6, speedup=t_lax / t_pl, match=ok))
    return rows


def bench_memcap(B=32, N=16384):
    """The Pallas pair kernel's raison d'être: a shape where the lax path's
    [B, N, N] fp32 pair matrix (B*N*N*4 bytes — 32 GB at the default shape)
    cannot fit chip HBM. Runs BOTH paths once (inner=1: one kernel app per
    dispatch — this shape is compute-dominated, no need to amortize) and
    records who survives and how fast. TPU-only; expect lax to fail with a
    RESOURCE_EXHAUSTED compile/alloc error."""
    import jax
    import jax.numpy as jnp

    from ptranking_tpu.losses.listwise import lambda_rank
    from ptranking_tpu.ops.pallas import lambda_rank_pallas

    ks, kl = jax.random.split(jax.random.PRNGKey(0))
    scores = jax.random.normal(ks, (B, N))
    labels = jnp.sort(jax.random.randint(kl, (B, N), 0, 5).astype(jnp.float32),
                      axis=1)[:, ::-1]
    mask = jnp.ones((B, N), bool)
    rows = []
    for name, fn in (("lambda_rank_lax", lambda_rank),
                     ("lambda_rank_pallas", lambda_rank_pallas)):
        vg = jax.value_and_grad(lambda s: fn(s, labels, mask))
        try:
            t = _timed(_loop_vg(vg, k=1), scores, steps=2, inner=1)
            rows.append(dict(kernel=name, B=B, N=N, us=t * 1e6, ok=True))
        except Exception as exc:
            rows.append(dict(kernel=name, B=B, N=N, ok=False,
                             error=f"{type(exc).__name__}: {str(exc)[:120]}"))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true", help="emit JSON rows only")
    ap.add_argument("--memcap", action="store_true",
                    help="run ONLY the memory-capped pair-loss shape "
                         "(B=32, N=16384 fp32: the lax [B,N,N] needs 32 GB; "
                         "the Pallas kernel should be the survivor)")
    args = ap.parse_args()
    import jax

    if args.memcap:
        rows = bench_memcap()
        print(json.dumps({"device": jax.devices()[0].device_kind, "rows": rows}))
        return

    pair_points = [(32, 128), (128, 128), (512, 128), (32, 512),
                   (128, 512), (8, 1408), (32, 1408)]
    sink_points = [(32, 64), (128, 64), (32, 256), (8, 1024), (4, 4096)]
    rows = bench_pair_losses(pair_points) + bench_sinkhorn(sink_points)
    if args.json:
        print(json.dumps({"device": jax.devices()[0].device_kind, "rows": rows}))
        return
    print(f"device: {jax.devices()[0].device_kind}")
    print("| kernel | B | N | lax us | pallas us | speedup | match |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['kernel']} | {r['B']} | {r['N']} | - | - | {r['error']} | - |")
        else:
            print(f"| {r['kernel']} | {r['B']} | {r['N']} | {r['lax_us']:.1f} "
                  f"| {r['pallas_us']:.1f} | {r['speedup']:.2f}x | {r['match']} |")


if __name__ == "__main__":
    main()
