"""Tests for the native ndeval oracle (native/ndeval.cpp).

Three layers:
 1. CSV contract smoke test on a tiny hand-built case.
 2. Fuzz equivalence against the reference C tool
    (/root/reference/ptranking/metric/srd/ndeval.c, compiled at test time as
    a golden oracle) — byte-identical stdout across option combinations.
 3. Cross-check of the on-device JAX alpha-nDCG (ptranking_tpu/metrics/srd.py)
    against ndeval's alpha-nDCG@k on the same rankings.
"""

import os
import random
import shutil
import subprocess

import numpy as np
import pytest

from ptranking_tpu.metrics.ndeval import (
    ndeval_binary,
    run_ndeval,
    write_qrels,
    write_run,
)

REF_NDEVAL_C = "/root/reference/ptranking/metric/srd/ndeval.c"

pytestmark = pytest.mark.skipif(
    ndeval_binary() is None, reason="no C++ toolchain for ndeval"
)


def _gen_case(seed):
    """Random qrels + run files covering judged/unjudged docs and topics."""
    rng = random.Random(seed)
    topics = rng.sample(range(1, 60), rng.randint(3, 7))
    qrows, rrows = [], []
    for t in topics:
        nsub = rng.randint(1, 6)
        ndocs = rng.randint(2, 30)
        docs = [f"doc{t}-{i:03d}" for i in range(ndocs)]
        for d in docs:
            for s in range(1, nsub + 1):
                if rng.random() < 0.4:
                    qrows.append((t, s, d, rng.choice([0, 1, 1, 2])))
        run_docs = docs + [f"unk{t}-{i}" for i in range(rng.randint(0, 4))]
        rng.shuffle(run_docs)
        for rank, d in enumerate(run_docs, 1):
            rrows.append((f"wt-{t}", d, rank, rng.uniform(-5, 5)))
    rrows.append((99, "xdoc", 1, 1.0))  # run-only topic, no judgments
    return qrows, rrows


def test_csv_contract(tmp_path):
    qrels = tmp_path / "qrels.txt"
    run = tmp_path / "run.txt"
    # topic 1: two subtopics; docA covers both, docB covers subtopic 2
    write_qrels(qrels, [(1, 1, "docA", 1), (1, 2, "docA", 1), (1, 2, "docB", 1)])
    write_run(run, [(1, "docA", 1, 2.0), (1, "docB", 2, 1.0)])
    res = run_ndeval(str(qrels), str(run))
    assert set(res) == {"1", "amean"}
    m = res["1"]
    # the run *is* the greedy ideal here -> all normalized measures are 1
    assert m["alpha-nDCG@5"] == pytest.approx(1.0)
    assert m["nERR-IA@5"] == pytest.approx(1.0)
    assert m["nNRBP"] == pytest.approx(1.0)
    assert m["strec@5"] == pytest.approx(1.0)
    # alpha-DCG@5: docA gains 2, docB's subtopic-2 gain is alpha-discounted:
    # dcg = [2*1, (1-0.5)*1/log2(3)] summed, ideal-ideal normalized from idx 1
    alpha = 0.5
    raw = 2.0 + (1 - alpha) / np.log2(3.0)
    ii = [2.0 / np.log2(i + 2) * (1 - alpha) ** i for i in range(5)]
    assert m["alpha-DCG@5"] == pytest.approx(raw / sum(ii), abs=1e-6)
    # P-IA@5: 3 (doc,subtopic) hits over 5*2 slots
    assert m["P-IA@5"] == pytest.approx(3 / 10)
    assert res["amean"] == m  # single topic


@pytest.mark.skipif(
    not os.path.exists(REF_NDEVAL_C) or shutil.which("cc") is None,
    reason="reference ndeval.c or cc unavailable",
)
def test_fuzz_matches_reference_tool(tmp_path):
    ref_bin = tmp_path / "ndeval_ref"
    subprocess.run(
        ["cc", "-O2", "-o", str(ref_bin), REF_NDEVAL_C, "-lm"],
        check=True, capture_output=True,
    )
    ours = ndeval_binary()
    qp, rp = str(tmp_path / "q.txt"), str(tmp_path / "r.txt")
    option_sets = [[], ["-alpha", "0.3"], ["-traditional"], ["-c"],
                   ["-M", "10"], ["-beta", "0.8"]]
    for seed in range(8):
        qrows, rrows = _gen_case(seed)
        write_qrels(qp, qrows)
        with open(rp, "w") as f:
            for topic, d, rank, score in rrows:
                f.write(f"{topic} Q0 {d} {rank} {score:.4f} fuzzrun\n")
        for extra in option_sets:
            ref = subprocess.run([str(ref_bin), *extra, qp, rp],
                                 capture_output=True, text=True)
            new = subprocess.run([ours, *extra, qp, rp],
                                 capture_output=True, text=True)
            assert new.stdout == ref.stdout, (seed, extra)


def test_alpha_ndcg_matches_jax_metric(tmp_path):
    """ndeval's alpha-nDCG@k == the on-device JAX alpha_ndcg_at_ks when the
    run ranks exactly the judged pool (binary judgments) and the JAX metric is
    fed the ideal ranking built with ndeval's tie-break (larger docno wins)."""
    import jax.numpy as jnp

    from ptranking_tpu.metrics.srd import alpha_ndcg_at_ks

    def ndeval_greedy(rele, alpha=0.5):
        # greedy ideal with ndeval's tie-break: ties -> lexicographically
        # larger docno; with docnos d000..dNNN that's the larger index
        S, N = rele.shape
        gain = np.ones(S)
        remaining = list(range(N))
        order = []
        while remaining:
            best, best_s = None, -1.0
            for d in remaining:
                s = float(np.sum(gain * rele[:, d]))
                if best is None or s > best_s or (s == best_s and d > best):
                    best, best_s = d, s
            gain *= np.where(rele[:, best] > 0, 1.0 - alpha, 1.0)
            order.append(best)
            remaining.remove(best)
        return np.asarray(order)

    rng = np.random.RandomState(7)
    for case in range(5):
        S, N = rng.randint(2, 5), 24
        rele = (rng.rand(S, N) < 0.35).astype(np.float64)
        rele[rng.randint(S), rng.randint(N)] = 1.0  # at least one judgment
        sys_order = rng.permutation(N)
        ideal_order = ndeval_greedy(rele, alpha=0.5)

        mask = jnp.ones(N, bool)
        ndcg_jax = alpha_ndcg_at_ks(
            jnp.asarray(rele[:, sys_order]), jnp.asarray(rele[:, ideal_order]),
            mask, ks=[5, 10, 20], alpha=0.5,
        )

        qp, rp = str(tmp_path / f"q{case}.txt"), str(tmp_path / f"r{case}.txt")
        write_qrels(qp, [(1, s + 1, f"d{d:03d}", int(rele[s, d]))
                         for s in range(S) for d in range(N)])
        write_run(rp, [(1, f"d{d:03d}", rank + 1, float(N - rank))
                       for rank, d in enumerate(sys_order)])
        res = run_ndeval(qp, rp)["1"]
        got = [res["alpha-nDCG@5"], res["alpha-nDCG@10"], res["alpha-nDCG@20"]]
        np.testing.assert_allclose(np.asarray(ndcg_jax), got, atol=1e-5)
