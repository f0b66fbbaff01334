"""Build (and execute) the tutorial notebooks under tutorial/.

The reference ships six hand-written notebooks (reference tutorial/*.ipynb);
this framework mirrors the same topics — typical LTR methods, IR metrics, the
lambda framework, GBMs, ERM, dataset statistics — rewritten for the JAX/TPU
stack, plus a TPU-scaling tutorial the reference has no counterpart for.
Notebooks are generated from this script so they stay regenerable and
reviewable as code, then executed on CPU with outputs baked in:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/build_tutorials.py [--no-exec] [--only NAME]
"""

from __future__ import annotations

import argparse
import os
import sys
import textwrap

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tutorial")

# every notebook starts with this setup cell (CPU-safe, deterministic)
SETUP = """\
import os, sys
sys.path.insert(0, os.path.abspath(".."))  # run from tutorial/
import numpy as np
import jax, jax.numpy as jnp
import matplotlib.pyplot as plt
np.set_printoptions(precision=4, suppress=True)
print("jax", jax.__version__, "backend:", jax.default_backend())"""


def md(text: str) -> tuple:
    return ("md", textwrap.dedent(text).strip())


def code(text: str) -> tuple:
    return ("code", textwrap.dedent(text).strip())


NOTEBOOKS: dict = {}

# --------------------------------------------------------------------------
# 1. Typical LTR methods: RankNet & LambdaRank end to end
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_demo_ltr"] = [
    md("""
    # Typical learning-to-rank methods with ptranking_tpu: RankNet and LambdaRank

    This tutorial walks through two classic neural LTR methods — **RankNet**
    (pairwise) and **LambdaRank** (its listwise, metric-driven refinement) —
    and trains both end to end on a synthetic LETOR-style dataset.

    Everything here runs on CPU; on a TPU the exact same code compiles onto
    the MXU (the scorer is a batched matmul pipeline) and the whole training
    epoch is fused into a handful of XLA dispatches.

    *Reference counterpart: `tutorial/ptranking_demo_ltr.ipynb` (topics
    mirrored; implementation is this framework's).*
    """),
    code(SETUP),
    md("""
    ## 1. The robust sigmoid

    Both methods squash score differences through a sigmoid
    $\\sigma(x) = 1/(1+e^{-\\sigma_0 x})$. Large negative inputs overflow
    `exp` in fp32, so the framework uses a numerically-robust formulation
    (`ptranking_tpu.ops.sigmoid.robust_sigmoid`) that evaluates the stable
    branch on each side of zero.
    """),
    code("""
    from ptranking_tpu.ops.sigmoid import robust_sigmoid

    x = jnp.linspace(-8, 8, 200)
    fig, ax = plt.subplots(figsize=(5, 3))
    for sigma in (0.5, 1.0, 2.0):
        ax.plot(x, robust_sigmoid(x, sigma), label=f"$\\\\sigma_0$={sigma}")
    ax.set_xlabel("score difference $s_i - s_j$"); ax.set_ylabel("$P(i \\\\succ j)$")
    ax.legend(); ax.set_title("robust sigmoid"); fig.tight_layout()
    # no overflow even far in the tails:
    print(robust_sigmoid(jnp.asarray([-1e4, 1e4]), 1.0))
    """),
    md("""
    ## 2. RankNet: pairwise cross entropy

    RankNet (Burges et al., 2005) models the probability that document $i$
    beats document $j$ as $P_{ij} = \\sigma(s_i - s_j)$ and minimizes the
    cross entropy against the ground-truth pair order. In this framework a
    "model" is just a **pure loss function** over `(scores, labels, mask)` —
    one jitted train step serves the whole zoo.
    """),
    code("""
    from ptranking_tpu.losses import LOSSES

    ranknet = LOSSES["RankNet"]
    scores = jnp.asarray([[2.0, 1.0, 0.5, -0.3]])
    labels = jnp.asarray([[2.0, 0.0, 1.0, 0.0]])   # graded relevance
    mask = jnp.ones_like(labels, dtype=bool)
    print("RankNet loss (scores agree with labels except one swap):",
          float(ranknet(scores, labels, mask)))
    print("RankNet loss (scores reversed):",
          float(ranknet(-scores, labels, mask)))
    """),
    md("""
    ## 3. LambdaRank: weight pairs by |ΔnDCG|

    RankNet treats every mis-ordered pair equally, but nDCG cares much more
    about mistakes at the top of the list. LambdaRank multiplies each pair's
    gradient by $|\\Delta \\mathrm{nDCG}_{ij}|$ — the change in nDCG if $i$
    and $j$ were swapped — which needs no change to the scorer, only to the
    loss. The framework computes the swap deltas as one masked batched
    tensor op (`ops/pairwise.py`), not a Python pair loop.
    """),
    code("""
    lambdarank = LOSSES["LambdaRank"]
    print("LambdaRank loss:", float(lambdarank(scores, labels, mask)))

    # the lambda weights concentrate gradient on top-of-list mistakes:
    g_rn = jax.grad(lambda s: ranknet(s, labels, mask))(scores)
    g_lr = jax.grad(lambda s: lambdarank(s, labels, mask))(scores)
    print("per-doc gradient, RankNet   :", g_rn[0])
    print("per-doc gradient, LambdaRank:", g_lr[0])
    """),
    md("""
    ## 4. An empirical comparison

    We now train both models on a learnable synthetic dataset (labels follow
    a hidden linear teacher, list lengths vary, label marginals are
    zero-heavy like real LTR data) and track test nDCG@5 per epoch.

    `AdhocRanker` compiles one scan-fused train step per (scorer, loss,
    optimizer) triple; `BucketedDataset` pads queries into a few fixed
    shapes so XLA compiles a handful of programs, not one per list length.
    """),
    code("""
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.models.scorers import ScorerConfig
    from ptranking_tpu.train.optimizer import OptimizerConfig
    from ptranking_tpu.train.ranker import AdhocRanker

    NUM_FEATURES = 46
    train_q = make_synthetic_queries(256, num_features=NUM_FEATURES, seed=1)
    test_q = make_synthetic_queries(96, num_features=NUM_FEATURES, seed=2)
    train_ds = BucketedDataset(train_q, batch_docs=1024)
    test_ds = BucketedDataset(test_q, batch_docs=1024)
    print(f"{train_ds.num_queries} train / {test_ds.num_queries} test queries,"
          f" buckets {train_ds.buckets}")
    """),
    code("""
    def fit(model_id, epochs=30):
        ranker = AdhocRanker(
            model_id,
            ScorerConfig(sf_id="pointsf", num_features=NUM_FEATURES),
            opt_cfg=OptimizerConfig(lr=1e-3),
        ).init()
        curve = []
        for epoch in range(epochs):
            loss, stop = ranker.train_epoch(train_ds.batches(shuffle=True, epoch=epoch))
            ndcg5 = float(ranker.evaluate(test_ds, ks=(5,))["nDCG"][0])
            curve.append(ndcg5)
            if stop:
                break
        return curve

    curves = {m: fit(m) for m in ("RankNet", "LambdaRank")}
    """),
    code("""
    fig, ax = plt.subplots(figsize=(6, 3.5))
    for m, c in curves.items():
        ax.plot(range(1, len(c) + 1), c, label=m)
    ax.set_xlabel("epoch"); ax.set_ylabel("test nDCG@5")
    ax.set_title("RankNet vs LambdaRank on synthetic LETOR data")
    ax.legend(); fig.tight_layout()
    for m, c in curves.items():
        print(f"{m:>11}: final test nDCG@5 = {c[-1]:.4f}")
    """),
    md("""
    LambdaRank's metric-weighted pairs typically reach a higher nDCG@5 than
    plain RankNet on graded-relevance data.

    **Where to go next:** the same two models run from the CLI with k-fold
    cross validation, grid search and JSON configs:

    ```bash
    python -m ptranking_tpu.ltr -model LambdaRank -debug
    python -m ptranking_tpu.ltr -frame ltr_adhoc -dir_json configs/
    ```
    """),
]

# --------------------------------------------------------------------------
# 2. Dataset statistics
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_dataset_statistics"] = [
    md("""
    # Dataset statistics

    Before training a ranker it pays to look at the data: how many queries,
    how long are the lists, what does the label distribution look like?
    This tutorial inspects a dataset with
    `ptranking_tpu.data.stats.dataset_statistics`.

    *Reference counterpart: `tutorial/ptranking_demo_dataset_statistics.ipynb`.*
    """),
    code(SETUP),
    md("""
    We use the built-in synthetic LETOR generator here; for a real benchmark
    point `load_letor_file` at e.g. `MQ2008/Fold1/train.txt` or use the CLI:

    ```bash
    python -m ptranking_tpu.data.stats -data MQ2008_Super -dir_data /data/MQ2008/
    python -m ptranking_tpu.data.stats -data SyntheticMQ     # no files needed
    ```
    """),
    code("""
    from ptranking_tpu.data.dataset import make_synthetic_queries
    from ptranking_tpu.data.stats import dataset_statistics, print_statistics

    queries = make_synthetic_queries(512, num_features=46, max_label=2, seed=11)
    stats = dataset_statistics(queries)
    print_statistics(stats, title="SyntheticMQ-like sample")
    """),
    code("""
    sizes = np.asarray([len(q[2]) for q in queries])
    all_labels = np.concatenate([q[2] for q in queries])

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3))
    ax1.hist(sizes, bins=24, edgecolor="white")
    ax1.set_xlabel("documents per query"); ax1.set_ylabel("queries")
    ax1.set_title("list-length distribution")
    vals, counts = np.unique(all_labels, return_counts=True)
    ax2.bar([str(int(v)) for v in vals], counts, edgecolor="white")
    ax2.set_xlabel("relevance label"); ax2.set_ylabel("documents")
    ax2.set_title("label marginal (zero-heavy, as in real LTR data)")
    fig.tight_layout()
    """),
    md("""
    Two properties matter for a TPU-first design:

    - **List lengths vary wildly** → padding every list to the global max
      wastes compute. `BucketedDataset` pads to a small set of bucket widths
      so XLA compiles a handful of shapes and the MXU stays busy.
    - **Labels are zero-heavy** → metrics must divide by *real* queries and
      losses must be exactly padding-invariant; both are tested properties
      of this framework (`tests/test_losses.py` padding-invariance suite).
    """),
]

# --------------------------------------------------------------------------
# 3. IR metrics
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_ir_metrics"] = [
    md("""
    # IR evaluation metrics: P@k, AP, nDCG, ERR

    A review of the standard ad-hoc retrieval metrics, each computed with the
    framework's batched implementations (`ptranking_tpu.metrics.adhoc`). All
    metric kernels are pure `jnp` functions over **label vectors sorted by
    the system's scores**, so a whole evaluation dataset reduces on-device
    with one host sync at the end.

    *Reference counterpart: `tutorial/ptranking_ir_metric.ipynb`.*
    """),
    code(SETUP),
    md("""
    ## Setup: one ranked list

    Take a query with 8 documents, graded labels in $\\{0,1,2\\}$, and a
    system ranking that makes a few mistakes. Metric functions take the
    label vector in **system order** plus the ideal (label-sorted) vector.
    """),
    code("""
    from ptranking_tpu.metrics import adhoc

    # labels in the order the system ranked the documents:
    sys_sorted = jnp.asarray([[2.0, 0.0, 1.0, 0.0, 2.0, 0.0, 1.0, 0.0]])
    ideal = jnp.sort(sys_sorted, axis=1)[:, ::-1]
    n = jnp.asarray([8])          # real (unpadded) list length
    ks = (1, 3, 5, 8)
    print("ideal order:", ideal[0])
    """),
    md("""
    ## Precision@k

    With binary relevance (label > 0), $P@k$ is the fraction of the top $k$
    that is relevant.
    """),
    code("""
    p = adhoc.precision_at_ks(sys_sorted, n, ks)
    for k, v in zip(ks, np.asarray(p)[0]):
        print(f"P@{k} = {float(v):.4f}")
    """),
    md("""
    ## Average Precision

    $AP$ averages precision at each relevant position:
    $AP = \\frac{1}{R} \\sum_{k: rel_k} P@k$. The mean over queries is MAP.
    """),
    code("""
    ap = adhoc.ap_at_ks(sys_sorted, ideal, n, ks)
    for k, v in zip(ks, np.asarray(ap)[0]):
        print(f"AP@{k} = {float(v):.4f}")
    """),
    md("""
    ## nDCG

    DCG rewards graded relevance with a position discount,
    $DCG@k = \\sum_{i=1}^{k} \\frac{2^{rel_i} - 1}{\\log_2(i+1)}$, and nDCG
    normalizes by the ideal ordering's DCG so values are comparable across
    queries.
    """),
    code("""
    ndcg = adhoc.ndcg_at_ks(sys_sorted, ideal, n, ks)
    for k, v in zip(ks, np.asarray(ndcg)[0]):
        print(f"nDCG@{k} = {float(v):.4f}")
    # sanity: the ideal ranking scores 1 everywhere
    print("ideal nDCG:", np.asarray(adhoc.ndcg_at_ks(ideal, ideal, n, ks))[0])
    """),
    md("""
    ## Expected Reciprocal Rank

    ERR models a cascading user who stops at the first satisfying document:
    position $i$ contributes $\\frac{1}{i} R_i \\prod_{j<i}(1-R_j)$ with
    stop probability $R_i = (2^{rel_i}-1)/2^{rel_{max}}$. The framework
    reports the normalized variant nERR (divided by the ideal ERR).
    """),
    code("""
    nerr = adhoc.nerr_at_ks(sys_sorted, ideal, n, ks)
    for k, v in zip(ks, np.asarray(nerr)[0]):
        print(f"nERR@{k} = {float(v):.4f}")
    """),
    md("""
    ## Kendall's τ

    Rank-correlation between two orderings — used for analysis rather than
    leaderboard comparisons.
    """),
    code("""
    # kendall_tau scores one ranking against the natural ascending order
    ascending = jnp.arange(8.0)
    two_swaps = ascending[jnp.asarray([1, 0, 2, 3, 5, 4, 6, 7])]
    print("tau(ascending) =", float(adhoc.kendall_tau(ascending)))
    print("tau(2 swaps)   =", float(adhoc.kendall_tau(two_swaps)))
    print("tau(reversed)  =", float(adhoc.kendall_tau(ascending[::-1])))
    """),
    md("""
    ## Batched, masked, on-device

    Real evaluation never loops per query: `AdhocRanker.evaluate` packs
    same-shape query batches, computes all metrics at all cutoffs inside one
    compiled program per shape, and syncs a single packed vector to the
    host. Padded rows carry zero weight — the means divide by *real*
    queries. For the diversification branch the analogous SRD metrics
    (α-nDCG, ERR-IA, nERR-IA) live in `ptranking_tpu.metrics.srd` and are
    cross-checked against the TREC `ndeval` tool (`native/ndeval.cpp`).
    """),
]

# --------------------------------------------------------------------------
# 4. The lambda framework: RankNet -> LambdaRank -> LambdaMART
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_lambda_framework"] = [
    md("""
    # From RankNet to LambdaRank to LambdaMART

    The "lambda framework" is one idea applied three times: *define the
    gradient you want per document (the λ), and let any learner follow it.*

    1. **RankNet** — λ from pairwise cross entropy.
    2. **LambdaRank** — scale each pair's λ by the metric change |ΔnDCG|.
    3. **LambdaMART** — feed the same λ (and its second derivative) to
       gradient-boosted trees instead of a neural net.

    In a functional JAX framework the λs are not hand-derived — they are
    literally `jax.grad` of the loss. This notebook inspects them directly.

    *Reference counterpart: `tutorial/ptranking_lambda_framework.ipynb`.*
    """),
    code(SETUP),
    md("""
    ## 1. RankNet's λ

    For a pair $(i, j)$ with $i$ more relevant, the cross-entropy gradient
    w.r.t. $s_i$ is $-\\sigma_0 \\, \\sigma(-(s_i - s_j))$ — a pull upward
    that fades as the pair becomes correctly ordered. Summing over pairs
    gives each document's λ. We verify `jax.grad` of the framework's
    RankNet loss against the closed form on a 3-document list.
    """),
    code("""
    from ptranking_tpu.losses import LOSSES
    from ptranking_tpu.ops.sigmoid import robust_sigmoid

    ranknet = LOSSES["RankNet"]
    s = jnp.asarray([[1.2, 0.1, -0.4]])
    y = jnp.asarray([[2.0, 1.0, 0.0]])
    m = jnp.ones_like(y, dtype=bool)

    lam_auto = jax.grad(lambda s_: ranknet(s_, y, m))(s)[0]

    # closed form: for each ordered pair (i beats j), lambda_i -= sig*P(j>i),
    # lambda_j += sig*P(j>i); the framework averages over queries in a batch
    sig = 1.0
    lam_hand = np.zeros(3)
    for i in range(3):
        for j in range(3):
            if y[0, i] > y[0, j]:
                p = float(robust_sigmoid(-(s[0, i] - s[0, j]), sig))
                lam_hand[i] -= sig * p
                lam_hand[j] += sig * p
    print("jax.grad     :", np.asarray(lam_auto))
    print("closed form  :", lam_hand, " (up to the batch-mean scale)")
    print("ratio        :", np.asarray(lam_auto) / lam_hand)
    """),
    md("""
    ## 2. LambdaRank's λ: |ΔnDCG| reweighting

    LambdaRank multiplies each pair's gradient by the nDCG change from
    swapping the pair. The effect is easiest to see by making the list
    longer: mistakes at the **top** now generate much larger λs than the
    same mistake further down.
    """),
    code("""
    lambdarank = LOSSES["LambdaRank"]
    N = 10
    # a perfectly decreasing score vector with labels that disagree at
    # position 0/1 and at position 8/9 symmetrically:
    s10 = jnp.asarray([np.linspace(2.0, -2.0, N)])
    y10 = np.zeros((1, N), np.float32)
    y10[0, 1] = 2.0   # top mistake: best doc ranked 2nd
    y10[0, 9] = 1.0   # bottom mistake: a relevant doc ranked last
    y10 = jnp.asarray(y10)
    m10 = jnp.ones_like(y10, dtype=bool)

    g_rn = np.asarray(jax.grad(lambda s_: ranknet(s_, y10, m10))(s10))[0]
    g_lr = np.asarray(jax.grad(lambda s_: lambdarank(s_, y10, m10))(s10))[0]

    fig, ax = plt.subplots(figsize=(6.5, 3))
    idx = np.arange(N)
    ax.bar(idx - 0.2, -g_rn, width=0.4, label="RankNet λ")
    ax.bar(idx + 0.2, -g_lr, width=0.4, label="LambdaRank λ")
    ax.set_xlabel("rank position"); ax.set_ylabel("λ (pull upward)")
    ax.set_title("LambdaRank concentrates gradient at the top of the list")
    ax.legend(); fig.tight_layout()
    """),
    md("""
    ## 3. LambdaMART: the same λ drives trees

    Replace the neural scorer with an additive forest: each boosting round
    fits a regression tree to the per-document λ (gradient) with a Newton
    step using the hessian. The framework exposes the gradient/hessian pair
    as a standalone objective (`ptranking_tpu.tree.objectives`) consumed by
    both the LightGBM wrapper and the native XLA GBDT
    (`ptranking_tpu.tree.jax_gbdt` — histogram tree growth as one compiled
    program; see the GBM tutorial).
    """),
    code("""
    from ptranking_tpu.tree.objectives import CUSTOM_OBJECTIVES

    lam_newton = CUSTOM_OBJECTIVES["lambdarank_newton"][0]
    target = np.asarray(y10[0], np.float64)
    preds = np.asarray(s10[0], np.float64)
    group = np.asarray([N])
    grad, hess = lam_newton(target, preds, group)
    print("per-doc gradient (tree target):", grad.round(4))
    print("per-doc hessian               :", hess.round(4))
    """),
    md("""
    The three methods share one mental model:

    | method | learner | λ |
    |---|---|---|
    | RankNet | neural net | pairwise CE gradient |
    | LambdaRank | neural net | CE gradient × \\|ΔnDCG\\| |
    | LambdaMART | boosted trees | same as LambdaRank (+ hessian) |

    In this framework the neural variants are entries in the loss registry
    (`LOSSES["RankNet"]`, `LOSSES["LambdaRank"]`, plus the generalized
    `LOSSES["LambdaLoss"]` family) and the tree variant is
    `TPUGBDTRanker(objective="lambdarank_newton")`.
    """),
]

# --------------------------------------------------------------------------
# 5. Gradient boosting
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_gbm"] = [
    md("""
    # Gradient-boosted decision trees for ranking, on XLA

    Gradient boosting builds an additive model $F_T(x) = \\sum_t f_t(x)$
    where each tree $f_t$ is fit to the current loss gradient. With a
    second-order (Newton) step, a leaf containing document set $L$ takes
    value $w_L = -\\frac{\\sum_{i \\in L} g_i}{\\sum_{i \\in L} h_i + \\lambda_2}$
    and a split's gain is the resulting decrease in the quadratic objective.

    This framework implements GBDT **as an XLA program**
    (`ptranking_tpu/tree/jax_gbdt.py`): features are quantile-binned once,
    each level of tree growth is one batched histogram build + split search
    on the accelerator, and inference is a vectorized forest walk. The same
    flat `(data, target, group)` arrays also drive the LightGBM wrapper
    (`tree/lambdamart.py`) when that library is available.

    *Reference counterpart: `tutorial/ptranking_gbm.ipynb`.*
    """),
    code(SETUP),
    md("""
    ## 1. Quantile histogram binning

    Exact split search over fp32 thresholds is memory-bound and
    shape-dynamic — wrong for a TPU. Instead each feature is discretized
    into ≤256 quantile bins **once**; split search then scans bin
    boundaries via histograms of (gradient, hessian) sums. This is the same
    approximation LightGBM makes, expressed as dense tensor ops.
    """),
    code("""
    from ptranking_tpu.tree.jax_gbdt import quantile_bin_edges, bin_features

    rng = np.random.RandomState(0)
    X = rng.randn(2000, 3) * np.asarray([1.0, 10.0, 0.1])
    edges = quantile_bin_edges(X, num_bins=16)
    B = bin_features(X, edges)
    print("bin matrix dtype/shape:", B.dtype, B.shape)
    print("feature 1 bin counts:", np.bincount(B[:, 1], minlength=16))
    """),
    md("""
    ## 2. Train a LambdaMART forest

    `TPUGBDTRanker.fit` consumes flat arrays — `data [D, F]`, `target [D]`,
    `group [Q]` (documents per query) — exactly the GBM data layout of the
    reference. The ranking objective is `lambdarank_newton`: LambdaRank λs
    as gradients with a true positive hessian for the Newton leaf step.
    """),
    code("""
    from ptranking_tpu.data.dataset import make_synthetic_queries
    from ptranking_tpu.tree.jax_gbdt import GBDTConfig, TPUGBDTRanker
    from ptranking_tpu.tree.lambdamart import queries_to_flat

    train_q = make_synthetic_queries(384, num_features=24, seed=5)
    vali_q = make_synthetic_queries(96, num_features=24, seed=6)
    test_q = make_synthetic_queries(96, num_features=24, seed=7)
    data, target, group = queries_to_flat(train_q)
    vdata, vtarget, vgroup = queries_to_flat(vali_q)
    print(f"{len(group)} train queries, {len(target)} documents")

    gbdt = TPUGBDTRanker(cfg=GBDTConfig(
        objective="lambdarank_newton", num_trees=120, max_depth=4,
        learning_rate=0.1, num_bins=64, early_stopping_rounds=30))
    gbdt.fit(data, target, group, vali=(vdata, vtarget, vgroup), verbose=True)
    print("trees kept after early stopping:", len(gbdt.trees))
    """),
    code("""
    from ptranking_tpu.metrics import adhoc

    def flat_ndcg5(model, queries):
        vals = []
        for _, f, l in queries:
            p = model.predict(f)
            order = np.argsort(-p, kind="stable")
            sys_sorted = jnp.asarray(l[order])[None, :]
            ideal = jnp.asarray(np.sort(l)[::-1].copy())[None, :]
            vals.append(float(adhoc.ndcg_at_ks(
                sys_sorted, ideal, jnp.asarray([len(l)]), (5,))[0, 0]))
        return float(np.mean(vals))

    print("GBDT test nDCG@5 :", round(flat_ndcg5(gbdt, test_q), 4))
    """),
    md("""
    ## 3. Why this maps well to a TPU

    - The histogram build is a batched one-hot matmul / segment-sum over a
      `[block, features]` bin tensor — MXU work, not pointer chasing.
    - Tree growth is **level-wise** with a fixed depth, so every level is
      the same static-shape program; XLA compiles it once.
    - Inference walks all trees with `lax.scan` over a stacked forest —
      one dispatch for any number of trees.

    Accuracy-wise the native GBDT lands close to (slightly under) the
    neural flagship on the synthetic parity protocol — the measured numbers
    are in `BASELINE.md`. For exact LightGBM parity semantics use
    `tree/lambdamart.py` where that library exists; the whole tree branch
    (CV, grids, JSON configs) is driven by
    `python -m ptranking_tpu.ltr -frame ltr_tree`.
    """),
]

# --------------------------------------------------------------------------
# 6. Empirical risk minimization
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_empirical_risk_minimization"] = [
    md("""
    # Learning to rank as empirical risk minimization

    Every method in this framework instantiates one template: choose a
    scoring function $f_\\theta$, choose a surrogate loss $\\ell$, and
    minimize the empirical risk

    $$\\hat{R}(\\theta) = \\frac{1}{|Q|} \\sum_{q \\in Q}
      \\ell\\big(f_\\theta(X_q),\\; y_q\\big) .$$

    The true objective — nDCG, ERR, MAP — is piecewise constant in the
    scores (it only depends on the *order*), so its gradient is zero almost
    everywhere. Surrogates differ in how they smooth that step function:
    pointwise regression, pairwise classification, listwise likelihoods, or
    direct smooth approximations of the metric.

    *Reference counterpart: `tutorial/ptranking_empirical_risk_minimization.ipynb`.*
    """),
    code(SETUP),
    md("""
    ## 1. The losses are interchangeable pure functions

    Because a "model" is `(scorer config, loss fn, hyper dict)` and every
    loss has the signature `f(scores, labels, mask, **hyper) -> scalar`,
    swapping the surrogate is a registry lookup — the compiled train step,
    data pipeline and evaluation are shared.
    """),
    code("""
    from ptranking_tpu.losses import LOSSES
    print(sorted(LOSSES))
    """),
    md("""
    ## 2. One experiment, six surrogates

    Same scorer, same optimizer, same data — only the empirical risk
    changes. (Pointwise) RankMSE regresses labels; (pairwise) RankNet
    classifies pairs; (listwise) ListNet matches top-1 permutation
    probabilities, ListMLE maximizes the Plackett–Luce likelihood of the
    ideal order, ApproxNDCG differentiates a smoothed nDCG directly, and
    NeuralNDCG pushes the metric through NeuralSort's relaxed permutation
    matrix (a beyond-reference model, arXiv:2102.07831).
    """),
    code("""
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.models.scorers import ScorerConfig
    from ptranking_tpu.train.optimizer import OptimizerConfig
    from ptranking_tpu.train.ranker import AdhocRanker

    F = 46
    train_ds = BucketedDataset(make_synthetic_queries(256, num_features=F, seed=21),
                               batch_docs=1024)
    test_ds = BucketedDataset(make_synthetic_queries(96, num_features=F, seed=22),
                              batch_docs=1024)

    MODELS = ["RankMSE", "RankNet", "ListNet", "ListMLE", "ApproxNDCG", "NeuralNDCG"]
    results = {}
    for model_id in MODELS:
        r = AdhocRanker(model_id, ScorerConfig(sf_id="pointsf", num_features=F),
                        opt_cfg=OptimizerConfig(lr=1e-3)).init()
        for epoch in range(25):
            r.train_epoch(train_ds.batches(shuffle=True, epoch=epoch))
        perf = r.evaluate(test_ds, ks=(1, 5, 10))
        results[model_id] = np.asarray(perf["nDCG"])
    """),
    code("""
    print(f"{'model':>11} | nDCG@1  nDCG@5  nDCG@10")
    for m, v in sorted(results.items(), key=lambda kv: -kv[1][1]):
        print(f"{m:>11} | {v[0]:.4f}  {v[1]:.4f}  {v[2]:.4f}")
    """),
    md("""
    ## 3. Reading the table

    The ordering of surrogates is dataset- and budget-dependent — which is
    exactly the point of a framework: the controlled comparison costs one
    loop. For a rigorous comparison use the evaluator's k-fold CV + grid
    search (`python -m ptranking_tpu.ltr -frame ltr_adhoc -grid ...`), which
    reports means over folds with the reference's run-dir bookkeeping.

    Two regularizers are built into the shared risk template: weight decay
    on the optimizer (`OptimizerConfig.weight_decay`) and early stopping on
    validation nDCG (the evaluator keeps the best-on-validation checkpoint,
    an implicit capacity control).
    """),
]

# --------------------------------------------------------------------------
# 7. TPU scaling (no reference counterpart)
# --------------------------------------------------------------------------
NOTEBOOKS["ptranking_tpu_scaling"] = [
    md("""
    # Scaling ptranking_tpu: residency, dispatch fusion, and device meshes

    This tutorial has no reference counterpart — it covers the TPU-native
    layer: why the framework keeps datasets device-resident, fuses many
    train steps per dispatch, and how one flag shards training across a
    device mesh. It runs here on **8 virtual CPU devices**, the same
    mechanism the test suite uses; on real hardware the identical code runs
    over ICI-connected TPU chips.
    """),
    code("""
    import os, sys
    sys.path.insert(0, os.path.abspath(".."))  # run from tutorial/
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    print(jax.devices())
    """),
    md("""
    ## 1. Dispatch cost is the silent killer

    A tunneled/remote accelerator pays ~1–8 ms *per dispatch*. Real LTR
    epochs are thousands of small bucketed batches, so a naive
    one-step-per-dispatch loop is dispatch-bound, not compute-bound. Two
    framework answers (measured at ~40× real-epoch training throughput on
    the tunneled TPU — `BASELINE.md`):

    - **Scan fusion**: `AdhocRanker(scan_steps=K)` runs K optimizer steps
      inside one `lax.scan` program → 1/K the dispatches, identical math.
    - **Device residency**: upload the padded bucket arrays to HBM once
      (`data/device_cache.py`, fp32/bf16/int8-quantized), then each fused
      step *gathers* its batches in-program from the resident arrays —
      index vectors are the only per-step host traffic.
    """),
    code("""
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries
    from ptranking_tpu.data.device_cache import DeviceResidentDataset
    from ptranking_tpu.models.scorers import ScorerConfig
    from ptranking_tpu.train.ranker import AdhocRanker

    F = 46
    ds = BucketedDataset(make_synthetic_queries(192, num_features=F, seed=3),
                         batch_docs=1024)
    resident = DeviceResidentDataset(ds)
    print(f"resident: {resident.num_queries} queries, buckets {resident.buckets}")

    ranker = AdhocRanker("LambdaRank", ScorerConfig(num_features=F),
                         scan_steps=8).init()
    loss, stop = ranker.train_epoch_resident(resident, epoch_k=1)
    perf = ranker.evaluate(resident, ks=(5,))
    print(f"one resident epoch: loss={loss:.4f}, nDCG@5={float(perf['nDCG'][0]):.4f}")
    """),
    md("""
    ## 2. Sharding: one flag, XLA inserts the collectives

    `DistributedTrainer` wraps the same ranker in `jax.sharding` + `pjit`
    semantics: batches shard over the `data` mesh axis (DP), parameters can
    shard over `model` (TP), long lists over `seq` (context parallelism via
    ring attention / Ulysses all-to-all), and MDN mixture experts over the
    mesh (EP). There are no hand-written communication calls in the model —
    shardings are annotated, XLA chooses `psum`/`all_gather`/`ppermute`
    that ride the ICI.
    """),
    code("""
    from ptranking_tpu.parallel.mesh import MeshConfig, make_mesh
    from ptranking_tpu.parallel.train import DistributedTrainer

    mesh = make_mesh(MeshConfig(data=4, model=2))
    trainer = DistributedTrainer("LambdaRank",
                                 ScorerConfig(sf_id="listsf", num_features=F),
                                 mesh=mesh)
    trainer.init()
    batches = list(ds.batches())
    loss, _ = trainer.train_epoch(batches)
    print(f"sharded epoch on {mesh.devices.size} devices: loss={loss:.4f}")
    """),
    md("""
    ## 3. Long lists: blockwise attention and context parallelism

    The listwise scorer's self-attention is O(N²) in list length. Two
    regimes:

    - **Single chip, long list**: `ScorerConfig(attn_block_size=...)`
      computes attention blockwise (flash-attention style streaming
      softmax) — 16k-document lists train where dense attention OOMs. On
      TPU, `ScorerConfig(flash_attn=True)` runs the fused Pallas kernel.
    - **Longer still**: `DistributedTrainer(shard_docs=True)` shards the
      *document axis* across the mesh — ring attention for the scorer and a
      ring pairwise loss, with an HLO-level test asserting no full [B, N, N]
      buffer exists in the compiled program.

    ```python
    trainer = DistributedTrainer("LambdaRank", cfg,
                                 mesh=make_mesh(MeshConfig(seq=8)),
                                 shard_docs=True)
    ```

    See `docs/parallel.md` for the full mesh/axis guide and
    `docs/kernel_bench.md` for measured kernel crossovers.
    """),
]


def build(name: str, cells, execute: bool = True) -> str:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    nb.metadata["language_info"] = {"name": "python"}
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbf.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbf.v4.new_code_cell(src))
    path = os.path.join(OUT_DIR, f"{name}.ipynb")
    if execute:
        from nbclient import NotebookClient

        client = NotebookClient(
            nb, timeout=900, kernel_name="python3",
            resources={"metadata": {"path": OUT_DIR}})
        client.execute()
    with open(path, "w") as f:
        nbf.write(nb, f)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-exec", action="store_true",
                    help="write notebooks without executing them")
    ap.add_argument("--only", default=None, help="build a single notebook")
    args = ap.parse_args(argv)
    os.makedirs(OUT_DIR, exist_ok=True)
    names = [args.only] if args.only else list(NOTEBOOKS)
    for name in names:
        print(f"[tutorials] building {name} ...", flush=True)
        path = build(name, NOTEBOOKS[name], execute=not args.no_exec)
        print(f"[tutorials] wrote {os.path.relpath(path, REPO)}")


if __name__ == "__main__":
    sys.exit(main())
