"""Benchmark: LambdaRank + listwise self-attention (DASALC) training throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = lists/s/chip training the flagship config (136 features, lists
               of 128 docs — the MSLR-WEB30K shape) on the default jax
               platform (the real TPU chip under the driver).
vs_baseline  = value / CPU-reference-lists-per-s. The reference
               (wildltr/ptranking) is CPU/1-GPU torch; BASELINE.json's target
               is >=5x its CPU throughput. The torch-equivalent baseline
               (same scorer shape + LambdaRank semantics, measured with torch
               on this host's CPU) is measured inline when torch is available,
               else a recorded constant from this machine is used.
"""

import json
import time

import numpy as np

N, F = 128, 136          # docs/list, features (WEB30K shape)
B = 512                   # TPU batch: best measured operating point (bf16)
B_TORCH = 32              # CPU torch batch: CPU is rate-saturated already
STEPS = 20
WARMUP = 5
RECORDED_TORCH_CPU_LISTS_PER_S = None  # filled by --record-baseline; see below


def bench_jax() -> float:
    import jax

    from ptranking_tpu.data.dataset import make_synthetic_queries, BucketedDataset
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import AdhocRanker, OptimizerConfig

    cfg = ScorerConfig.default_listsf(num_features=F, dropout=0.1,
                                  compute_dtype="bfloat16")
    ranker = AdhocRanker(
        "LambdaRank", cfg, opt_cfg=OptimizerConfig(opt="Adagrad", lr=1e-3)
    ).init()
    nq = min(B, 256)  # tile a smaller synthetic pool up to the TPU batch
    qs = make_synthetic_queries(num_queries=nq, num_features=F, min_docs=N, max_docs=N, seed=1)
    ds = BucketedDataset(qs, batch_docs=nq * N, buckets=(N,))
    batch = next(iter(ds.batches()))
    reps = B // nq
    feats = np.tile(np.asarray(batch.features), (reps, 1, 1))
    labels = np.tile(np.asarray(batch.labels), (reps, 1))
    mask = np.tile(np.asarray(batch.mask), (reps, 1))

    import jax.numpy as jnp

    feats, labels, mask = jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask)
    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        ranker.params, ranker.opt_state, loss = ranker._compiled_step(
            ranker.params, ranker.opt_state, sub, feats, labels, mask)
    float(loss)  # NOT block_until_ready: on the remote-TPU (axon) backend it
    # can return before queued donated-buffer steps finish, under-measuring by
    # >50x; fetching the value forces a real device->host read.
    t0 = time.perf_counter()
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        ranker.params, ranker.opt_state, loss = ranker._compiled_step(
            ranker.params, ranker.opt_state, sub, feats, labels, mask)
    float(loss)
    dt = time.perf_counter() - t0
    return B * STEPS / dt


def bench_torch_cpu() -> float:
    """Reference-equivalent: torch CPU, same scorer architecture + LambdaRank.

    Mirrors reference list_ranker.py (DASALC wiring) + lambdarank.py loss at
    the same [B, N, F] shapes; trains with Adagrad like the reference listsf
    default. Architecture built from the published structure, not imported.
    """
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    ff_dims = [128, 256, 512]

    def ffn(d_in, d_out, tail_af):
        dims = [d_in, *ff_dims, d_out]
        layers = []
        for i in range(len(dims) - 2):
            layers += [nn.Dropout(0.1), nn.Linear(dims[i], dims[i + 1]), nn.ReLU()]
        layers += [nn.Linear(dims[-2], dims[-1])]
        if tail_af:
            layers += [nn.ReLU()]
        return nn.Sequential(*layers)

    class Encoder(nn.Module):
        def __init__(self, d, n_layers=6, heads=2):
            super().__init__()
            self.layers = nn.ModuleList([
                nn.MultiheadAttention(d, heads, dropout=0.1, batch_first=True)
                for _ in range(n_layers)
            ])
            self.norms = nn.ModuleList([nn.LayerNorm(d) for _ in range(n_layers)])

        def forward(self, x):
            for attn, norm in zip(self.layers, self.norms):
                x = norm(attn(x, x, x, need_weights=False)[0])
            return x

    class DASALC(nn.Module):
        def __init__(self):
            super().__init__()
            self.head = ffn(F, F, True)
            self.enc = Encoder(F)
            self.tail = ffn(F, 1, False)

        def forward(self, x):
            return self.tail((self.enc(x) + 1.0) * self.head(x)).squeeze(-1)

    model = DASALC()
    opt = torch.optim.Adagrad(model.parameters(), lr=1e-3, weight_decay=1e-3)
    x = torch.randn(B_TORCH, N, F)
    labels, _ = torch.sort(torch.randint(0, 5, (B_TORCH, N)).float(), dim=1, descending=True)

    def step():
        preds = model(x)
        desc, inds = torch.sort(preds, dim=1, descending=True)
        pred_rank = torch.gather(labels, 1, inds)
        diffs = desc.unsqueeze(2) - desc.unsqueeze(1)
        p_ij = torch.sigmoid(diffs)
        std_p = 0.5 * (1 + torch.clamp(pred_rank.unsqueeze(2) - pred_rank.unsqueeze(1), -1, 1))
        gains = (2.0 ** pred_rank - 1)
        disc = 1.0 / torch.log2(torch.arange(N).float() + 2.0)
        idcg = ((2.0 ** labels - 1) * disc).sum(1, keepdim=True)
        ngains = gains / idcg
        delta = torch.abs(ngains.unsqueeze(2) - ngains.unsqueeze(1)) * \
            torch.abs(disc.view(-1, 1) - disc.view(1, -1))
        bce = nn.functional.binary_cross_entropy(
            torch.triu(p_ij, 1).clamp(1e-8, 1 - 1e-8), torch.triu(std_p, 1),
            weight=torch.triu(delta, 1), reduction="sum")
        opt.zero_grad()
        bce.backward()
        opt.step()

    for _ in range(2):
        step()
    steps = max(STEPS // 6, 3)
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return B_TORCH * steps / dt


def main():
    value = bench_jax()
    try:
        baseline = bench_torch_cpu()
    except Exception:
        baseline = RECORDED_TORCH_CPU_LISTS_PER_S
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "lists/s/chip (WEB30K-shape LambdaRank + DASALC listsf)",
        "value": round(value, 2),
        "unit": "lists/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
