"""Standalone model export: serialized StableHLO scoring artifacts.

    python -m ptranking_tpu.export -ckpt fold1.pkl -out model.ptx \
        [-batch_docs 100] [-platforms cpu,tpu]

`jax.export` lowers the trained scorer (params baked in as constants) to a
versioned StableHLO artifact per padded bucket shape. The artifact is
self-contained — serving it needs jax but NOT this framework's model code,
survives framework upgrades (StableHLO forward compatibility), and skips
Python-side retracing at load. The batch scoring CLI accepts artifacts
directly (`python -m ptranking_tpu.score -ckpt model.ptx ...`).

Cross-platform: `-platforms cpu,tpu` produces one artifact servable on
either backend. No reference analogue (the reference serves nothing
outside its evaluators); this is the TPU-deployment counterpart of a
TorchScript/ONNX export.
"""

from __future__ import annotations

import argparse
import pickle
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

ARTIFACT_VERSION = 1
# magic prefix distinguishes artifacts from checkpoint pickles
MAGIC = b"PTRX"


def export_scorer(ckpt_path: str, out_path: str, batch_docs: int = 100,
                  buckets: Optional[Sequence[int]] = None,
                  platforms: Optional[Sequence[str]] = None,
                  max_docs: Optional[int] = None,
                  quantize: str = "none") -> Dict:
    """Export a checkpoint's scorer to a multi-shape StableHLO artifact.

    One entry per padded bucket shape (B, N) with the same B-per-bucket
    rounding as BucketedDataset(batch_docs=...), so the scoring CLI hits a
    compiled entry for every batch. ~100-doc batches stay the default for
    BN-statistics parity (see score.py). Datasets with lists longer than
    DEFAULT_BUCKETS' 1536 cap get extra doubled buckets (3072, 6144, ...)
    exactly like pick_buckets — pass `max_docs` to cover them.
    """
    import jax
    from jax import export as jexport

    from ptranking_tpu.data.dataset import DEFAULT_BUCKETS
    from ptranking_tpu.models import apply_scorer
    from ptranking_tpu.train import AdhocRanker

    ranker = AdhocRanker.from_checkpoint(ckpt_path)
    if quantize == "int8":
        # bake per-channel int8 weights + the dynamic-activation-scale
        # program into the artifact (models/quantize.py) — the served
        # matmuls run the MXU integer path with no load-time step
        ranker = ranker.quantized()
    elif quantize != "none":
        raise ValueError(f"unknown quantize {quantize!r}")
    params, cfg = ranker.params, ranker.scorer_cfg
    F = cfg.num_features

    def predict(feats, mask):
        return apply_scorer(params, cfg, feats, mask, training=False)

    plats = list(platforms) if platforms else [jax.default_backend()]
    # "axon" is this project's remote-TPU PJRT platform; its programs ARE
    # tpu programs (lowering canonicalizes axon -> tpu)
    plats = ["tpu" if p == "axon" else p for p in plats]
    bucket_list = sorted(buckets or DEFAULT_BUCKETS)
    # mirror pick_buckets' doubling past the largest bucket so very long
    # lists (Istella-class) hit a compiled entry too
    while max_docs is not None and bucket_list[-1] < max_docs:
        bucket_list.append(bucket_list[-1] * 2)
    # ONE module per (shape, platform): a single multi-platform module
    # cannot carry platform-exclusive kernels (the Pallas flash branch only
    # lowers for tpu), but per-platform modules each prune to their branch
    entries: Dict[Tuple[int, int], Dict[str, bytes]] = {}
    for n in bucket_list:
        # same rounding as BucketedDataset.batch_size_for — the artifact
        # must hit a compiled entry for every shape the scorer CLI produces
        B = max(1, round(batch_docs / n))
        args = (jax.ShapeDtypeStruct((B, n, F), np.float32),
                jax.ShapeDtypeStruct((B, n), np.bool_))
        entries[(B, n)] = {
            p: jexport.export(jax.jit(predict), platforms=[p])(*args).serialize()
            for p in plats}

    blob = {
        "version": ARTIFACT_VERSION,
        "num_features": F,
        "batch_docs": batch_docs,
        "model_id": ranker.model_id,
        "platforms": plats,
        "entries": entries,
    }
    with open(out_path, "wb") as f:
        f.write(MAGIC)
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
    return blob


def is_artifact(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(len(MAGIC)) == MAGIC


class ExportedScorer:
    """Serve a .ptx artifact: `predict(features [B,N,F], mask [B,N])` ->
    scores [B,N]. Deserializes each shape's program lazily and caches it.
    Duck-types the slice of AdhocRanker that score.py uses."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            assert f.read(len(MAGIC)) == MAGIC, f"{path} is not an artifact"
            self._blob = pickle.load(f)
        assert self._blob["version"] <= ARTIFACT_VERSION
        self.num_features = self._blob["num_features"]
        self.batch_docs = self._blob["batch_docs"]
        self.model_id = self._blob["model_id"]
        # the bucket widths this artifact has compiled entries for — callers
        # bucketing inputs themselves (ptranking_tpu.serve) must use these
        self.buckets = tuple(sorted({n for _, n in self._blob["entries"]}))
        self._fns = {}

    def _fn(self, shape: Tuple[int, int]):
        fn = self._fns.get(shape)
        if fn is None:
            import jax
            from jax import export as jexport

            per_plat = self._blob["entries"].get(shape)
            if per_plat is None:
                raise KeyError(
                    f"no exported entry for batch shape {shape}; artifact has "
                    f"{sorted(self._blob['entries'])}. Score with -batch_docs "
                    f"{self.batch_docs}, or re-export with matching "
                    f"-batch_docs / a larger -max_docs (lists longer than the "
                    f"largest exported bucket need extra doubled buckets)")
            backend = jax.default_backend()
            plat = "tpu" if backend == "axon" else backend
            blob = per_plat.get(plat)
            if blob is None:
                raise KeyError(
                    f"artifact was exported for platforms "
                    f"{sorted(per_plat)} but this process runs on '{plat}'; "
                    f"re-export with -platforms {plat} (or cpu,tpu)")
            fn = self._fns[shape] = jexport.deserialize(bytearray(blob)).call
        return fn

    def predict(self, batch):
        import jax.numpy as jnp

        f = jnp.asarray(batch.features, jnp.float32)
        m = jnp.asarray(batch.mask)
        return self._fn((f.shape[0], f.shape[1]))(f, m)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ptranking_tpu.export")
    p.add_argument("-ckpt", required=True, help="self-describing checkpoint (.pkl)")
    p.add_argument("-out", required=True, help="artifact path to write (.ptx)")
    p.add_argument("-batch_docs", type=int, default=100)
    p.add_argument("-max_docs", type=int, default=None,
                   help="longest list to serve; adds doubled buckets past "
                        "1536 like the dataset's pick_buckets")
    p.add_argument("-platforms", default=None,
                   help="comma list, e.g. cpu,tpu (default: current backend)")
    p.add_argument("-quantize", default="none", choices=("none", "int8"),
                   help="int8: bake per-channel int8 weights into the "
                        "artifact (MXU integer matmuls, quarter-size)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    plats = args.platforms.split(",") if args.platforms else None
    blob = export_scorer(args.ckpt, args.out, batch_docs=args.batch_docs,
                         platforms=plats, max_docs=args.max_docs,
                         quantize=args.quantize)
    print(f"exported {len(blob['entries'])} shapes "
          f"({blob['model_id']}, F={blob['num_features']}, "
          f"platforms={blob['platforms']}) -> {args.out}")
    return blob


if __name__ == "__main__":
    main()
