"""Batch scoring CLI — the serving entry point.

    python -m ptranking_tpu.score -ckpt fold1.pkl -in test.txt -out run.txt \
        -data MQ2008 [-runid myrun]

Reads a LETOR/LibSVM file, restores the ranker from a self-describing
checkpoint (AdhocRanker.from_checkpoint), scores every query in padded
buckets on the accelerator, and writes a TREC-format run file
(qid Q0 docid rank score runid). No reference counterpart — the reference has
no inference path outside its evaluators.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ptranking_tpu.score")
    p.add_argument("-ckpt", required=True, help="self-describing checkpoint (.pkl)")
    p.add_argument("-in", dest="in_path", required=True, help="LETOR/LibSVM file")
    p.add_argument("-out", dest="out_path", required=True, help="TREC run file to write")
    p.add_argument("-data", dest="data_id", default="GLTR_LETOR")
    p.add_argument("-runid", default="ptranking_tpu")
    # ~100-doc batches: BN scorers normalize with BATCH statistics, so
    # serving must mirror the ~100-doc eval batches training validated
    p.add_argument("-batch_docs", type=int, default=100)
    p.add_argument("-quantize", default="none", choices=("none", "int8"),
                   help="int8: per-channel int8 weights + dynamic activation "
                        "scales — the MXU integer path (checkpoints only)")
    return p


def load_ranker(ckpt: str, quantize: str = "none"):
    """Shared serving loader (score_file + ptranking_tpu.serve): a .ptx
    StableHLO artifact (ptranking_tpu.export) serves directly — no model
    code or retracing — otherwise a self-describing checkpoint, optionally
    int8-quantized (models/quantize.py)."""
    from ptranking_tpu.export import ExportedScorer, is_artifact
    from ptranking_tpu.train import AdhocRanker

    if is_artifact(ckpt):
        if quantize != "none":
            raise ValueError(
                "-quantize applies when serving a checkpoint; a .ptx "
                "artifact is already compiled — pass -quantize to "
                "ptranking_tpu.export instead to bake int8 weights in")
        return ExportedScorer(ckpt)
    ranker = AdhocRanker.from_checkpoint(ckpt)
    if quantize == "int8":
        return ranker.quantized()
    if quantize != "none":
        raise ValueError(f"unknown -quantize {quantize!r}")
    return ranker


def score_file(ckpt: str, in_path: str, out_path: str, data_id: str = "GLTR_LETOR",
               runid: str = "ptranking_tpu", batch_docs: int = 100,
               quantize: str = "none") -> int:
    from ptranking_tpu.data.dataset import BucketedDataset
    from ptranking_tpu.data.letor import load_letor_file

    ranker = load_ranker(ckpt, quantize)
    queries = load_letor_file(in_path, data_id=data_id, min_docs=1, min_rele=0,
                              presort=False)
    ds = BucketedDataset(queries, batch_docs=batch_docs)
    docids = _docids_by_qid(in_path, data_id)  # real docids when the file has comments
    rows = 0
    with open(out_path, "w") as f:
        for batch in ds.batches():
            scores = np.asarray(ranker.predict(batch))
            mask = np.asarray(batch.mask)
            for i, qrow in enumerate(np.asarray(batch.qids)):
                if qrow < 0 or not mask[i].any():
                    continue  # all-padded remainder row
                n = int(mask[i].sum())
                order = np.argsort(-scores[i, :n], kind="stable")
                qid = ds.qid_for(batch, i)
                ids = docids.get(qid)
                for rank, j in enumerate(order, start=1):
                    docid = ids[j] if ids is not None else f"{qid}-d{j}"
                    f.write(f"{qid} Q0 {docid} {rank} "
                            f"{scores[i, j]:.6f} {runid}\n")
                    rows += 1
    return rows


def _docids_by_qid(in_path: str, data_id: str):
    """Real docids from LETOR '#docid = X' comments, grouped per qid in file
    order (matching the un-presorted per-query doc order); {} without
    comments."""
    from ptranking_tpu.data.letor import YAHOO_LTR, parse_letor_lines
    from ptranking_tpu.data.meta import get_data_meta

    try:
        has_comment = get_data_meta(data_id).has_comment
    except (NotImplementedError, ValueError):
        # generic GLTR ids raise ValueError without a JSON data section
        # (meta.py); scoring proceeds with has_comment=False
        has_comment = False
    if not has_comment:
        return {}
    with open(in_path, encoding="iso-8859-1") as f:
        parsed = parse_letor_lines(f, has_comment=True,
                                   one_indexed=data_id not in YAHOO_LTR)
    out = {}
    for qid, docid in zip(parsed[2], parsed[3]):
        out.setdefault(qid, []).append(docid)
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    n = score_file(args.ckpt, args.in_path, args.out_path, data_id=args.data_id,
                   runid=args.runid, batch_docs=args.batch_docs,
                   quantize=args.quantize)
    print(f"wrote {n} rows to {args.out_path}")


if __name__ == "__main__":
    main()
