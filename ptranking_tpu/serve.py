"""HTTP scoring server: rank documents over the wire, stdlib-only.

The reference has no inference path outside its evaluators (SURVEY §2.9);
this rounds out the framework's serving story: a minimal batch-scoring
daemon over a self-describing checkpoint (`.pkl`) or a standalone StableHLO
artifact (`.ptx`, `ptranking_tpu.export`). Requests batch into the same
padded buckets the training pipeline uses, so every request shape hits a
compiled program.

    python -m ptranking_tpu.serve -ckpt model.ptx -port 8080
    python -m ptranking_tpu.serve -ckpt fold1.pkl -quantize int8

API:
  GET  /healthz            -> {"ok": true, "model_id": ..., "num_features": N}
  POST /score              body:
      {"queries": [{"qid": "q1", "docs": [[f0 .. fF-1], ...],
                    "docids": ["d0", ...]          # optional
                   }, ...]}
    -> {"results": [{"qid": "q1", "docids": [...ranked...],
                     "scores": [...sorted desc...]}, ...]}

Scoring is exact batch inference — no model code or retracing per request
when serving an artifact. The server is synchronous (ThreadingHTTPServer
accepts concurrent connections; device dispatch serializes), intended as
the reference implementation of the wire contract rather than a
load-balanced production frontend.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class ScoringService:
    """Checkpoint/artifact -> callable scoring core (shared by HTTP and
    tests; no sockets involved)."""

    def __init__(self, ckpt: str, quantize: str = "none",
                 batch_docs: Optional[int] = None):
        from ptranking_tpu.score import load_ranker

        self.ranker = load_ranker(ckpt, quantize)
        self.num_features = int(getattr(self.ranker, "num_features", 0)
                                or self.ranker.scorer_cfg.num_features)
        self.model_id = self.ranker.model_id
        # artifacts only carry compiled entries for the batch_docs they were
        # exported with — default to (and validate against) that recording
        artifact_bd = getattr(self.ranker, "batch_docs", None)
        if batch_docs is None:
            self.batch_docs = int(artifact_bd or 100)
        else:
            if artifact_bd is not None and int(batch_docs) != int(artifact_bd):
                raise ValueError(
                    f"artifact was exported with batch_docs={artifact_bd}; "
                    f"serve with that value (got {batch_docs})")
            self.batch_docs = int(batch_docs)

    def info(self) -> dict:
        return {"ok": True, "model_id": self.model_id,
                "num_features": self.num_features}

    def score(self, payload: dict) -> dict:
        from ptranking_tpu.data.dataset import BucketedDataset

        queries = payload.get("queries")
        if not isinstance(queries, list) or not queries:
            raise ValueError("body must be {'queries': [...]} (non-empty)")
        parsed = []
        for i, q in enumerate(queries):
            docs = np.asarray(q.get("docs"), np.float32)
            if docs.ndim != 2 or docs.shape[1] != self.num_features:
                raise ValueError(
                    f"queries[{i}].docs must be [n_docs, {self.num_features}]")
            qid = str(q.get("qid", f"q{i}"))
            docids = q.get("docids") or [f"{qid}-d{j}" for j in range(len(docs))]
            if len(docids) != len(docs):
                raise ValueError(f"queries[{i}]: docids/docs length mismatch")
            parsed.append((qid, docs, np.zeros(len(docs), np.float32), docids))

        # one bucketed pass over the whole request (same padding scheme as
        # training); qids are positional indices into `parsed`. Artifacts
        # only carry entries for their exported bucket widths.
        kw = {}
        art_buckets = getattr(self.ranker, "buckets", None)
        if art_buckets:
            kw["buckets"] = art_buckets
        ds = BucketedDataset([(str(k), f, l) for k, (_, f, l, _) in
                              enumerate(parsed)],
                             batch_docs=self.batch_docs,
                             num_features=self.num_features, **kw)
        results = [None] * len(parsed)
        for batch in ds.batches():
            scores = np.asarray(self.ranker.predict(batch))
            mask = np.asarray(batch.mask)
            for row in range(scores.shape[0]):
                if not mask[row].any():
                    continue  # all-padded remainder row
                k = int(ds.qid_for(batch, row))
                qid, _, _, docids = parsed[k]
                n = int(mask[row].sum())
                order = np.argsort(-scores[row, :n], kind="stable")
                # strict-JSON contract: NaN/Infinity tokens are not JSON —
                # non-finite scores (degenerate inputs) become null
                vals = [float(scores[row, j]) for j in order]
                results[k] = {
                    "qid": qid,
                    "docids": [docids[j] for j in order],
                    "scores": [v if np.isfinite(v) else None for v in vals],
                }
        return {"results": results}


def make_server(service: ScoringService, host: str = "127.0.0.1",
                port: int = 8080) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, service.info())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/score":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except Exception as exc:  # malformed JSON / bad headers
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})
                return
            try:
                self._send(200, service.score(payload))
            except ValueError as exc:  # bad request shape/width
                self._send(400, {"error": str(exc)})
            except Exception as exc:
                # server-side fault (e.g. an artifact exported for another
                # platform or batch_docs) — NOT the client's doing
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser("python -m ptranking_tpu.serve")
    p.add_argument("-ckpt", required=True,
                   help="self-describing checkpoint (.pkl) or artifact (.ptx)")
    p.add_argument("-host", default="127.0.0.1")
    p.add_argument("-port", type=int, default=8080)
    p.add_argument("-batch_docs", type=int, default=None,
                   help="docs per padded batch (default: the artifact's "
                        "recorded value, else 100)")
    p.add_argument("-quantize", default="none", choices=("none", "int8"))
    args = p.parse_args(argv)
    service = ScoringService(args.ckpt, quantize=args.quantize,
                             batch_docs=args.batch_docs)
    server = make_server(service, args.host, args.port)
    print(f"serving {service.model_id} (F={service.num_features}) "
          f"on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
