"""Python driver for the native ndeval oracle (native/ndeval.cpp).

The reference ships TREC's ndeval as a standalone C CLI
(ptranking/metric/srd/ndeval.c) consuming the qrels + run files emitted by
its diversity evaluator (base/ranker.py:437-443,
ltr_diversification/eval/ltr_diversification.py:114-152). Our C++ clone keeps
the same CLI/CSV contract; this module builds it on demand and parses its
output, so tests can cross-check the on-device JAX SRD metrics
(ptranking_tpu/metrics/srd.py) against the official off-device tool.
"""

from __future__ import annotations

import csv
import io
import os
import subprocess
from typing import Dict, List, Optional, Sequence

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def ndeval_binary(rebuild: bool = False) -> Optional[str]:
    """Path to the compiled ndeval binary, building it on demand (atomic,
    lock-guarded — see utils/native_build.py). None without a toolchain."""
    from ptranking_tpu.utils.native_build import build_native

    native = os.path.abspath(_NATIVE_DIR)
    return build_native(os.path.join(native, "ndeval.cpp"),
                        os.path.join(native, "build", "ndeval"),
                        rebuild=rebuild)


def run_ndeval(qrels_path: str, run_path: str, alpha: float = 0.5,
               beta: float = 0.5, traditional: bool = False,
               complete: bool = False, depth: int = 0,
               ) -> Dict[str, Dict[str, float]]:
    """Run ndeval and return {topic (str, incl. 'amean'): {measure: value}}."""
    binary = ndeval_binary()
    if binary is None:
        raise RuntimeError("no C++ toolchain available to build ndeval")
    cmd: List[str] = [binary, "-alpha", str(alpha), "-beta", str(beta)]
    if traditional:
        cmd.append("-traditional")
    if complete:
        cmd.append("-c")
    if depth:
        cmd += ["-M", str(depth)]
    cmd += [qrels_path, run_path]
    proc = subprocess.run(cmd, check=True, capture_output=True, text=True)
    reader = csv.DictReader(io.StringIO(proc.stdout))
    out: Dict[str, Dict[str, float]] = {}
    for row in reader:
        topic = row.pop("topic")
        row.pop("runid", None)
        out[topic] = {k: float(v) for k, v in row.items()}
    return out


def write_qrels(path: str, rows: Sequence[tuple]):
    """rows: (topic, subtopic, docno, judgment)."""
    with open(path, "w") as f:
        for topic, sub, docno, judgment in rows:
            f.write(f"{topic} {sub} {docno} {judgment}\n")


def write_run(path: str, rows: Sequence[tuple], runid: str = "ptranking_tpu"):
    """rows: (topic, docno, rank, score)."""
    with open(path, "w") as f:
        for topic, docno, rank, score in rows:
            f.write(f"{topic} Q0 {docno} {rank} {score:.6f} {runid}\n")
