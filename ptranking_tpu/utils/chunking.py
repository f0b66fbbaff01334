"""Shared same-shape batch chunking for the fused-dispatch loops.

Every fused train/eval pass follows the same shape-aware grouping: collect
consecutive same-shape batches, run a full K-sized chunk through one fused
(scan/vmap) dispatch, and run bucket boundaries and epoch tails per-step so
no remainder-K program is ever compiled. This iterator is that policy,
shared by train/ranker.py, diversification/ranker.py, parallel/train.py and
the adversarial passes (one copy instead of six drifting ones)."""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, List, Tuple


def iter_shape_chunks(
    batches: Iterable,
    chunk_size: int,
    shape_of: Callable = lambda b: b.features.shape,
) -> Iterator[Tuple[List, bool]]:
    """Yield (chunk, fused) pairs. `fused` is True only for full
    `chunk_size`-sized same-shape chunks (and only when chunk_size > 1);
    boundary/tail chunks come out with fused=False for per-step execution."""
    chunk_size = max(int(chunk_size), 1)
    pending: List = []
    last_shape = None
    for b in batches:
        s = shape_of(b)
        if pending and s != last_shape:
            yield pending, False  # bucket boundary
            pending = []
        pending.append(b)
        last_shape = s
        if len(pending) >= chunk_size:
            yield pending, chunk_size > 1
            pending = []
    if pending:
        yield pending, False  # epoch tail
