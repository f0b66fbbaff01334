"""Host-side input pipeline: background prefetch of batches onto the device.

The reference feeds each batch synchronously through `.to(device)` inside the
train loop (base/ranker.py:577). On TPU the equivalent anti-pattern is a
blocking `device_put` between steps; this module overlaps host batch assembly
and H2D transfer with device compute:

  * `prefetch_to_device(it, size)` — a bounded background thread stages the
    next `size` batches with `jax.device_put` while the current step runs.
  * `shard_for_process(items, ...)` — multi-host data sharding: each process
    takes its own slice of the query stream (SURVEY §2.10 host-parallel input
    row; the reference is single-process).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence, TypeVar

import jax

from ptranking_tpu.types import RankingBatch

T = TypeVar("T")

_STOP = object()


def prefetch_to_device(batches: Iterable[RankingBatch], size: int = 2,
                       sharding=None) -> Iterator[RankingBatch]:
    """Yield batches whose arrays are already on device.

    A daemon thread pulls from `batches`, calls `jax.device_put` (with the
    given sharding, e.g. a NamedSharding over the `data` axis) and parks up to
    `size` staged batches in a bounded queue. Exceptions in the producer are
    re-raised at the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    abandoned = threading.Event()  # consumer dropped the generator early

    def stage(b: RankingBatch) -> RankingBatch:
        return RankingBatch(
            features=jax.device_put(b.features, sharding),
            labels=jax.device_put(b.labels, sharding),
            mask=jax.device_put(b.mask, sharding),
            qids=b.qids,
        )

    def put_or_bail(item) -> bool:
        # bounded put that gives up when the consumer is gone, so the daemon
        # thread (and its device-resident staged batches) cannot leak
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for b in batches:
                if not put_or_bail(stage(b)):
                    return
        except BaseException as exc:  # surface in the consumer thread
            put_or_bail(exc)
            return
        put_or_bail(_STOP)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _STOP:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        abandoned.set()  # reached on GeneratorExit / early break too


def shard_for_process(items: Sequence[T], process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> Sequence[T]:
    """Each host reads only its slice of the query stream (strided, so label
    and length distributions stay balanced across hosts)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up: `jax.distributed.initialize` when launched as one
    process per host (TPU pods set everything via env); single-process runs
    are a no-op. Returns True when distributed mode is active."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    try:
        return jax.process_count() > 1
    except RuntimeError:
        return False
