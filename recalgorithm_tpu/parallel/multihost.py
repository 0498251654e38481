"""Multi-host training support: process init + per-host batch assembly.

The reference is strictly single-process (its PS/worker cluster flags are
commented out, wide_and_deep.py:41-51).  This module adds the TPU-pod story:

  * ``initialize()`` — `jax.distributed.initialize` from standard cluster env
    (TPU pods auto-discover; explicit coordinator/process args for manual
    setups), idempotent,
  * ``global_batch()`` — assembles a globally-sharded batch from each host's
    local shard via `jax.make_array_from_process_local_data`: every host
    feeds batch_size/num_processes examples and the resulting arrays are
    sharded over the mesh's ``data`` axis with no cross-host copies,
  * ``host_shard_range()`` — which slice of a global file list / example
    range this host should read (per-host input pipelines).

With these, the Trainer's pjit step runs unchanged on N hosts: gradients
psum over ICI/DCN via the sharded params, embedding exchanges ride the mesh.
"""

from __future__ import annotations

from typing import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recalgorithm_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent jax.distributed.initialize (no-op when single-process)."""
    if jax.process_count() > 1 or getattr(initialize, "_done", False):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process / already initialised — keep local devices
        pass
    initialize._done = True  # type: ignore[attr-defined]


def host_shard_range(total: int) -> tuple[int, int]:
    """[start, end) of a length-``total`` global range owned by this host."""
    pid, n = jax.process_index(), jax.process_count()
    per = total // n
    start = pid * per
    end = total if pid == n - 1 else start + per
    return start, end


def global_batch(
    local_batch: Mapping[str, np.ndarray],
    mesh: Mesh,
    global_batch_size: int,
) -> dict[str, jax.Array]:
    """Host-local shard -> globally data-sharded device arrays.

    Each host passes its (global_batch_size / process_count)-row slice; the
    returned arrays have global shape (global_batch_size, ...) sharded over
    the ``data`` axis with only this host's rows resident locally.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = {}
    for k, v in local_batch.items():
        global_shape = (global_batch_size,) + tuple(v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), global_shape
        )
    return out


def agreed_flag(flag: bool) -> bool:
    """Process-0's flag, agreed by EVERY process (collective broadcast).

    For decisions that must be identical across hosts but derive from
    host-local state (wall clocks drift: the eval_throttle_secs trigger
    firing on step N on one host and N+1 on another would diverge the
    per-step programs inside collectives).  Every process must call this
    at the same point in its step sequence."""
    from jax.experimental import multihost_utils

    return bool(
        multihost_utils.broadcast_one_to_all(np.asarray(flag, np.int32))
    )


def agreed_all(flags, window: int | None = None, reduce_fn=None) -> "np.ndarray":
    """Elementwise AND of per-batch booleans across processes (one collective).

    The compact-scatter executable dispatch (train/loop.py) is a host-side
    per-batch decision; in a multi-process run every host must pick the SAME
    executable or the job deadlocks inside collectives.  Each host passes its
    local window of fits-flags; the return is the global AND per position.
    ``window`` pads short final windows with True so the allgather shape
    stays static; ``reduce_fn`` is injectable for tests.  Single-process:
    passthrough."""
    arr = np.asarray(flags, np.int32)
    n = len(arr)
    if window is not None and n < window:
        arr = np.concatenate([arr, np.ones(window - n, np.int32)])
    if reduce_fn is None:
        if jax.process_count() == 1:
            return arr.astype(bool)[:n]

        def reduce_fn(a):
            from jax.experimental import multihost_utils

            return np.min(multihost_utils.process_allgather(a), axis=0)

    return np.asarray(reduce_fn(arr)).astype(bool)[:n]


def aligned_iterator(it, make_pad, reduce_max=None, window: int = 8):
    """Lock-step eval coordination that PADS short hosts instead of dropping.

    The training-side ``synchronized_iterator`` truncates every host to the
    global-minimum batch count (drop_remainder semantics) — correct for
    training, lossy for eval, where every example must be scored exactly
    once.  Here each window all-reduces the global MAXIMUM count and hosts
    holding fewer batches top up with ``make_pad()`` batches (fully padded,
    zero ``_weights``) so every process enters the same number of collective
    eval steps while no real row is lost.

    ``reduce_max`` (local count -> global max) is injectable for tests; the
    default all-gathers across processes.  Single-process: passthrough.
    """
    it = iter(it)
    if reduce_max is None:
        if jax.process_count() == 1:
            yield from it
            return

        def reduce_max(count: int) -> int:
            from jax.experimental import multihost_utils

            counts = multihost_utils.process_allgather(
                np.asarray(count, np.int32)
            )
            return int(np.max(counts))

    while True:
        buf = []
        for _ in range(window):
            try:
                buf.append(next(it))
            except StopIteration:
                break
        m = reduce_max(len(buf))
        if m == 0:
            return
        yield from buf
        for _ in range(m - len(buf)):
            yield make_pad()
        if m < window:
            return


def synchronized_iterator(it, reduce_min=None, window: int = 8):
    """Lock-step end-of-data coordination for per-host input streams.

    Streaming inputs give each host a disjoint strided set of file chunks
    (data/pipeline.stream_batches), so hosts can run out of data at
    DIFFERENT batch counts when the file tail does not divide evenly.  A
    host that silently leaves the train loop while the others still enter
    the collective step hangs the job.

    Coordination is per WINDOW of ``window`` batches, not per batch: each
    host buffers up to ``window`` items, all-reduces how many it holds,
    and every host yields exactly the global-minimum count — one blocking
    DCN round trip per window instead of per step (end-of-data happens
    once per run; a per-next() allgather would tax the steady-state host
    path the prefetcher cannot hide).  Hosts holding more than the global
    minimum drop the excess — an end-of-data tail of < ``window`` batches,
    mirroring drop_remainder.  Host RAM: ``window`` batches buffered.

    ``reduce_min`` (local count -> global min) is injectable for tests;
    the default all-gathers across processes.  Single-process: a
    transparent passthrough (no collective, no buffering).
    """
    it = iter(it)
    if reduce_min is None:
        if jax.process_count() == 1:
            yield from it
            return

        def reduce_min(count: int) -> int:
            from jax.experimental import multihost_utils

            counts = multihost_utils.process_allgather(
                np.asarray(count, np.int32)
            )
            return int(np.min(counts))

    while True:
        buf = []
        for _ in range(window):
            try:
                buf.append(next(it))
            except StopIteration:
                break
        m = reduce_min(len(buf))
        yield from buf[:m]
        if m < window:
            return
