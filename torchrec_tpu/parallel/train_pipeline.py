"""Training pipeline with device prefetch.

ref: torchrec/distributed/train_pipeline.py — `TrainPipelineBase` (:74,
2-stage memcpy/compute overlap via CUDA streams) and
`TrainPipelineSparseDist` (:422, 3-stage overlap via FX-rewriting
ShardedModule.forward to consume a pre-issued input_dist).

TPU re-design: none of that machinery is needed. One jitted train step
contains input-dist collectives, lookup, output-dist, dense fwd/bwd and
both optimizers; XLA's async scheduler overlaps the collectives with
compute *inside* the step, and dispatch is asynchronous so the host can
stage batch i+k while the device runs batch i. What remains worth doing
explicitly is keeping a couple of batches resident on device ahead of
time — `jax.device_put` is async, so this pipeline simply maintains a
small prefetch queue, giving the same 2-deep batch overlap as the
reference's memcpy stream (TRAIN_PIPELINE_STAGES=3, ref
examples/dlrm/dlrm_main.py:58).
"""

from __future__ import annotations

import collections
import concurrent.futures
from typing import Any, Callable, Iterator, Optional

import jax


class TrainPipeline:
    """Iterator-driven train loop with K-deep threaded device prefetch.

    train_step: (state, batch) -> (state, loss, aux) — a jitted function.
    state is held internally; `progress(it)` runs one step and returns
    (loss, aux), raising StopIteration when the iterator is exhausted
    (mirroring the reference's progress() contract,
    ref train_pipeline.py:499-552).

    Host batch prep + host->device transfer run on a thread pool so
    uploads overlap device compute AND each other (the reference's
    memcpy-stream overlap; on remote-attached TPUs transfer latency is
    the dominant cost and threading pipelines it away).
    """

    def __init__(
        self,
        train_step: Callable,
        state: Any,
        prefetch_depth: int = 3,
        device_put: Optional[Callable] = None,
    ):
        self._train_step = train_step
        self.state = state
        self._depth = max(1, prefetch_depth)
        self._queue: collections.deque = collections.deque()  # of futures
        self._device_put = device_put or jax.device_put
        self._pool = concurrent.futures.ThreadPoolExecutor(self._depth)

    def _fill(self, it: Iterator) -> None:
        # next(it) stays on the caller's thread (iterator order/safety);
        # only the upload is offloaded
        while len(self._queue) < self._depth:
            try:
                batch = next(it)
            except StopIteration:
                return
            self._queue.append(self._pool.submit(self._device_put, batch))

    def progress(self, it: Iterator):
        self._fill(it)
        if not self._queue:
            raise StopIteration
        batch = self._queue.popleft().result()
        self._fill(it)
        self.state, loss, aux = self._train_step(self.state, batch)
        return loss, aux

    def close(self) -> None:
        """Shut the upload pool down (also safe to call twice)."""
        self._pool.shutdown(wait=False)

    def __del__(self):  # noqa: D105 - best-effort resource cleanup
        try:
            self._pool.shutdown(wait=False)
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass


class SparseDistPipeline(TrainPipeline):
    """3-stage pipeline: batch i+1's sparse input dist runs INSIDE batch
    i's step program (ref: TrainPipelineSparseDist,
    train_pipeline.py:422-536 — 3-stage overlap via pre-issued input
    dists on a side stream; here the pre-gathered ids are an extra
    output/input of ONE jitted step, so XLA overlaps the id all_gathers
    with batch i's dense compute, no streams or FX rewrites).

    Numerics are identical to TrainPipeline/make_train_step (the same
    collectives run, one batch earlier). EBCs and ECs both prefetch;
    modules that cannot (feature processors, UVM, towers) transparently
    gather in-step.
    On the final batch the step re-dists the last batch as a throwaway
    placeholder to keep the compiled program static; exhausting an
    iterator resets the primed dist, so one pipeline can be reused
    across epochs (fresh iterators) without consuming a stale dist.
    """

    def __init__(
        self,
        dmp,
        state: Any,
        loss_fn: Optional[Callable] = None,
        prefetch_depth: int = 3,
        device_put: Optional[Callable] = None,
    ):
        # need batch i+1 resident to fuse its dist into step i
        super().__init__(
            dmp.make_prefetched_train_step(loss_fn=loss_fn),
            state,
            prefetch_depth=max(2, prefetch_depth),
            device_put=device_put,
        )
        self._dmp = dmp
        self._prime = jax.jit(dmp.input_dist)
        self._dists = None

    @staticmethod
    def _as_args(batch) -> tuple:
        return batch if isinstance(batch, tuple) else (batch,)

    def progress(self, it: Iterator):
        self._fill(it)
        if not self._queue:
            # epoch boundary: the primed dist belongs to the exhausted
            # iterator's last batch — drop it so a future iterator
            # re-primes from ITS first batch
            self._dists = None
            raise StopIteration
        args = self._as_args(self._queue.popleft().result())
        self._fill(it)
        sb = self._dmp._find_sparse_arg(args)
        if self._dists is None:
            self._dists = self._prime(sb)  # prime the pipeline (batch 0)
        next_sb = (
            self._dmp._find_sparse_arg(self._as_args(self._queue[0].result()))
            if self._queue
            else sb
        )
        self.state, loss, aux, self._dists = self._train_step(
            self.state, self._dists, next_sb, *args
        )
        return loss, aux


class EvalPipeline:
    """Same prefetch structure for evaluation (no state update)."""

    def __init__(self, eval_step: Callable, state: Any, prefetch_depth: int = 2):
        self._eval_step = eval_step
        self.state = state
        self._depth = max(1, prefetch_depth)
        self._queue: collections.deque = collections.deque()

    def progress(self, it: Iterator):
        while len(self._queue) < self._depth:
            try:
                self._queue.append(jax.device_put(next(it)))
            except StopIteration:
                break
        if not self._queue:
            raise StopIteration
        batch = self._queue.popleft()
        return self._eval_step(self.state, batch)
