"""Serving-side request micro-batcher — the TPU-native analogue of the
reference's batching queue in front of the predict executor
(ref: torchrec/inference — `batching_metadata` on PredictFactory,
modules.py:64-99, names the per-feature batching strategy the C++
serving tier coalesces by; the tier itself lives outside the 2022 repo).

TPU design constraints drive the shape of this component:

* ONE jitted executable, STATIC shapes: requests are coalesced into a
  fixed server batch B (and fixed sparse budget L). A ragged tail is
  padded with repeats of the last real example — never a shape change,
  so the predict program compiles exactly once.
* latency/throughput knob: the worker launches as soon as B examples
  are waiting, or when `max_latency_s` has passed since the oldest
  pending request (partial batch, padded).
* demux by example count: each request contributes `n_examples` rows;
  responses are sliced back out and delivered through futures.

The batcher is model-agnostic: `collate(requests) -> model args` builds
the padded arg tuple for `predict_fn`, `n_examples(request)` sizes each
request, and the result is sliced along axis 0 of every output leaf.
`dlrm_collate` below is the DLRM wiring used by examples/dlrm_predict.py.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np


@dataclass
class _Pending:
    request: Any
    n: int
    future: Future
    t_enqueue: float


class BatchingPredictServer:
    """Micro-batching front for a jitted predict callable.

    predict_fn:    (*args) -> pytree of arrays with leading batch dim B
    collate:       (requests, batch_size) -> args for predict_fn,
                   padded to EXACTLY batch_size examples
    n_examples:    request -> number of examples it contributes
    batch_size:    the static server batch B
    max_latency_s: flush deadline for partial batches
    """

    def __init__(
        self,
        predict_fn: Callable,
        collate: Callable[[Sequence[Any], int], tuple],
        batch_size: int,
        n_examples: Callable[[Any], int] = lambda r: 1,
        max_latency_s: float = 0.005,
    ):
        self._predict = predict_fn
        self._collate = collate
        self._B = batch_size
        self._n_of = n_examples
        self._deadline = max_latency_s
        self._lock = threading.Condition()
        self._queue: List[_Pending] = []
        self._stopped = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side -------------------------------------------------------

    def submit(self, request: Any) -> Future:
        n = self._n_of(request)
        if n > self._B:
            raise ValueError(
                f"request with {n} examples exceeds server batch {self._B}"
            )
        f: Future = Future()
        with self._lock:
            if self._stopped:
                raise RuntimeError("server stopped")
            self._queue.append(_Pending(request, n, f, time.monotonic()))
            self._lock.notify()
        return f

    def predict(self, request: Any, timeout: Optional[float] = None):
        """Synchronous convenience wrapper."""
        return self.submit(request).result(timeout)

    def stop(self) -> None:
        with self._lock:
            self._stopped = True
            self._lock.notify()
        self._worker.join(timeout=5)

    # -- worker ------------------------------------------------------------

    def _take_batch(self) -> Optional[List[_Pending]]:
        """Wait until >= B examples are pending or the oldest request
        ages past the deadline; pop a prefix fitting the batch."""
        with self._lock:
            while not self._stopped:
                total = sum(p.n for p in self._queue)
                if total >= self._B:
                    break
                if self._queue:
                    age = time.monotonic() - self._queue[0].t_enqueue
                    if age >= self._deadline:
                        break
                    self._lock.wait(self._deadline - age)
                else:
                    self._lock.wait()
            if self._stopped and not self._queue:
                return None
            batch, used = [], 0
            while self._queue and used + self._queue[0].n <= self._B:
                p = self._queue.pop(0)
                batch.append(p)
                used += p.n
            return batch

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                args = self._collate([p.request for p in batch], self._B)
                out = self._predict(*args)
                out = jax.tree.map(np.asarray, out)
                off = 0
                for p in batch:
                    sl = jax.tree.map(
                        lambda a, o=off, n=p.n: a[o:o + n]
                        if getattr(a, "ndim", 0) >= 1 else a,
                        out,
                    )
                    # a client may have cancelled (e.g. result() timed
                    # out); that must not poison the rest of the batch
                    if not p.future.cancelled():
                        p.future.set_result(sl)
                    off += p.n
            except Exception as e:  # noqa: BLE001 - delivered per future
                for p in batch:
                    if not p.future.done() and not p.future.cancelled():
                        p.future.set_exception(e)


def make_dlrm_collate(keys: Sequence[str]) -> Callable:
    """Collate function for DLRM requests `(dense [n, d], ids [F, n, L])`
    -> the server's static `(dense [B, d], PaddedSparseBatch, labels
    [B])`. The padded tail repeats example 0 — static shape, its results
    discarded by the demux slicing. `keys` are the model's sparse
    feature names in EBC order."""
    import jax.numpy as jnp

    from torchrec_tpu.sparse import PaddedSparseBatch

    keys = tuple(keys)

    def collate(requests: Sequence[Any], batch_size: int) -> tuple:
        denses, ids = zip(*requests)
        F, _, L = ids[0].shape
        assert F == len(keys), (F, keys)
        dense = np.concatenate(denses, axis=0)
        id_cat = np.concatenate(ids, axis=1)
        n = dense.shape[0]
        if n < batch_size:
            pad = batch_size - n
            dense = np.concatenate(
                [dense, np.repeat(dense[:1], pad, axis=0)], axis=0
            )
            id_cat = np.concatenate(
                [id_cat, np.repeat(id_cat[:, :1], pad, axis=1)], axis=1
            )
        sb = PaddedSparseBatch(
            ids=jnp.asarray(id_cat.astype(np.int32)),
            lengths=jnp.ones((F, batch_size), jnp.int32) * L,
            keys=keys,
        )
        labels = jnp.zeros((batch_size,), jnp.float32)
        return jnp.asarray(dense.astype(np.float32)), sb, labels

    return collate
