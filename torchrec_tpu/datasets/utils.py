"""Dataset utilities (ref: torchrec/datasets/utils.py:35-307).

`Batch` is the canonical training example container (dense, sparse,
labels). The reference's `Pipelineable` contract (record_stream/to) has
no TPU analogue — a Batch is a pytree; `jax.device_put` moves it and the
train pipeline prefetches it."""

from __future__ import annotations

import random
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import struct

from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array


@struct.dataclass
class Batch:
    """Dense features + sparse id features + labels (ref: utils.py:35-62)."""

    dense_features: Array
    sparse_features: PaddedSparseBatch
    labels: Array

    @property
    def batch_size(self) -> int:
        return self.dense_features.shape[0]


def train_filter(
    key_fn, train_perc: float, decimal_places: int, idx: int
) -> bool:
    """Deterministic train-split membership by index hashing
    (ref: utils.py train/val filter helpers)."""
    return (key_fn(idx) % 10**decimal_places) < round(
        train_perc * 10**decimal_places
    )


def val_filter(key_fn, train_perc: float, decimal_places: int, idx: int) -> bool:
    return not train_filter(key_fn, train_perc, decimal_places, idx)


def rand_split_train_val(
    iterable, train_perc: float, random_seed: int = 0
) -> Tuple[Iterator, Iterator]:
    """Split an iterable into train/val streams by hashed index
    (ref: utils.py rand_split_train_val)."""
    if not 0.0 < train_perc < 1.0:
        raise ValueError("train_perc must be in (0.0, 1.0)")

    def gen(want_train: bool):
        rng = random.Random(random_seed)
        for item in iterable:
            is_train = rng.random() < train_perc
            if is_train == want_train:
                yield item

    return gen(True), gen(False)


class ParallelReadConcat:
    """Round-robin concatenation of several iterator factories
    (ref: utils.py:307 ParallelReadConcat over datapipes)."""

    def __init__(self, *factories):
        self._factories = factories

    def __iter__(self):
        for factory in self._factories:
            yield from factory()
