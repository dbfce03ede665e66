"""Synthetic recommendation data (ref: torchrec/datasets/random.py:113)."""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.datasets.utils import Batch
from torchrec_tpu.sparse import PaddedSparseBatch


class RandomRecDataset:
    """Random stream of Batches (ref: random.py:113).

    keys: sparse feature names; hash_sizes: id range per feature (or one
    hash_size for all); ids_per_feature: L (fixed per-token count);
    num_dense: dense feature width.
    """

    def __init__(
        self,
        keys: Sequence[str],
        batch_size: int,
        hash_size: Optional[int] = None,
        hash_sizes: Optional[Sequence[int]] = None,
        ids_per_feature: int = 2,
        num_dense: int = 13,
        manual_seed: Optional[int] = None,
        num_batches: Optional[int] = None,
        min_ids_per_feature: Optional[int] = None,
        on_device: bool = False,
        zipf_a: Optional[float] = None,
    ):
        """on_device=True generates each batch with a jitted PRNG program
        directly in device memory — no host->device transfer at all. Use
        for synthetic throughput runs on remote-attached TPUs where
        upload latency would otherwise dominate (a real PCIe-attached
        host does not have this constraint)."""
        if hash_sizes is None:
            hash_sizes = [hash_size or 100] * len(keys)
        assert len(hash_sizes) == len(keys)
        self.keys = tuple(keys)
        self.batch_size = batch_size
        self.hash_sizes = list(hash_sizes)
        self.L = ids_per_feature
        self.min_L = (
            ids_per_feature if min_ids_per_feature is None
            else min_ids_per_feature
        )
        self.num_dense = num_dense
        self.num_batches = num_batches
        self._seed = manual_seed if manual_seed is not None else 0
        self.on_device = on_device
        # zipf_a: heavy-tailed ids (duplicate-rich batches, the realistic
        # Criteo-like distribution) instead of uniform draws
        self.zipf_a = zipf_a
        self._gen = None

    def _batch(self, rng: np.random.RandomState) -> Batch:
        F, B, L = len(self.keys), self.batch_size, self.L
        lengths = rng.randint(self.min_L, L + 1, size=(F, B)).astype(np.int32)
        if self.zipf_a is not None:
            from torchrec_tpu.datasets.synthetic_criteo import zipf_ids

            ids = np.stack(
                [
                    zipf_ids(rng, self.hash_sizes[f], (B, L), self.zipf_a)
                    for f in range(F)
                ]
            ).astype(np.int32)
        else:
            ids = np.stack(
                [
                    rng.randint(0, self.hash_sizes[f], size=(B, L))
                    for f in range(F)
                ]
            ).astype(np.int32)
        dense = rng.randn(B, self.num_dense).astype(np.float32)
        labels = rng.randint(0, 2, size=(B,)).astype(np.float32)
        # keep numpy leaves: the train pipeline device_puts the WHOLE batch
        # pytree in one async call instead of one transfer per array (each
        # transfer costs a full dispatch roundtrip on remote-attached TPUs)
        sb = PaddedSparseBatch(ids=ids, lengths=lengths, keys=self.keys)
        return Batch(
            dense_features=dense, sparse_features=sb, labels=labels
        )

    def device_batch_fn(self):
        """UNJITTED key -> Batch generator body, for fusing into a larger
        jitted program (generation + train step as one executable)."""
        import jax

        F, B, L = len(self.keys), self.batch_size, self.L
        hashes = jnp.asarray(self.hash_sizes)

        zipf_a = self.zipf_a

        def gen(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            lengths = jax.random.randint(
                k1, (F, B), self.min_L, L + 1, dtype=jnp.int32
            )
            if zipf_a is not None:
                # bounded power-law inverse CDF (synthetic_criteo.zipf_ids);
                # a == 1 uses the log-space closed form (1/t diverges)
                u = jax.random.uniform(k2, (F, B, L), minval=1e-7)
                nf = hashes[:, None, None].astype(jnp.float32)
                if abs(zipf_a - 1.0) < 1e-6:
                    kk = jnp.power(nf, u)
                else:
                    t = 1.0 - zipf_a
                    kk = jnp.power(
                        u * (jnp.power(nf, t) - 1.0) + 1.0, 1.0 / t
                    )
                ids = jnp.clip(
                    kk.astype(jnp.int32) - 1, 0,
                    hashes[:, None, None] - 1,
                )
            else:
                ids = jax.random.randint(
                    k2, (F, B, L), 0, hashes[:, None, None], dtype=jnp.int32
                )
            dense = jax.random.normal(k3, (B, self.num_dense), jnp.float32)
            labels = jax.random.bernoulli(k4, 0.5, (B,)).astype(jnp.float32)
            sb = PaddedSparseBatch(ids=ids, lengths=lengths, keys=self.keys)
            return Batch(
                dense_features=dense, sparse_features=sb, labels=labels
            )

        return gen

    def __iter__(self) -> Iterator[Batch]:
        n = 0
        if self.on_device:
            import jax

            if self._gen is None:
                self._gen = jax.jit(self.device_batch_fn())
            key = jax.random.PRNGKey(self._seed)
            while self.num_batches is None or n < self.num_batches:
                yield self._gen(jax.random.fold_in(key, n))
                n += 1
            return
        rng = np.random.RandomState(self._seed)
        while self.num_batches is None or n < self.num_batches:
            yield self._batch(rng)
            n += 1

    def __len__(self) -> int:
        if self.num_batches is None:
            raise TypeError("infinite dataset")
        return self.num_batches
