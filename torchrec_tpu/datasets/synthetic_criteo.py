"""Frequency-calibrated synthetic Criteo (Kaggle DAC) generator.

Real Criteo data is unreachable from this environment (no network
egress; see QUALITY_r2.md for the documented attempt), so quality runs
use a synthetic stream calibrated to the PUBLISHED dataset statistics
instead of uniform noise (ref: torchrec/datasets/criteo.py:37-46 schema;
the reference random stream, datasets/random.py:113, draws uniform ids
— unrealistic duplicate structure):

* per-feature categorical cardinalities = the Kaggle DAC embedding sizes
  published with DLRM (facebookresearch/dlrm README / MLPerf DLRM
  configs), optionally capped by `max_ind_range` (the reference CLI's
  --max_ind_range modulo trick);
* ids drawn Zipf(a) per feature via the closed-form bounded power-law
  inverse CDF — Criteo id frequencies are heavy-tailed, and duplicate-
  rich batches stress the dedup/segment path the way real data does;
* dense features log-normal then log1p-ed (the DAC ints are heavy-
  tailed; the reference preprocesses with log(x+3),
  examples/dlrm/README);
* clicks from a fixed logistic ground truth over per-id latent scores
  (hash-derived, so the mapping is learnable by an embedding model),
  a dense linear term and one pairwise interaction, with the intercept
  set to the published DAC positive rate (~25.6%). The signal scale is
  chosen so the Bayes-optimal AUROC is ~0.80 (sigma = sqrt(2) *
  Phi^-1(AUROC*)), mirroring the reference's Criteo ballpark — a
  learner's gap to that ceiling is real modeling error.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from torchrec_tpu.datasets.utils import Batch
from torchrec_tpu.sparse import PaddedSparseBatch

# Kaggle DAC (Criteo display-advertising challenge) categorical
# cardinalities as published for DLRM / MLPerf Kaggle configs.
CRITEO_KAGGLE_CARDINALITIES: Tuple[int, ...] = (
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683,
    8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18,
    15, 286181, 105, 142572,
)
CRITEO_KAGGLE_CTR = 0.2562  # published DAC positive rate
INT_FEATURE_COUNT = 13
CAT_FEATURE_COUNT = 26

_SQRT3 = np.float32(np.sqrt(3.0))


def latent_score(feature: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Deterministic per-(feature, id) latent in [-sqrt(3), sqrt(3)]
    (unit variance uniform): the ground truth an embedding model can
    learn. 32-bit murmur-style finalizer, bit-identical to the on-device
    twin: both sides build u from the hash's exact 16-bit halves (each
    exact in float32) and apply the same sequence of IEEE f32 ops, so
    host-eval and device-train streams share ONE ground truth."""
    key = (
        ids.astype(np.uint32)
        + np.uint32(1_000_003) * (feature.astype(np.uint32) + np.uint32(1))
    )
    z = key * np.uint32(0x9E3779B9)
    z = (z ^ (z >> np.uint32(16))) * np.uint32(0x85EBCA6B)
    z = (z ^ (z >> np.uint32(13))) * np.uint32(0xC2B2AE35)
    z = z ^ (z >> np.uint32(16))
    hi = (z >> np.uint32(16)).astype(np.float32)
    lo = (z & np.uint32(0xFFFF)).astype(np.float32)
    u = hi * np.float32(2.0**-16) + lo * np.float32(2.0**-32)
    return (np.float32(2.0) * u - np.float32(1.0)) * _SQRT3


def device_latent_score(feats, ids):
    """On-device twin of latent_score: identical IEEE f32 op sequence
    (u built from the hash's exact 16-bit halves), so host-eval and
    device-train streams share ONE bit-identical ground truth."""
    import jax.numpy as jnp

    key = (
        ids.astype(jnp.uint32)
        + jnp.uint32(1_000_003) * (feats.astype(jnp.uint32) + 1)
    )
    # 32-bit splitmix-style finalizer (device ints are 32-bit)
    z = key * jnp.uint32(0x9E3779B9)
    z = (z ^ (z >> 16)) * jnp.uint32(0x85EBCA6B)
    z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    hi = (z >> 16).astype(jnp.float32)
    lo = (z & 0xFFFF).astype(jnp.float32)
    u = hi * jnp.float32(2.0**-16) + lo * jnp.float32(2.0**-32)
    return (jnp.float32(2.0) * u - jnp.float32(1.0)) * jnp.float32(_SQRT3)


def zipf_ids(
    rng: np.random.RandomState, n: int, size, a: float = 1.05
) -> np.ndarray:
    """Bounded power-law ids in [0, n): closed-form inverse CDF of the
    continuous Zipf(a) truncated at n (O(1) memory at 10M-row
    cardinalities)."""
    u = rng.random_sample(size)
    if abs(a - 1.0) < 1e-6:
        k = np.power(float(n), u)
    else:
        t = 1.0 - a
        k = np.power(u * (float(n) ** t - 1.0) + 1.0, 1.0 / t)
    # continuous rank k in [1, n] -> id k-1 in [0, n)
    return np.clip(k.astype(np.int64) - 1, 0, n - 1)


class SyntheticCriteoDataset:
    """Criteo-Kaggle-shaped synthetic stream with Zipf ids and a fixed
    logistic ground truth. Same Batch interface as RandomRecDataset."""

    def __init__(
        self,
        batch_size: int,
        max_ind_range: Optional[int] = None,
        zipf_a: float = 1.05,
        target_auroc: float = 0.80,
        ctr: float = CRITEO_KAGGLE_CTR,
        num_batches: Optional[int] = None,
        manual_seed: int = 0,
        cardinalities: Sequence[int] = CRITEO_KAGGLE_CARDINALITIES,
        keys: Optional[Sequence[str]] = None,
    ):
        self.batch_size = batch_size
        self.cardinalities = tuple(
            min(c, max_ind_range) if max_ind_range else c
            for c in cardinalities
        )
        self.keys = (
            tuple(keys)
            if keys is not None
            else tuple(f"cat_{i}" for i in range(len(self.cardinalities)))
        )
        assert len(self.keys) == len(self.cardinalities)
        self.zipf_a = zipf_a
        self.num_batches = num_batches
        self.seed = manual_seed
        self.ctr = ctr
        # Bayes AUROC* = Phi(sigma / sqrt(2)) for a N(0, sigma^2) logit
        # spread around the intercept -> sigma = sqrt(2) Phi^-1(AUROC*)
        from scipy.stats import norm  # scipy ships with the image

        self.sigma = float(np.sqrt(2.0) * norm.ppf(target_auroc))
        # intercept calibrated so E_z[sigmoid(b + sigma z)] = ctr under
        # z ~ N(0,1) (plain log-odds undershoots by ~2pp at sigma ~1.2)
        zs = norm.ppf(np.linspace(0.0005, 0.9995, 2001))
        lo, hi = -8.0, 8.0
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            if np.mean(1.0 / (1.0 + np.exp(-(mid + self.sigma * zs)))) < ctr:
                lo = mid
            else:
                hi = mid
        self.bias = 0.5 * (lo + hi)
        rng = np.random.RandomState(12345)
        self._dense_w = rng.randn(INT_FEATURE_COUNT).astype(
            np.float32
        ) / np.sqrt(INT_FEATURE_COUNT)
        # Zipf weighting makes the token-weighted latent mean nonzero (the
        # head ids' fixed scores dominate); standardize z empirically so
        # the intercept/sigma calibration holds
        cal = np.random.RandomState(777)
        zr = []
        for _ in range(4):
            ids = np.stack(
                [
                    zipf_ids(cal, c, (4096,), self.zipf_a)
                    for c in self.cardinalities
                ]
            )
            dense = self._dense(cal, 4096)
            zr.append(self._raw_z(ids, dense))
        zr = np.concatenate(zr)
        self._z_mu = float(zr.mean())
        self._z_sd = float(zr.std()) or 1.0

    def _dense(self, rng: np.random.RandomState, B: int) -> np.ndarray:
        raw = rng.lognormal(mean=1.0, sigma=1.6, size=(B, INT_FEATURE_COUNT))
        dense = np.log1p(raw).astype(np.float32)
        return (dense - 1.9) / 1.1  # approx standardize

    def _raw_z(self, ids: np.ndarray, dense: np.ndarray) -> np.ndarray:
        F, B = ids.shape
        feats = np.arange(F)[:, None] * np.ones((1, B), np.int64)
        s = latent_score(feats, ids)  # [F, B], unit variance per token
        cat_term = s.mean(axis=0) * np.sqrt(F)
        dense_term = dense @ self._dense_w
        inter = s[2] * s[20]  # two heavy-tailed features interact
        z = 0.70 * cat_term + 0.55 * dense_term + 0.45 * inter
        return z / np.sqrt(0.70**2 + 0.55**2 + 0.45**2)

    def _logits(self, ids: np.ndarray, dense: np.ndarray) -> np.ndarray:
        """Ground-truth logit for [F, B] ids + [B, 13] dense."""
        z = (self._raw_z(ids, dense) - self._z_mu) / self._z_sd
        return self.bias + self.sigma * z

    def _batch(self, rng: np.random.RandomState) -> Batch:
        F, B = len(self.keys), self.batch_size
        ids = np.stack(
            [
                zipf_ids(rng, c, (B,), self.zipf_a)
                for c in self.cardinalities
            ]
        )  # [F, B]
        dense = self._dense(rng, B)
        logits = self._logits(ids, dense)
        labels = (
            rng.random_sample((B,)) < 1.0 / (1.0 + np.exp(-logits))
        ).astype(np.float32)
        sb = PaddedSparseBatch(
            ids=ids[:, :, None].astype(np.int32),
            lengths=np.ones((F, B), np.int32),
            keys=self.keys,
        )
        return Batch(dense_features=dense, sparse_features=sb, labels=labels)

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.RandomState(self.seed)
        n = 0
        while self.num_batches is None or n < self.num_batches:
            yield self._batch(rng)
            n += 1

    def __len__(self) -> int:
        if self.num_batches is None:
            raise TypeError("infinite dataset")
        return self.num_batches

    # -- fused on-device twin (remote-attached-TPU throughput pattern) ----

    def device_batch_fn(self):
        """UNJITTED key -> Batch generator with IDENTICAL semantics
        (Zipf ids, log-normal dense, ground-truth labels) computed on
        device, for fusing generation + train step into one executable."""
        import jax
        import jax.numpy as jnp

        F, B = len(self.keys), self.batch_size
        cards = jnp.asarray(self.cardinalities, jnp.float64
                            if jax.config.jax_enable_x64 else jnp.float32)
        a = self.zipf_a
        dense_w = jnp.asarray(self._dense_w)
        sigma, bias = self.sigma, self.bias
        z_mu, z_sd = self._z_mu, self._z_sd

        dev_latent = device_latent_score

        def gen(key):
            k1, k2, k3 = jax.random.split(key, 3)
            u = jax.random.uniform(
                k1, (F, B), minval=1e-7, maxval=1.0
            )
            if abs(a - 1.0) < 1e-6:  # log-space form; 1/(1-a) diverges
                k = jnp.power(cards[:, None], u)
            else:
                t = 1.0 - a
                k = jnp.power(
                    u * (jnp.power(cards[:, None], t) - 1.0) + 1.0, 1.0 / t
                )
            ids = jnp.clip(
                k.astype(jnp.int32) - 1,
                0,
                (cards[:, None] - 1).astype(jnp.int32),
            )
            raw = jnp.exp(
                1.0 + 1.6 * jax.random.normal(k2, (B, INT_FEATURE_COUNT))
            )
            dense = (jnp.log1p(raw) - 1.9) / 1.1
            feats = jnp.arange(F, dtype=jnp.int32)[:, None] * jnp.ones(
                (1, B), jnp.int32
            )
            s = dev_latent(feats, ids)
            cat_term = s.mean(axis=0) * jnp.sqrt(jnp.float32(F))
            dense_term = dense @ dense_w
            inter = s[2] * s[20]
            z = 0.70 * cat_term + 0.55 * dense_term + 0.45 * inter
            z = z / jnp.sqrt(0.70**2 + 0.55**2 + 0.45**2)
            z = (z - z_mu) / z_sd
            logits = bias + sigma * z
            labels = (
                jax.random.uniform(k3, (B,)) < jax.nn.sigmoid(logits)
            ).astype(jnp.float32)
            sb = PaddedSparseBatch(
                ids=ids[:, :, None],
                lengths=jnp.ones((F, B), jnp.int32),
                keys=self.keys,
            )
            return Batch(
                dense_features=dense.astype(jnp.float32),
                sparse_features=sb,
                labels=labels,
            )

        return gen
