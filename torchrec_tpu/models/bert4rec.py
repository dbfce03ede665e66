"""BERT4Rec sequence recommender (arxiv 1904.06690).

ref: examples/bert4rec/models/bert4rec.py — HistoryArch wrapping an
EmbeddingCollection for item embeddings + learned positional embeddings
(:323-409), hand-rolled pre-norm transformer blocks (:34-321), and a
linear output head over the item vocabulary (:412-501).

TPU notes: attention runs as batched [B, H, L, L] matmuls on the MXU;
only the item-embedding table is model-parallel (via DMP swapping the
EmbeddingCollection), the transformer is data-parallel — exactly the
reference's DMP-vs-DDP split (ref bert4rec_main.py:487-519)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_configs import EmbeddingConfig
from torchrec_tpu.modules.embedding_modules import EmbeddingCollection
from torchrec_tpu.sparse import PaddedSparseBatch

Array = jax.Array


class TransformerBlock(nn.Module):
    """Pre-norm block: x + drop(attn(norm(x))); x + drop(ff(norm(x)))
    (ref: bert4rec.py:260-321 SublayerConnection composition)."""

    dim_model: int
    num_heads: int
    dim_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: Array, mask: Array, deterministic: bool = True
    ) -> Array:
        """Call Args: x [B, L, D]; mask [B, 1, L, L] additive attention
        mask; deterministic disables dropout. Returns [B, L, D]."""
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim_model,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(h, h, mask=mask)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim_ff)(h)
        h = jax.nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim_model)(h)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x


def make_item_embedding_collection(
    vocab_size: int, emb_dim: int, history_len: int
) -> EmbeddingCollection:
    """The item-embedding table BERT4Rec model-parallelizes."""
    return EmbeddingCollection(
        tables=(
            EmbeddingConfig(
                num_embeddings=vocab_size,
                embedding_dim=emb_dim,
                name="item_embedding",
                feature_names=["item"],
            ),
        ),
        max_feature_length=history_len,
    )


class HistoryArch(nn.Module):
    """Item embedding (EmbeddingCollection) + learned positional embedding
    + LayerNorm + dropout (ref: bert4rec.py:323-409).

    `ec` is a declared field (not setup-created) so DistributedModelParallel
    can find and swap it for the sharded version."""

    vocab_size: int
    history_len: int
    emb_dim: int
    ec: nn.Module
    dropout: float = 0.1

    def setup(self) -> None:
        self.positional = self.param(
            "positional",
            nn.initializers.normal(1.0),
            (self.history_len, self.emb_dim),
        )
        self.layernorm = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self, id_list_features: PaddedSparseBatch, deterministic: bool = True
    ) -> Array:
        """Call Args: id_list_features padded item-history batch;
        deterministic disables dropout. Returns token embeddings
        [B, L, D]."""
        tokens = self.ec(id_list_features)  # {"item": [B, L, D]}
        item_output = tokens["item"]
        x = item_output + self.positional[None, :, :]
        return self.drop(self.layernorm(x), deterministic=deterministic)


class BERT4Rec(nn.Module):
    """ref: bert4rec.py:412-501."""

    vocab_size: int
    max_len: int
    emb_dim: int
    nhead: int
    num_layers: int
    dropout: float = 0.1
    # declared here (not in setup) so DMP's module walk can swap it;
    # None -> constructed automatically
    ec: Optional[nn.Module] = None

    def setup(self) -> None:
        ec = self.ec
        if ec is None:
            ec = make_item_embedding_collection(
                self.vocab_size, self.emb_dim, self.max_len
            )
        self.history = HistoryArch(
            self.vocab_size, self.max_len, self.emb_dim, ec, self.dropout
        )
        self.blocks = [
            TransformerBlock(
                self.emb_dim, self.nhead, self.emb_dim * 4, self.dropout,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]
        # linear head instead of tied-embedding matmul (ref comment
        # bert4rec.py:470-473)
        self.out = nn.Dense(self.vocab_size)

    def __call__(
        self, input: PaddedSparseBatch, deterministic: bool = True
    ) -> Array:
        """Call Args: input padded item-history batch; deterministic
        disables dropout. Returns per-position logits [B, L, vocab]."""
        # attention mask: attend only to non-pad positions (id > 0)
        ids = input.select_features([input.keys.index("item")]).ids[0]  # [B,L]
        valid = ids > 0
        mask = valid[:, None, None, :] & jnp.ones(
            (1, 1, ids.shape[1], 1), bool
        )  # [B, 1, L(q), L(k)]
        x = self.history(input, deterministic=deterministic)
        for block in self.blocks:
            x = block(x, mask, deterministic=deterministic)
        return self.out(x)  # [B, L, vocab]


class BERT4RecTrain(nn.Module):
    """Masked-LM training wrapper: cross-entropy on masked positions
    (ref: examples/bert4rec/bert4rec_main.py training loop)."""

    model: BERT4Rec
    pad_id: int = 0

    def __call__(
        self,
        input: PaddedSparseBatch,
        labels: Array,
        deterministic: bool = True,
    ) -> Tuple[Array, Tuple[Array, Array]]:
        """Call Args: input padded masked item histories; labels [B, L]
        (pad_id positions ignored); deterministic disables dropout.
        Returns (loss, (loss, logits))."""
        logits = self.model(input, deterministic=deterministic)
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(
            logp, labels[:, :, None].astype(jnp.int32), axis=-1
        )[:, :, 0]
        mask = (labels != self.pad_id).astype(logits.dtype)
        loss = -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss, (loss, logits)
