"""Model tests (ref: torchrec/models/tests/test_dlrm.py — exact-shape and
hand-computed-value checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.models import DLRM, DLRMTrain, InteractionArch, SimpleDeepFMNN
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.sparse import KeyedJaggedTensor


def _ebc(num_features=2, dim=4):
    tables = tuple(
        EmbeddingBagConfig(
            num_embeddings=20, embedding_dim=dim, name=f"t{i}",
            feature_names=[f"f{i}"],
        )
        for i in range(num_features)
    )
    return EmbeddingBagCollection(tables=tables, max_feature_length=2)


def _sparse_batch(num_features=2, B=3, L=2, seed=0):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(0, L + 1, size=(num_features * B,)).astype(np.int32)
    total = int(lengths.sum())
    values = rng.randint(0, 20, size=(total,)).astype(np.int32)
    return KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(num_features)],
        jnp.asarray(values), jnp.asarray(lengths),
    ).to_padded(L)


def test_interaction_arch_hand_computed():
    inter = InteractionArch(num_sparse_features=2)
    dense = jnp.asarray([[1.0, 0.0]])
    sparse = jnp.asarray([[[0.0, 1.0], [1.0, 1.0]]])
    params = inter.init(jax.random.PRNGKey(0), dense, sparse)
    out = inter.apply(params, dense, sparse)
    # pairs (dense,s0)=0, (dense,s1)=1, (s0,s1)=1; output = dense ++ [0,1,1]
    np.testing.assert_allclose(np.asarray(out), [[1.0, 0.0, 0.0, 1.0, 1.0]])


def test_interaction_arch_no_sparse():
    inter = InteractionArch(num_sparse_features=0)
    dense = jnp.ones((2, 3))
    params = inter.init(jax.random.PRNGKey(0), dense, jnp.zeros((2, 0, 3)))
    out = inter.apply(params, dense, jnp.zeros((2, 0, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense))


def test_dlrm_forward_shape():
    F, D, B = 2, 4, 3
    model = DLRM(
        embedding_bag_collection=_ebc(F, D),
        dense_in_features=5,
        dense_arch_layer_sizes=(8, D),
        over_arch_layer_sizes=(6, 1),
    )
    dense = jnp.ones((B, 5))
    sb = _sparse_batch(F, B)
    params = model.init(jax.random.PRNGKey(0), dense, sb)
    logits = model.apply(params, dense, sb)
    assert logits.shape == (B, 1)


def test_dlrm_rejects_dim_mismatch():
    model = DLRM(
        embedding_bag_collection=_ebc(2, 4),
        dense_in_features=5,
        dense_arch_layer_sizes=(8, 7),  # != embedding dim 4
        over_arch_layer_sizes=(6, 1),
    )
    with pytest.raises(ValueError, match="must match dense arch"):
        model.init(jax.random.PRNGKey(0), jnp.ones((2, 5)), _sparse_batch())


def test_dlrm_train_learns():
    """End-to-end: single-device DLRM + optax SGD decreases BCE loss."""
    F, D, B = 2, 4, 16
    model = DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=_ebc(F, D),
            dense_in_features=5,
            dense_arch_layer_sizes=(8, D),
            # wide enough that torch-style U(-1/sqrt(fan),1/sqrt(fan)) init
            # can't leave the whole ReLU layer dead
            over_arch_layer_sizes=(16, 1),
        )
    )
    rng = np.random.RandomState(0)
    dense = jnp.asarray(rng.randn(B, 5).astype(np.float32))
    sb = _sparse_batch(F, B, seed=1)
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), dense, sb, labels)
    tx = optax.sgd(0.5)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(model.apply, has_aux=True)(
            params, dense, sb, labels
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    # fixed random labels: the model must memorize the batch
    assert losses[-1] < losses[0] - 0.1, (losses[0], losses[-1])


def test_simple_deepfm_forward():
    F, D, B = 2, 4, 3
    model = SimpleDeepFMNN(
        num_dense_features=5,
        embedding_bag_collection=_ebc(F, D),
        hidden_layer_size=8,
        deep_fm_dimension=3,
    )
    dense = jnp.ones((B, 5))
    sb = _sparse_batch(F, B)
    params = model.init(jax.random.PRNGKey(0), dense, sb)
    out = model.apply(params, dense, sb)
    assert out.shape == (B, 1)
    assert ((np.asarray(out) >= 0) & (np.asarray(out) <= 1)).all()


def test_dlrm_bf16_dense_close_to_fp32():
    """bf16 compute dtype (the TF32 analogue) keeps the same params and
    stays close to the fp32 forward."""
    import jax.numpy as jnp

    tables = _tables() if "_tables" in dir() else None
    from torchrec_tpu.models import DLRM
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.sparse import KeyedJaggedTensor

    tabs = (
        EmbeddingBagConfig(num_embeddings=50, embedding_dim=8, name="t0",
                           feature_names=["f0"]),
    )
    rng = np.random.RandomState(0)
    B = 8
    sb = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.asarray(rng.randint(0, 50, B), jnp.int32),
        jnp.asarray(np.ones(B, np.int32)),
    ).to_padded(1)
    dense = jnp.asarray(rng.randn(B, 4).astype(np.float32))

    def build(dt):
        return DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=tabs, max_feature_length=1),
            dense_in_features=4, dense_arch_layer_sizes=(8, 8),
            over_arch_layer_sizes=(8, 1), dense_dtype=dt,
        )

    m32, mb = build(None), build(jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), dense, sb)
    out32 = m32.apply(params, dense, sb)
    outb = mb.apply(params, dense, sb)  # same params, bf16 compute
    assert out32.dtype == outb.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(outb), np.asarray(out32), rtol=5e-2, atol=5e-2
    )
