"""Module tests (ref: torchrec/modules/tests/*, models/tests/test_dlrm.py
— exact-shape and hand-computed-value checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingCollection,
    EmbeddingConfig,
    MLP,
    PoolingType,
)
from torchrec_tpu.modules.activation import SwishLayerNorm
from torchrec_tpu.modules.crossnet import (
    CrossNet,
    LowRankCrossNet,
    LowRankMixtureCrossNet,
    VectorCrossNet,
)
from torchrec_tpu.modules.deepfm import DeepFM, FactorizationMachine
from torchrec_tpu.modules.embedding_modules import embedding_names_by_table
from torchrec_tpu.modules.feature_processor import PositionWeightedModule
from torchrec_tpu.sparse import KeyedJaggedTensor


def _batch(keys, values, lengths, L=2, weights=None):
    return KeyedJaggedTensor.from_lengths(
        keys, jnp.asarray(values, dtype=jnp.int32),
        jnp.asarray(lengths, dtype=jnp.int32), weights=weights
    ).to_padded(L)


def _two_table_ebc(pooling=PoolingType.SUM, is_weighted=False):
    tables = (
        EmbeddingBagConfig(num_embeddings=10, embedding_dim=4, name="t1",
                           feature_names=["f1"], pooling=pooling),
        EmbeddingBagConfig(num_embeddings=10, embedding_dim=4, name="t2",
                           feature_names=["f2"], pooling=pooling),
    )
    return EmbeddingBagCollection(tables=tables, is_weighted=is_weighted,
                                  max_feature_length=2)


def test_ebc_shapes_and_values():
    ebc = _two_table_ebc()
    sb = _batch(["f1", "f2"], [1, 2, 3, 4, 5, 6], [2, 0, 1, 1, 1, 1], L=2)
    params = ebc.init(jax.random.PRNGKey(0), sb)
    kt = ebc.apply(params, sb)
    assert kt.keys == ("f1", "f2")
    assert kt.values.shape == (3, 8)
    w1 = params["params"]["t1"]
    np.testing.assert_allclose(
        np.asarray(kt["f1"][0]), np.asarray(w1[1] + w1[2]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(kt["f1"][1]), 0.0)
    np.testing.assert_allclose(np.asarray(kt["f1"][2]), np.asarray(w1[3]), rtol=1e-6)


def test_ebc_mean_pooling():
    ebc = _two_table_ebc(pooling=PoolingType.MEAN)
    sb = _batch(["f1", "f2"], [1, 2, 3, 4, 5, 6], [2, 0, 1, 1, 1, 1], L=2)
    params = ebc.init(jax.random.PRNGKey(0), sb)
    kt = ebc.apply(params, sb)
    w1 = params["params"]["t1"]
    np.testing.assert_allclose(
        np.asarray(kt["f1"][0]), np.asarray((w1[1] + w1[2]) / 2), rtol=1e-6
    )


def test_ebc_weighted():
    ebc = _two_table_ebc(is_weighted=True)
    sb = _batch(
        ["f1", "f2"], [1, 2, 3, 4, 5, 6], [2, 0, 1, 1, 1, 1], L=2,
        weights=jnp.asarray([0.5, 2.0, 1.0, 1.0, 1.0, 1.0]),
    )
    params = ebc.init(jax.random.PRNGKey(0), sb)
    kt = ebc.apply(params, sb)
    w1 = params["params"]["t1"]
    np.testing.assert_allclose(
        np.asarray(kt["f1"][0]), np.asarray(0.5 * w1[1] + 2.0 * w1[2]), rtol=1e-6
    )


def test_ebc_shared_feature_naming():
    tables = (
        EmbeddingBagConfig(num_embeddings=5, embedding_dim=2, name="t1",
                           feature_names=["shared"]),
        EmbeddingBagConfig(num_embeddings=5, embedding_dim=2, name="t2",
                           feature_names=["shared"]),
    )
    names = embedding_names_by_table(tables)
    assert names == [["shared@t1"], ["shared@t2"]]
    ebc = EmbeddingBagCollection(tables=tables, max_feature_length=1)
    sb = _batch(["shared"], [1, 2], [1, 1], L=1)
    params = ebc.init(jax.random.PRNGKey(0), sb)
    kt = ebc.apply(params, sb)
    assert kt.keys == ("shared@t1", "shared@t2")


def test_ebc_multi_feature_table():
    tables = (
        EmbeddingBagConfig(num_embeddings=6, embedding_dim=3, name="t",
                           feature_names=["a", "b"]),
    )
    ebc = EmbeddingBagCollection(tables=tables, max_feature_length=1)
    sb = _batch(["a", "b"], [1, 2, 3, 4], [1, 1, 1, 1], L=1)
    params = ebc.init(jax.random.PRNGKey(0), sb)
    kt = ebc.apply(params, sb)
    assert kt.keys == ("a", "b")
    w = params["params"]["t"]
    np.testing.assert_allclose(np.asarray(kt["b"][1]), np.asarray(w[4]), rtol=1e-6)


def test_ec_padded_and_jagged():
    tables = (
        EmbeddingConfig(num_embeddings=8, embedding_dim=3, name="t",
                        feature_names=["f"]),
    )
    ec = EmbeddingCollection(tables=tables, max_feature_length=3)
    sb = _batch(["f"], [1, 2, 3], [2, 1], L=3)
    params = ec.init(jax.random.PRNGKey(0), sb)
    out = ec.apply(params, sb)
    assert out["f"].shape == (2, 3, 3)
    w = params["params"]["t"]
    np.testing.assert_allclose(np.asarray(out["f"][0, 1]), np.asarray(w[2]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["f"][0, 2]), 0.0)  # pad zeroed
    jagged = ec.apply(params, sb, as_jagged=True)
    np.testing.assert_allclose(
        np.asarray(jagged["f"].values[0]), np.asarray(w[1]), rtol=1e-6
    )


def test_ec_rejects_mixed_dims():
    tables = (
        EmbeddingConfig(num_embeddings=4, embedding_dim=2, name="a", feature_names=["x"]),
        EmbeddingConfig(num_embeddings=4, embedding_dim=3, name="b", feature_names=["y"]),
    )
    ec = EmbeddingCollection(tables=tables)
    sb = _batch(["x", "y"], [1, 1], [1, 1], L=1)
    with pytest.raises(ValueError, match="embedding_dim"):
        ec.init(jax.random.PRNGKey(0), sb)


def test_mlp_shapes():
    mlp = MLP(layer_sizes=[8, 4])
    x = jnp.ones((5, 10))
    params = mlp.init(jax.random.PRNGKey(0), x)
    y = mlp.apply(params, x)
    assert y.shape == (5, 4)
    assert (np.asarray(y) >= 0).all()  # relu output


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (CrossNet, dict(num_layers=2)),
        (LowRankCrossNet, dict(num_layers=2, low_rank=2)),
        (VectorCrossNet, dict(num_layers=2)),
        (LowRankMixtureCrossNet, dict(num_layers=2, num_experts=3, low_rank=2)),
    ],
)
def test_crossnets_preserve_shape(cls, kwargs):
    net = cls(**kwargs)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 6).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (4, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_factorization_machine_hand_value():
    # x = [1, 2, 3]: 0.5*((1+2+3)^2 - (1+4+9)) = 0.5*(36-14) = 11
    fm = FactorizationMachine()
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    params = fm.init(jax.random.PRNGKey(0), [x])
    out = fm.apply(params, [x])
    np.testing.assert_allclose(np.asarray(out), [[11.0]], rtol=1e-6)


def test_deepfm_module():
    import flax.linen as nn

    deep = DeepFM(deep_module=nn.Dense(5))
    xs = [jnp.ones((3, 2, 4)), jnp.ones((3, 6))]
    params = deep.init(jax.random.PRNGKey(0), xs)
    y = deep.apply(params, xs)
    assert y.shape == (3, 5)


def test_swish_layer_norm():
    m = SwishLayerNorm()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_position_weighted_module():
    pw = PositionWeightedModule(max_feature_lengths=(("f", 4),))
    sb = _batch(["f"], [1, 2, 3], [2, 1], L=3)
    params = pw.init(jax.random.PRNGKey(0), sb)
    out = pw.apply(params, sb)
    assert out.weights.shape == (1, 2, 3)
    # init weights are 1.0 on valid slots, 0 on pad
    np.testing.assert_allclose(np.asarray(out.weights[0]), [[1, 1, 0], [1, 0, 0]])


# -- modules/utils.py (ref: torchrec/modules/utils.py) -----------------------


def test_utils_extract_and_output_dimension():
    import flax.linen as nn

    from torchrec_tpu.modules.utils import (
        check_module_output_dimension,
        extract_module_or_tensor_callable,
        get_module_output_dimension,
    )

    class Proj(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(7)(x)

    m = extract_module_or_tensor_callable(Proj)  # factory -> instance
    assert isinstance(m, nn.Module)
    assert get_module_output_dimension(m, 5) == 7
    assert check_module_output_dimension([m, Proj()], 5, 7)
    assert not check_module_output_dimension(m, 5, 8)
    fn = extract_module_or_tensor_callable(lambda x: x[:, :3])
    assert get_module_output_dimension(fn, 5) == 3
    with pytest.raises(ValueError, match="not a flax Module class"):
        extract_module_or_tensor_callable(dict)


def test_utils_modulelist_shaping():
    import flax.linen as nn

    from torchrec_tpu.modules.utils import (
        construct_modulelist_from_single_module,
        convert_list_of_modules_to_modulelist,
    )

    dense = nn.Dense(4)
    nested = construct_modulelist_from_single_module(dense, (2, 3))
    assert len(nested) == 2 and all(len(row) == 3 for row in nested)

    mods = [nn.Dense(i + 1) for i in range(6)]
    grid = convert_list_of_modules_to_modulelist(mods, (2, 3))
    assert grid[1][2].features == 6
    with pytest.raises(ValueError, match="do not match"):
        convert_list_of_modules_to_modulelist(mods, (2, 2))
