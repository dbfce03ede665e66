"""Reference-checkpoint interop (torch state_dict import/export).

ref: torchrec/modules/embedding_modules.py:136 (EBC tables live at
`embedding_bags.<name>.weight`), :265 (EC at `embeddings.<name>.weight`),
model_parallel.py:392-456 (the reference DMP re-exports original FQNs) —
these FQNs are the contract a migrating user's checkpoints carry."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from torchrec_tpu.models import DLRM, DLRMTrain
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
)
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.utils.torch_interop import (
    ImportReport,
    export_torch_state_dict,
    extract_tables,
    import_torch_state_dict,
)

N_DEV = 8
B = 8
L = 2
D = 16
DENSE_IN = 8


def _tables():
    return tuple(
        EmbeddingBagConfig(num_embeddings=rows, embedding_dim=D,
                           name=f"t{i}", feature_names=[f"f{i}"])
        for i, rows in enumerate([60, 40, 32])
    )


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    tables = _tables()
    feats = [f for t in tables for f in t.feature_names]
    rows = {f: t.num_embeddings for t in tables for f in t.feature_names}
    lengths = rng.randint(0, L + 1, size=(len(feats) * B,)).astype(np.int32)
    vals = np.concatenate(
        [rng.randint(0, rows[feats[i // B]], size=(lengths[i],))
         for i in range(len(lengths))] + [np.zeros((0,))]
    ).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)
    dense = jnp.asarray(rng.randn(B, DENSE_IN).astype(np.float32))
    labels = jnp.asarray((rng.rand(B) > 0.5).astype(np.float32))
    return dense, sb, labels


@pytest.fixture(scope="module")
def dmp_state():
    env = ShardingEnv.from_local(N_DEV)
    model = DLRMTrain(
        dlrm=DLRM(
            embedding_bag_collection=EmbeddingBagCollection(
                tables=_tables(), max_feature_length=L
            ),
            dense_in_features=DENSE_IN,
            dense_arch_layer_sizes=(16, D),
            over_arch_layer_sizes=(16, 1),
        )
    )
    plan = ShardingPlan({"dlrm/embedding_bag_collection": {
        "t0": ParameterSharding(ShardingType.ROW_WISE),
        "t1": ParameterSharding(ShardingType.TABLE_WISE, ranks=[3]),
        "t2": ParameterSharding(ShardingType.COLUMN_WISE),
    }})
    dmp = DistributedModelParallel(
        model, env=env, plan=plan,
        fused_optim=EmbOptimType.EXACT_SGD,
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.05),
    )
    state = dmp.init(jax.random.PRNGKey(0), *_batch())
    return dmp, state


def _torch_sd(prefix="model.sparse_arch.embedding_bag_collection",
              seed=3, rows=None):
    """A reference-shaped state dict: tables + dense distractors."""
    rng = np.random.RandomState(seed)
    sd = {}
    for t in _tables():
        r = (rows or {}).get(t.name, t.num_embeddings)
        sd[f"{prefix}.embedding_bags.{t.name}.weight"] = torch.from_numpy(
            rng.randn(r, t.embedding_dim).astype(np.float32)
        )
    sd["model.dense_arch.model.0.weight"] = torch.zeros(16, DENSE_IN)
    sd["model.dense_arch.model.0.bias"] = torch.zeros(16)
    return sd


def test_extract_tables_fqn_parsing():
    sd = _torch_sd()
    sd["seq.ec.embeddings.items.weight"] = torch.zeros(10, 4)
    sd["not_embeddings.t9.weight"] = torch.zeros(5, 4)  # no dot before
    got = extract_tables(sd)
    assert set(got) == {
        "model.sparse_arch.embedding_bag_collection", "seq.ec"
    }
    assert set(got["model.sparse_arch.embedding_bag_collection"]) == {
        "t0", "t1", "t2"
    }
    assert got["seq.ec"]["items"].shape == (10, 4)


def test_import_loads_reference_tables(dmp_state):
    dmp, state = dmp_state
    sd = _torch_sd()
    new_state, report = import_torch_state_dict(dmp, state, sd)
    assert isinstance(report, ImportReport)
    assert report.num_tables == 3
    assert not report.partial_rows
    assert any("dense_arch" in k for k in report.skipped_keys)

    back = dmp.state_dict(new_state)["embeddings/dlrm/embedding_bag_collection"]
    for t in _tables():
        want = sd[
            "model.sparse_arch.embedding_bag_collection."
            f"embedding_bags.{t.name}.weight"
        ].numpy()
        np.testing.assert_allclose(
            np.asarray(back[t.name], np.float32), want, rtol=1e-6
        )
    # the import must actually flow into the sharded forward
    dense, sb, labels = _batch(1)
    step = dmp.make_train_step(donate=False)
    _, loss_new, _ = step(new_state, dense, sb, labels)
    _, loss_old, _ = step(state, dense, sb, labels)
    assert float(loss_new) != float(loss_old)


def test_import_partial_rows_prefix(dmp_state):
    """Row-count mismatch (e.g. our side extends tables with positional
    rows) loads the overlapping prefix and keeps our extra rows."""
    dmp, state = dmp_state
    sd = _torch_sd(rows={"t0": 50})  # checkpoint shorter than model (60)
    new_state, report = import_torch_state_dict(dmp, state, sd)
    assert report.partial_rows == ["t0"]
    back = dmp.state_dict(new_state)["embeddings/dlrm/embedding_bag_collection"]
    old = dmp.state_dict(state)["embeddings/dlrm/embedding_bag_collection"]
    want = sd[
        "model.sparse_arch.embedding_bag_collection.embedding_bags.t0.weight"
    ].numpy()
    np.testing.assert_allclose(np.asarray(back["t0"])[:50], want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["t0"])[50:], np.asarray(old["t0"])[50:], rtol=1e-6
    )


def test_import_dim_mismatch_strict_raises(dmp_state):
    dmp, state = dmp_state
    sd = {"m.embedding_bags.t0.weight": torch.zeros(60, D + 4)}
    with pytest.raises(ValueError, match="dim"):
        import_torch_state_dict(dmp, state, sd)
    _, report = import_torch_state_dict(dmp, state, sd, strict=False)
    assert report.num_tables == 0


def test_import_no_tables_raises(dmp_state):
    dmp, state = dmp_state
    with pytest.raises(ValueError, match="no embedding tables"):
        import_torch_state_dict(dmp, state, {"w": torch.zeros(3)})


def test_import_from_pt_file(dmp_state, tmp_path):
    dmp, state = dmp_state
    p = tmp_path / "ref_ckpt.pt"
    torch.save(_torch_sd(seed=9), p)
    new_state, report = import_torch_state_dict(dmp, state, str(p))
    assert report.num_tables == 3


def _torch_dense_sd(seed=11):
    """Reference-DLRM dense params at this fixture's shapes
    (dense 8->16->16; over (16+6)=22->16->1)."""
    rng = np.random.RandomState(seed)

    def lin(i, o):
        return (torch.from_numpy(rng.randn(o, i).astype(np.float32)),
                torch.from_numpy(rng.randn(o).astype(np.float32)))

    sd = {}
    for i, (fi, fo) in enumerate([(DENSE_IN, 16), (16, D)]):
        w, b = lin(fi, fo)
        sd[f"model.dense_arch.model._mlp.{i}._linear.weight"] = w
        sd[f"model.dense_arch.model._mlp.{i}._linear.bias"] = b
    w, b = lin(22, 16)
    sd["model.over_arch.model.0._mlp.0._linear.weight"] = w
    sd["model.over_arch.model.0._mlp.0._linear.bias"] = b
    w, b = lin(16, 1)
    sd["model.over_arch.model.1.weight"] = w
    sd["model.over_arch.model.1.bias"] = b
    return sd


def test_import_dlrm_dense_maps_and_transposes(dmp_state):
    from torchrec_tpu.utils.torch_interop import import_dlrm_dense

    dmp, state = dmp_state
    sd = _torch_dense_sd()
    new_state, matched = import_dlrm_dense(dmp, state, sd)
    assert len(matched) == 8

    p = new_state.dense_params["dlrm"]
    for i in range(2):
        k = np.asarray(
            p["dense_arch"]["MLP_0"][f"Perceptron_{i}"]["Dense_0"]["kernel"]
        )
        w = sd[f"model.dense_arch.model._mlp.{i}._linear.weight"].numpy()
        np.testing.assert_allclose(k, w.T, rtol=1e-6)
    hk = np.asarray(p["over_arch"]["head"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(
        hk, sd["model.over_arch.model.1.weight"].numpy().T, rtol=1e-6
    )

    # dense-arch MLP math parity: torch forward == numpy relu chain over
    # the imported flax tree (validates layer order + transpose, not
    # just placement)
    x = np.random.RandomState(1).randn(5, DENSE_IN).astype(np.float32)
    t_out = torch.from_numpy(x)
    for i in range(2):
        t_out = torch.relu(
            t_out @ sd[f"model.dense_arch.model._mlp.{i}._linear.weight"].T
            + sd[f"model.dense_arch.model._mlp.{i}._linear.bias"]
        )
    f_out = x
    for i in range(2):
        layer = p["dense_arch"]["MLP_0"][f"Perceptron_{i}"]["Dense_0"]
        f_out = np.maximum(
            f_out @ np.asarray(layer["kernel"]) + np.asarray(layer["bias"]),
            0.0,
        )
    np.testing.assert_allclose(f_out, t_out.numpy(), rtol=1e-5, atol=1e-6)

    # and the imported params change the live model's loss
    dense, sb, labels = _batch(4)
    step = dmp.make_train_step(donate=False)
    assert float(step(new_state, dense, sb, labels)[1]) != float(
        step(state, dense, sb, labels)[1]
    )


def test_import_dlrm_dense_shape_mismatch_raises(dmp_state):
    from torchrec_tpu.utils.torch_interop import import_dlrm_dense

    dmp, state = dmp_state
    sd = {"model.dense_arch.model._mlp.0._linear.weight":
          torch.zeros(16, DENSE_IN + 1)}
    with pytest.raises(ValueError, match="shape"):
        import_dlrm_dense(dmp, state, sd)


def test_import_dlrm_dense_no_match_raises(dmp_state):
    from torchrec_tpu.utils.torch_interop import import_dlrm_dense

    dmp, state = dmp_state
    with pytest.raises(ValueError, match="no reference DLRM dense"):
        import_dlrm_dense(dmp, state, {"x.weight": torch.zeros(2, 2)})


class _FakeDmp:
    """Matching-logic harness: two modules with a shared table name."""

    _kinds = {"a/ebc": "ebc", "b/ebc": "ebc"}

    def __init__(self):
        self.loaded = None

    def state_dict(self, state):
        return {
            "dense": {},
            "embeddings/a/ebc": {"shared": np.zeros((4, 2), np.float32)},
            "embeddings/b/ebc": {"shared": np.ones((4, 2), np.float32)},
        }

    def load_tables(self, state, tables):
        self.loaded = tables
        return state


def test_import_ambiguous_table_uses_torch_path():
    fake = _FakeDmp()
    sd = {"x.b.ebc.embedding_bags.shared.weight": torch.full((4, 2), 7.0)}
    _, report = import_torch_state_dict(fake, None, sd)
    assert report.loaded == {"b/ebc": ["shared"]}
    np.testing.assert_allclose(fake.loaded["b/ebc"]["shared"], 7.0)


def test_import_ambiguous_table_without_path_raises():
    fake = _FakeDmp()
    sd = {"embedding_bags.shared.weight": torch.zeros(4, 2)}
    with pytest.raises(ValueError, match="ambiguous"):
        import_torch_state_dict(fake, None, sd)


def test_export_roundtrip(dmp_state):
    """export -> a reference-style sd -> import restores bit-exact."""
    dmp, state = dmp_state
    # train a step so the exported tables differ from init
    state1, _, _ = dmp.make_train_step(donate=False)(state, *_batch(2))
    sd = export_torch_state_dict(dmp, state1)
    assert set(sd) == {
        f"dlrm.embedding_bag_collection.embedding_bags.t{i}.weight"
        for i in range(3)
    }
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    state2, report = import_torch_state_dict(dmp, state, sd)
    assert report.num_tables == 3
    a = dmp.state_dict(state1)["embeddings/dlrm/embedding_bag_collection"]
    b = dmp.state_dict(state2)["embeddings/dlrm/embedding_bag_collection"]
    for t in a:
        np.testing.assert_array_equal(
            np.asarray(a[t], np.float32), np.asarray(b[t], np.float32)
        )


def test_export_ec_uses_embeddings_attr():
    fake = _FakeDmp()
    fake._kinds = {"a/ebc": "ebc", "b/ec": "ec"}

    def sd(state):
        return {
            "embeddings/a/ebc": {"w1": np.zeros((2, 2), np.float32)},
            "embeddings/b/ec": {"w2": np.zeros((2, 2), np.float32)},
        }

    fake.state_dict = sd
    out = export_torch_state_dict(fake, None, as_torch=False)
    assert set(out) == {
        "a.ebc.embedding_bags.w1.weight", "b.ec.embeddings.w2.weight"
    }


def test_import_bf16_checkpoint(dmp_state):
    # reference checkpoints trained in bf16: .numpy() raises on bf16
    # torch tensors, so the importer must upcast before converting
    dmp, state = dmp_state
    sd = {
        k: (v.to(torch.bfloat16) if v.ndim == 2 and "embedding_bags" in k
            else v)
        for k, v in _torch_sd().items()
    }
    new_state, report = import_torch_state_dict(dmp, state, sd)
    assert report.num_tables == 3
    got = dmp.state_dict(new_state)
    key = next(k for k in got if k.startswith("embeddings/"))
    want = sd[
        "model.sparse_arch.embedding_bag_collection.embedding_bags"
        ".t0.weight"
    ].float().numpy()
    np.testing.assert_allclose(got[key]["t0"], want, rtol=2e-2, atol=2e-2)
