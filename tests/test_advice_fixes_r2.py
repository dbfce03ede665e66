"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. Adam-family bias correction computed in f32 even for bf16 tables
   (beta2**t in bf16 rounds 0.999 -> ~0.996 and ~2x-overscales early
   updates).
2. save_reshardable/load_reshardable cover FUSED_UVM_CACHING modules
   (host-offloaded tables + momenta were silently dropped; all-UVM
   modules crashed on ebc=None).
3. Eval under jit with UVM plans: make_eval_fn splits host staging out
   of the jitted region.
4. UvmEmbeddingBagCollection duplicate-combines a row id shared by two
   features of one table (one fused update per TABLE, matching the
   device path / FBGEMM exact semantics).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops.fused_update import (
    EmbOptimType,
    apply_fused_update,
    init_fused_optimizer_state,
)
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.parallel.types import ComputeKernel
from torchrec_tpu.sparse import KeyedJaggedTensor


def test_adam_bias_correction_f32_for_bf16_tables():
    """First Adam step on a bf16 table: update magnitude must match the
    f32 bias-corrected math. With beta**t computed in bf16 the step-1
    correction 1-beta2**1 becomes ~0.0039 instead of 0.001 and the
    update is ~2x too small/large depending on branch."""
    R, D = 8, 16
    rng = np.random.RandomState(0)
    w0 = rng.randn(R, D).astype(np.float32)
    g = rng.randn(4, D).astype(np.float32)
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)
    valid = jnp.ones((4,), bool)
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-8

    out = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        w = jnp.asarray(w0).astype(dtype)
        opt = init_fused_optimizer_state(R, D, EmbOptimType.ADAM)
        new_w, _ = apply_fused_update(
            w, opt, ids, jnp.asarray(g), valid, jnp.float32(lr),
            beta1=b1, beta2=b2, eps=eps, stochastic_rounding=False,
        )
        out[jnp.dtype(dtype).name] = np.asarray(
            new_w[:4].astype(jnp.float32) - w[:4].astype(jnp.float32)
        )

    # golden step-1 Adam in f64
    m1 = (1 - b1) * g.astype(np.float64)
    m2 = (1 - b2) * (g.astype(np.float64) ** 2)
    upd = -lr * (m1 / (1 - b1)) / (np.sqrt(m2 / (1 - b2)) + eps)
    np.testing.assert_allclose(out["float32"], upd, rtol=1e-5, atol=1e-6)
    # bf16 storage quantizes the result, but the SCALE must be right
    # (the r1 bug made it off by ~2x, far outside bf16's ~0.8% grid)
    np.testing.assert_allclose(out["bfloat16"], upd, rtol=0.05, atol=0.02)


class _M(nn.Module):
    ebc: nn.Module

    @nn.compact
    def __call__(self, sb, labels):
        """Call Args: sb padded sparse batch; labels [B]. Returns
        (loss, (loss, logits))."""
        logits = nn.Dense(1)(self.ebc(sb).values)[:, 0]
        y = labels.astype(logits.dtype)
        loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        return loss, (loss, logits)


def _uvm_dmp(all_uvm: bool):
    D = 16
    tables = (
        EmbeddingBagConfig(num_embeddings=96, embedding_dim=D, name="t0",
                           feature_names=["f0"]),
        EmbeddingBagConfig(num_embeddings=200, embedding_dim=D, name="t1",
                           feature_names=["f1"]),
    )
    model = _M(ebc=EmbeddingBagCollection(tables=tables, max_feature_length=2))
    uvm = lambda: ParameterSharding(
        ShardingType.TABLE_WISE,
        compute_kernel=ComputeKernel.FUSED_UVM_CACHING, ranks=[0],
    )
    plan = {
        "t0": uvm() if all_uvm else ParameterSharding(ShardingType.ROW_WISE),
        "t1": uvm(),
    }
    return DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"ebc": plan}),
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.05),
    )


def _uvm_batch(seed, B=16, L=2):
    r = np.random.RandomState(seed)
    lengths = r.randint(0, L + 1, size=(2 * B,)).astype(np.int32)
    rows = [96, 200]
    vals = np.concatenate(
        [r.randint(0, rows[i // B], size=(lengths[i],))
         for i in range(len(lengths))]
        + [np.zeros((0,), np.int64)]
    ).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        ["f0", "f1"], jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)
    labels = jnp.asarray((r.rand(B) > 0.5).astype(np.float32))
    return sb, labels


@pytest.mark.parametrize("all_uvm", [False, True])
def test_uvm_reshardable_checkpoint_roundtrip(tmp_path, all_uvm):
    """save_reshardable captures host-offloaded tables AND their momenta;
    load resumes training identically to the uninterrupted run (device +
    UVM tables both, incl. the all-UVM module where the device EBC is
    None — the r1 AttributeError case)."""
    from torchrec_tpu.utils.checkpoint import (
        load_reshardable,
        save_reshardable,
    )

    dmp = _uvm_dmp(all_uvm)
    sb, labels = _uvm_batch(0)
    state = dmp.init(jax.random.PRNGKey(1), sb, labels)
    step = dmp.make_train_step(donate=False)
    for i in range(2):
        state, _, _ = step(state, *_uvm_batch(i))

    path = str(tmp_path / "ck.npz")
    save_reshardable(path, dmp, state)
    data = np.load(path)
    assert any(k == "tables/ebc/t1" for k in data.files), data.files
    assert any(k.startswith("uvmopt/ebc/t1") for k in data.files)

    # control: continue the original run
    state_c, _, _ = step(state, *_uvm_batch(9))
    want = dmp.state_dict(state_c)

    # resume: fresh DMP, load, same step
    dmp2 = _uvm_dmp(all_uvm)
    s2 = dmp2.init(jax.random.PRNGKey(33), sb, labels)
    s2 = load_reshardable(path, dmp2, s2)
    step2 = dmp2.make_train_step(donate=False)
    s2, _, _ = step2(s2, *_uvm_batch(9))
    got = dmp2.state_dict(s2)
    for name in ("t0", "t1"):
        np.testing.assert_allclose(
            got["embeddings/ebc"][name], want["embeddings/ebc"][name],
            rtol=1e-6, atol=1e-7, err_msg=name,
        )


def test_make_eval_fn_jit_with_uvm_plan():
    """Jitted eval on a plan holding FUSED_UVM_CACHING tables: forward()
    cannot be wrapped in jax.jit (host staging), make_eval_fn can."""
    dmp = _uvm_dmp(all_uvm=False)
    sb, labels = _uvm_batch(0)
    state = dmp.init(jax.random.PRNGKey(1), sb, labels)
    want_loss, (_, want_logits) = dmp.forward(state, sb, labels)
    eval_fn = dmp.make_eval_fn()
    loss, (_, logits) = eval_fn(state, sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want_logits), rtol=1e-6
    )
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)


def test_uvm_shared_table_duplicate_combined_update():
    """A row id under TWO features of one table in the same batch gets ONE
    duplicate-combined rowwise-Adagrad update (not two sequential ones):
    parity with apply_fused_update over the concatenated features."""
    from torchrec_tpu.parallel.uvm_ebc import UvmEmbeddingBagCollection

    R, D, B = 32, 8, 4
    t = EmbeddingBagConfig(
        num_embeddings=R, embedding_dim=D, name="t",
        feature_names=["fa", "fb"],
    )
    rng = np.random.RandomState(0)
    w0 = rng.randn(R, D).astype(np.float32)
    uvm = UvmEmbeddingBagCollection(
        (t,), {"t": w0}, optim=EmbOptimType.ROWWISE_ADAGRAD,
        optim_kwargs={"stochastic_rounding": False},
    )

    # id 5 appears under BOTH features for sample 0
    ids = np.zeros((2, B, 1), np.int32)
    ids[0, :, 0] = [5, 1, 2, 3]
    ids[1, :, 0] = [5, 7, 8, 9]
    lengths = np.ones((2, B), np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        ["fa", "fb"],
        jnp.asarray(ids.reshape(-1)),
        jnp.asarray(lengths.reshape(-1)),
    ).to_padded(1)
    d_values = rng.randn(B, 2 * D).astype(np.float32)
    uvm.update(sb, jnp.asarray(d_values), 0.1)
    got = uvm.state_dict()["t"]

    # golden: one fused update over both features' (id, grad) lists
    opt = init_fused_optimizer_state(R, D, EmbOptimType.ROWWISE_ADAGRAD)
    flat_ids = jnp.asarray(
        np.concatenate([ids[0].reshape(-1), ids[1].reshape(-1)])
    )
    grads = jnp.asarray(
        np.concatenate([d_values[:, :D], d_values[:, D:]], axis=0)
    )
    valid = jnp.ones((2 * B,), bool)
    want, _ = apply_fused_update(
        jnp.asarray(w0), opt, flat_ids, grads, valid, jnp.float32(0.1),
        stochastic_rounding=False,
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_tower_accepts_input_routing_fused_param():
    """fused_params carrying strategy-only knobs (input_routing) must not
    leak into the tower collection's apply_fused_update call."""
    from torchrec_tpu.modules.embedding_tower import (
        EmbeddingTower,
        EmbeddingTowerCollection,
    )
    from torchrec_tpu.modules.mlp import MLP

    class M(nn.Module):
        etc: EmbeddingTowerCollection

        @nn.compact
        def __call__(self, sb, labels):
            """Call Args: sb padded batch; labels [B]. Returns
            (loss, (loss, logits))."""
            logits = nn.Dense(1)(self.etc(sb))[:, 0]
            loss = jnp.mean((logits - labels) ** 2)
            return loss, (loss, logits)

    tower = EmbeddingTower(
        embedding_module=EmbeddingBagCollection(
            tables=(EmbeddingBagConfig(
                num_embeddings=32, embedding_dim=8, name="tt",
                feature_names=["ft"]),),
            max_feature_length=1,
        ),
        interaction_module=MLP(layer_sizes=(4,)),
    )
    model = M(etc=EmbeddingTowerCollection(towers=(tower,)))
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": 0.1, "input_routing": "a2a"},
    )
    rng = np.random.RandomState(0)
    sb = KeyedJaggedTensor.from_lengths(
        ["ft"], jnp.asarray(rng.randint(0, 32, 8).astype(np.int32)),
        jnp.asarray(np.ones(8, np.int32)),
    ).to_padded(1)
    labels = jnp.zeros((8,), jnp.float32)
    state = dmp.init(jax.random.PRNGKey(0), sb, labels)
    step = dmp.make_train_step(donate=False)
    _, loss, _ = step(state, sb, labels)  # r2 advisor: raised TypeError
    assert np.isfinite(float(loss))


def test_zipf_a_exactly_one_device_generator():
    """zipf_a=1.0 (the classic exponent) must not divide by zero in the
    on-device generators."""
    from torchrec_tpu.datasets.random import RandomRecDataset
    from torchrec_tpu.datasets.synthetic_criteo import SyntheticCriteoDataset

    gen = jax.jit(RandomRecDataset(
        keys=["f0"], batch_size=16, hash_sizes=[1000],
        ids_per_feature=1, num_dense=2, on_device=True, zipf_a=1.0,
    ).device_batch_fn())
    b = gen(jax.random.PRNGKey(0))
    ids = np.asarray(b.sparse_features.ids)
    assert ids.min() >= 0 and ids.max() < 1000

    ds = SyntheticCriteoDataset(batch_size=64, zipf_a=1.0,
                                max_ind_range=1000)
    b2 = jax.jit(ds.device_batch_fn())(jax.random.PRNGKey(1))
    assert int(np.asarray(b2.sparse_features.ids).max()) < 1000


def test_single_column_shard_momentum_reshards():
    """CW on a 1-device mesh saves [1, R] rowwise momentum; reloading it
    into a padded multi-device RW plan must flatten to row space (r2
    advisor finding)."""
    from torchrec_tpu.parallel.strategies import (
        BaseEmbeddingShardingStrategy,
    )

    import pytest

    arr = np.arange(10, dtype=np.float32)[None]  # [1, R]
    out = BaseEmbeddingShardingStrategy._convert_rowspace(arr, 1)
    assert out.ndim == 1 and np.array_equal(out, np.arange(10))
    # r3 corrected semantics (ADVICE r2): the accumulator is mean(g²)
    # over local columns, so expansion REPLICATES the full-row value
    # into each shard (and warns about the approximation)
    with pytest.warns(UserWarning, match="not recoverable"):
        out4 = BaseEmbeddingShardingStrategy._convert_rowspace(arr, 4)
    assert out4.shape == (4, 10)
    for s in range(4):
        np.testing.assert_allclose(out4[s], np.arange(10))
