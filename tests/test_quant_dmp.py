"""Quantized inference THROUGH the distributed stack (VERDICT r1 item 3):
the reference's §3.5 call chain train -> quantize_embeddings -> shard
over an inference env -> package -> load -> serve, end-to-end
(ref: quant_embeddingbag.py:62-256, inference/modules.py:18-46,
model_parallel.py:43-47; examples/dlrm/dlrm_predict.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.inference import (
    PredictFactory,
    PredictFactoryPackager,
    PredictModule,
    quantize_embeddings,
    shard_quantized,
)
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.modules.embedding_configs import DataType
from torchrec_tpu.ops.fused_update import EmbOptimType
from torchrec_tpu.parallel import (
    DistributedModelParallel,
    ParameterSharding,
    ShardingEnv,
    ShardingPlan,
    ShardingType,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

B, L, D = 16, 2, 16


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


def _batch(seed):
    r = np.random.RandomState(seed)
    rows = [96, 200, 64]
    feats = ["f0", "f1", "f2"]
    lengths = r.randint(0, L + 1, size=(3 * B,)).astype(np.int32)
    vals = np.concatenate(
        [r.randint(0, rows[i // B], size=(lengths[i],))
         for i in range(len(lengths))]
        + [np.zeros((0,), np.int64)]
    ).astype(np.int32)
    sb = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(vals), jnp.asarray(lengths)
    ).to_padded(L)
    labels = jnp.asarray((r.rand(B) > 0.5).astype(np.float32))
    return sb, labels


@pytest.fixture(scope="module")
def trained():
    tables = tuple(
        EmbeddingBagConfig(num_embeddings=r, embedding_dim=D, name=f"t{i}",
                           feature_names=[f"f{i}"])
        for i, r in enumerate([96, 200, 64])
    )
    model = _M(ebc=EmbeddingBagCollection(tables=tables, max_feature_length=L))
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"ebc": {
            "t0": ParameterSharding(ShardingType.ROW_WISE),
            "t1": ParameterSharding(ShardingType.TABLE_WISE, ranks=[1]),
            "t2": ParameterSharding(ShardingType.COLUMN_WISE),
        }}),
        fused_optim=EmbOptimType.ROWWISE_ADAGRAD,
        fused_params={"learning_rate": 0.1},
        dense_optimizer=optax.sgd(0.05),
    )
    sb, labels = _batch(0)
    state = dmp.init(jax.random.PRNGKey(1), sb, labels)
    step = dmp.make_train_step(donate=False)
    for i in range(3):
        state, _, _ = step(state, *_batch(i))
    return dmp, state


def test_e2e_train_quantize_shard_package_serve(trained, tmp_path):
    """The full §3.5 chain in one test: train -> quantize_embeddings ->
    shard_quantized over ShardingEnv.from_local -> PredictFactoryPackager
    save -> load -> serve; the sharded served output matches the
    unsharded quantized module exactly (dequantization is
    deterministic)."""
    dmp, state = trained
    sb, labels = _batch(9)

    pm = quantize_embeddings(dmp, state, DataType.INT8)
    want_loss, (_, want_logits) = pm.predict(sb, labels)

    env = ShardingEnv.from_local(8)
    spm = shard_quantized(pm, env)
    # planned TW placement spread tables over more than one device
    sq = spm._sharded["ebc"]
    feat_pos = {f: i for i, f in enumerate(sq.features)}
    ranks = {
        t.name: int(sq.out_pos[feat_pos[t.feature_names[0]]]) // sq.f_max
        for t in sq.tables
    }
    assert len(set(ranks.values())) > 1, ranks
    loss, (_, logits) = spm.predict(sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want_logits), rtol=1e-5, atol=1e-6
    )

    class Factory(PredictFactory):
        def create_predict_module(self):
            return pm

        def batching_metadata(self):
            return pm.batching_metadata()

    path = str(tmp_path / "archive")
    PredictFactoryPackager.save_predict_factory(Factory(), path)
    meta = PredictFactoryPackager.load_metadata(path)
    assert meta["batching_metadata"]["f1"] == "sparse"

    pm2 = PredictModule.load(path, dmp)
    spm2 = shard_quantized(pm2, env)
    loss2, (_, logits2) = spm2.predict(sb, labels)
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(want_logits), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(loss2), float(want_loss), rtol=1e-5)


def test_sharded_quant_int4(trained):
    """int4 tables serve through the sharded path too."""
    dmp, state = trained
    sb, labels = _batch(11)
    pm = quantize_embeddings(dmp, state, DataType.INT4)
    want = np.asarray(pm.predict(sb, labels)[1][1])
    spm = shard_quantized(pm, ShardingEnv.from_local(4))
    got = np.asarray(spm.predict(sb, labels)[1][1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
