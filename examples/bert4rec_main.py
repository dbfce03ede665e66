"""BERT4Rec training CLI.

ref: examples/bert4rec/bert4rec_main.py:412 — MovieLens sequences,
masked-LM (cloze) training, leave-one-out HR@k / NDCG@k evaluation, and
a mode flag choosing model-parallel (DMP) vs pure data-parallel for the
item-embedding table (ref :487-519).

Usage (synthetic smoke run):
  python examples/bert4rec_main.py --synthetic --num_batches 50

MovieLens:
  python examples/bert4rec_main.py --movielens_dir DIR --dataset_name ml-1m
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import defaultdict
from typing import List, Optional

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="torchrec_tpu BERT4Rec")
    p.add_argument("--movielens_dir", type=str, default=None)
    p.add_argument("--dataset_name", type=str, default="ml-1m")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_ml1m", action="store_true",
                   help="ML-1M-calibrated synthetic sequences: 6040 "
                        "users, 3706-item vocab, Zipf item popularity, "
                        "the published per-user length distribution "
                        "(min 20, mean ~165), and genre-structured "
                        "transitions a sequence model can learn (real "
                        "ML-1M is unreachable without network egress)")
    p.add_argument("--mode", choices=["dmp", "dp"], default="dmp",
                   help="shard the item table (dmp) or replicate it (dp)")
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--emb_dim", type=int, default=64)
    p.add_argument("--nhead", type=int, default=2)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_batches", type=int, default=100)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--mask_prob", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--emb_lr", type=float, default=0.01)
    p.add_argument("--vocab_size", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_movielens_sequences(root: str) -> List[List[int]]:
    """Per-user chronological item sequences (ref: bert4rec dataloaders)."""
    from torchrec_tpu.datasets.movielens import _ratings

    per_user = defaultdict(list)
    for row in _ratings(root):
        per_user[row["userId"]].append((row["timestamp"], row["movieId"]))
    seqs = []
    remap = {}
    for user, items in per_user.items():
        items.sort()
        seq = []
        for _, m in items:
            if m not in remap:
                remap[m] = len(remap) + 1  # 0 is pad
            seq.append(remap[m])
        if len(seq) >= 5:
            seqs.append(seq)
    return seqs


def main(argv: Optional[List[str]] = None) -> dict:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp
    import optax

    from torchrec_tpu.models.bert4rec import (
        BERT4Rec,
        BERT4RecTrain,
        make_item_embedding_collection,
    )
    from torchrec_tpu.parallel import (
        DistributedModelParallel,
        ParameterSharding,
        ShardingEnv,
        ShardingPlan,
        ShardingType,
    )
    from torchrec_tpu.sparse import KeyedJaggedTensor
    from torchrec_tpu.utils.metrics import hr_at_k, ndcg_at_k

    rng = np.random.RandomState(args.seed)
    L = args.max_len

    if args.movielens_dir:
        seqs = load_movielens_sequences(args.movielens_dir)
        vocab = max(max(s) for s in seqs) + 2  # + pad + mask
    elif args.synthetic_ml1m:
        # ML-1M-shaped: 6040 users / 3706 movies / 1,000,209 ratings
        # (published stats). Items carry a latent genre; users watch a
        # small genre mixture with Zipf-popular items inside each — the
        # learnable structure standing in for real taste clusters.
        from torchrec_tpu.datasets.synthetic_criteo import zipf_ids

        n_users, n_items, n_genres = 6040, 3706, 64
        vocab = n_items + 2  # + pad(0) + mask
        g_of_item = zipf_ids(rng, n_genres, (n_items,), a=1.1)
        items_by_genre = [
            np.where(g_of_item == g)[0] + 1 for g in range(n_genres)
        ]
        items_by_genre = [
            it if len(it) else np.asarray([1]) for it in items_by_genre
        ]
        seqs = []
        for _ in range(n_users):
            # published per-user count distribution: min 20, mean ~165
            n = int(np.clip(rng.lognormal(4.56, 0.95), 20, 1000))
            genres = zipf_ids(rng, n_genres, (3,), a=1.1)
            cur = genres[rng.randint(3)]
            s = []
            for _ in range(n):
                if rng.rand() < 0.2:
                    cur = genres[rng.randint(3)]
                pool = items_by_genre[cur]
                s.append(int(pool[zipf_ids(rng, len(pool), (1,), 1.05)[0]]))
            seqs.append(s)
    else:
        # synthetic: shifted arithmetic sequences (learnable)
        vocab = args.vocab_size
        seqs = [
            list((np.arange(rng.randint(8, 2 * L)) * (1 + i % 3)
                  + rng.randint(1, vocab - 2)) % (vocab - 2) + 1)
            for i in range(512)
        ]
    MASK = vocab - 1
    B = args.batch_size

    def pad_seq(s):
        s = s[-L:]
        return [0] * (L - len(s)) + list(s)

    def make_train_batch():
        rows, labels = [], []
        for _ in range(B):
            s = pad_seq(seqs[rng.randint(len(seqs))][:-1])
            lab = np.zeros(L, np.int32)
            s = np.asarray(s, np.int32)
            m = (rng.rand(L) < args.mask_prob) & (s > 0)
            if not m.any():
                valid = np.where(s > 0)[0]
                m[valid[-1]] = True
            lab[m] = s[m]
            s = np.where(m, MASK, s)
            rows.append(s)
            labels.append(lab)
        ids = np.stack(rows)
        sb = KeyedJaggedTensor.from_lengths(
            ["item"], jnp.asarray(ids.reshape(-1)),
            jnp.asarray(np.full(B, L, np.int32)),
        ).to_padded(L)
        return sb, jnp.asarray(np.stack(labels))

    def make_eval_batch(idx):
        """Leave-one-out: mask the last item, rank it (ref bert4rec eval)."""
        rows, targets = [], []
        for i in idx:
            s = np.asarray(pad_seq(seqs[i]), np.int32)
            valid = np.where(s > 0)[0]
            t = int(s[valid[-1]])
            s[valid[-1]] = MASK
            rows.append(s)
            targets.append(t)
        ids = np.stack(rows)
        sb = KeyedJaggedTensor.from_lengths(
            ["item"], jnp.asarray(ids.reshape(-1)),
            jnp.asarray(np.full(len(idx), L, np.int32)),
        ).to_padded(L)
        return sb, np.asarray(targets), ids

    model = BERT4RecTrain(
        model=BERT4Rec(
            vocab_size=vocab, max_len=L, emb_dim=args.emb_dim,
            nhead=args.nhead, num_layers=args.num_layers, dropout=0.0,
            ec=make_item_embedding_collection(vocab, args.emb_dim, L),
        )
    )
    stype = (
        ShardingType.ROW_WISE if args.mode == "dmp"
        else ShardingType.DATA_PARALLEL
    )
    dmp = DistributedModelParallel(
        model,
        env=ShardingEnv.from_devices(),
        plan=ShardingPlan({"model/ec": {
            "item_embedding": ParameterSharding(stype)}}),
        fused_params={"learning_rate": args.emb_lr},
        dense_optimizer=optax.adam(args.lr),
    )
    sb, labels = make_train_batch()
    state = dmp.init(jax.random.PRNGKey(args.seed), sb, labels)
    eval_fwd = jax.jit(lambda st, sb, lab: dmp.forward(st, sb, lab))

    # Device-resident masked-LM batch generation fused into ONE executable
    # with the train step (host batch prep costs a relay roundtrip per
    # batch on remote-attached TPUs). The padded train-sequence pool is
    # uploaded once; sampling + masking run under the same jit.
    from functools import partial

    from torchrec_tpu.sparse import PaddedSparseBatch

    pool = jax.device_put(jnp.asarray(np.stack(
        [pad_seq(s[:-1]) for s in seqs]
    ).astype(np.int32)))  # [n_seq, L]
    n_seq = pool.shape[0]
    raw_step = dmp.make_train_step(jit=False)

    @jax.jit
    def fused_step(state, key):
        k1, k2 = jax.random.split(jax.random.fold_in(key, state.step))
        s = pool[jax.random.randint(k1, (B,), 0, n_seq)]  # [B, L]
        m = (jax.random.uniform(k2, (B, L)) < args.mask_prob) & (s > 0)
        # guarantee >= 1 masked position per row (mask the last valid)
        lastv = L - 1 - jnp.argmax((s > 0)[:, ::-1], axis=1)
        force = (~m.any(axis=1))[:, None] & (s > 0)
        m = m | (jax.nn.one_hot(lastv, L, dtype=bool) & force)
        lab = jnp.where(m, s, 0)
        ids = jnp.where(m, MASK, s)
        sb2 = PaddedSparseBatch(
            ids=ids[None], lengths=jnp.full((1, B), L, jnp.int32),
            keys=("item",),
        )
        return raw_step(state, sb2, lab)

    key0 = jax.device_put(jax.random.PRNGKey(args.seed + 99))
    state, _l, _ = fused_step(state, key0)  # compile outside the window
    float(_l)

    results = {}
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = None
        key = jax.device_put(jax.random.PRNGKey(args.seed + 31 * epoch))
        cpu = jax.default_backend() == "cpu"
        for i in range(args.num_batches):
            state, loss, _ = fused_step(state, key)
            if cpu and i % 25 == 24:
                # CPU backend: an unbounded async dispatch queue
                # deadlocks the in-process collectives
                # (AwaitAndLogIfStuck); TPU skips the sync — a host
                # roundtrip through the relay costs ~29 ms
                float(loss)
        float(loss)
        dt = time.perf_counter() - t0
        print(
            f"epoch {epoch} ({args.mode}): "
            f"{args.num_batches * B / dt:,.0f} seq/s, "
            f"loss {float(loss):.4f}"
        )

        # leave-one-out eval on a sample of users
        n_eval = min(len(seqs), 256)
        idx = list(range(n_eval))
        hrs, ndcgs = [], []
        for lo in range(0, n_eval, B):
            chunk = idx[lo : lo + B]
            if len(chunk) < B:
                break
            sbe, targets, ids = make_eval_batch(chunk)
            _, (_, logits) = eval_fwd(
                state, sbe, jnp.zeros((B, L), jnp.int32)
            )
            # score at each row's masked (last valid) position
            scores = []
            for b in range(B):
                pos = np.where(ids[b] == MASK)[0][-1]
                scores.append(np.asarray(logits[b, pos]))
            scores = np.stack(scores)
            hrs.append(hr_at_k(scores, targets, 10))
            ndcgs.append(ndcg_at_k(scores, targets, 10))
        results = {
            "hr@10": float(np.mean(hrs)),
            "ndcg@10": float(np.mean(ndcgs)),
        }
        print(f"epoch {epoch}: HR@10 {results['hr@10']:.4f} "
              f"NDCG@10 {results['ndcg@10']:.4f}")
    return results


if __name__ == "__main__":
    main()
