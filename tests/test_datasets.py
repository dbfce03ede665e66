"""Dataset tests (ref: torchrec/datasets/tests/test_criteo.py with tmp
TSV/npy fixtures)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.datasets.criteo import (
    CAT_FEATURE_COUNT,
    INT_FEATURE_COUNT,
    BinaryCriteoUtils,
    InMemoryBinaryCriteoIterDataPipe,
    criteo_kaggle,
    parse_criteo_tsv,
    _parse_tsv_numpy,
    _native_parser,
)
from torchrec_tpu.datasets.random import RandomRecDataset
from torchrec_tpu.datasets.utils import Batch, rand_split_train_val
from torchrec_tpu.parallel.train_pipeline import TrainPipeline


def _write_tsv(path, rows=10, seed=0, missing=False):
    rng = np.random.RandomState(seed)
    lines = []
    for i in range(rows):
        label = rng.randint(0, 2)
        dense = [str(rng.randint(0, 1000)) for _ in range(INT_FEATURE_COUNT)]
        cats = ["%08x" % rng.randint(0, 2**31) for _ in range(CAT_FEATURE_COUNT)]
        if missing and i % 3 == 0:
            dense[2] = ""
            cats[5] = ""
        lines.append("\t".join([str(label)] + dense + cats))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_native_parser_matches_python(tmp_path):
    p = str(tmp_path / "day_0.tsv")
    _write_tsv(p, rows=50, missing=True)
    ref = _parse_tsv_numpy(p)
    got = parse_criteo_tsv(p)
    if _native_parser() is None:
        pytest.skip("native parser unavailable")
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_tsv_to_npys_and_loader(tmp_path):
    p = str(tmp_path / "day_0.tsv")
    _write_tsv(p, rows=64)
    d, s, l = (str(tmp_path / f"day_0_{k}.npy") for k in ("dense", "sparse", "labels"))
    BinaryCriteoUtils.tsv_to_npys(p, d, s, l)
    dense = np.load(d)
    assert dense.shape == (64, INT_FEATURE_COUNT) and dense.dtype == np.float32
    assert (dense >= np.log(3.0) - 1e-5).all()  # log(x+3), x >= 0
    sparse = np.load(s)
    assert sparse.shape == (64, CAT_FEATURE_COUNT) and sparse.dtype == np.int32
    labels = np.load(l)
    assert labels.shape == (64, 1)

    pipe = InMemoryBinaryCriteoIterDataPipe(
        [d], [s], [l], batch_size=16, hashes=[1000] * CAT_FEATURE_COUNT
    )
    batches = list(pipe)
    assert len(batches) == 4 == len(pipe)
    b = batches[0]
    assert b.dense_features.shape == (16, INT_FEATURE_COUNT)
    assert b.sparse_features.ids.shape == (CAT_FEATURE_COUNT, 16, 1)
    assert int(b.sparse_features.ids.max()) < 1000
    assert b.labels.shape == (16,)


def test_loader_rank_split(tmp_path):
    p = str(tmp_path / "day_0.tsv")
    _write_tsv(p, rows=40)
    d, s, l = (str(tmp_path / f"f_{k}.npy") for k in ("dense", "sparse", "labels"))
    BinaryCriteoUtils.tsv_to_npys(p, d, s, l)
    full = np.load(d)
    parts = []
    for rank in range(4):
        pipe = InMemoryBinaryCriteoIterDataPipe(
            [d], [s], [l], batch_size=10, rank=rank, world_size=4
        )
        parts.append(pipe.dense)
    np.testing.assert_allclose(np.concatenate(parts), full)


def test_get_file_idx_to_row_range():
    rr = BinaryCriteoUtils.get_file_idx_to_row_range([10, 20, 10], rank=1,
                                                     world_size=2)
    # total 40, rank1 gets global rows 20..39 -> file1 local 10..19, file2 all
    assert rr == {1: (10, 19), 2: (0, 9)}


def test_load_npy_range(tmp_path):
    p = str(tmp_path / "a.npy")
    arr = np.arange(50, dtype=np.int32).reshape(10, 5)
    np.save(p, arr)
    out = BinaryCriteoUtils.load_npy_range(p, 3, 4)
    np.testing.assert_array_equal(out, arr[3:7])
    with pytest.raises(ValueError):
        BinaryCriteoUtils.load_npy_range(p, 8, 5)


def test_sparse_to_contiguous(tmp_path):
    a = np.asarray([[11, 7], [22, 7], [22, 9]], np.int32)
    b = np.asarray([[33, 7], [11, 9]], np.int32)
    pa, pb = str(tmp_path / "day_0.npy"), str(tmp_path / "day_1.npy")
    np.save(pa, a)
    np.save(pb, b)
    out = str(tmp_path / "out")
    BinaryCriteoUtils.sparse_to_contiguous(
        [pa, pb], out, frequency_threshold=2, columns=2
    )
    a2 = np.load(os.path.join(out, "day_0_contig_freq.npy"))
    b2 = np.load(os.path.join(out, "day_1_contig_freq.npy"))
    # col0: 11 appears 2x -> 2; 22 appears 2x -> 3; 33 once -> 1
    np.testing.assert_array_equal(a2[:, 0], [2, 3, 3])
    np.testing.assert_array_equal(b2[:, 0], [1, 2])
    # col1: 7 appears 3x -> 2; 9 twice -> 3
    np.testing.assert_array_equal(a2[:, 1], [2, 2, 3])
    np.testing.assert_array_equal(b2[:, 1], [2, 3])


def test_criteo_tsv_reader(tmp_path):
    p = str(tmp_path / "x.tsv")
    _write_tsv(p, rows=5)
    rows = list(criteo_kaggle(p))
    assert len(rows) == 5
    assert set(rows[0].keys()) == {
        "label", *{f"int_{i}" for i in range(13)}, *{f"cat_{i}" for i in range(26)}
    }


def test_random_rec_dataset():
    ds = RandomRecDataset(
        keys=["a", "b"], batch_size=8, hash_sizes=[100, 50],
        ids_per_feature=3, num_dense=4, num_batches=5, manual_seed=7,
    )
    batches = list(ds)
    assert len(batches) == 5
    b = batches[0]
    assert b.dense_features.shape == (8, 4)
    assert b.sparse_features.ids.shape == (2, 8, 3)
    assert int(b.sparse_features.ids[1].max()) < 50
    # deterministic with manual_seed
    again = list(RandomRecDataset(keys=["a", "b"], batch_size=8,
                                  hash_sizes=[100, 50], ids_per_feature=3,
                                  num_dense=4, num_batches=5, manual_seed=7))
    np.testing.assert_array_equal(
        np.asarray(b.sparse_features.ids),
        np.asarray(again[0].sparse_features.ids),
    )


def test_rand_split_train_val():
    train, val = rand_split_train_val(list(range(100)), 0.8, random_seed=1)
    tr, va = list(train), list(val)
    assert len(tr) + len(va) == 100
    assert 60 <= len(tr) <= 95
    assert set(tr).isdisjoint(va)


def test_train_pipeline_runs():
    import jax

    ds = RandomRecDataset(keys=["a"], batch_size=4, hash_size=10,
                          ids_per_feature=1, num_dense=2, num_batches=6)

    def train_step(state, batch):
        return state + 1, jnp.mean(batch.dense_features), None

    pipe = TrainPipeline(jax.jit(train_step, static_argnums=()), state=jnp.zeros(()))
    it = iter(ds)
    n = 0
    while True:
        try:
            loss, _ = pipe.progress(it)
            n += 1
        except StopIteration:
            break
    assert n == 6
    assert int(pipe.state) == 6


def test_preproc_scripts_cli(tmp_path):
    """End-to-end CLI: tsv -> npy -> contiguous (ref:
    datasets/scripts/{npy,contiguous}_preproc_criteo.py)."""
    from torchrec_tpu.datasets.scripts import (
        contiguous_preproc_criteo,
        npy_preproc_criteo,
    )
    from torchrec_tpu.datasets.criteo import (
        CAT_FEATURE_COUNT,
        INT_FEATURE_COUNT,
    )

    raw = tmp_path / "raw"
    npy = tmp_path / "npy"
    contig = tmp_path / "contig"
    raw.mkdir(), npy.mkdir(), contig.mkdir()
    rng = np.random.RandomState(0)
    rows = 12
    lines = []
    for _ in range(rows):
        label = str(rng.randint(0, 2))
        dense = [str(rng.randint(0, 9)) for _ in range(INT_FEATURE_COUNT)]
        sparse = [
            format(rng.randint(0, 4), "x") for _ in range(CAT_FEATURE_COUNT)
        ]
        lines.append("\t".join([label] + dense + sparse))
    (raw / "day_0").write_text("\n".join(lines) + "\n")

    npy_preproc_criteo.main(
        ["--input_dir", str(raw), "--output_dir", str(npy)]
    )
    assert sorted(p.name for p in npy.iterdir()) == [
        "day_0_dense.npy", "day_0_labels.npy", "day_0_sparse.npy",
    ]
    assert np.load(npy / "day_0_sparse.npy").shape == (rows, CAT_FEATURE_COUNT)

    contiguous_preproc_criteo.main(
        ["--input_dir", str(npy), "--output_dir", str(contig),
         "--frequency_threshold", "0"]
    )
    out = np.load(contig / "day_0_sparse_contig_freq.npy")
    assert out.shape == (rows, CAT_FEATURE_COUNT)
    assert out.min() >= 2  # contiguous ids start at 2


def test_criteo_undersampling(tmp_path):
    """undersampling keeps all positives and ~rate of negatives
    (ref: dlrm --undersampled_rate)."""
    from torchrec_tpu.datasets.criteo import InMemoryBinaryCriteoIterDataPipe

    rng = np.random.RandomState(0)
    N = 4000
    np.save(tmp_path / "d.npy", rng.randn(N, 13).astype(np.float32))
    np.save(tmp_path / "s.npy", rng.randint(0, 50, (N, 26)).astype(np.int32))
    labels = (rng.rand(N, 1) < 0.25).astype(np.int32)
    np.save(tmp_path / "l.npy", labels)
    pipe = InMemoryBinaryCriteoIterDataPipe(
        [str(tmp_path / "d.npy")], [str(tmp_path / "s.npy")],
        [str(tmp_path / "l.npy")], batch_size=64,
        undersampling_rate=0.2,
    )
    n_pos = int(labels.sum())
    n_neg = N - n_pos
    kept = pipe.labels.shape[0]
    assert pipe.labels.sum() == n_pos  # every positive kept
    frac_neg = (kept - n_pos) / n_neg
    assert 0.1 < frac_neg < 0.3


def test_native_stager_matches_numpy(tmp_path):
    """C++ threaded batch staging must produce exactly the numpy batch."""
    from torchrec_tpu.datasets.criteo import (
        InMemoryBinaryCriteoIterDataPipe,
        _native_stager,
    )

    if _native_stager() is None:
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.RandomState(0)
    N = 600
    np.save(tmp_path / "d.npy", rng.randn(N, 13).astype(np.float32))
    np.save(tmp_path / "s.npy", rng.randint(0, 99, (N, 26)).astype(np.int32))
    np.save(tmp_path / "l.npy", rng.randint(0, 2, (N, 1)).astype(np.int32))
    args = ([str(tmp_path / "d.npy")], [str(tmp_path / "s.npy")],
            [str(tmp_path / "l.npy")])
    pipe = InMemoryBinaryCriteoIterDataPipe(*args, batch_size=128)
    batch = pipe._make_batch(64)

    # numpy reference slice
    ref_dense = pipe.dense[64:192]
    ref_ids = pipe.sparse[64:192].T[:, :, None]
    ref_labels = pipe.labels[64:192, 0].astype(np.float32)
    np.testing.assert_array_equal(np.asarray(batch.dense_features), ref_dense)
    np.testing.assert_array_equal(
        np.asarray(batch.sparse_features.ids), ref_ids
    )
    np.testing.assert_array_equal(np.asarray(batch.labels), ref_labels)


def test_criteo_day_shuffle(tmp_path):
    """Global day-shuffle keeps the multiset of rows, permutes order, and
    passes the last (test) day through (ref: criteo.py:500-637)."""
    from torchrec_tpu.datasets.criteo import BinaryCriteoUtils

    rng = np.random.RandomState(0)
    days, rows = 3, 40
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir(), outd.mkdir()
    rows_per_day = {}
    all_sparse = []
    for d in range(days):
        dense = np.full((rows, 13), d, np.float32)
        sparse = rng.randint(0, 1000, (rows, 26)).astype(np.int32)
        labels = np.full((rows, 1), d, np.int32)
        np.save(ind / f"day_{d}_dense.npy", dense)
        np.save(ind / f"day_{d}_sparse.npy", sparse)
        np.save(ind / f"day_{d}_labels.npy", labels)
        rows_per_day[d] = rows
        if d < days - 1:
            all_sparse.append(sparse)
    BinaryCriteoUtils.shuffle(
        str(ind), str(ind), str(outd), rows_per_day, days=days, seed=0
    )
    out_sparse = np.concatenate([
        np.load(outd / f"day_{d}_sparse.npy") for d in range(days - 1)
    ])
    want = np.concatenate(all_sparse)
    # same multiset of rows, different order
    got_sorted = out_sparse[np.lexsort(out_sparse.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_array_equal(got_sorted, want_sorted)
    assert not np.array_equal(out_sparse, want)
    # test day untouched
    np.testing.assert_array_equal(
        np.load(outd / f"day_{days-1}_sparse.npy"),
        np.load(ind / f"day_{days-1}_sparse.npy"),
    )


def test_movielens_pipes(tmp_path):
    """ref: datasets/tests for movielens.py:81,112."""
    from torchrec_tpu.datasets.movielens import movielens_20m, movielens_25m

    (tmp_path / "ratings.csv").write_text(
        "userId,movieId,rating,timestamp\n"
        "1,10,4.5,100\n"
        "2,20,3.0,200\n"
    )
    (tmp_path / "movies.csv").write_text(
        'movieId,title,genres\n'
        '10,Toy Story,Animation|Comedy\n'
    )
    rows = list(movielens_20m(str(tmp_path)))
    assert rows[0] == {"userId": 1, "movieId": 10, "rating": 4.5,
                       "timestamp": 100}
    rows = list(movielens_25m(str(tmp_path), include_movies_data=True))
    assert rows[0]["title"] == "Toy Story"
    assert rows[1]["genres"] == ""  # movie 20 missing from movies.csv


def test_parallel_read_concat_and_splits():
    """ref: datasets/utils.py:307 ParallelReadConcat + train/val split."""
    from torchrec_tpu.datasets.utils import (
        ParallelReadConcat,
        rand_split_train_val,
    )

    a = lambda: iter([1, 2, 3])
    b = lambda: iter([10, 20])
    merged = sorted(ParallelReadConcat(a, b))
    assert merged == [1, 2, 3, 10, 20]

    items = list(range(200))
    train_gen, val_gen = rand_split_train_val(items, train_perc=0.8)
    train, val = list(train_gen), list(val_gen)
    assert sorted(train + val) == items  # disjoint exhaustive split
    assert 0.7 < len(train) / len(items) < 0.9
