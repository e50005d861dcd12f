"""Uniform sweep-wide shape buckets (VERDICT r2 "Next" #4).

Per-period shape buckets made round 2's faithful cold sweep spend ~700 s
compiling variants of the same programs. With ``uniform_shapes`` every
period of a stream pads to ONE sweep-wide shape (rows, sampling index, eval
sets), so each op compiles once per sweep.
"""

import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.data.formats import row_count
from sml_tpu.ops.batching import pad_rows
from sml_tpu.ops.sampling import build_period_index
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine


def _cfg(**kw):
    base = dict(multi_num=1, mf_batch_size=256, tr_batch_size=128,
                eval_batch_size=256, latent_dim=8,
                transfer=TransferConfig(latent_dim=8, fc_hidden=32),
                mf_sample="alone")
    base.update(kw)
    return SMLConfig(**base)


def test_row_count_matches_load(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    from sml_tpu.data.formats import load_test, load_train
    for p in range(dspec.num_periods):
        assert row_count(dspec.path, "train", p) == \
            load_train(dspec.path, p).shape[0]
        t = load_test(dspec.path, p)
        rc = row_count(dspec.path, "test", p)
        assert (rc is None) == (t is None)
        if t is not None:
            assert rc == t.shape[0]
    assert row_count(dspec.path, "train", 999) is None


def test_pad_rows_floor():
    arr = np.ones((100, 3), dtype=np.int64)
    assert pad_rows(arr, 64).rows.shape[0] == 128
    assert pad_rows(arr, 64, pad_to=1000).rows.shape[0] == 1024
    # floor below the natural bucket is a no-op
    assert pad_rows(arr, 64, pad_to=50).rows.shape[0] == 128
    assert pad_rows(arr, 64, pad_to=1000).n_real == 100
    # the floor is itself bucketed: the stream's LARGEST period (whose
    # natural bucket is coarser than ceil-to-batch) must share the shape
    big = np.ones((1190, 3), dtype=np.int64)
    assert pad_rows(arr, 64, pad_to=1190).rows.shape \
        == pad_rows(big, 64).rows.shape


def test_period_index_min_rows_one_shape(rng):
    n_items = 500
    shapes = set()
    for n in (300, 700, 1100):
        rows = np.stack([rng.integers(0, 200, n),
                         rng.integers(0, n_items, n)], axis=1)
        idx = build_period_index(rows, n_items, min_rows=1100)
        shapes.add((idx.item_pool.shape, idx.pos_hashes.shape,
                    idx.bloom.shape))
    assert len(shapes) == 1
    # padded index still rejects true positives and samples from the pool
    assert int(idx.pool_size) == len(np.unique(rows[:, 1]))


def test_driver_uniform_shapes_single_bucket(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    engine = SMLEngine(_cfg(), info.n_users, info.n_items)
    driver = SMLDriver(_cfg(), dspec, engine=engine)
    bounds = driver.feeder.shape_bounds()
    assert engine.shape_targets == bounds
    assert bounds["set_t"] > 0 and bounds["eval"] > 0

    shapes = {"t": set(), "tt": set(), "idx": set(), "eval": set()}
    driver.feeder.reinit()
    d_time = 0
    while True:
        sd = driver.feeder.next_train(d_time)
        if sd.set_t is None:
            break
        pt, it = engine.prep_inner(sd.set_t)
        shapes["t"].add(pt.rows.shape)
        if it is not None:
            shapes["idx"].add((it.item_pool.shape, it.pos_hashes.shape,
                               it.bloom.shape))
        if sd.set_tt is not None:
            ptt, _ = engine.prep_outer(sd.set_tt)
            shapes["tt"].add(ptt.rows.shape)
        for ev in (sd.now_test, sd.val):
            if ev is not None:
                shapes["eval"].add(engine.make_eval_set(ev).rows.shape)
        d_time += 1
    assert d_time >= 3
    for kind, seen in shapes.items():
        assert len(seen) == 1, (kind, seen)


def test_upload_dedup_shares_buffers(synthetic_dataset, rng):
    """The content-keyed upload LRU: repeated make_eval_set of the same
    matrix returns the SAME device buffers, and an 'all'-mode training
    pool shares the eval upload when the driver unified the bounds."""
    dspec, info, spec = synthetic_dataset
    cfg = _cfg(mf_sample="all", mf_batch_size=256, eval_batch_size=256)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    assert engine.shape_targets["set_t"] == engine.shape_targets["eval"]

    from sml_tpu.data.formats import load_test
    rows = load_test(dspec.path, dspec.online_test_start)
    a = engine.make_eval_set(rows)
    b = engine.make_eval_set(rows.copy())          # same content, new array
    assert a.rows is b.rows
    padded, index = engine.prep_inner(rows.copy())  # 'all' training pool
    assert padded.rows is a.rows and index is None

    # different content misses
    other = rows.copy()
    other[0, 0] = (other[0, 0] + 1) % info.n_users
    c = engine.make_eval_set(other)
    assert c.rows is not a.rows

    # LRU evicts beyond cap without losing correctness
    for p in range(dspec.online_test_start, dspec.num_periods):
        t = load_test(dspec.path, p)
        if t is not None:
            engine.make_eval_set(t)
    assert len(engine._upload_cache) <= engine._upload_cache_cap

    # dedup off -> fresh buffers, same values
    cfg2 = _cfg(mf_sample="all", mf_batch_size=256, eval_batch_size=256,
                upload_dedup=False)
    engine2 = SMLEngine(cfg2, info.n_users, info.n_items)
    SMLDriver(cfg2, dspec, engine=engine2)
    d1 = engine2.make_eval_set(rows)
    d2 = engine2.make_eval_set(rows)
    assert d1.rows is not d2.rows
    np.testing.assert_array_equal(np.asarray(d1.rows), np.asarray(a.rows))


def test_uniform_shapes_trains_correctly(synthetic_dataset):
    """End-to-end: the uniform-bucket run reports sane metrics (and the
    padded tails/oversized index change no eval math: recall well above
    the 1/(1+neg) random floor)."""
    dspec, info, spec = synthetic_dataset
    engine = SMLEngine(_cfg(uniform_shapes=True), info.n_users, info.n_items)
    driver = SMLDriver(_cfg(uniform_shapes=True), dspec, engine=engine)
    report = driver.run(engine.init_state())
    assert len(report.test_counts) == 3
    random_floor = 5 / (1 + spec.neg_num)
    assert report.summary()["test_recall@5"] > random_floor
