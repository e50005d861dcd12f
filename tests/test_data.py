"""Data layer: synthetic generator contract + feeder regime semantics."""

import numpy as np
import pytest

from sml_tpu.data.feeder import PeriodFeeder, StreamingPeriods
from sml_tpu.data.formats import load_info, load_test, load_train


def test_synthetic_contract(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    assert info.n_users == spec.n_users
    assert info.n_items == spec.n_items
    got = load_info(dspec.path)
    assert got == info

    for p in range(spec.n_periods):
        tr = load_train(dspec.path, p)
        assert tr.ndim == 2 and tr.shape[1] == 2
        assert tr[:, 0].max() < info.n_users
        assert tr[:, 1].max() < info.n_items

    # eval rows: [u, pos, negs...]; negatives must avoid the user's history
    # as known THROUGH that period (the incremental reference contract,
    # dataset2.py:376-399)
    hist = {}
    for p in range(spec.first_test_period + 1):
        for u, i in load_train(dspec.path, p):
            hist.setdefault(int(u), set()).add(int(i))
    rows = load_test(dspec.path, spec.first_test_period)
    assert rows.shape[1] == 2 + spec.neg_num
    for r in rows[:50]:
        u = int(r[0])
        negs = set(map(int, r[2:]))
        assert len(negs) == spec.neg_num, "negatives must be distinct"
        assert not negs & hist[u], "negative collided with user history"


def test_feeder_regimes(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    feeder = PeriodFeeder(dspec, mf_sample="alone", tr_sample_type="alone")
    # regime A: online_train_start=3, online_test_start=5 -> d_time 0 is warm-up
    sd = feeder.next_train(0)
    assert sd.set_t is not None and sd.set_tt is not None
    assert sd.now_test is None and sd.val is not None
    np.testing.assert_array_equal(sd.set_t, load_train(dspec.path, 3))
    np.testing.assert_array_equal(sd.set_tt, load_train(dspec.path, 4))

    # regime C: t+1 = 5 = online_test_start
    sd = feeder.next_train(1)
    assert sd.now_test is not None and sd.set_tt is not None
    np.testing.assert_array_equal(sd.now_test, load_test(dspec.path, 5))

    # second test period advances the cursor
    sd = feeder.next_train(2)
    np.testing.assert_array_equal(sd.now_test, load_test(dspec.path, 6))

    # end of stream: t+1 >= num_periods
    sd = feeder.next_train(4)
    assert sd.set_t is None

    # reinit resets the test cursor (dataset2.py:238-240)
    feeder.reinit()
    sd = feeder.next_train(1)
    np.testing.assert_array_equal(sd.now_test, load_test(dspec.path, 5))


def test_feeder_all_mode_reads_presampled(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    feeder = PeriodFeeder(dspec, mf_sample="all", tr_sample_type="alone")
    # mf_sample='all' for t with a test file reads test/t (dataset2.py:319-324)
    sd = feeder.next_train(1)  # t = 4... no test/4 file -> expect failure
    # t=4 has no presampled file (first_test_period=3 -> files 3..7 exist)
    np.testing.assert_array_equal(sd.set_t, load_test(dspec.path, 4))


def test_feeder_tr_stop_regime(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    feeder = PeriodFeeder(dspec, mf_sample="alone", tr_sample_type="alone",
                          tr_stop=True)
    sd = feeder.next_train(1)  # t+1 = 5 -> test span, tr_stop -> regime B
    assert sd.set_tt is None
    assert sd.now_test is not None


def test_streaming_periods(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    stream = StreamingPeriods(dspec)
    full, test = stream.get_next(5, mode="not_only_new")
    assert full.shape[0] == sum(
        load_train(dspec.path, p).shape[0] for p in range(5))
    fine, _ = stream.get_next(5, mode="only_new")
    np.testing.assert_array_equal(fine, load_train(dspec.path, 4))
    none_train, none_test = stream.get_next(spec.n_periods + 1)
    assert none_train is None


def test_prefetching_feeder_equivalence(synthetic_dataset):
    """PrefetchingFeeder yields exactly the same StageData sequence as the
    plain feeder, across multi-pass reinit, including the stateful test
    cursor."""
    from sml_tpu.data.prefetch import PrefetchingFeeder

    dspec, info, spec = synthetic_dataset

    def sweep(feeder):
        out = []
        for _pass in range(2):
            feeder.reinit()
            d_time = 0
            while True:
                sd = feeder.next_train(d_time)
                out.append(sd)
                if sd.set_t is None:
                    break
                d_time += 1
        return out

    plain = sweep(PeriodFeeder(dspec, mf_sample="alone",
                               tr_sample_type="alone"))
    pre_feeder = PrefetchingFeeder(
        PeriodFeeder(dspec, mf_sample="alone", tr_sample_type="alone"))
    pre = sweep(pre_feeder)
    pre_feeder.close()

    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        for fa, fb in zip(a, b):
            if fa is None:
                assert fb is None
            else:
                np.testing.assert_array_equal(fa, fb)
    assert pre_feeder.n_users == info.n_users


def test_prefetching_feeder_rejects_out_of_order(synthetic_dataset):
    """Once a period is prefetched, requesting a different one must raise
    (the inner feeder's test cursor has already advanced)."""
    import pytest as _pytest

    from sml_tpu.data.prefetch import PrefetchingFeeder

    dspec, info, spec = synthetic_dataset
    feeder = PrefetchingFeeder(
        PeriodFeeder(dspec, mf_sample="alone", tr_sample_type="alone"))
    feeder.next_train(0)                      # schedules prefetch of 1
    with _pytest.raises(RuntimeError, match="sequentially"):
        feeder.next_train(0)
    feeder.close()
