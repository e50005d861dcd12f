"""Raw-log ingestion → dataset contract."""

import numpy as np

from sml_tpu.data.feeder import PeriodFeeder, StreamingPeriods
from sml_tpu.data.formats import load_info, load_test, load_train
from sml_tpu.data.ingest import IngestSpec, densify_ids, ingest_csv, ingest_events
from sml_tpu.config import DataSpec


def test_densify_first_appearance():
    vals = np.array([50, 7, 50, 3, 7, 99])
    dense, vocab = densify_ids(vals)
    np.testing.assert_array_equal(dense, [0, 1, 0, 2, 1, 3])
    np.testing.assert_array_equal(vocab, [50, 7, 3, 99])


def test_ingest_events_roundtrip(tmp_path, rng):
    n = 3000
    users = rng.integers(1000, 1200, n)
    items = rng.integers(5000, 5100, n)
    ts = rng.uniform(0, 100, n)
    out = str(tmp_path / "ds")
    spec = IngestSpec(n_periods=6, first_test_period=3, neg_num=19, seed=1)
    info = ingest_events(users, items, ts, out, spec)

    got = load_info(out)
    assert got.n_interactions == n
    assert got.n_users <= 200 and got.n_items <= 100

    # periods are time-ordered and equal-count split
    sizes = [load_train(out, p).shape[0] for p in range(6)]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1

    # test rows obey the contract
    rows = load_test(out, 3)
    assert rows is not None and rows.shape[1] == 2 + 19
    hist = np.concatenate([load_train(out, p) for p in range(4)], axis=0)
    hist_set = {(int(u), int(i)) for u, i in hist}
    for r in rows[:30]:
        for j in map(int, r[2:]):
            assert (int(r[0]), int(j)) not in hist_set

    # feeds straight into the period feeder
    dspec = DataSpec(root=str(tmp_path), name="ds", num_periods=6,
                     online_train_start=3, online_test_start=4,
                     eval_neg_num=19)
    feeder = PeriodFeeder(dspec, mf_sample="alone")
    sd = feeder.next_train(0)
    assert sd.set_t is not None and sd.now_test is not None
    stream = StreamingPeriods(dspec)
    assert stream.test_new_user.size > 0 or stream.test_new_item.size >= 0


def test_ingest_csv(tmp_path, rng):
    n = 500
    lines = ["user,item,ts"]
    for _ in range(n):
        lines.append(f"{rng.integers(0, 50)},{rng.integers(0, 40)},"
                     f"{rng.uniform(0, 10):.3f}")
    csv = tmp_path / "log.csv"
    csv.write_text("\n".join(lines))
    info = ingest_csv(str(csv), str(tmp_path / "ds2"),
                      IngestSpec(n_periods=4, first_test_period=2,
                                 neg_num=9))
    assert info.n_interactions == n


def test_ingest_time_split(tmp_path, rng):
    n = 1000
    users = rng.integers(0, 60, n)
    items = rng.integers(0, 50, n)
    ts = np.concatenate([rng.uniform(0, 1, n // 2),
                         rng.uniform(9, 10, n - n // 2)])
    out = str(tmp_path / "ds3")
    ingest_events(users, items, ts, out,
                  IngestSpec(n_periods=4, first_test_period=3, neg_num=9,
                             split="time"))
    sizes = [load_train(out, p).shape[0] for p in range(4)]
    # bimodal times: outer windows dense, middle windows nearly empty
    assert sizes[0] + sizes[3] > 0.9 * n
