"""Native C++ data kernels vs the numpy fallback contract."""

import numpy as np
import pytest

from sml_tpu.data import native
from sml_tpu.data.formats import attach_negatives


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _setup(rng, n=400, users=60, items=120):
    history = np.unique(np.stack([rng.integers(0, users, n),
                                  rng.integers(0, items, n)], 1), axis=0)
    inter = history[rng.permutation(history.shape[0])[:100]]
    catalog = np.unique(history[:, 1])
    return inter, history, catalog


def test_build_eval_rows_contract(lib, rng):
    inter, history, catalog = _setup(rng)
    neg = 20
    out = native.build_eval_rows_native(inter, history, catalog, neg, seed=1)
    assert out.shape == (inter.shape[0], 2 + neg)
    hist_set = {(int(u), int(i)) for u, i in history}
    cat_set = set(catalog.tolist())
    for r in out:
        u = int(r[0])
        negs = [int(x) for x in r[2:]]
        assert len(set(negs)) == neg, "negatives must be distinct in-row"
        for j in negs:
            assert j in cat_set
            assert (u, j) not in hist_set, "negative collided with history"
    np.testing.assert_array_equal(out[:, :2], inter)


def test_build_eval_rows_deterministic(lib, rng):
    inter, history, catalog = _setup(rng)
    a = native.build_eval_rows_native(inter, history, catalog, 10, seed=7)
    b = native.build_eval_rows_native(inter, history, catalog, 10, seed=7)
    np.testing.assert_array_equal(a, b)
    c = native.build_eval_rows_native(inter, history, catalog, 10, seed=8)
    assert not np.array_equal(a, c)


def test_build_eval_rows_impossible_raises(lib, rng):
    # 5 catalog items, user has seen all but 2, ask for 3 distinct negatives
    history = np.array([[0, 0], [0, 1], [0, 2]], dtype=np.int64)
    inter = np.array([[0, 0]], dtype=np.int64)
    catalog = np.arange(5, dtype=np.int64)
    with pytest.raises(ValueError):
        native.build_eval_rows_native(inter, history, catalog, 3, seed=0)


def test_sample_negatives_native(lib, rng):
    inter, history, catalog = _setup(rng)
    users = rng.integers(0, 60, 500)
    out = native.sample_negatives_native(users, history, catalog, tries=16,
                                         seed=3)
    hist_set = {(int(u), int(i)) for u, i in history}
    collisions = sum((int(u), int(j)) in hist_set
                     for u, j in zip(users, out))
    # bounded-retry guarantee: collisions should be essentially zero here
    assert collisions <= 2


def test_attach_negatives_uses_native_and_matches_contract(rng):
    inter, history, catalog = _setup(rng)
    out = attach_negatives(inter, history, catalog, 15, seed=2)
    hist_set = {(int(u), int(i)) for u, i in history}
    for r in out[:50]:
        u = int(r[0])
        for j in map(int, r[2:]):
            assert (u, j) not in hist_set


def test_parse_csv_log_native_matches_numpy(tmp_path):
    from sml_tpu.data.native import parse_csv_log_native

    rng = np.random.default_rng(3)
    n = 500
    path = str(tmp_path / "log.csv")
    with open(path, "w") as fh:
        fh.write("user,item,ts\n")
        for k in range(n):
            fh.write(f"{rng.integers(0, 900)},{rng.integers(0, 400)},"
                     f"{1000.5 + k}\n")

    parsed = parse_csv_log_native(path)
    if parsed is None:
        import pytest
        pytest.skip("native lib unavailable")
    users, items, times = parsed
    raw = np.genfromtxt(path, delimiter=",", skip_header=1)
    np.testing.assert_array_equal(users, raw[:, 0].astype(np.int64))
    np.testing.assert_array_equal(items, raw[:, 1].astype(np.int64))
    np.testing.assert_allclose(times, raw[:, 2])


def test_parse_csv_log_native_malformed_line_number(tmp_path):
    import pytest

    from sml_tpu.data.native import get_lib, parse_csv_log_native

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    path = str(tmp_path / "bad.csv")
    with open(path, "w") as fh:
        fh.write("user,item,ts\n1,2,3\n4,notanumber,6\n")
    with pytest.raises(ValueError, match="line 3"):
        parse_csv_log_native(path)


def test_parse_csv_log_native_multichar_delimiter_falls_back(tmp_path):
    """Multi-char delimiters aren't supported natively; the function must
    return None so ingest falls back to numpy (which handles them)."""
    from sml_tpu.data.ingest import IngestSpec, ingest_csv
    from sml_tpu.data.native import parse_csv_log_native

    path = str(tmp_path / "ml.dat")
    with open(path, "w") as fh:
        for k in range(60):
            fh.write(f"{k % 9}::{k % 23}::{1000 + k}\n")
    assert parse_csv_log_native(path, delimiter="::", skip_header=0) is None

    info = ingest_csv(path, str(tmp_path / "out"), 
                      IngestSpec(n_periods=3, first_test_period=1,
                                 neg_num=3),
                      delimiter="::", skip_header=0)
    assert info.n_interactions == 60


def test_parse_csv_log_native_skips_comments_rejects_garbage(tmp_path):
    import pytest

    from sml_tpu.data.native import get_lib, parse_csv_log_native

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    path = str(tmp_path / "c.csv")
    with open(path, "w") as fh:
        fh.write("# a comment line\n1,2,3\n# another\n4,5,6\n")
    users, items, times = parse_csv_log_native(path, skip_header=0)
    assert users.tolist() == [1, 4] and items.tolist() == [2, 5]

    bad = str(tmp_path / "g.csv")
    with open(bad, "w") as fh:
        fh.write("1,2,3\n4,5junk,6\n")
    with pytest.raises(ValueError, match="line 2"):
        parse_csv_log_native(bad, skip_header=0)
