"""Metric kernels vs brute-force numpy references."""

import jax.numpy as jnp
import numpy as np

from sml_tpu.ops import metrics as M


def brute_rank(scores_row):
    """Rank of candidate 0 by strictly-greater count."""
    return int((scores_row[1:] > scores_row[0]).sum())


def test_rank_of_target(rng):
    scores = rng.normal(size=(32, 50)).astype(np.float32)
    got = np.asarray(M.rank_of_target(jnp.asarray(scores)))
    want = np.array([brute_rank(r) for r in scores])
    np.testing.assert_array_equal(got, want)


def test_hits_and_ndcg(rng):
    scores = rng.normal(size=(64, 100)).astype(np.float32)
    mask = (rng.random(64) < 0.8).astype(np.float32)
    rank = M.rank_of_target(jnp.asarray(scores))
    out = M.hits_and_ndcg_at(rank, jnp.asarray(mask), (5, 10, 20))
    ranks = np.asarray(rank)
    for k in (5, 10, 20):
        hits = ((ranks < k) * mask).sum()
        ndcg = (((ranks < k) / np.log2(ranks + 2)) * mask).sum()
        np.testing.assert_allclose(float(out[k][0]), hits, rtol=1e-6)
        np.testing.assert_allclose(float(out[k][1]), ndcg, rtol=1e-5)


def test_weighted_period_average_matches_reference_protocol():
    # 10 test periods, N3 = round(10/3) = 3 val, slice [3:-1] = 6 test
    # (transfer.py:991-1009)
    recalls = np.arange(10, dtype=np.float64) / 10
    counts = np.arange(1, 11, dtype=np.float64)
    val, test = M.weighted_period_average(recalls, counts)
    vw = counts[:3] / counts[:3].sum()
    tw = counts[3:-1] / counts[3:-1].sum()
    np.testing.assert_allclose(val, (recalls[:3] * vw).sum())
    np.testing.assert_allclose(test, (recalls[3:-1] * tw).sum())
    # baseline protocol keeps the last period (baseline.py:546)
    _, test_b = M.weighted_period_average(recalls, counts,
                                          drop_last_test=False)
    tw_b = counts[3:] / counts[3:].sum()
    np.testing.assert_allclose(test_b, (recalls[3:] * tw_b).sum())


def test_multitarget_kernels(rng):
    # ranklist of candidate indices; targets encoded as indices < n_targets
    n_targets, list_len, n_cand = 4, 20, 60
    ranklist = jnp.asarray(rng.permutation(n_cand)[:list_len])
    rl = np.asarray(ranklist)
    hit_pos = np.nonzero(rl < n_targets)[0]

    assert int(M.hit_count(ranklist, n_targets)) == hit_pos.size
    np.testing.assert_allclose(
        float(M.recall_at(ranklist, n_targets)), hit_pos.size / n_targets)
    np.testing.assert_allclose(
        float(M.precision_at(ranklist, n_targets, 20)), hit_pos.size / 20)

    idcg = sum(1.0 / np.log2(np.arange(n_targets) + 2))
    dcg = sum(1.0 / np.log2(p + 2) for p in hit_pos)
    np.testing.assert_allclose(float(M.ndcg(ranklist, n_targets)),
                               dcg / idcg, rtol=1e-6)

    mrr_want = 1.0 / (hit_pos[0] + 1) if hit_pos.size else 0.0
    np.testing.assert_allclose(float(M.mrr(ranklist, n_targets)), mrr_want,
                               rtol=1e-6)

    # MAP (evalution_function.py:114-133)
    precs = [(h + 1) / (p + 1) for h, p in enumerate(hit_pos)]
    map_want = sum(precs) / min(list_len, n_targets)
    np.testing.assert_allclose(
        float(M.average_precision(ranklist, n_targets)), map_want, rtol=1e-6)
