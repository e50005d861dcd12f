"""Masked losses == unmasked on real rows; batching utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from sml_tpu.ops import batching as B
from sml_tpu.ops.losses import bce_pair_loss, bpr_loss, l2_embedding_penalty


def test_bce_matches_reference_form(rng):
    pos = rng.normal(size=32).astype(np.float32)
    neg = rng.normal(size=32).astype(np.float32)
    mask = np.ones(32, dtype=np.float32)
    got = float(bce_pair_loss(jnp.asarray(pos), jnp.asarray(neg),
                              jnp.asarray(mask)))
    sig = lambda x: 1 / (1 + np.exp(-x))
    want = (-np.log(sig(pos) + 1e-15).mean()
            - np.log(1 - sig(neg) + 1e-15).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_padding_invariance(rng):
    """Loss over padded batch == loss over the real rows alone."""
    pos = rng.normal(size=24).astype(np.float32)
    neg = rng.normal(size=24).astype(np.float32)
    pad_pos = np.concatenate([pos, rng.normal(size=8).astype(np.float32)])
    pad_neg = np.concatenate([neg, rng.normal(size=8).astype(np.float32)])
    mask = np.concatenate([np.ones(24), np.zeros(8)]).astype(np.float32)

    full = float(bce_pair_loss(jnp.asarray(pos), jnp.asarray(neg),
                               jnp.ones(24)))
    padded = float(bce_pair_loss(jnp.asarray(pad_pos), jnp.asarray(pad_neg),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(full, padded, rtol=1e-6)

    full_b = float(bpr_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.ones(24)))
    padded_b = float(bpr_loss(jnp.asarray(pad_pos), jnp.asarray(pad_neg),
                              jnp.asarray(mask)))
    np.testing.assert_allclose(full_b, padded_b, rtol=1e-6)

    emb = rng.normal(size=(24, 8)).astype(np.float32)
    emb_pad = np.concatenate([emb, rng.normal(size=(8, 8)).astype(np.float32)])
    np.testing.assert_allclose(
        float(l2_embedding_penalty(jnp.ones(24), jnp.asarray(emb))),
        float(l2_embedding_penalty(jnp.asarray(mask), jnp.asarray(emb_pad))),
        rtol=1e-6)


def test_bucket_rows():
    assert B.bucket_rows(1, 1024) == 1024
    assert B.bucket_rows(1024, 1024) == 1024
    assert B.bucket_rows(1025, 1024) == 2048
    # large n: slack bounded by ~1/8
    for n in (100_000, 123_456, 999_999):
        b = B.bucket_rows(n, 1024)
        assert b >= n and b % 1024 == 0
        assert (b - n) / n < 0.3
    # bucketing collapses nearby sizes to few distinct shapes
    buckets = {B.bucket_rows(n, 1024) for n in range(90_000, 110_000, 137)}
    assert len(buckets) <= 4


def test_pad_rows_and_shuffle(rng):
    arr = rng.integers(0, 100, size=(777, 2))
    padded = B.pad_rows(arr, 256)
    assert padded.rows.shape[0] % 256 == 0
    assert padded.n_real == 777
    assert float(padded.mask.sum()) == 777

    rows, mask = B.shuffle_real_first(jax.random.PRNGKey(0),
                                      padded.rows, padded.mask)
    mask = np.asarray(mask)
    # all real rows first
    assert mask[:777].all() and not mask[777:].any()
    # same multiset of rows
    got = np.asarray(rows)[:777]
    np.testing.assert_array_equal(
        np.sort(got.view([('a', got.dtype), ('b', got.dtype)]), axis=0),
        np.sort(np.asarray(padded.rows)[:777].view(
            [('a', got.dtype), ('b', got.dtype)]), axis=0))


def test_num_batches():
    assert int(B.num_batches(jnp.int32(1), 256)) == 1
    assert int(B.num_batches(jnp.int32(256), 256)) == 1
    assert int(B.num_batches(jnp.int32(257), 256)) == 2
