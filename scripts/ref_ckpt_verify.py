"""Verify the checkpointed reference sweep resumes bit-identically.

Runs the reference driver twice on the same toy dataset + pretrain:
(A) uninterrupted, (B) checkpointed with a synthetic kill after 2 periods,
then resumed from the snapshot. Asserts the per-period metric arrays are
EXACTLY equal — the snapshot captures all three RNG streams, so the
resumed trajectory must be the same floating-point trajectory.

Usage: python scripts/ref_ckpt_verify.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(repo, "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)

    root = tempfile.mkdtemp(prefix="refckpt_")
    info = pvr.build_dataset(root, seed=11)
    print(f"dataset: {info}", file=sys.stderr, flush=True)
    dspec, params, pre = pvr.pretrain(root, info)

    t0 = time.time()
    a = pvr.run_reference(root, params, ref_seed=2000)
    print(f"uninterrupted: {time.time() - t0:.1f}s", file=sys.stderr)

    ck = os.path.join(root, "ref.ckpt")
    try:
        pvr.run_reference(root, params, ref_seed=2000, ckpt_path=ck,
                          interrupt_after=2)
        raise AssertionError("expected the synthetic interrupt")
    except KeyboardInterrupt:
        pass
    assert os.path.exists(ck), "no checkpoint written before the kill"
    print("killed after 2 periods; resuming from snapshot", file=sys.stderr)
    b = pvr.run_reference(root, params, ref_seed=2000, ckpt_path=ck)

    for k in ("recall@20", "recall@10", "recall@5",
              "ndcg@20", "ndcg@10", "ndcg@5", "test_num"):
        xa, xb = np.asarray(a[k]), np.asarray(b[k])
        assert xa.shape == xb.shape, (k, xa.shape, xb.shape)
        assert np.array_equal(xa, xb), (
            f"{k} diverged: max|d|={np.max(np.abs(xa - xb))}")
        print(f"  {k}: exact match ({len(xa)} periods)", file=sys.stderr)
    print("OK: resumed sweep is bit-identical to uninterrupted",
          file=sys.stderr)


if __name__ == "__main__":
    main()
