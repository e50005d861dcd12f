"""Debug probe for the lockstep d_theta-at-refresh-0 anomaly.

At refresh 0 neither side has trained Θ yet, so d_theta must be exactly 0
unless (a) the torch->jax->torch layout roundtrip is lossy, (b) our replay
mutates Θ in the inner epoch, or (c) the recorded event stream contains an
outer epoch before the first refresh. This isolates which.
"""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _mod(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    ls = _mod("lockstep_parity")

    root = "/tmp/lockstep_probe"
    os.makedirs(root, exist_ok=True)
    if not os.path.exists(os.path.join(root, "synth", "information.npy")):
        ls.gen_dataset(root)

    pvr = ls._pvr()
    params = ls.make_pretrained(np.random.default_rng(97))
    events, theta_init, ref_snaps, _ = ls.run_reference_recorded(
        pvr, root, params, seed=2000)

    # (c) event stream shape before the first refresh
    pre = []
    for ev in events:
        if ev[0] == "refresh":
            break
        pre.append((ev[0], ev[1] if ev[0] != "epoch" else
                    (ev[1], len(ev[2]))))
    print("events before refresh 0:", pre)

    # (a) layout roundtrip: map theta_init back to torch order and compare
    # against the reference's theta at snapshot 0 (== its init)
    ours_leaves = [np.asarray(x) for x in jax.tree.leaves(theta_init)]
    back = ls.theta_leaves_torch_order((ours_leaves[:8], ours_leaves[8:]))
    rth0 = ref_snaps[0][2]
    print("n ref leaves:", len(rth0), "n ours leaves:", len(back))
    for i, (a, b) in enumerate(zip(rth0, back)):
        d = float(np.max(np.abs(a - b))) if a.shape == b.shape else "SHAPE"
        print(f"leaf {i}: ref {a.shape} ours {b.shape} maxdiff {d}")


if __name__ == "__main__":
    main()
