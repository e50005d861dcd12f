"""Locked merge-one-key-into-a-results-JSON helper.

Campaign scripts (scripts/yelp_scale_sweep.py, scripts/adressa_run.py,
scripts/scale_engine_run.py, scripts/saddle_experiment.py) run phases as
concurrent processes that append results to one shared JSON file; an
unlocked read-modify-write would silently drop a phase's key.
"""

from __future__ import annotations

import fcntl
import json
import os


def record(path: str, key: str, value) -> None:
    """Merge ``{key: value}`` into the JSON object at ``path`` under an
    exclusive flock and replace the file atomically."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lock_path = path + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        data = {}
        if os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
        data[key] = value
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh, indent=2)
        os.replace(tmp, path)
