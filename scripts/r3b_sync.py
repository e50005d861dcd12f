"""Seed / sync campaign results between /tmp roots and the repo snapshots.

The host restart wiped /tmp, losing the working results.json files that the
lane scripts' ``have`` checks and summarize_r3.py read. Two modes:

  seed: merge the repo snapshot INTO the /tmp working file, never
        overwriting keys the fresh run already recorded (e.g. the
        regenerated ``dataset`` timing). Run once before launching lanes.
  sync: merge the /tmp working file INTO the repo snapshot. A key that
        already exists in the repo with a DIFFERENT value is written under
        ``<key>_r3b`` instead (ADVICE r2: re-measurements go under new
        keys, never clobber history). Run periodically while lanes grind.

Usage:
  python scripts/r3b_sync.py seed /tmp/yelp_scale_r2/results.json yelp_scale_r3.json
  python scripts/r3b_sync.py sync /tmp/yelp_scale_r2/results.json yelp_scale_r3.json
"""

import fcntl
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _locked_update(path, fn):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        data = {}
        if os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
        data = fn(data)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh, indent=2)
        os.replace(tmp, path)


def seed(tmp_path, repo_name):
    repo_path = os.path.join(REPO, repo_name)
    with open(repo_path) as fh:
        snap = json.load(fh)

    def merge(cur):
        added = 0
        for k, v in snap.items():
            if k not in cur:
                cur[k] = v
                added += 1
        print(f"seeded {tmp_path}: +{added} keys from {repo_name}")
        return cur

    _locked_update(tmp_path, merge)


def sync(tmp_path, repo_name):
    repo_path = os.path.join(REPO, repo_name)
    if not os.path.exists(tmp_path):
        print(f"nothing to sync: {tmp_path} missing")
        return
    with open(tmp_path) as fh:
        work = json.load(fh)

    def merge(cur):
        added, renamed = 0, 0
        for k, v in work.items():
            if k not in cur:
                cur[k] = v
                added += 1
                continue
            if cur[k] == v:
                continue
            # never clobber history (ADVICE r3): a third distinct value for
            # the same key gets the next free incrementing suffix instead
            # of overwriting the prior re-measurement
            n = 0
            while True:
                alias = k + ("_r3b" if n == 0 else f"_r3b{n + 1}")
                if alias not in cur:
                    cur[alias] = v
                    renamed += 1
                    break
                if cur[alias] == v:
                    break
                n += 1
        print(f"synced {repo_name}: +{added} new, {renamed} under *_r3b*")
        return cur

    _locked_update(repo_path, merge)


if __name__ == "__main__":
    mode, tmp_path, repo_name = sys.argv[1], sys.argv[2], sys.argv[3]
    {"seed": seed, "sync": sync}[mode](tmp_path, repo_name)
