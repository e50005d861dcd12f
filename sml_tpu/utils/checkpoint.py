"""Period-boundary checkpoint / resume.

The reference only *loads* whole-module pickles (``model/transfer.py:322-325``)
and saves baseline state_dicts ad hoc (``model/baseline.py:213,219``); there
is no resume story — a crash loses the run (SURVEY.md §5). Here the period
boundary is the recovery unit: a checkpoint captures the full pytree state
(tables, Θ, both Adam states, PRNG key) plus a JSON manifest with the period
cursor, written atomically (tmp + rename) so a crash mid-write never
corrupts the latest good checkpoint.

Format: one ``.npz`` with flattened pytree leaves keyed by path, plus a
manifest JSON. No framework lock-in, readable with plain numpy.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, Any]:
    """Flatten to {path: ndarray}. ml_dtypes extension dtypes (bfloat16,
    float8_*) are not numpy-native and silently round-trip through ``.npz``
    as opaque void bytes — store their raw bits as a same-width uint view
    instead, with the true dtype names recorded under ``__dtypes__``."""
    flat, ext = {}, {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p.name) if hasattr(p, "name") else str(p.idx)
                       for p in path)
        arr = np.asarray(leaf)
        if arr.dtype.kind == "V":  # ml_dtypes extension type
            ext[key] = arr.dtype.name
            arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
        flat[key] = arr
    if ext:
        flat["__dtypes__"] = np.asarray(json.dumps(ext))
    return flat


def save_checkpoint(directory: str, step: int, state,
                    extra: Optional[Dict[str, Any]] = None,
                    keep: int = 3) -> str:
    """Atomically write ``state`` (any pytree) as checkpoint ``step``."""
    os.makedirs(directory, exist_ok=True)
    flat = _flatten_with_paths(state)
    path = os.path.join(directory, f"ckpt_{step:06d}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    manifest = {"step": step, "file": os.path.basename(path),
                "extra": extra or {}}
    mtmp = path + ".manifest.tmp"
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(mtmp, os.path.join(directory, "manifest.json"))

    # retention
    ckpts = sorted(f for f in os.listdir(directory)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    for old in ckpts[:-keep]:
        os.unlink(os.path.join(directory, old))
    return path


def latest_step(directory: str) -> Optional[int]:
    mf = os.path.join(directory, "manifest.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as fh:
        return int(json.load(fh)["step"])


def restore_checkpoint(directory: str, template,
                       step: Optional[int] = None
                       ) -> Tuple[Any, int, Dict[str, Any]]:
    """Restore into the structure of ``template``; returns
    (state, step, extra)."""
    mf = os.path.join(directory, "manifest.json")
    with open(mf) as fh:
        manifest = json.load(fh)
    if step is None:
        step = int(manifest["step"])
        fname = manifest["file"]
    else:
        fname = f"ckpt_{step:06d}.npz"
    data = np.load(os.path.join(directory, fname))
    ext = (json.loads(str(data["__dtypes__"]))
           if "__dtypes__" in data.files else {})

    flat_template = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat_template[0]:
        key = "/".join(str(p.name) if hasattr(p, "name") else str(p.idx)
                       for p in path)
        arr = data[key]
        if key in ext:
            import ml_dtypes
            arr = arr.view(np.dtype(getattr(ml_dtypes, ext[key])))
        leaves.append(jax.numpy.asarray(
            arr, dtype=getattr(leaf, "dtype", arr.dtype)))
    state = jax.tree_util.tree_unflatten(flat_template[1], leaves)
    return state, step, manifest.get("extra", {})
