"""Checkpoint / resume for parameter pytrees and BO loop state.

The reference has only the NaN-rollback snapshot
(`Experiments/log_debugger.py:77-83`, torch.save of model+optimizer
state) and never resumes (SURVEY.md §5.4).  Here: orbax-backed pytree
checkpointing with an npz fallback, plus save/restore of BO loop records
— standard long-run resume capability for sweeps and BO.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

try:  # orbax is baked into the image; fall back gracefully anyway
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_pytree(path: str, tree) -> str:
    """Save a parameter pytree; orbax if available, else flat npz."""
    import jax

    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)
        return path
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path + ".npz", *[np.asarray(leaf) for leaf in leaves])
    with open(path + ".treedef", "w") as f:
        f.write(str(treedef))
    return path + ".npz"


def restore_pytree(path: str, like=None):
    """Restore a pytree saved by `save_pytree`.  With orbax, ``like`` is an
    optional reference structure."""
    import jax

    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(path)
        if like is not None:
            leaves = jax.tree_util.tree_leaves(restored)
            treedef = jax.tree_util.tree_structure(like)
            return jax.tree_util.tree_unflatten(treedef, leaves)
        return restored
    if like is None:
        raise ValueError("npz restore requires `like` reference pytree")
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [data[k] for k in data.files]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_bo_state(path: str, record: Dict[str, Any], xs, ys) -> None:
    """Persist a BO loop's record + datasets for resume."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        record=json.dumps(record),
        **{f"x_{i}": np.asarray(x) for i, x in enumerate(xs)},
        **{f"y_{i}": np.asarray(y) for i, y in enumerate(ys)},
    )


def load_bo_state(path: str):
    data = np.load(path, allow_pickle=False)
    record = json.loads(str(data["record"]))
    n = sum(1 for k in data.files if k.startswith("x_"))
    xs = [data[f"x_{i}"] for i in range(n)]
    ys = [data[f"y_{i}"] for i in range(n)]
    return record, xs, ys
