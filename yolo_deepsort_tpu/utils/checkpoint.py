"""Checkpoint IO for parameter / state pytrees.

Contract: SURVEY.md section 5.4 -- the reference checkpoints weights only
(darknet .weights with its `seen` counter; torch pickle ckpt.t7). Here any
pytree (model params, optimizer state, BN stats, tracker runtime state --
a few KB of fixed-shape arrays) serializes to a single .npz with
slash-joined key paths, with no framework lock-in.
"""

from __future__ import annotations

import io
import os
from typing import Any, Dict

import numpy as np

_NONE = "__none__"


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if tree is None:
        out[prefix + "/" + _NONE] = np.zeros(0)
    elif isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}/{k}", out)
    elif isinstance(tree, (list, tuple)):
        tag = "T" if isinstance(tree, tuple) else "L"
        out[f"{prefix}/__{tag}{len(tree)}__"] = np.zeros(0)
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten(tree, "root", flat)
    with open(path, "wb") as f:
        np.savez(f, **flat)


def _unflatten(store: Dict[str, np.ndarray], prefix: str) -> Any:
    if prefix + "/" + _NONE in store:
        return None
    seq = [k for k in store if k.startswith(prefix + "/__")]
    if seq:
        marker = seq[0][len(prefix) + 3 :]
        tag, n = marker[0], int(marker[1:].rstrip("_"))
        items = [_unflatten(store, f"{prefix}/{i}") for i in range(n)]
        return tuple(items) if tag == "T" else items
    children = {}
    plen = len(prefix) + 1
    for k in store:
        if k.startswith(prefix + "/"):
            child = k[plen:].split("/")[0]
            children[child] = None
    if not children:
        return store[prefix]
    return {c: _unflatten(store, f"{prefix}/{c}") for c in children}


def load_pytree(path: str | os.PathLike) -> Any:
    with np.load(path, allow_pickle=False) as z:
        store = {k: z[k] for k in z.files}
    return _unflatten(store, "root")


def save_reid_checkpoint(
    path: str | os.PathLike, params: Any, acc: float, epoch: int,
    stats: Any = None, opt_state: Any = None,
) -> None:
    """Training checkpoint mirroring the reference's {'net_dict','acc','epoch'}
    dict (deep/train.py), plus BN stats / optimizer state for exact resume."""
    save_pytree(path, {
        "net_dict": params,
        "acc": np.float64(acc),
        "epoch": np.int64(epoch),
        "stats": stats,
        "opt_state": opt_state,
    })


def load_reid_checkpoint_npz(path: str | os.PathLike) -> Dict:
    return load_pytree(path)
