"""Checkpoint IO for parameter / state pytrees.

Contract: SURVEY.md section 5.4 -- the reference checkpoints weights only
(darknet .weights with its `seen` counter; torch pickle ckpt.t7). Here any
pytree (model params, optimizer state, BN stats, tracker runtime state --
a few KB of fixed-shape arrays) serializes to a single .npz with
slash-joined key paths, with no framework lock-in.

Path encoding (round-trip-faithful, collision-proof):

* dict str key ``k``  -> segment ``s<urlquote(k)>`` ("/" and "%" escaped)
* dict int key ``k``  -> segment ``i<k>`` (ints survive the round trip)
* list / tuple        -> marker leaf ``!L<n>`` / ``!T<n>``, items ``e<i>``
* ``None``            -> marker leaf ``!none``

Marker segments start with ``!``; dict segments always start with ``s``/``i``
and sequence items with ``e``, so user keys can never be misparsed as
structure. Custom pytree node types (optax NamedTuples etc.) deserialize as
plain tuples -- use :func:`restore_like` with a freshly-built template to
restore the original node types.
"""

from __future__ import annotations

import os
from typing import Any, Dict
from urllib.parse import quote, unquote

import numpy as np


def _seg(key: Any) -> str:
    if isinstance(key, bool):  # bool is an int subclass; be explicit
        raise TypeError(f"unsupported dict key type: {key!r}")
    if isinstance(key, (int, np.integer)):
        return f"i{int(key)}"
    if isinstance(key, str):
        return "s" + quote(key, safe="")
    raise TypeError(f"unsupported dict key type: {key!r}")


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if tree is None:
        out[prefix + "/!none"] = np.zeros(0)
    elif isinstance(tree, dict):
        for k in sorted(tree, key=str):
            _flatten(tree[k], f"{prefix}/{_seg(k)}", out)
    elif isinstance(tree, (list, tuple)):
        tag = "L" if isinstance(tree, list) else "T"
        out[f"{prefix}/!{tag}{len(tree)}"] = np.zeros(0)
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/e{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten(tree, "root", flat)
    with open(path, "wb") as f:
        np.savez(f, **flat)


def _decode(node: Any) -> Any:
    if isinstance(node, np.ndarray):
        return node
    if "!none" in node:
        return None
    marker = next((k for k in node if k.startswith("!")), None)
    if marker is not None:
        tag, n = marker[1], int(marker[2:])
        items = [_decode(node[f"e{i}"]) for i in range(n)]
        return items if tag == "L" else tuple(items)
    out: Dict[Any, Any] = {}
    for seg, child in node.items():
        key = int(seg[1:]) if seg[0] == "i" else unquote(seg[1:])
        out[key] = _decode(child)
    return out


def load_pytree(path: str | os.PathLike) -> Any:
    with np.load(path, allow_pickle=False) as z:
        store = {k: z[k] for k in z.files}
    trie: Dict[str, Any] = {}
    for key, val in store.items():
        parts = key.split("/")
        node = trie
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _decode(trie["root"])


def restore_like(template: Any, loaded: Any) -> Any:
    """Map ``loaded``'s leaves onto ``template``'s pytree structure.

    load_pytree returns plain dict/list/tuple containers; optimizer states
    built from optax are NamedTuple pytree nodes. Both flatten to the same
    leaf sequence (dict keys sort identically, NamedTuples flatten in field
    = tuple order), so unflattening loaded leaves with the template's treedef
    restores the original node types exactly.
    """
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(template)
    loaded_leaves = jax.tree_util.tree_leaves(loaded)
    if len(leaves) != len(loaded_leaves):
        raise ValueError(
            f"checkpoint structure mismatch: template has {len(leaves)} "
            f"leaves, checkpoint has {len(loaded_leaves)}"
        )
    for t, l in zip(leaves, loaded_leaves):
        ts, ls = np.shape(t), np.shape(l)
        if ts != ls:
            raise ValueError(f"leaf shape mismatch: template {ts} vs checkpoint {ls}")
    return jax.tree_util.tree_unflatten(treedef, loaded_leaves)


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
