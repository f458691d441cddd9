"""Checkpoint / resume for scenes, paths, and training state.

The reference has no checkpointing (its objects are Equinox PyTrees and it
notes ``eqx.tree_serialise_leaves`` would be the mechanism, unused
in-repo). Here the same leaf-wise scheme is provided for this framework's
PyTrees: :func:`save_leaves` writes every array leaf of a tree to one
``.npz``; :func:`load_leaves` restores them into the structure of a
template tree (the usual "build the model, then fill the weights"
pattern). Works for scenes, tracer arrays, optimizer states, and flax
parameter trees alike.
"""

from __future__ import annotations

import os
from typing import TypeVar

import jax
import jax.numpy as jnp
import numpy as np

T = TypeVar("T")


def save_leaves(path: str, tree: T) -> None:
    """Serialize every array leaf of ``tree`` to ``path`` (``.npz``).

    Leaves are stored in flattened traversal order; the tree structure
    itself is not stored (provide a template at load time).
    """
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_leaves(path: str, like: T) -> T:
    """Restore leaves saved by :func:`save_leaves` into the structure of
    ``like``.

    :raises ValueError: If the leaf count or any leaf shape mismatches.
    """
    with np.load(path) as data:
        arrays = [data[f"leaf_{i}"] for i in range(len(data.files))]
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(arrays) != len(leaves):
        msg = (
            f"checkpoint has {len(arrays)} leaves, "
            f"template has {len(leaves)}"
        )
        raise ValueError(msg)
    restored = []
    for i, (saved, leaf) in enumerate(zip(arrays, leaves)):
        if hasattr(leaf, "shape") and tuple(saved.shape) != tuple(leaf.shape):
            msg = (
                f"leaf {i}: checkpoint shape {tuple(saved.shape)} != "
                f"template shape {tuple(leaf.shape)}"
            )
            raise ValueError(msg)
        restored.append(jnp.asarray(saved))
    return jax.tree_util.tree_unflatten(treedef, restored)
