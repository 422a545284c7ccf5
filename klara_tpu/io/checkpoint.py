"""Full-state checkpoint / resume.

The reference persists only draws (CSV iostreams); sampler/tuner state is
lost on restart (SURVEY.md §5: "No sampler/tuner state is persisted").
Here a checkpoint captures ANY pytree — chain buffers, sampler state
(including adaptation state: AM covariance, RAM factor, dual-averaging
ε̄/h̄), and PRNG keys — so a run resumes bit-exactly:

    save_checkpoint(path, {"state": chain.final_state, "key": key})
    tree = load_checkpoint(path, like={"state": ..., "key": ...})

Storage: a single .npz of leaves keyed by their pytree key-paths (no
external deps, portable across hosts).  `restore_like` rebuilds the
original structure (NamedTuples, dataclasses, dicts) from a template.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _leaf_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [
        (jax.tree_util.keystr(path), leaf) for path, leaf in leaves_with_paths
    ]


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialise a pytree of arrays to ``path`` (.npz).  PRNG keys are
    stored as their raw key data and re-wrapped on restore."""
    entries = {
        k: (np.asarray(jax.random.key_data(v)) if _is_key(v) else np.asarray(v))
        for k, v in _leaf_paths(tree)
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **entries)


def _is_key(x):
    try:
        return jnp.issubdtype(jnp.asarray(x).dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a checkpoint.  With ``like`` (a pytree template of matching
    structure) the original structure is rebuilt; otherwise a flat
    {keypath: array} dict is returned."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    if like is None:
        return flat
    return restore_like(like, flat)


def restore_like(like: Any, flat: dict) -> Any:
    """Rebuild the pytree ``like`` with leaves taken from ``flat``."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        keystr = jax.tree_util.keystr(path)
        if keystr not in flat:
            raise KeyError(f"checkpoint missing leaf {keystr}")
        raw = flat[keystr]
        if _is_key(leaf):
            new_leaves.append(jax.random.wrap_key_data(jnp.asarray(raw)))
        else:
            new_leaves.append(jnp.asarray(raw, jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
