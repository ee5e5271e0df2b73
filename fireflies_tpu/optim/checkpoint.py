"""Checkpoint / resume for long-running optimization and dataset jobs.

The reference's only persistence is Laser.save() YAML and count-indexed
images (SURVEY.md §5).  Here full training state — parameters, optimizer
state, PRNG key, step — round-trips through a single .npz (flat pytree with
path-encoded keys: dependency-free, fast for the MB-scale states a pattern
optimizer has).  Laser YAML export stays available for interop
(projection.Laser.save/load).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

SEP = "\x1f"  # unit separator: safe key-path delimiter


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = SEP.join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str | Path, state: dict) -> None:
    """Save a pytree-of-arrays state dict (params/opt_state/key/step...)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(state)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str | Path, like: dict) -> dict:
    """Restore into the structure of `like` (same pytree used to save)."""
    data = np.load(Path(path), allow_pickle=False)
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_elems, leaf in paths_and_leaves:
        key = SEP.join(str(p) for p in path_elems)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(directory: str | Path, pattern: str = "*.npz") -> Path | None:
    paths = sorted(Path(directory).glob(pattern))
    return paths[-1] if paths else None
