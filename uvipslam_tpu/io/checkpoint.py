"""Map / tracker state checkpointing.

The reference has NO map save/load (SURVEY §5: "Checkpoint / resume:
none"); this is a capability the TPU-native design gets almost for free
because the entire world model is one pytree of arrays. Snapshots are
plain .npz archives of the flattened pytree (orbax is available in the
environment but npz keeps the artifact dependency-free and inspectable).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from uvipslam_tpu.core.preintegration import PreintState
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.mapstate.map import MapState


def save_map(path: str, m: MapState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(m)
    np.savez_compressed(
        path, n_leaves=len(leaves),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_map(path: str, template: MapState | None = None) -> MapState:
    """Restore a MapState; `template` supplies the pytree structure (a
    MapState.empty of matching capacities — shapes are validated)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    if template is None:
        # derive capacities from the stored arrays via a probe flatten
        raise ValueError("load_map requires a template MapState for structure")
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != n:
        raise ValueError(f"leaf count mismatch: {len(t_leaves)} vs {n}")
    for a, b in zip(t_leaves, leaves):
        if tuple(a.shape) != tuple(b.shape):
            raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(x) for x in leaves])
