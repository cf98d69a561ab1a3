"""Multi-chip scaling: device meshes and sharded SLAM steps.

The reference is a single-process CPU system (SURVEY §2.4: no distributed
anything); its scaling axes on TPU are:

- **data parallel over sequences**: B independent SLAM instances tracked
  in one vmapped+sharded step (batch axis over the mesh's "data" axis) —
  the TPU replacement for "run N dataset sequences" throughput;
- **sharded bundle adjustment**: observation tables sharded over devices,
  per-shard Hessian contributions reduced with psum (see optim/ba.py);
- RANSAC hypothesis fan-out within a chip via vmap (no comm needed).

Collectives ride the ICI mesh; nothing here touches DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def batched_track_step(cam, scales, scale_factor: float, n_levels: int):
    """Returns a function tracking B frames (one per sequence) at once:
    vmap of slam.tracking.track_step over the leading batch axis. Under a
    sharded jit, each device tracks its own sequences."""
    from splslam_tpu.slam.tracking import LineWindow, track_step

    def one(cur, last_xy, last_oct, last_ang, last_desc, lm_xyz, lm_gid,
            T_pred, win):
        lcap = cur.lines.capacity
        no_ll = jnp.full((lcap,), -1, jnp.int32)
        return track_step(
            cam, scales, cur, last_xy, last_oct, last_ang, last_desc,
            lm_xyz, lm_gid, T_pred, win,
            cur.lines, no_ll, jnp.zeros((lcap, 3, 3)), jnp.zeros((lcap,)),
            LineWindow.empty(1),
            scale_factor=scale_factor, n_levels=n_levels,
        )

    return jax.vmap(one)
