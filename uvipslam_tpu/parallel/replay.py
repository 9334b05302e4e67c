"""Multi-chip batched replay: N independent SLAM streams over a device mesh.

The reference is a single-process, single-stream system (SURVEY §2.4);
its TPU-native scale-out axis is *batched replay* (BASELINE config 5):
vmap the per-frame pipeline over N independent sequences and shard the
stream axis over a `jax.sharding.Mesh`. Per-stream state is independent,
so the only cross-chip communication is the metric reduction (psum over
ICI) — embarrassingly parallel by design, exactly what the hardware
wants.

`batched_replay` is what the multi-chip dry-run and the CPU-mesh test
exercise: the FULL device-tracker step vmapped over streams and scanned
over frames, stream axis sharded over the mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "stream",
              platform: str | None = None) -> Mesh:
    """Build a 1-D mesh. `platform` pins the device kind (e.g. "cpu" for
    the virtual host mesh used by tests and the driver's dry run —
    without the pin, jax.devices() grabs whatever backend registered
    first, which in this environment is the TPU tunnel)."""
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} {platform or 'default'} devices, have {len(devs)}"
            )
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devs), (axis,))


def shard_stream_axis(mesh: Mesh, tree, axis: str = "stream"):
    """device_put every leaf of `tree` with its leading dim sharded over
    `axis` (the batched-replay layout: one or more SLAM streams per chip)."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def batched_replay(cam, cfg, kf_cap: int, pt_cap: int, mesh: Mesh,
                   axis: str = "stream"):
    """The production scale-out form (SURVEY §2.4, BASELINE config 5):
    the FULL device tracker step — state machine, two-view init, KLT,
    pose opt, window BA — vmapped over N independent streams and scanned
    over time, with the stream axis sharded over the mesh. Returns
    (make_states, run) where

      states0 = make_states(n_streams)   # stream-sharded TrackerState batch
      stf, outs, fleet = run(states0, imgs)  # imgs [S, T, H, W]

    `fleet` is a cross-chip psum-reduced scalar (total WORKING frame
    count) — the only communication; everything else is stream-local, so
    the collective rides ICI once per replay, not per frame.
    """
    from uvipslam_tpu.frontend.device_tracker import WORKING, build_tracker, init_state

    _, step = build_tracker(cam, cfg, kf_cap, pt_cap)
    raw_step = step.__wrapped__  # un-jitted for scan/vmap embedding

    def one_stream(st, imgs):
        return jax.lax.scan(raw_step, st, imgs)

    @jax.jit
    def run(states, imgs):
        stf, outs = jax.vmap(one_stream)(states, imgs)
        fleet = jnp.sum((outs.state == WORKING).astype(jnp.int32))
        return stf, outs, fleet

    def make_states(n_streams: int):
        st0 = init_state(cfg, kf_cap, pt_cap, cam.height, cam.width)
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), st0
        )
        # decorrelate per-stream RNG
        batched = dataclasses.replace(
            batched,
            key=jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.PRNGKey(0), jnp.arange(n_streams)),
        )
        return shard_stream_axis(mesh, batched, axis)

    return make_states, run


def batched_replay_vip(cam, cfg, kf_cap: int, pt_cap: int, mesh: Mesh,
                       axis: str = "stream"):
    """Batched replay of the FLAGSHIP visual-inertial-pressure tracker —
    the system the paper is about (reference: the whole of
    src/Tracking.cc + src/LocalMapping.cc:89-709) — vmapped over N
    independent streams and sharded over the mesh. Each stream runs the
    complete VIP step: mono bootstrap, on-device TryInitVIO
    (gyro bias + gravity + pressure scale), VI(P) tracking with the
    depth-projected factor, VI window BA, recovery.

    Returns (make_states, run):
      states0 = make_states(n_streams)
      stf, outs, fleet = run(states0, bundles)   # bundles leaves [S, T, ...]

    `fleet` = (total WORKING frames, total VIO-initialized streams),
    psum-style reduced across the mesh once per replay.
    """
    from uvipslam_tpu.frontend.device_vip import build_vip_tracker, init_vip_state
    from uvipslam_tpu.frontend.tracker import WORKING

    _, step = build_vip_tracker(cam, cfg, kf_cap, pt_cap)
    raw_step = step.__wrapped__

    def one_stream(st, bundles):
        return jax.lax.scan(raw_step, st, bundles)

    @jax.jit
    def run(states, bundles):
        stf, outs = jax.vmap(one_stream)(states, bundles)
        fleet = (jnp.sum((outs.state == WORKING).astype(jnp.int32)),
                 jnp.sum(stf.vio_ok.astype(jnp.int32)))
        return stf, outs, fleet

    def make_states(n_streams: int):
        st0 = init_vip_state(cfg, kf_cap, pt_cap, cam.height, cam.width)
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), st0
        )
        batched = dataclasses.replace(
            batched,
            key=jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.PRNGKey(0), jnp.arange(n_streams)),
        )
        return shard_stream_axis(mesh, batched, axis)

    return make_states, run
