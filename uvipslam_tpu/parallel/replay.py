"""Multi-chip batched replay: N independent SLAM streams over a device mesh.

The reference is a single-process, single-stream system (SURVEY §2.4);
its TPU-native scale-out axis is *batched replay* (BASELINE config 5):
vmap the per-frame pipeline over N independent sequences and shard the
stream axis over a `jax.sharding.Mesh`. Per-stream state is independent,
so the only cross-chip communication is the metric reduction (psum over
ICI) — embarrassingly parallel by design, exactly what the hardware
wants.

`sharded_frontend_step` is the demonstrator used by the multi-chip
dry-run: per stream it runs the full front-end compute (CLAHE -> ORB
extract -> Hamming match -> pose optimization) and reduces a fleet
metric across chips.
"""

from __future__ import annotations

import dataclasses
import functools

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


def _one_stream_step(img, prev_desc, prev_valid, pts_w, uvs, key):
    """One stream's frame step: enhance, extract, match, pose-solve."""
    from uvipslam_tpu.ops.clahe import clahe
    from uvipslam_tpu.ops.hamming import match_best
    from uvipslam_tpu.ops.orb import extract_orb
    from uvipslam_tpu.solver.pose_opt import pose_optimization_se3

    enh = clahe(img)
    feats = extract_orb(
        enh, jnp.zeros((1, 2)), jnp.zeros(1, bool),
        n_features=prev_desc.shape[0],
    )
    idx, dist, ok = match_best(feats.desc, prev_desc, feats.valid, prev_valid,
                               max_dist=64.0, ratio=0.9)
    # tie the initial pose to stream data so the LM scan carry is
    # device-varying under shard_map (vma rules)
    zero_var = 0.0 * img[0, 0]
    R, t, inl, n_in = pose_optimization_se3(
        jnp.eye(3) + zero_var, jnp.zeros(3) + zero_var, pts_w, uvs, feats.valid,
        jnp.ones(uvs.shape[0]), 208.0, 208.0,
        img.shape[1] / 2.0, img.shape[0] / 2.0,
        rounds=2, iters=4,
    )
    return feats.desc, feats.valid, R, t, (n_in + jnp.sum(ok)).astype(jnp.float32)


def sharded_frontend_step(mesh: Mesh, axis: str = "stream"):
    """Build the pjit-ed multi-stream step: inputs sharded over `axis`,
    per-stream compute vmapped, fleet metric psum-reduced over ICI."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        # the per-stream body contains LM scans whose carries mix
        # replicated inits with varying data; skip the static vma check
        # (semantics unchanged — everything is stream-local + one psum)
        check_vma=False,
    )
    def step(imgs, prev_desc, prev_valid, pts_w, uvs, keys):
        descs, valids, Rs, ts, metrics = jax.vmap(_one_stream_step)(
            imgs, prev_desc, prev_valid, pts_w, uvs, keys
        )
        fleet_metric = jax.lax.psum(jnp.sum(metrics), axis)
        return descs, valids, Rs, ts, fleet_metric[None]

    return jax.jit(step)
