"""Per-frame track table: the fixed-slot redesign of FrameKTL.

TPU-native equivalent of the reference's per-frame feature bookkeeping
(reference: src/FrameKTL.cc + the KLT track maintenance in
src/Tracking.cc:476-543). The reference erases dead tracks from
std::vectors and shuffles descriptor rows; here a track lives in a fixed
slot with a validity mask — dead slots are simply refilled by the next
detection pass, so no compaction, no dynamic shapes, and track identity
(the slot index) is stable for free.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.ops.klt import (anchor_refine, anchor_refine_fast,
    extract_templates, extract_templates_fast, global_shift, klt_track)
from uvipslam_tpu.ops.orb import (Features, brief_descriptors, extract_orb,
    ic_angles, orient_and_describe_fast)
from uvipslam_tpu.ops.twoview import find_fundamental

N_BITS = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Tracks:
    """Fixed-slot KLT track table for the current frame."""

    xy: jax.Array        # [N, 2] distorted pixel position (current frame)
    xy_und: jax.Array    # [N, 2] undistorted
    desc: jax.Array      # [N, 256] i8 (from birth frame, refreshed at KFs)
    level: jax.Array     # [N] i32 pyramid level at detection
    angle: jax.Array     # [N] f32
    valid: jax.Array     # [N] bool
    pt_id: jax.Array     # [N] i32 associated landmark (-1 = none)
    birth_frame: jax.Array  # [N] i32 frame id when the track was born
    birth_xy_und: jax.Array # [N, 2] undistorted position at birth
    age: jax.Array       # [N] i32 frames tracked
    # anchor template (birth patch + gradients) for drift-free refinement,
    # at full resolution and at quarter resolution (coarse search)
    tpl: jax.Array       # [N, W*W] f32
    tpl_gx: jax.Array    # [N, W*W]
    tpl_gy: jax.Array    # [N, W*W]
    tpl2: jax.Array      # [N, W*W] level-1 (half res)
    tpl2_gx: jax.Array   # [N, W*W]
    tpl2_gy: jax.Array   # [N, W*W]

    TPL_WIN = 13

    @staticmethod
    def empty(n: int, dtype=jnp.float32, tpl_win: int = 13) -> "Tracks":
        return Tracks(
            xy=jnp.zeros((n, 2), dtype),
            xy_und=jnp.zeros((n, 2), dtype),
            desc=jnp.zeros((n, N_BITS), jnp.int8),
            level=jnp.zeros((n,), jnp.int32),
            angle=jnp.zeros((n,), dtype),
            valid=jnp.zeros((n,), bool),
            pt_id=jnp.full((n,), -1, jnp.int32),
            birth_frame=jnp.full((n,), -1, jnp.int32),
            birth_xy_und=jnp.zeros((n, 2), dtype),
            age=jnp.zeros((n,), jnp.int32),
            tpl=jnp.zeros((n, tpl_win * tpl_win), dtype),
            tpl_gx=jnp.zeros((n, tpl_win * tpl_win), dtype),
            tpl_gy=jnp.zeros((n, tpl_win * tpl_win), dtype),
            tpl2=jnp.zeros((n, tpl_win * tpl_win), dtype),
            tpl2_gx=jnp.zeros((n, tpl_win * tpl_win), dtype),
            tpl2_gy=jnp.zeros((n, tpl_win * tpl_win), dtype),
        )

    @property
    def n_slots(self) -> int:
        return self.xy.shape[0]


@functools.partial(jax.jit, static_argnames=("win", "iters", "levels"))
def propagate_tracks(
    tracks: Tracks,
    pyr_prev: tuple,
    pyr_cur: tuple,
    guess_xy: jax.Array,     # [N, 2] initial guesses (motion-model proj)
    guess_ok: jax.Array,     # [N] bool: use guess (else last position)
    ransac_key: jax.Array,
    win: int = 21,
    iters: int = 10,
    levels: int = 5,
) -> Tracks:
    """Propagate all tracks prev->cur and gate with F-RANSAC
    (reference: perform_matching, src/Tracking.cc:968-1080 — motion-model
    guesses, calcOpticalFlowPyrLK, findFundamentalMat mask).

    TPU redesign: instead of chaining pyramidal KLT frame-to-frame (15M
    bilinear gathers/frame — the TPU's weakest op — and cumulative
    template drift), each track is re-localized against its BIRTH
    template in two anchor-refinement stages (quarter-res for capture
    range, full-res for precision). ~100x fewer gathers and drift-free
    by construction; `ops.klt.klt_track` remains available for classic
    chained flow.
    """
    # dominant inter-frame translation from 1/4-res images: the capture-
    # range provider for tracks without a motion-model guess
    # level 3 (1/8 res): +-64 px capture range at full res with 8 px
    # quantization — well inside the half-res anchor stage's +-10 px
    # capture, at 1/4 the FFT cost of level 2
    lvl = min(3, len(pyr_prev) - 1)
    shift = global_shift(pyr_prev[lvl], pyr_cur[lvl], radius=8) * float(2 ** lvl)
    start = jnp.where(guess_ok[:, None], guess_xy, tracks.xy + shift[None, :])

    # mid: half-res anchor (capture ~ +-10 px at full res)
    coarse, ok_c = anchor_refine_fast(
        pyr_cur[1], tracks.tpl2, tracks.tpl2_gx, tracks.tpl2_gy,
        start / 2.0, tracks.valid, win=Tracks.TPL_WIN, iters=10,
        max_correction=5.0, max_residual=45.0,
    )
    mid = jnp.where(ok_c[:, None], coarse * 2.0, start)

    # fine: full-res anchor
    nxt, ok_f = anchor_refine_fast(
        pyr_cur[0], tracks.tpl, tracks.tpl_gx, tracks.tpl_gy,
        mid, tracks.valid, win=Tracks.TPL_WIN,
        max_correction=4.0, max_residual=32.0,
    )
    ok = tracks.valid & ok_f

    # fundamental-matrix gate between prev and cur positions
    _, _, inl = find_fundamental(ransac_key, tracks.xy, nxt, ok, sigma=1.0)
    survived = ok & inl

    return dataclasses.replace(
        tracks,
        xy=jnp.where(survived[:, None], nxt, tracks.xy),
        valid=survived,
        age=jnp.where(survived, tracks.age + 1, 0),
    )


@functools.partial(jax.jit, static_argnames=("steer",))
def refresh_descriptors(tracks: Tracks, img: jax.Array, steer: bool = False) -> Tracks:
    """Recompute BRIEF descriptors (and angles) for all live tracks at
    their CURRENT positions — the reference computes fresh descriptors
    every frame (FrameKTL::compute_descriptors, src/FrameKTL.cc:227-269);
    stale birth descriptors would make keyframe storage and projection
    matching wide-baseline problems."""
    from uvipslam_tpu.ops.image import gaussian_blur

    blur = gaussian_blur(img, 7, 2.0)
    if steer:
        ang = ic_angles(blur, tracks.xy, tracks.valid)
        desc = brief_descriptors(blur, tracks.xy, ang, tracks.valid)
    else:
        ang, desc = orient_and_describe_fast(blur, tracks.xy, tracks.valid)
    return dataclasses.replace(
        tracks,
        angle=jnp.where(tracks.valid, ang, tracks.angle),
        desc=jnp.where(tracks.valid[:, None], desc, tracks.desc),
    )


@functools.partial(jax.jit, static_argnames=("n_features", "px_distance",
                                              "steer", "score_type"))
def refill_tracks(
    tracks: Tracks,
    img: jax.Array,
    frame_id: jax.Array,
    n_features: int = 400,
    px_distance: int = 20,
    steer: bool = False,
    score_type: int = 0,
) -> Tracks:
    """Detect new ORB features away from live tracks and place them into
    dead slots (reference: perform_detection_monocular,
    src/Tracking.cc:893-966 + the occupancy-aware ORBextractor)."""
    feats = extract_orb(
        img, tracks.xy, tracks.valid,
        n_features=n_features, px_distance=px_distance, steer=steer,
        score_type=score_type,
    )
    # order new detections by score (desc), dead slots in slot order
    det_order = jnp.argsort(-jnp.where(feats.valid, feats.score, -jnp.inf), stable=True)
    slot_order = jnp.argsort(tracks.valid, stable=True)  # dead slots first

    n_dead = jnp.sum(~tracks.valid)
    # assign k-th best detection to k-th dead slot, while k < n_dead and
    # detection k is valid
    N = tracks.n_slots
    k = jnp.arange(N)
    det_idx = det_order[jnp.minimum(k, feats.xy.shape[0] - 1)]
    take = (k < n_dead) & feats.valid[det_idx]
    dst = slot_order[k]

    def fill(table, newvals, extra_dims=0):
        upd = newvals[det_idx]
        sel = take.reshape((N,) + (1,) * extra_dims)
        cur = table[dst]
        return table.at[dst].set(jnp.where(sel, upd, cur))

    tplT, tplX, tplY = extract_templates_fast(img, feats.xy, win=Tracks.TPL_WIN)
    from uvipslam_tpu.ops.image import pyr_down
    img2 = pyr_down(img)
    tpl2T, tpl2X, tpl2Y = extract_templates_fast(img2, feats.xy / 2.0, win=Tracks.TPL_WIN)
    xy = fill(tracks.xy, feats.xy, 1)
    tpl = fill(tracks.tpl, tplT, 1)
    tpl_gx = fill(tracks.tpl_gx, tplX, 1)
    tpl_gy = fill(tracks.tpl_gy, tplY, 1)
    tpl2 = fill(tracks.tpl2, tpl2T, 1)
    tpl2_gx = fill(tracks.tpl2_gx, tpl2X, 1)
    tpl2_gy = fill(tracks.tpl2_gy, tpl2Y, 1)
    desc = fill(tracks.desc, feats.desc, 1)
    level = fill(tracks.level, feats.level)
    angle = fill(tracks.angle, feats.angle)
    valid = tracks.valid.at[dst].set(jnp.where(take, True, tracks.valid[dst]))
    pt_id = tracks.pt_id.at[dst].set(jnp.where(take, -1, tracks.pt_id[dst]))
    birth = tracks.birth_frame.at[dst].set(
        jnp.where(take, jnp.asarray(frame_id, jnp.int32), tracks.birth_frame[dst])
    )
    age = tracks.age.at[dst].set(jnp.where(take, 0, tracks.age[dst]))

    return dataclasses.replace(
        tracks, xy=xy, desc=desc, level=level, angle=angle, valid=valid,
        pt_id=pt_id, birth_frame=birth, age=age,
        tpl=tpl, tpl_gx=tpl_gx, tpl_gy=tpl_gy,
        tpl2=tpl2, tpl2_gx=tpl2_gx, tpl2_gy=tpl2_gy,
    )
