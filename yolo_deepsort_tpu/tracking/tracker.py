"""The DeepSORT tracker as a fixed-shape functional state machine.

Contracts: SURVEY.md section 3.3 + Appendices A/B (reference:
deep_sort/sort/tracker.py, track.py, nn_matching.py, iou_matching.py and the
deep_sort/deep_sort.py facade). Oracle: specs/tracker_np.py.

TPU-first design (SURVEY.md section 7): the reference's per-frame Python
object graph (Track list, feature-gallery dict, scipy Hungarian) becomes one
jitted ``tracker_step(state, detections) -> (state, outputs)`` over
fixed-shape masked arrays:

  * track slots: MAX_TRACKS lanes; a slot's lifecycle lives in integer arrays
    (state/hits/time_since_update), its motion state in batched Kalman
    mean/cov, its appearance history in a ring-buffer gallery
    (MAX_TRACKS, NN_BUDGET, FEAT_DIM).
  * the 70-level matching cascade + IoU fallback run fully on-chip via the
    single-pass JV cascade solver (ops/assignment.py).
  * everything vmaps over a stream axis and scans over frames; state is a
    pytree of arrays, trivially checkpointable (SURVEY.md section 5.4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from ..ops import boxes as B
from ..ops.assignment import solve_two_stage_assignment
from . import kalman as K

INFTY_COST = 1e5

# track slot lifecycle states (sort/track.py TrackState; 0 = free slot)
STATE_FREE = 0
STATE_TENTATIVE = 1
STATE_CONFIRMED = 2


class TrackerState(NamedTuple):
    """Pytree carried through jit / lax.scan; one lane per track slot."""

    mean: jnp.ndarray  # (T, 8) f32 Kalman mean (xyah + velocities)
    cov: jnp.ndarray  # (T, 8, 8) f32
    track_id: jnp.ndarray  # (T,) i32; 0 when free
    state: jnp.ndarray  # (T,) i32 STATE_*
    hits: jnp.ndarray  # (T,) i32
    age: jnp.ndarray  # (T,) i32
    time_since_update: jnp.ndarray  # (T,) i32
    gallery: jnp.ndarray  # (T, B, F) f32 ring buffer of L2-normed features
    gallery_head: jnp.ndarray  # (T,) i32 next write slot
    gallery_count: jnp.ndarray  # (T,) i32 valid entries (<= B)
    next_id: jnp.ndarray  # () i32, starts at 1


def init_tracker_state(cfg: TrackerConfig) -> TrackerState:
    t, b, f = cfg.max_tracks, cfg.nn_budget, cfg.feat_dim
    return TrackerState(
        mean=jnp.zeros((t, 8), jnp.float32),
        cov=jnp.zeros((t, 8, 8), jnp.float32),
        track_id=jnp.zeros((t,), jnp.int32),
        state=jnp.zeros((t,), jnp.int32),
        hits=jnp.zeros((t,), jnp.int32),
        age=jnp.zeros((t,), jnp.int32),
        time_since_update=jnp.zeros((t,), jnp.int32),
        gallery=jnp.zeros((t, b, f), jnp.float32),
        gallery_head=jnp.zeros((t,), jnp.int32),
        gallery_count=jnp.zeros((t,), jnp.int32),
        next_id=jnp.ones((), jnp.int32),
    )


def _appearance_cost(
    state: TrackerState, det_feat: jnp.ndarray, cfg: TrackerConfig
) -> jnp.ndarray:
    """min over gallery of (1 - cosine similarity); (T, D).

    Features are L2-normalized by the extractor (reference pre-normalizes
    too, nn_matching.py _nn_cosine_distance with normalized data).
    """
    sims = jnp.einsum("tbf,df->tbd", state.gallery, det_feat)  # (T, B, D)
    valid = (
        jnp.arange(cfg.nn_budget)[None, :] < state.gallery_count[:, None]
    )  # (T, B)
    sims = jnp.where(valid[:, :, None], sims, -jnp.inf)
    best = jnp.max(sims, axis=1)  # (T, D)
    return jnp.where(state.gallery_count[:, None] > 0, 1.0 - best, INFTY_COST)


def tracker_step(
    cfg: TrackerConfig,
    state: TrackerState,
    det_tlwh: jnp.ndarray,  # (D, 4) f32
    det_conf: jnp.ndarray,  # (D,) f32
    det_feat: jnp.ndarray,  # (D, F) f32, L2-normalized
    det_mask: jnp.ndarray,  # (D,) bool
    img_hw: jnp.ndarray,  # (2,) i32 (height, width) for output clipping
) -> Tuple[TrackerState, jnp.ndarray, jnp.ndarray]:
    """One frame of DeepSORT association.

    Returns (new_state, outputs, out_mask): outputs is (T, 5) int32 rows
    [x1, y1, x2, y2, track_id] (clipped to the frame like the reference's
    _tlwh_to_xyxy), valid where out_mask -- confirmed tracks with
    time_since_update <= 1 (deep_sort.py:~95).
    """
    t = cfg.max_tracks
    det_mask = det_mask & (det_conf > cfg.min_confidence)
    det_xyah = B.tlwh_to_xyah(det_tlwh)

    active = state.state > STATE_FREE
    confirmed = state.state == STATE_CONFIRMED

    # ---- predict (tracker.predict: KF predict + age/tsu bump for every track)
    new_mean, new_cov = K.predict_batch(state.mean, state.cov)
    mean = jnp.where(active[:, None], new_mean, state.mean)
    cov = jnp.where(active[:, None, None], new_cov, state.cov)
    tsu = jnp.where(active, state.time_since_update + 1, state.time_since_update)
    age = jnp.where(active, state.age + 1, state.age)

    # ---- stage 1: gated-cosine matching cascade over confirmed tracks
    app_cost = _appearance_cost(state, det_feat, cfg)  # (T, D)
    maha = K.gating_distance_matrix(mean, cov, det_xyah)  # (T, D)
    gated_cost = jnp.where(maha > K.CHI2INV95_4DOF, INFTY_COST, app_cost)

    # ---- stage 2 costs: IoU matching for unconfirmed + just-missed
    # confirmed; both stages solve as ONE fused call (a single Pallas
    # dispatch per frame on TPU)
    track_tlwh = B.xyah_to_tlwh(mean[:, :4])
    iou_cost = 1.0 - B.iou_tlwh(track_tlwh, det_tlwh)  # (T, D)
    iou_cost = jnp.where((tsu > 1)[:, None], INFTY_COST, iou_cost)
    iou_rows_super = (state.state == STATE_TENTATIVE) | (
        confirmed & (tsu == 1)
    )
    match_a, match_b = solve_two_stage_assignment(
        gated_cost, tsu - 1, confirmed, det_mask, cfg.max_dist,
        iou_cost, iou_rows_super, cfg.max_iou_distance,
    )
    det_taken = jnp.zeros(det_mask.shape, bool).at[
        jnp.where(match_a >= 0, match_a, det_mask.shape[0])
    ].set(True, mode="drop")
    match = jnp.where(match_a >= 0, match_a, match_b)  # (T,)
    matched = match >= 0

    # ---- apply updates to matched tracks (track.update)
    meas = det_xyah[jnp.maximum(match, 0)]  # (T, 4)
    upd_mean, upd_cov = K.update_batch(mean, cov, meas)
    mean = jnp.where(matched[:, None], upd_mean, mean)
    cov = jnp.where(matched[:, None, None], upd_cov, cov)
    hits = state.hits + matched.astype(jnp.int32)
    tsu = jnp.where(matched, 0, tsu)
    trk_state = jnp.where(
        matched & (state.state == STATE_TENTATIVE) & (hits >= cfg.n_init),
        STATE_CONFIRMED,
        state.state,
    )

    # gallery append for matched tracks (metric.partial_fit ring-buffer
    # form). Row-scatter with dropped out-of-range rows, NOT a masked
    # full-tensor where: the where rewrites the whole (T, B, F) gallery
    # (26 MB/stream at defaults) every frame, ~6.6 GB of HBM traffic per
    # 128-frame chunk; the scatter touches only the written rows and stays
    # in-place under buffer donation.
    feat_for_track = det_feat[jnp.maximum(match, 0)]  # (T, F)
    lane = jnp.arange(t, dtype=jnp.int32)
    gallery = state.gallery.at[
        jnp.where(matched, lane, t), state.gallery_head
    ].set(feat_for_track, mode="drop")
    gallery_head = jnp.where(
        matched, (state.gallery_head + 1) % cfg.nn_budget, state.gallery_head
    )
    gallery_count = jnp.where(
        matched,
        jnp.minimum(state.gallery_count + 1, cfg.nn_budget),
        state.gallery_count,
    )

    # ---- mark_missed: tentative miss -> delete; confirmed stale -> delete
    missed = active & ~matched
    deleted = missed & (
        (state.state == STATE_TENTATIVE) | (tsu > cfg.max_age)
    )
    trk_state = jnp.where(deleted, STATE_FREE, trk_state)
    track_id = jnp.where(deleted, 0, state.track_id)

    # ---- initiate tracks for unmatched detections, in detection order
    det_taken_b = jnp.zeros(det_mask.shape, bool).at[
        jnp.where(match_b >= 0, match_b, det_mask.shape[0])
    ].set(True, mode="drop")
    unmatched_det = det_mask & ~det_taken & ~det_taken_b

    free_slot = trk_state == STATE_FREE
    det_rank = jnp.cumsum(unmatched_det.astype(jnp.int32)) - 1  # (D,)
    n_free = jnp.sum(free_slot.astype(jnp.int32))
    slot_order = jnp.argsort(~free_slot, stable=True)  # free slots first
    can_init = unmatched_det & (det_rank < n_free)
    target_slot = jnp.where(can_init, slot_order[jnp.minimum(det_rank, t - 1)], t)
    det_for_slot = (
        jnp.full((t,), -1, jnp.int32)
        .at[target_slot]
        .set(jnp.arange(det_mask.shape[0], dtype=jnp.int32), mode="drop")
    )
    is_new = det_for_slot >= 0
    new_det = jnp.maximum(det_for_slot, 0)

    init_mean, init_cov = K.initiate_batch(det_xyah[new_det])
    mean = jnp.where(is_new[:, None], init_mean, mean)
    cov = jnp.where(is_new[:, None, None], init_cov, cov)
    trk_state = jnp.where(is_new, STATE_TENTATIVE, trk_state)
    track_id = jnp.where(
        is_new, state.next_id + det_rank[new_det], track_id
    )
    hits = jnp.where(is_new, 1, hits)
    age = jnp.where(is_new, 1, age)
    tsu = jnp.where(is_new, 0, tsu)
    gallery = gallery.at[jnp.where(is_new, lane, t), 0].set(
        det_feat[new_det], mode="drop"
    )  # slot 0 write for fresh tracks; same scatter form as the append
    # head wraps immediately when nn_budget == 1 (else the first matched-frame
    # write would target the out-of-range index 1 and be silently dropped)
    gallery_head = jnp.where(is_new, 1 % cfg.nn_budget, gallery_head)
    gallery_count = jnp.where(is_new, 1, gallery_count)
    next_id = state.next_id + jnp.sum(can_init.astype(jnp.int32))

    new_state = TrackerState(
        mean=mean,
        cov=cov,
        track_id=track_id,
        state=trk_state,
        hits=hits,
        age=age,
        time_since_update=tsu,
        gallery=gallery,
        gallery_head=gallery_head,
        gallery_count=gallery_count,
        next_id=next_id,
    )

    # ---- outputs: confirmed tracks with tsu <= 1, as int [x1,y1,x2,y2,id]
    emit = (trk_state == STATE_CONFIRMED) & (tsu <= 1)
    out_tlwh = B.xyah_to_tlwh(mean[:, :4])
    x, y, w, h = out_tlwh[:, 0], out_tlwh[:, 1], out_tlwh[:, 2], out_tlwh[:, 3]
    height, width = img_hw[0], img_hw[1]
    x1 = jnp.maximum(x.astype(jnp.int32), 0)
    y1 = jnp.maximum(y.astype(jnp.int32), 0)
    x2 = jnp.minimum((x + w).astype(jnp.int32), width - 1)
    y2 = jnp.minimum((y + h).astype(jnp.int32), height - 1)
    outputs = jnp.stack([x1, y1, x2, y2, track_id], axis=1)
    return new_state, outputs, emit
