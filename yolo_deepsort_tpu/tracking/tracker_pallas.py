"""Fused Pallas TPU "megakernel" for the whole DeepSORT tracker step.

Why: the scanned tracker (tracking/tracker.py tracker_step inside the K-frame
lax.scan) spends ~14 ms/chunk in SMALL-op dispatch overhead: each of the 16
scan iterations issues ~50 tiny XLA kernels (batched 8x8 KF algebra, gating,
IoU costs, lifecycle scatters) around the already-fused Pallas JV solve
(ops/assignment_pallas.py).  This module folds KF predict/update, gating,
IoU-cost construction, the two-stage JV solve and the track lifecycle into
ONE kernel dispatch per frame.  Only the parts that touch big HBM state stay
in XLA: the appearance-cost einsum over the (T, B, F) gallery, the gallery
ring-buffer scatters, and the two cascade argsorts (docs/ROADMAP.md "Design
sketch for lever 1").

Contracts: SURVEY.md Appendices A/B (reference: deep_sort/sort/tracker.py,
kalman_filter.py:~1-230, linear_assignment.py:~1-190, iou_matching.py).
Semantics mirror tracking/tracker.py tracker_step; the JV solve itself is the
EXACT machinery of ops/assignment_pallas.py (_make_stage_runner).

Layout: everything rides tracks-on-SUBLANES, matching the solver's cost
matrix (r_pad sublanes x nc_pad lanes):

  * mean (T, 8) f32, cov (T, 64) f32 (the 8x8 flattened on lanes), lifecycle
    ints (T, 8) i32 -- per-track scalars are (T, 1) column vectors.
  * per-detection scalars are (1, NC) lane vectors (det_cols rows), so every
    (track, det) interaction -- Mahalanobis gating, IoU -- is a plain
    broadcast op producing the (T, NC) cost block in place.
  * "gather detection k for track t" is a one-hot matmul: the solver's
    col_owner lane vector broadcast against a sublane iota yields the
    selection matrix sel[t, j] = (col_owner[j] == t), and sel @ det_rows
    lands the matched measurement per track on the MXU -- no transposes,
    no lane gathers.

KF algebra is unrolled closed-form: F P F^T as three lane-rolls of the
flattened covariance, the 4x4 projected-covariance Cholesky and the 8x4 gain
solve as ~10/60 elementwise column ops over full sublanes.

Numerics: same f32 math as the lax path but different op order/associativity
(e.g. lax uses jax.scipy cho_factor; here it is unrolled), so means/covs
match to ~1e-5 relative, not bitwise; all DISCRETE decisions (matches,
lifecycle, ids) are asserted equal to the lax tracker in tests on seeded
scenarios.  The lax path stays the default off-TPU and the reference
implementation everywhere.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TrackerConfig
from ..ops import boxes as B
from ..ops.assignment_pallas import _make_stage_runner, _round_up
from . import kalman as K
from .tracker import (
    INFTY_COST,
    STATE_CONFIRMED,
    STATE_FREE,
    STATE_TENTATIVE,
    TrackerState,
    _appearance_cost,
)

_BIG = 1e9
_LEVEL_INACTIVE = 2**30

_SP = 1.0 / 20  # kalman _STD_W_POS
_SV = 1.0 / 160  # kalman _STD_W_VEL
_H_FLOOR = 1e-2


def use_fused_tracker_default() -> bool:
    """Megakernel on TPU-class backends; YDT_TRACKER_PALLAS=0/1 forces."""
    env = os.environ.get("YDT_TRACKER_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() not in ("cpu", "gpu")


def _col(x, j):
    return x[:, j:j + 1]


def _chol4(s):
    """Unrolled lower-Cholesky of a batch of 4x4 SPD matrices.

    ``s`` is a dict {(i, j): (T, 1) column} of the lower entries; returns the
    10 L entries keyed the same way.  Guarded sqrt keeps padded free-slot
    rows finite (their S has the R floor on the diagonal anyway)."""
    def gsqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-20))

    l = {}
    l[(0, 0)] = gsqrt(s[(0, 0)])
    l[(1, 0)] = s[(1, 0)] / l[(0, 0)]
    l[(2, 0)] = s[(2, 0)] / l[(0, 0)]
    l[(3, 0)] = s[(3, 0)] / l[(0, 0)]
    l[(1, 1)] = gsqrt(s[(1, 1)] - l[(1, 0)] * l[(1, 0)])
    l[(2, 1)] = (s[(2, 1)] - l[(2, 0)] * l[(1, 0)]) / l[(1, 1)]
    l[(3, 1)] = (s[(3, 1)] - l[(3, 0)] * l[(1, 0)]) / l[(1, 1)]
    l[(2, 2)] = gsqrt(s[(2, 2)] - l[(2, 0)] ** 2 - l[(2, 1)] ** 2)
    l[(3, 2)] = (s[(3, 2)] - l[(3, 0)] * l[(2, 0)]
                 - l[(3, 1)] * l[(2, 1)]) / l[(2, 2)]
    l[(3, 3)] = gsqrt(s[(3, 3)] - l[(3, 0)] ** 2 - l[(3, 1)] ** 2
                      - l[(3, 2)] ** 2)
    return l


def _cho_solve4(l, b):
    """Solve L L^T x = b for one 4-vector of (T, 1) columns."""
    y0 = b[0] / l[(0, 0)]
    y1 = (b[1] - l[(1, 0)] * y0) / l[(1, 1)]
    y2 = (b[2] - l[(2, 0)] * y0 - l[(2, 1)] * y1) / l[(2, 2)]
    y3 = (b[3] - l[(3, 0)] * y0 - l[(3, 1)] * y1 - l[(3, 2)] * y2) / l[(3, 3)]
    x3 = y3 / l[(3, 3)]
    x2 = (y2 - l[(3, 2)] * x3) / l[(2, 2)]
    x1 = (y1 - l[(2, 1)] * x2 - l[(3, 1)] * x3) / l[(1, 1)]
    x0 = (y0 - l[(1, 0)] * x1 - l[(2, 0)] * x2 - l[(3, 0)] * x3) / l[(0, 0)]
    return [x0, x1, x2, x3]


def _tracker_kernel(
    n_ref, app_ref, detc_ref, detr_ref, mask_ref,
    order_a_ref, levels_a_ref, order_b_ref,
    mean_ref, cov_ref, ints_ref,
    mean_out, cov_out, ints_out,
    aug_ref,
    *, r_pad: int, nc_pad: int, c_real: int,
    max_dist: float, max_iou_distance: float, max_age: int, n_init: int,
):
    """One stream's full tracker step.

    n_ref (S, 3) i32 SMEM: [n_active_a, n_active_b, next_id].
    app_ref (T, NC) f32: appearance cost, BIG beyond the real det columns.
    detc_ref (8, NC) f32 rows: [cx, cy, a, h, tx, ty, tw, th] per det lane.
    detr_ref (NC, 128) f32: [xyah | tlwh | 0...] per det sublane row.
    mask_ref (1, NC) i32: valid-detection lanes (conf-filtered).
    order/levels (1, T) i32: stage-A cascade order (XLA argsort).
    mean/cov/ints: (T, 8) f32 / (T, 64) f32 / (T, 8) i32
      ints cols: [state, hits, age, tsu, track_id, 0, 0, 0].
    ints_out cols: [state, hits, age, tsu, track_id, match_det,
      det_for_slot, 0] (match_det/det_for_slot are -1 when none; the XLA
      wrapper turns them into the gallery scatters)."""
    run_stage, pick_r, iota_c, _ = _make_stage_runner(r_pad, nc_pad)
    pid = pl.program_id(0)
    t = r_pad

    iota_rc = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)  # (T, 1)
    mask_row = mask_ref[...] > 0  # (1, NC)
    real_col = iota_c < c_real

    mean = mean_ref[...]  # (T, 8)
    cov = cov_ref[...]  # (T, 64)
    ints = ints_ref[...]  # (T, 8)
    st0 = _col(ints, 0)
    hits0 = _col(ints, 1)
    age0 = _col(ints, 2)
    tsu0 = _col(ints, 3)
    tid0 = _col(ints, 4)
    active = st0 > STATE_FREE
    confirmed = st0 == STATE_CONFIRMED
    tentative = st0 == STATE_TENTATIVE

    # ---- KF predict (kalman.predict batched; F P F^T as lane rolls)
    h_q = jnp.maximum(_col(mean, 3), _H_FLOOR)  # Q uses pre-step h
    mean_p = jnp.concatenate([mean[:, :4] + mean[:, 4:], mean[:, 4:]], axis=1)
    zc = jnp.zeros_like(cov)
    r4 = jnp.concatenate([cov[:, 4:], zc[:, :4]], axis=1)
    r32 = jnp.concatenate([cov[:, 32:], zc[:, :32]], axis=1)
    r36 = jnp.concatenate([cov[:, 36:], zc[:, :36]], axis=1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    il, jl = l_iota // 8, l_iota % 8
    cov_p = (cov + jnp.where(jl < 4, r4, 0.0) + jnp.where(il < 4, r32, 0.0)
             + jnp.where((il < 4) & (jl < 4), r36, 0.0))
    q_diag = [(_SP * h_q) ** 2, (_SP * h_q) ** 2,
              jnp.full_like(h_q, 1e-2 ** 2), (_SP * h_q) ** 2,
              (_SV * h_q) ** 2, (_SV * h_q) ** 2,
              jnp.full_like(h_q, 1e-5 ** 2), (_SV * h_q) ** 2]
    for i in range(8):
        cov_p = cov_p + jnp.where(l_iota == 9 * i, q_diag[i], 0.0)
    mean_p = jnp.where(active, mean_p, mean)
    cov_p = jnp.where(active, cov_p, cov)
    tsu1 = tsu0 + active.astype(jnp.int32)
    age1 = age0 + active.astype(jnp.int32)

    # ---- project + Cholesky of S = H P H^T + R (kalman.project)
    h_p = jnp.maximum(_col(mean_p, 3), _H_FLOOR)
    r_diag = [(_SP * h_p) ** 2, (_SP * h_p) ** 2,
              jnp.full_like(h_p, 1e-1 ** 2), (_SP * h_p) ** 2]
    s = {}
    for i in range(4):
        for j in range(i + 1):
            s[(i, j)] = _col(cov_p, 8 * i + j)
        s[(i, i)] = s[(i, i)] + r_diag[i]
    l = _chol4(s)

    # ---- Mahalanobis gating distance, all (track, det) pairs broadcast
    proj = [_col(mean_p, k) for k in range(4)]
    diff = [detc_ref[k:k + 1, :] - proj[k] for k in range(4)]  # (T, NC)
    y0 = diff[0] / l[(0, 0)]
    y1 = (diff[1] - l[(1, 0)] * y0) / l[(1, 1)]
    y2 = (diff[2] - l[(2, 0)] * y0 - l[(2, 1)] * y1) / l[(2, 2)]
    y3 = (diff[3] - l[(3, 0)] * y0 - l[(3, 1)] * y1
          - l[(3, 2)] * y2) / l[(3, 3)]
    maha = y0 * y0 + y1 * y1 + y2 * y2 + y3 * y3

    # ---- stage A: gated-cosine cascade (linear_assignment.matching_cascade)
    app = app_ref[...]
    el_a = (confirmed & mask_row & (app <= max_dist)
            & (maha <= K.CHI2INV95_4DOF))
    dummy_a = jnp.where(iota_c - c_real == iota_rc, max_dist + 2e-5, _BIG)
    aug_ref[...] = jnp.where(real_col, jnp.where(el_a, app, _BIG), dummy_a)
    assign_a, owner_a = run_stage(
        aug_ref, order_a_ref[...], levels_a_ref[...], n_ref[pid, 0]
    )

    # ---- stage B: IoU match over unconfirmed + just-missed (iou_matching)
    a_col = _col(mean_p, 2)
    tw = a_col * h_p
    tx = _col(mean_p, 0) - tw * 0.5
    ty = _col(mean_p, 1) - h_p * 0.5
    dtx, dty = detc_ref[4:5, :], detc_ref[5:6, :]
    dtw, dth = detc_ref[6:7, :], detc_ref[7:8, :]
    ix = jnp.maximum(jnp.minimum(tx + tw, dtx + dtw) - jnp.maximum(tx, dtx),
                     0.0)
    iy = jnp.maximum(jnp.minimum(ty + h_p, dty + dth) - jnp.maximum(ty, dty),
                     0.0)
    inter = ix * iy
    denom = tw * h_p + dtw * dth - inter
    iou = jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1.0), 0.0)
    iou_cost = 1.0 - iou
    rows_b = tentative | (confirmed & (tsu1 == 1))
    el_b = (rows_b & mask_row & (tsu1 <= 1) & (iou_cost <= max_iou_distance))
    dummy_b = jnp.where(iota_c - c_real == iota_rc, max_iou_distance + 2e-5,
                        _BIG)
    taken_a = ((owner_a >= 0) & real_col).astype(jnp.int32)

    def skip_row(i):
        a = pick_r(assign_a, i)
        return ((a >= 0) & (a < c_real)).astype(jnp.int32)

    aug_ref[...] = jnp.where(real_col, jnp.where(el_b, iou_cost, _BIG),
                             dummy_b)
    zeros_lv = jnp.zeros((1, r_pad), jnp.int32)
    _, owner_b = run_stage(
        aug_ref, order_b_ref[...], zeros_lv, n_ref[pid, 1],
        col_veto=taken_a, skip_row=skip_row,
    )

    # ---- combined match selection (tracker._match result)
    own = jnp.where(owner_a >= 0, owner_a, owner_b)  # (1, NC)
    sel = (own == iota_rc) & (own >= 0) & real_col  # (T, NC) one-hot rows
    sel_i = sel.astype(jnp.int32)
    matched = jnp.sum(sel_i, axis=1, keepdims=True) > 0  # (T, 1)
    match_det = jnp.where(
        matched, jnp.sum(sel_i * iota_c, axis=1, keepdims=True), -1
    )

    # ---- lifecycle: hits/confirm/miss/delete (sort/track.py update paths)
    hits1 = hits0 + matched.astype(jnp.int32)
    tsu2 = jnp.where(matched, 0, tsu1)
    st1 = jnp.where(matched & tentative & (hits1 >= n_init),
                    STATE_CONFIRMED, st0)
    missed = active & jnp.logical_not(matched)
    deleted = missed & (tentative | (tsu2 > max_age))
    st1 = jnp.where(deleted, STATE_FREE, st1)
    tid1 = jnp.where(deleted, 0, tid0)

    # ---- initiate: pair r-th unmatched det with r-th free slot
    free = st1 == STATE_FREE  # (T, 1)
    unmatched_d = (mask_row & (own < 0) & real_col).astype(jnp.int32)
    # shift ladders derived from the (static) padded sizes so any
    # max_dets/max_tracks is covered (a fixed ladder topping out at 256
    # would silently mis-rank beyond 512 lanes)
    drank = unmatched_d
    sh = 1
    while sh < nc_pad:  # inclusive lane cumsum
        drank = drank + jnp.concatenate(
            [jnp.zeros((1, sh), jnp.int32), drank[:, :-sh]], axis=1)
        sh *= 2
    drank0 = drank - 1
    frank = free.astype(jnp.int32)
    sh = 1
    while sh < t:  # sublane cumsum
        frank = frank + jnp.concatenate(
            [jnp.zeros((sh, 1), jnp.int32), frank[:-sh, :]], axis=0)
        sh *= 2
    frank0 = frank - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    sel_new = (free & (unmatched_d > 0) & (frank0 == drank0)
               & (drank0 < n_free))
    sel_new_i = sel_new.astype(jnp.int32)
    is_new = jnp.sum(sel_new_i, axis=1, keepdims=True) > 0  # (T, 1)
    det_for_slot = jnp.where(
        is_new, jnp.sum(sel_new_i * iota_c, axis=1, keepdims=True), -1
    )

    # ---- matched + new measurements in one MXU one-hot matmul
    sel_all = (sel_i + sel_new_i).astype(jnp.float32)  # disjoint rows
    # HIGHEST precision: this dot is an exact f32 selection (one-hot rows);
    # default MXU precision may round f32 operands toward bf16, perturbing
    # measurement coords by pixels at 1080p.
    meas = jnp.dot(sel_all, detr_ref[...],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (T, 128)
    mz = [_col(meas, k) for k in range(4)]  # xyah measurement columns

    # ---- KF update (kalman.update): gain = P H^T S^-1 via the Cholesky
    inno = [mz[k] - proj[k] for k in range(4)]
    gain = []
    for i in range(8):
        b4 = [_col(cov_p, 8 * i + k) for k in range(4)]
        gain.append(_cho_solve4(l, b4))
    mean_u_cols = [
        _col(mean_p, i) + sum(gain[i][k] * inno[k] for k in range(4))
        for i in range(8)
    ]
    sfull = {}
    for i in range(4):
        for j in range(4):
            sfull[(i, j)] = s[(i, j)] if i >= j else s[(j, i)]
    m_ik = [[sum(gain[i][q] * sfull[(q, k)] for q in range(4))
             for k in range(4)] for i in range(8)]
    cov_u_cols = [
        _col(cov_p, 8 * i + j) - sum(m_ik[i][k] * gain[j][k]
                                     for k in range(4))
        for i in range(8) for j in range(8)
    ]
    mean_u = jnp.concatenate(mean_u_cols, axis=1)
    cov_u = jnp.concatenate(cov_u_cols, axis=1)
    mean_f = jnp.where(matched, mean_u, mean_p)
    cov_f = jnp.where(matched, cov_u, cov_p)

    # ---- initiate mean/cov (kalman.initiate)
    h_n = jnp.maximum(mz[3], _H_FLOOR)
    init_mean = jnp.concatenate(mz + [jnp.zeros_like(h_n)] * 4, axis=1)
    i_diag = [(2 * _SP * h_n) ** 2, (2 * _SP * h_n) ** 2,
              jnp.full_like(h_n, 1e-2 ** 2), (2 * _SP * h_n) ** 2,
              (10 * _SV * h_n) ** 2, (10 * _SV * h_n) ** 2,
              jnp.full_like(h_n, 1e-5 ** 2), (10 * _SV * h_n) ** 2]
    init_cov = jnp.zeros_like(cov_f)
    for i in range(8):
        init_cov = init_cov + jnp.where(l_iota == 9 * i, i_diag[i], 0.0)
    mean_f = jnp.where(is_new, init_mean, mean_f)
    cov_f = jnp.where(is_new, init_cov, cov_f)

    next_id = n_ref[pid, 2]
    st2 = jnp.where(is_new, STATE_TENTATIVE, st1)
    tid2 = jnp.where(is_new, next_id + frank0, tid1)
    hits2 = jnp.where(is_new, 1, hits1)
    age2 = jnp.where(is_new, 1, age1)
    tsu3 = jnp.where(is_new, 0, tsu2)

    mean_out[...] = mean_f
    cov_out[...] = cov_f
    ints_out[...] = jnp.concatenate(
        [st2, hits2, age2, tsu3, tid2, match_det, det_for_slot,
         jnp.zeros_like(st2)], axis=1)


def _kernel_batched(n3, app, det_cols, det_rows, mask_l, order_a, levels_a,
                    order_b, mean, cov, ints, *, c_real, cfg: TrackerConfig,
                    interpret=False):
    s, r_pad, nc_pad = app.shape
    kernel = partial(
        _tracker_kernel, r_pad=r_pad, nc_pad=nc_pad, c_real=c_real,
        max_dist=float(cfg.max_dist),
        max_iou_distance=float(cfg.max_iou_distance),
        max_age=int(cfg.max_age), n_init=int(cfg.n_init),
    )
    row = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((s, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, r_pad, nc_pad), row),
            pl.BlockSpec((None, 8, nc_pad), row),
            pl.BlockSpec((None, nc_pad, 128), row),
            pl.BlockSpec((None, 1, nc_pad), row),
            pl.BlockSpec((None, 1, r_pad), row),
            pl.BlockSpec((None, 1, r_pad), row),
            pl.BlockSpec((None, 1, r_pad), row),
            pl.BlockSpec((None, r_pad, 8), row),
            pl.BlockSpec((None, r_pad, 64), row),
            pl.BlockSpec((None, r_pad, 8), row),
        ],
        out_specs=[
            pl.BlockSpec((None, r_pad, 8), row),
            pl.BlockSpec((None, r_pad, 64), row),
            pl.BlockSpec((None, r_pad, 8), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, r_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((s, r_pad, 64), jnp.float32),
            jax.ShapeDtypeStruct((s, r_pad, 8), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((r_pad, nc_pad), jnp.float32)],
        interpret=interpret,
    )(n3, app, det_cols, det_rows, mask_l, order_a, levels_a, order_b,
      mean, cov, ints)


def tracker_step_fused_batched(
    cfg: TrackerConfig,
    state: TrackerState,  # every leaf with a leading (S,) stream axis
    det_tlwh: jnp.ndarray,  # (S, D, 4) f32
    det_conf: jnp.ndarray,  # (S, D) f32
    det_feat: jnp.ndarray,  # (S, D, F) f32 L2-normalized
    det_mask: jnp.ndarray,  # (S, D) bool
    img_hw: jnp.ndarray,  # (2,) i32
    interpret=None,  # None = interpret mode iff the backend is CPU
) -> Tuple[TrackerState, jnp.ndarray, jnp.ndarray]:
    """Batched drop-in for vmap(tracker_step) over the stream axis.

    Same returns: (new_state, outputs (S, T, 5) i32, emit (S, T) bool)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t = cfg.max_tracks
    assert t % 8 == 0, "megakernel requires max_tracks % 8 == 0"
    s_streams, c = det_tlwh.shape[0], det_tlwh.shape[1]
    r_pad = t
    nc_pad = _round_up(c + t, 128)

    det_mask = det_mask & (det_conf > cfg.min_confidence)
    det_xyah = B.tlwh_to_xyah(det_tlwh)

    # -- XLA side: appearance cost from the gallery + cascade orders
    app = jax.vmap(lambda st, f: _appearance_cost(st, f, cfg))(
        state, det_feat)  # (S, T, D)
    confirmed = state.state == STATE_CONFIRMED
    levels = jnp.where(confirmed, state.time_since_update, _LEVEL_INACTIVE)
    order_a = jnp.argsort(levels, axis=-1, stable=True).astype(jnp.int32)
    n_a = jnp.sum(confirmed.astype(jnp.int32), axis=-1)
    rows_b = (state.state == STATE_TENTATIVE) | (
        confirmed & (state.time_since_update == 0))
    order_b = jnp.argsort(
        jnp.where(rows_b, 0, _LEVEL_INACTIVE), axis=-1, stable=True
    ).astype(jnp.int32)
    n_b = jnp.sum(rows_b.astype(jnp.int32), axis=-1)
    n3 = jnp.stack(
        [n_a, n_b, jnp.broadcast_to(state.next_id, n_a.shape)], axis=-1
    ).astype(jnp.int32)

    app_p = jnp.pad(app, ((0, 0), (0, 0), (0, nc_pad - c)),
                    constant_values=_BIG)
    d8 = jnp.concatenate([det_xyah, det_tlwh], axis=-1)  # (S, D, 8)
    det_cols = jnp.pad(jnp.swapaxes(d8, 1, 2),
                       ((0, 0), (0, 0), (0, nc_pad - c)))
    det_rows = jnp.pad(d8, ((0, 0), (0, nc_pad - c), (0, 120)))
    mask_l = jnp.pad(det_mask.astype(jnp.int32), ((0, 0), (0, nc_pad - c)))
    ints = jnp.stack(
        [state.state, state.hits, state.age, state.time_since_update,
         state.track_id] + [jnp.zeros_like(state.state)] * 3, axis=-1
    ).astype(jnp.int32)

    mean_o, cov_o, ints_o = _kernel_batched(
        n3, app_p, det_cols, det_rows, mask_l[:, None, :],
        order_a[:, None, :], levels.astype(jnp.int32)[:, None, :],
        order_b[:, None, :],
        state.mean, state.cov.reshape(s_streams, t, 64), ints,
        c_real=c, cfg=cfg, interpret=interpret,
    )

    st2 = ints_o[..., 0]
    hits2 = ints_o[..., 1]
    age2 = ints_o[..., 2]
    tsu2 = ints_o[..., 3]
    tid2 = ints_o[..., 4]
    match_det = ints_o[..., 5]
    det_for_slot = ints_o[..., 6]

    # -- XLA side: gallery ring-buffer scatters (tracker.py:~160-223)
    def gallery_update(gal, head, count, match, new_slot, feat):
        lane = jnp.arange(t, dtype=jnp.int32)
        matched = match >= 0
        gal = gal.at[jnp.where(matched, lane, t), head].set(
            feat[jnp.maximum(match, 0)], mode="drop")
        head2 = jnp.where(matched, (head + 1) % cfg.nn_budget, head)
        count2 = jnp.where(matched, jnp.minimum(count + 1, cfg.nn_budget),
                           count)
        is_new = new_slot >= 0
        gal = gal.at[jnp.where(is_new, lane, t), 0].set(
            feat[jnp.maximum(new_slot, 0)], mode="drop")
        head2 = jnp.where(is_new, 1 % cfg.nn_budget, head2)
        count2 = jnp.where(is_new, 1, count2)
        return gal, head2, count2

    gallery, g_head, g_count = jax.vmap(gallery_update)(
        state.gallery, state.gallery_head, state.gallery_count,
        match_det, det_for_slot, det_feat)
    next_id = state.next_id + jnp.sum(
        (det_for_slot >= 0).astype(jnp.int32), axis=-1)

    new_state = TrackerState(
        mean=mean_o, cov=cov_o.reshape(s_streams, t, 8, 8), track_id=tid2,
        state=st2, hits=hits2, age=age2, time_since_update=tsu2,
        gallery=gallery, gallery_head=g_head, gallery_count=g_count,
        next_id=next_id,
    )

    # -- outputs: confirmed & tsu<=1 as int [x1,y1,x2,y2,id] (tracker.py:~240)
    emit = (st2 == STATE_CONFIRMED) & (tsu2 <= 1)
    out_tlwh = B.xyah_to_tlwh(mean_o[..., :4])
    x, y = out_tlwh[..., 0], out_tlwh[..., 1]
    w, h = out_tlwh[..., 2], out_tlwh[..., 3]
    height, width = img_hw[0], img_hw[1]
    x1 = jnp.maximum(x.astype(jnp.int32), 0)
    y1 = jnp.maximum(y.astype(jnp.int32), 0)
    x2 = jnp.minimum((x + w).astype(jnp.int32), width - 1)
    y2 = jnp.minimum((y + h).astype(jnp.int32), height - 1)
    outputs = jnp.stack([x1, y1, x2, y2, tid2], axis=-1)
    return new_state, outputs, emit
