"""Sanitizer tier (SURVEY section 5.2): jax_debug_nans over the tracker hot
path, and NaN-injection isolation -- one poisoned stream must not corrupt
its neighbors through the batched step.

The fixed-shape masked style is prone to a specific bug class: a masked
lane's garbage (inf - inf, 0/0) leaking into live lanes through a reduction
or matmul. ``jax_debug_nans`` turns any NaN *produced by an op* into an
error, so running representative scenarios under it proves the masking
discipline keeps every computed array finite where it matters.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from functools import partial  # noqa: E402

from yolo_deepsort_tpu.config import TrackerConfig  # noqa: E402
from yolo_deepsort_tpu.tracking.tracker import (  # noqa: E402
    init_tracker_state,
    tracker_step,
)

IMG_HW = np.array([720, 1280], np.int32)


def _frame(rng, cfg, n):
    d = cfg.max_dets
    tlwh = np.zeros((d, 4), np.float32)
    tlwh[:n, :2] = rng.uniform(50, 500, (n, 2))
    tlwh[:n, 2:] = rng.uniform([20, 40], [60, 120], (n, 2))
    conf = np.zeros((d,), np.float32)
    conf[:n] = rng.uniform(0.6, 0.95, n)
    feat = np.zeros((d, cfg.feat_dim), np.float32)
    f = rng.normal(size=(n, cfg.feat_dim))
    feat[:n] = f / np.linalg.norm(f, axis=1, keepdims=True)
    mask = np.zeros((d,), bool)
    mask[:n] = True
    return tlwh, conf, feat, mask


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_tracker_step_under_debug_nans(debug_nans):
    """Births, matches, misses, deletions and empty frames all run with
    jax_debug_nans enabled: no op in the tracker hot path may produce NaN,
    even in masked lanes (SURVEY 5.2's sanitizer tier)."""
    cfg = TrackerConfig(max_tracks=16, max_dets=8, feat_dim=16, nn_budget=5)
    step = jax.jit(partial(tracker_step, cfg))
    state = init_tracker_state(cfg)
    rng = np.random.default_rng(7)
    counts = [3, 3, 3, 0, 5, 2, 0, 0, 4, 1]  # births, misses, empty frames
    for n in counts:
        tlwh, conf, feat, mask = _frame(rng, cfg, n)
        state, boxes, emit = step(state, tlwh, conf, feat, mask, IMG_HW)
        np.asarray(boxes)  # materialize under debug_nans
    for leaf in jax.tree_util.tree_leaves(state):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.isfinite(arr).all()


def test_nan_poisoned_stream_cannot_corrupt_neighbors():
    """Poison one stream's tracker state with NaN and run the vmapped
    batched step: the other streams' outputs and states must be bit-equal
    to an unpoisoned run (per-stream isolation through the batch)."""
    cfg = TrackerConfig(max_tracks=8, max_dets=4, feat_dim=16, nn_budget=4)
    s = 3
    rng = np.random.default_rng(3)
    step = jax.jit(jax.vmap(
        lambda st, t_, c_, f_, m_: tracker_step(
            cfg, st, t_, c_, f_, m_, jnp.asarray(IMG_HW))))

    def batched_state():
        one = init_tracker_state(cfg)
        return jax.tree_util.tree_map(lambda x: jnp.stack([x] * s), one)

    # warm all streams with two frames so there is real state to corrupt
    frames = [[_frame(rng, cfg, 2) for _ in range(s)] for _ in range(3)]

    def run(poison: bool):
        state = batched_state()
        outs = []
        for t, per_stream in enumerate(frames):
            if poison and t == 1:
                state = state._replace(
                    mean=state.mean.at[1].set(jnp.nan),
                    cov=state.cov.at[1].set(jnp.nan),
                    gallery=state.gallery.at[1].set(jnp.nan),
                )
            tlwh = jnp.stack([jnp.asarray(f[0]) for f in per_stream])
            conf = jnp.stack([jnp.asarray(f[1]) for f in per_stream])
            feat = jnp.stack([jnp.asarray(f[2]) for f in per_stream])
            mask = jnp.stack([jnp.asarray(f[3]) for f in per_stream])
            state, boxes, emit = step(state, tlwh, conf, feat, mask)
            outs.append((np.asarray(boxes), np.asarray(emit)))
        return state, outs

    clean_state, clean_outs = run(poison=False)
    pois_state, pois_outs = run(poison=True)

    for (cb, ce), (pb, pe) in zip(clean_outs, pois_outs):
        for j in (0, 2):  # neighbors of the poisoned stream 1
            np.testing.assert_array_equal(cb[j], pb[j])
            np.testing.assert_array_equal(ce[j], pe[j])
    for cl, pl in zip(jax.tree_util.tree_leaves(clean_state),
                      jax.tree_util.tree_leaves(pois_state)):
        cl, pl = np.asarray(cl), np.asarray(pl)
        if cl.ndim and cl.shape[0] == s:  # skip unbatched leaves
            np.testing.assert_array_equal(cl[[0, 2]], pl[[0, 2]])


def test_nan_poisoned_stream_isolated_in_megakernel():
    """Same isolation property through the fused Pallas tracker megakernel
    (interpret mode on CPU): programs on the (S,) grid share nothing."""
    from yolo_deepsort_tpu.tracking.tracker_pallas import (
        tracker_step_fused_batched,
    )

    cfg = TrackerConfig(max_tracks=8, max_dets=4, feat_dim=16, nn_budget=4)
    s = 3
    rng = np.random.default_rng(5)
    img_hw = jnp.asarray(IMG_HW)
    step = jax.jit(lambda st, t_, c_, f_, m_: tracker_step_fused_batched(
        cfg, st, t_, c_, f_, m_, img_hw, interpret=True))

    def batched_state():
        one = init_tracker_state(cfg)
        return jax.tree_util.tree_map(lambda x: jnp.stack([x] * s), one)

    frames = [[_frame(rng, cfg, 2) for _ in range(s)] for _ in range(3)]

    def run(poison: bool):
        state = batched_state()
        outs = []
        for t, per_stream in enumerate(frames):
            if poison and t == 1:
                state = state._replace(
                    mean=state.mean.at[1].set(jnp.nan),
                    cov=state.cov.at[1].set(jnp.nan),
                )
            tlwh = jnp.stack([jnp.asarray(f[0]) for f in per_stream])
            conf = jnp.stack([jnp.asarray(f[1]) for f in per_stream])
            feat = jnp.stack([jnp.asarray(f[2]) for f in per_stream])
            mask = jnp.stack([jnp.asarray(f[3]) for f in per_stream])
            state, boxes, emit = step(state, tlwh, conf, feat, mask)
            outs.append((np.asarray(boxes), np.asarray(emit)))
        return outs

    clean_outs = run(poison=False)
    pois_outs = run(poison=True)
    for (cb, ce), (pb, pe) in zip(clean_outs, pois_outs):
        for j in (0, 2):
            np.testing.assert_array_equal(cb[j], pb[j])
            np.testing.assert_array_equal(ce[j], pe[j])
