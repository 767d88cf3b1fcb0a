"""Multi-stream batching, multi-chip sharding (8 virtual CPU devices), and
the ReID training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolo_deepsort_tpu.cfg import yolov3_tiny
from yolo_deepsort_tpu.config import DetectorConfig, TrackerConfig
from yolo_deepsort_tpu.models import weights as W
from yolo_deepsort_tpu.models.darknet import build_network
from yolo_deepsort_tpu.models.reid import random_reid_params
from yolo_deepsort_tpu.parallel.streams import (
    fused_frame_step,
    init_stream_states,
    make_batched_step,
    make_sharded_step,
    make_stream_mesh,
)
from yolo_deepsort_tpu.train.reid_train import (
    init_train_params,
    make_train_step,
    reid_train_apply,
)

DET_CFG = DetectorConfig(img_size=96, conf_thres=0.4, nms_thres=0.4, max_boxes=64)
TRK_CFG = TrackerConfig(max_tracks=16, max_dets=8, nn_budget=5)
FRAME_HW = (64, 96)


@pytest.fixture(scope="module")
def small_net():
    plan = build_network(yolov3_tiny(img_size=96))
    det_params = W.fold_inference_params(
        W.random_raw_params(plan.defs(), seed=0), plan.defs()
    )
    reid_params = random_reid_params(seed=0)
    return plan, det_params, reid_params


@pytest.mark.slow
def test_batched_step_equals_per_stream(small_net):
    """vmap over streams must equal running each stream separately."""
    plan, det_params, reid_params = small_net
    s = 3
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (s, *FRAME_HW, 3), dtype=np.uint8)
    states = init_stream_states(TRK_CFG, s)
    step = make_batched_step(plan, DET_CFG, TRK_CFG, FRAME_HW,
                             donate_state=False)
    new_states, (outputs, emit) = step(det_params, reid_params, states,
                                       jnp.asarray(frames))
    for i in range(s):
        st_i = jax.tree_util.tree_map(lambda x: x[i], states)
        st1, (out1, emit1) = fused_frame_step(
            plan, DET_CFG, TRK_CFG, FRAME_HW, det_params, reid_params,
            st_i, jnp.asarray(frames[i]),
        )
        # vmapped and unbatched XLA graphs are not bit-identical (conv
        # batching differs); ids must match exactly, boxes within 2px
        np.testing.assert_array_equal(
            np.asarray(outputs[i])[:, 4], np.asarray(out1)[:, 4]
        )
        np.testing.assert_allclose(
            np.asarray(outputs[i])[:, :4], np.asarray(out1)[:, :4], atol=2
        )
        np.testing.assert_array_equal(np.asarray(emit[i]), np.asarray(emit1))


def test_sharded_step_runs_on_virtual_mesh(small_net):
    plan, det_params, reid_params = small_net
    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_stream_mesh(n)
    step = make_sharded_step(mesh, plan, DET_CFG, TRK_CFG, FRAME_HW)
    states = init_stream_states(TRK_CFG, n)
    sharded = NamedSharding(mesh, P("stream"))
    states = jax.device_put(states, sharded)
    frames = jax.device_put(
        jnp.zeros((n, *FRAME_HW, 3), jnp.uint8), sharded
    )
    new_states, (outputs, emit) = step(det_params, reid_params, states, frames)
    assert outputs.shape == (n, TRK_CFG.max_tracks, 5)
    # sharding preserved on outputs
    assert outputs.sharding.spec == P("stream")


@pytest.mark.slow
def test_reid_train_step_learns():
    """A few SGD steps on a toy 2-class problem must reduce the loss."""
    params, stats = init_train_params(num_classes=2, seed=0)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)
    opt_init, train_step = make_train_step(lr=0.01)
    opt_state = opt_init(params)
    step = jax.jit(train_step)

    rng = np.random.default_rng(0)
    # class 0: dark images, class 1: bright images
    images = np.concatenate(
        [rng.uniform(-1, -0.2, (8, 128, 64, 3)), rng.uniform(0.2, 1, (8, 128, 64, 3))]
    ).astype(np.float32)
    labels = np.array([0] * 8 + [1] * 8, np.int32)

    losses = []
    for _ in range(5):
        params, opt_state, stats, loss, acc = step(
            params, opt_state, stats, images, labels
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_reid_train_eval_mode_uses_running_stats():
    params, stats = init_train_params(num_classes=4, seed=1)
    x = np.random.default_rng(2).normal(0, 1, (2, 128, 64, 3)).astype(np.float32)
    logits1, s1 = reid_train_apply(params, stats, x, train=False)
    logits2, s2 = reid_train_apply(params, stats, x, train=False)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))
    # eval mode must not mutate stats
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s1, stats,
    )


@pytest.mark.slow
def test_dp_sharded_train_step_matches_single_device():
    """dp-sharded batch must produce the same loss as unsharded (global BN)."""
    params, stats = init_train_params(num_classes=4, seed=3)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)
    opt_init, train_step = make_train_step(lr=0.1)
    opt_state = opt_init(params)

    rng = np.random.default_rng(4)
    images = rng.normal(0, 1, (8, 128, 64, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 8).astype(np.int32)

    _, _, _, loss_single, _ = jax.jit(train_step)(
        params, opt_state, stats, images, labels
    )

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    sharded = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    params_s = jax.device_put(params, rep)
    stats_s = jax.device_put(stats, rep)
    opt_s = jax.device_put(opt_state, rep)
    images_s = jax.device_put(images, sharded)
    labels_s = jax.device_put(labels, sharded)
    _, _, _, loss_dp, _ = jax.jit(train_step)(
        params_s, opt_s, stats_s, images_s, labels_s
    )
    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)


def test_stream_failure_isolation(small_net):
    """A stream with frame_valid=False keeps its tracker state frozen while
    other streams advance (SURVEY.md section 5.3)."""
    plan, det_params, reid_params = small_net
    s = 2
    step = make_batched_step(plan, DET_CFG, TRK_CFG, FRAME_HW,
                             donate_state=False, with_validity=True)
    states = init_stream_states(TRK_CFG, s)
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (s, *FRAME_HW, 3),
                                          dtype=np.uint8)
    )
    valid = np.array([True, False])
    new_states, (outputs, emit) = step(det_params, reid_params, states,
                                       frames, valid)
    # stream 1 state is bit-identical to its initial state
    for a, b in zip(jax.tree_util.tree_leaves(new_states),
                    jax.tree_util.tree_leaves(states)):
        np.testing.assert_array_equal(np.asarray(a)[1], np.asarray(b)[1])
    assert not np.asarray(emit)[1].any()


def test_scanned_step_equals_repeated_batched(small_net):
    """K frames per dispatch via lax.scan == K sequential batched calls."""
    from yolo_deepsort_tpu.parallel.streams import make_scanned_step

    plan, det_params, reid_params = small_net
    s, k = 2, 3
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (k, s, *FRAME_HW, 3), dtype=np.uint8)
    states0 = init_stream_states(TRK_CFG, s)

    scanned = make_scanned_step(plan, DET_CFG, TRK_CFG, FRAME_HW, k,
                                donate_state=False)
    st_a, (out_a, emit_a) = scanned(det_params, reid_params, states0,
                                    jnp.asarray(frames))

    batched = make_batched_step(plan, DET_CFG, TRK_CFG, FRAME_HW,
                                donate_state=False)
    st_b = states0
    outs, emits = [], []
    for t in range(k):
        st_b, (o, e) = batched(det_params, reid_params, st_b,
                               jnp.asarray(frames[t]))
        outs.append(np.asarray(o))
        emits.append(np.asarray(e))
    np.testing.assert_array_equal(np.asarray(emit_a), np.stack(emits))
    # ids exact; boxes may differ by 1px (scan vs unrolled conv batching)
    np.testing.assert_array_equal(np.asarray(out_a)[..., 4],
                                  np.stack(outs)[..., 4])
    np.testing.assert_allclose(np.asarray(out_a)[..., :4],
                               np.stack(outs)[..., :4], atol=2)


@pytest.mark.slow
def test_bucketed_scanned_step_equals_full_capacity(small_net):
    """Capacity bucketing is a pure perf transform: the bucketed step (detect
    at full capacity -> 1-int readback -> capacity-sliced crop/embed/track)
    must reproduce the monolithic scanned step's outputs and state."""
    from yolo_deepsort_tpu.parallel.streams import (
        make_scanned_step,
        make_scanned_step_bucketed,
    )

    plan, det_params, reid_params = small_net
    s, k = 2, 3
    rng = np.random.default_rng(5)
    chunks = [
        jnp.asarray(rng.integers(0, 256, (k, s, *FRAME_HW, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    states0 = init_stream_states(TRK_CFG, s)

    full = make_scanned_step(plan, DET_CFG, TRK_CFG, FRAME_HW, k,
                             donate_state=False)
    bucketed = make_scanned_step_bucketed(
        plan, DET_CFG, TRK_CFG, FRAME_HW, buckets=(2, 4), donate_state=False
    )

    st_a, st_b = states0, states0
    for chunk in chunks:  # two chunks: state must carry across bucket calls
        st_a, (out_a, emit_a) = full(det_params, reid_params, st_a, chunk)
        st_b, (out_b, emit_b) = bucketed(det_params, reid_params, st_b, chunk)
        assert bucketed.last_max_count <= bucketed.last_bucket
        assert bucketed.last_bucket in (2, 4, TRK_CFG.max_dets)
        np.testing.assert_array_equal(np.asarray(emit_a), np.asarray(emit_b))
        # ids exact; boxes within conv-batching tolerance (embed batch size
        # differs between capacities)
        np.testing.assert_array_equal(np.asarray(out_a)[..., 4],
                                      np.asarray(out_b)[..., 4])
        np.testing.assert_allclose(np.asarray(out_a)[..., :4],
                                   np.asarray(out_b)[..., :4], atol=2)
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2)


def test_bucketed_step_class_filter_parity(small_net):
    """tracked_class_ids through the bucketed step: the capacity count is
    taken BEFORE the class filter (a contiguous-prefix upper bound), the
    filter applies after slicing -- results must equal the monolithic step
    with the same filter."""
    from yolo_deepsort_tpu.parallel.streams import (
        make_scanned_step,
        make_scanned_step_bucketed,
    )

    plan, det_params, reid_params = small_net
    s, k = 2, 2
    classes = np.array([0, 2, 5], np.int32)
    rng = np.random.default_rng(9)
    frames = jnp.asarray(
        rng.integers(0, 256, (k, s, *FRAME_HW, 3), dtype=np.uint8))
    states0 = init_stream_states(TRK_CFG, s)

    full = make_scanned_step(plan, DET_CFG, TRK_CFG, FRAME_HW, k,
                             tracked_class_ids=classes, donate_state=False)
    bucketed = make_scanned_step_bucketed(
        plan, DET_CFG, TRK_CFG, FRAME_HW, buckets=(2, 4),
        tracked_class_ids=classes, donate_state=False)

    st_a, (out_a, emit_a) = full(det_params, reid_params, states0, frames)
    st_b, (out_b, emit_b) = bucketed(det_params, reid_params, states0, frames)
    np.testing.assert_array_equal(np.asarray(emit_a), np.asarray(emit_b))
    np.testing.assert_array_equal(np.asarray(out_a)[..., 4],
                                  np.asarray(out_b)[..., 4])


def test_bucketed_step_crop_window_parity(small_net):
    """The crop-window ladder is a pure perf transform: with aggressively
    small windows the bucketed step must still reproduce the monolithic
    step's outputs -- the stats readback measures the chunk's real max crop
    extents and falls back toward the full frame whenever a consumed
    detection would not fit, so selection can never go inexact."""
    from yolo_deepsort_tpu.parallel.streams import (
        make_scanned_step,
        make_scanned_step_bucketed,
    )

    plan, det_params, reid_params = small_net
    s, k = 2, 3
    rng = np.random.default_rng(11)
    frames = jnp.asarray(
        rng.integers(0, 256, (k, s, *FRAME_HW, 3), dtype=np.uint8))
    states0 = init_stream_states(TRK_CFG, s)

    full = make_scanned_step(plan, DET_CFG, TRK_CFG, FRAME_HW, k,
                             donate_state=False)
    bucketed = make_scanned_step_bucketed(
        plan, DET_CFG, TRK_CFG, FRAME_HW, buckets=(2, 4), donate_state=False,
        windows=((8, 8), (16, 24), (32, 48)),
    )

    st_a, (out_a, emit_a) = full(det_params, reid_params, states0, frames)
    st_b, (out_b, emit_b) = bucketed(det_params, reid_params, states0, frames)
    assert bucketed.last_window in bucketed._windows
    np.testing.assert_array_equal(np.asarray(emit_a), np.asarray(emit_b))
    np.testing.assert_array_equal(np.asarray(out_a)[..., 4],
                                  np.asarray(out_b)[..., 4])
    np.testing.assert_allclose(np.asarray(out_a)[..., :4],
                               np.asarray(out_b)[..., :4], atol=2)
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2)


def test_window_ladder_selection():
    """_window_for picks the smallest covering rung and falls back to the
    full frame; the ladder always contains the full frame and clamps
    oversized rungs."""
    from yolo_deepsort_tpu.cfg import yolov3_tiny
    from yolo_deepsort_tpu.models.darknet import build_network
    from yolo_deepsort_tpu.parallel.streams import BucketedScannedStep

    plan = build_network(yolov3_tiny(img_size=96))
    step = BucketedScannedStep(
        plan, DET_CFG, TRK_CFG, (100, 200),
        windows=((16, 16), (48, 64), (1000, 2000)),
    )
    assert step._windows == ((16, 16), (48, 64), (100, 200))
    assert step._window_for(10, 10) == (16, 16)
    assert step._window_for(17, 10) == (48, 64)
    assert step._window_for(10, 17) == (48, 64)
    assert step._window_for(49, 10) == (100, 200)
    assert step._window_for(0, 0) == (16, 16)
    assert step._window_for(101, 300) == (100, 200)  # oversize -> full frame
    none_step = BucketedScannedStep(
        plan, DET_CFG, TRK_CFG, (100, 200), windows=None)
    assert none_step._windows == ((100, 200),)


@pytest.mark.slow
def test_sharded_detection_train_matches_single_device():
    """Detector training is sharding-agnostic by construction: BN uses the
    GLOBAL batch mean (a jnp.mean over the batch axis that GSPMD turns into
    a cross-device reduction = sync-BN) and the loss reduces globally, so a
    dp-sharded step must reproduce the single-device step exactly up to
    float reassociation. This is the detector-side counterpart of the ReID
    dp test above (SURVEY.md section 2.2 scale-out mandate)."""
    import optax

    from yolo_deepsort_tpu.train.yolo_cli import (
        make_detection_train_step,
        raw_params_to_train,
    )

    n = len(jax.devices())
    plan = build_network(yolov3_tiny(img_size=96))
    raw = W.random_raw_params(plan.defs(), seed=2)
    params, stats = raw_params_to_train(raw, plan.defs())
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_detection_train_step(plan, tx))

    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(n, 96, 96, 3)).astype(np.float32)
    targets = np.zeros((2 * n, 6), np.float32)
    tmask = np.zeros(2 * n, bool)
    for i in range(n):  # one object per image, varying geometry
        targets[i] = [i, i % 3, 0.3 + 0.04 * i, 0.5, 0.2, 0.3]
        tmask[i] = True

    p1, o1, s1, loss1, _ = step(params, opt_state, stats,
                                imgs, targets, tmask)

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    params_s = jax.device_put(params, rep)
    stats_s = jax.device_put(stats, rep)
    opt_s = jax.device_put(opt_state, rep)
    p2, o2, s2, loss2, _ = step(
        params_s, opt_s, stats_s,
        jax.device_put(jnp.asarray(imgs), shard),
        jax.device_put(jnp.asarray(targets), shard),
        jax.device_put(jnp.asarray(tmask), shard),
    )

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_cross_camera_gallery_match():
    """BASELINE config 5: a detection on one chip re-identifies against a
    confirmed track living on ANOTHER chip via the all-gathered gallery."""
    from yolo_deepsort_tpu.parallel.streams import make_cross_camera_matcher
    from yolo_deepsort_tpu.tracking.tracker import STATE_CONFIRMED

    n = len(jax.devices())
    mesh = make_stream_mesh(n)
    cfg = TrackerConfig(max_tracks=4, max_dets=2, feat_dim=8, nn_budget=3)
    states = init_stream_states(cfg, n)

    rng = np.random.default_rng(0)
    sig = rng.normal(size=(n, 8))
    sig /= np.linalg.norm(sig, axis=1, keepdims=True)

    # plant one confirmed track per camera c with signature feature sig[c]
    gallery = np.asarray(states.gallery).copy()
    count = np.asarray(states.gallery_count).copy()
    tid = np.asarray(states.track_id).copy()
    st = np.asarray(states.state).copy()
    for c in range(n):
        gallery[c, 0, 0] = sig[c]
        count[c, 0] = 1
        tid[c, 0] = 100 + c
        st[c, 0] = STATE_CONFIRMED
    states = states._replace(
        gallery=jnp.asarray(gallery), gallery_count=jnp.asarray(count),
        track_id=jnp.asarray(tid), state=jnp.asarray(st),
    )

    # every camera queries with camera (c+1)%n's signature: the best match
    # must be the track on the OTHER chip
    queries = np.zeros((n, cfg.max_dets, 8), np.float32)
    qmask = np.zeros((n, cfg.max_dets), bool)
    for c in range(n):
        queries[c, 0] = sig[(c + 1) % n]
        qmask[c, 0] = True

    sharded = NamedSharding(mesh, P("stream"))
    states = jax.device_put(states, sharded)
    match = make_cross_camera_matcher(mesh, cfg)
    best_id, best_dist = match(
        states, jax.device_put(jnp.asarray(queries), sharded),
        jax.device_put(jnp.asarray(qmask), sharded),
    )
    best_id = np.asarray(best_id)
    best_dist = np.asarray(best_dist)
    for c in range(n):
        assert best_id[c, 0] == 100 + (c + 1) % n, (c, best_id[c])
        assert best_dist[c, 0] < 1e-4
        assert best_id[c, 1] == -1  # masked query


def test_global_id_handoff_across_cameras():
    """BASELINE config 5 end-to-end: an object leaves camera 0 (chip 0) and
    appears on camera 7 (chip 7) with the same appearance; after the
    global-ID step, camera 7's track carries camera 0's GLOBAL id."""
    from functools import partial

    from yolo_deepsort_tpu.parallel.streams import (
        init_global_ids,
        make_global_id_step,
        make_stream_mesh,
        relabel_outputs_global,
    )
    from yolo_deepsort_tpu.tracking.tracker import (
        init_tracker_state,
        tracker_step,
    )

    n = len(jax.devices())
    mesh = make_stream_mesh(n)
    cfg = TrackerConfig(max_tracks=8, max_dets=4, feat_dim=32, nn_budget=5)
    step = jax.jit(jax.vmap(partial(tracker_step, cfg)))
    gid_step = make_global_id_step(mesh, cfg, n_streams_total=n)

    rng = np.random.default_rng(0)
    f_obj = rng.normal(size=32); f_obj /= np.linalg.norm(f_obj)
    img_hw = jnp.broadcast_to(jnp.array([720, 1280], jnp.int32), (n, 2))

    states = init_stream_states(cfg, n)
    gids = init_global_ids(cfg, n)
    sharded = NamedSharding(mesh, P("stream"))
    states = jax.device_put(states, sharded)
    gids = jax.device_put(gids, sharded)

    def frame_inputs(t):
        d = cfg.max_dets
        tlwh = np.zeros((n, d, 4), np.float32)
        conf = np.zeros((n, d), np.float32)
        feat = np.zeros((n, d, 32), np.float32)
        mask = np.zeros((n, d), bool)
        if t < 10:  # camera 0 sees the object
            tlwh[0, 0] = [200 + 5 * t, 300, 40, 80]
            conf[0, 0] = 0.9
            feat[0, 0] = f_obj + rng.normal(0, 0.02, 32)
            feat[0, 0] /= np.linalg.norm(feat[0, 0])
            mask[0, 0] = True
        if t >= 8:  # camera 7 picks it up (overlap frames 8-9)
            tlwh[7, 0] = [100 + 5 * t, 400, 40, 80]
            conf[7, 0] = 0.9
            feat[7, 0] = f_obj + rng.normal(0, 0.02, 32)
            feat[7, 0] /= np.linalg.norm(feat[7, 0])
            mask[7, 0] = True
        return tlwh, conf, feat, mask

    outputs = emit = None
    for t in range(16):
        tlwh, conf, feat, mask = frame_inputs(t)
        states, outputs, emit = step(states, tlwh, conf, feat, mask, img_hw)
        gids = gid_step(states, gids)

    g = np.asarray(gids.gid)
    trk = np.asarray(states.state)
    # camera 0's track died out of frame; camera 7's track is confirmed and
    # carries camera 0's global id (=1: stream 0, first track)
    lane7 = int(np.argmax(trk[7] == 2))
    assert trk[7, lane7] == 2
    assert g[7, lane7] == 1, f"no handoff: gids cam7 = {g[7]}"
    out_g = np.asarray(relabel_outputs_global(outputs, gids))
    em = np.asarray(emit)
    assert out_g[7][em[7]][0, 4] == 1  # emitted rows show the global id


def test_global_id_no_false_aliasing():
    """Distinct-appearance tracks on different cameras must keep distinct
    global ids; same-camera tracks never alias."""
    from functools import partial

    from yolo_deepsort_tpu.parallel.streams import (
        init_global_ids,
        make_global_id_step,
        make_stream_mesh,
    )
    from yolo_deepsort_tpu.tracking.tracker import tracker_step

    n = len(jax.devices())
    mesh = make_stream_mesh(n)
    cfg = TrackerConfig(max_tracks=8, max_dets=4, feat_dim=32, nn_budget=5)
    step = jax.jit(jax.vmap(partial(tracker_step, cfg)))
    gid_step = make_global_id_step(mesh, cfg, n_streams_total=n)

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(n, 2, 32))
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    img_hw = jnp.broadcast_to(jnp.array([720, 1280], jnp.int32), (n, 2))
    sharded = NamedSharding(mesh, P("stream"))
    states = jax.device_put(init_stream_states(cfg, n), sharded)
    gids = jax.device_put(init_global_ids(cfg, n), sharded)

    for t in range(6):
        d = cfg.max_dets
        tlwh = np.zeros((n, d, 4), np.float32)
        conf = np.zeros((n, d), np.float32)
        feat = np.zeros((n, d, 32), np.float32)
        mask = np.zeros((n, d), bool)
        for s in range(n):
            for j in range(2):  # two distinct objects per camera
                tlwh[s, j] = [150 + 300 * j + 4 * t, 300, 40, 80]
                conf[s, j] = 0.9
                feat[s, j] = feats[s, j]
                mask[s, j] = True
        states, outputs, emit = step(states, tlwh, conf, feat, mask, img_hw)
        gids = gid_step(states, gids)

    g = np.asarray(gids.gid)
    trk = np.asarray(states.state)
    live = g[trk == 2]
    assert len(live) == 2 * n
    assert len(set(live.tolist())) == 2 * n, f"false aliasing: {sorted(live)}"
