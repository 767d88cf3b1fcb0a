"""MOT tracking-quality harness: MOTA / MOTP / ID switches.

The BASELINE gate metric is "MOTA/ID-switch parity with the PyTorch
reference on MOT sequences" (BASELINE.json). This harness runs the tracker
and scores it with the CLEAR-MOT implementation in utils/mot.py, in three
modes:

  --synthetic          no data/weights needed: generate a randomized
                       multi-object scene with appearance features, run BOTH
                       the JAX DeepSort facade and the numpy reference oracle
                       (specs/tracker_np.py) on identical inputs, report each
                       MOTA and their parity delta.
  --seq DIR            a MOTChallenge sequence dir (img1/ + gt/gt.txt +
                       det/det.txt): tracks from the public detections with
                       ReID crops from the frames, scores against gt.
  --seq DIR --detector yolov3-416 --weights FILE: full pipeline (detect +
                       track) on the sequence frames.

Usage examples:
  python benchmarks/mot_eval.py --synthetic
  python benchmarks/mot_eval.py --seq data/MOT16/train/MOT16-04
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_eval(seed: int = 0, n_frames: int = 120, n_objects: int = 8,
                   feat_dim: int = 64):
    from specs.tracker_np import DeepSortLogic
    from yolo_deepsort_tpu.config import TrackerConfig
    from yolo_deepsort_tpu.tracking.tracker import (
        init_tracker_state,
        tracker_step,
    )
    from yolo_deepsort_tpu.utils.mot import evaluate_mot

    import jax
    from functools import partial

    rng = np.random.default_rng(seed)
    img_hw = (1080, 1920)
    feats = rng.normal(size=(n_objects, feat_dim))
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    pos = rng.uniform([100, 200], [1700, 800], (n_objects, 2))
    vel = rng.uniform(-12, 12, (n_objects, 2))
    size = rng.uniform([40, 90], [90, 200], (n_objects, 2))
    t_in = rng.integers(0, 20, n_objects)
    t_out = rng.integers(n_frames - 30, n_frames + 30, n_objects)
    occl = [(rng.integers(30, 70), rng.integers(3, 15)) for _ in range(n_objects)]

    cfg = TrackerConfig(max_tracks=64, max_dets=32, feat_dim=feat_dim,
                        nn_budget=100)
    step = jax.jit(partial(tracker_step, cfg))
    state = init_tracker_state(cfg)
    oracle = DeepSortLogic()

    gt_frames, jax_frames, oracle_frames = [], [], []
    for t in range(n_frames):
        rows, confs, fs, gts = [], [], [], []
        for k in range(n_objects):
            if not (t_in[k] <= t < t_out[k]):
                continue
            o_start, o_len = occl[k]
            cx, cy = pos[k] + vel[k] * t
            w, h = size[k]
            cx = float(np.clip(cx, w / 2, 1920 - w / 2))
            cy = float(np.clip(cy, h / 2, 1080 - h / 2))
            gts.append([k + 1, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
            if o_start <= t < o_start + o_len:
                continue  # occluded: no detection, gt persists
            if rng.uniform() < 0.05:
                continue  # detector miss
            jit_xy = rng.normal(0, 2, 2)
            f = feats[k] + rng.normal(0, 0.08, feat_dim)
            rows.append([cx + jit_xy[0], cy + jit_xy[1], w, h])
            confs.append(float(rng.uniform(0.5, 0.95)))
            fs.append(f / np.linalg.norm(f))
        gt_frames.append(np.array(gts, np.float64).reshape(-1, 5))

        xywh = np.array(rows, np.float64).reshape(-1, 4)
        fsn = np.array(fs, np.float64).reshape(-1, feat_dim)
        oracle_frames.append(
            oracle.update(xywh, confs, fsn, img_hw).astype(np.float64)
        )

        d = cfg.max_dets
        tlwh = np.zeros((d, 4), np.float32)
        conf = np.zeros((d,), np.float32)
        feat = np.zeros((d, feat_dim), np.float32)
        mask = np.zeros((d,), bool)
        n = len(rows)
        if n:
            tlwh[:n, 0] = xywh[:, 0] - xywh[:, 2] / 2
            tlwh[:n, 1] = xywh[:, 1] - xywh[:, 3] / 2
            tlwh[:n, 2:] = xywh[:, 2:]
            conf[:n] = confs
            feat[:n] = fsn
            mask[:n] = True
        state, boxes, emit = step(
            state, tlwh, conf, feat, mask, np.asarray(img_hw, np.int32)
        )
        jax_frames.append(
            np.asarray(boxes)[np.asarray(emit)].astype(np.float64)
        )

    from yolo_deepsort_tpu.utils.mot import idf1_score

    m_jax = evaluate_mot(gt_frames, jax_frames)
    m_oracle = evaluate_mot(gt_frames, oracle_frames)
    m_jax.idf1 = idf1_score(gt_frames, jax_frames)
    m_oracle.idf1 = idf1_score(gt_frames, oracle_frames)
    return m_jax, m_oracle


def sequence_eval(seq_dir: str, detector: str | None, weights: str | None,
                  reid_ckpt: str | None, img_size: int, max_dets: int = 64):
    from yolo_deepsort_tpu.api import Darknet, DeepSort, VideoTracker
    from yolo_deepsort_tpu.utils.mot import (
        evaluate_mot,
        load_mot_file,
        mot_sequence_frames,
    )

    img_dir = os.path.join(seq_dir, "img1")
    gt_path = os.path.join(seq_dir, "gt", "gt.txt")
    det_path = os.path.join(seq_dir, "det", "det.txt")
    frames = sorted(
        f for f in os.listdir(img_dir) if f.endswith((".jpg", ".png"))
    )
    n_frames = len(frames)
    gt = load_mot_file(gt_path, min_visibility=0.25)
    gt_frames = mot_sequence_frames(gt, n_frames)

    from PIL import Image

    hyp_frames = []
    if detector:
        model = Darknet(detector, img_size=img_size)
        if weights:
            model.load_darknet_weights(weights)
        vt = VideoTracker(model, reid_model_path=reid_ckpt)
        for fname in frames:
            img = np.asarray(Image.open(os.path.join(img_dir, fname)).convert("RGB"))
            hyp_frames.append(vt.track_frame(img).astype(np.float64))
    else:
        dets = load_mot_file(det_path, person_only=False)
        ds = DeepSort(model_path=reid_ckpt, max_dets=max_dets)
        for i, fname in enumerate(frames):
            img = np.asarray(Image.open(os.path.join(img_dir, fname)).convert("RGB"))
            rows = dets.get(i + 1)
            if rows is None:
                out = ds.update(np.zeros((0, 4)), [], img)
            else:
                xyxy = rows[:, 1:5]
                xywh = np.stack(
                    [
                        (xyxy[:, 0] + xyxy[:, 2]) / 2,
                        (xyxy[:, 1] + xyxy[:, 3]) / 2,
                        xyxy[:, 2] - xyxy[:, 0],
                        xyxy[:, 3] - xyxy[:, 1],
                    ],
                    axis=1,
                )
                conf = rows[:, 5]
                # MOTChallenge det confidences are unbounded scores; squash
                conf = 1.0 / (1.0 + np.exp(-conf / 10.0))
                out = ds.update(xywh, conf.tolist(), img)
            hyp_frames.append(out.astype(np.float64))
    from yolo_deepsort_tpu.utils.mot import idf1_score

    m = evaluate_mot(gt_frames, hyp_frames)
    m.idf1 = idf1_score(gt_frames, hyp_frames)
    return m


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--seq")
    p.add_argument("--detector", default=None,
                   help="builtin arch name or cfg path (else use det/det.txt)")
    p.add_argument("--weights", default=None)
    p.add_argument("--reid-ckpt", default=None)
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--max-dets", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    # honor JAX_PLATFORMS=cpu despite the axon sitecustomize prepending
    # the TPU plugin (same dance as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.synthetic:
        m_jax, m_oracle = synthetic_eval(seed=args.seed)
        print(f"jax    : {m_jax}")
        print(f"oracle : {m_oracle}")
        print(json.dumps({
            "mota_jax": round(m_jax.mota, 4),
            "mota_oracle": round(m_oracle.mota, 4),
            "idf1_jax": round(m_jax.idf1, 4),
            "idf1_oracle": round(m_oracle.idf1, 4),
            "idsw_jax": m_jax.id_switches,
            "idsw_oracle": m_oracle.id_switches,
            "mota_delta": round(abs(m_jax.mota - m_oracle.mota), 4),
        }))
    elif args.seq:
        m = sequence_eval(args.seq, args.detector, args.weights,
                          args.reid_ckpt, args.img_size,
                          max_dets=args.max_dets)
        print(m)
        print(json.dumps({"mota": round(m.mota, 4), "idsw": m.id_switches,
                          "idf1": round(m.idf1, 4)}))
    else:
        p.error("choose --synthetic or --seq DIR")


if __name__ == "__main__":
    main()
