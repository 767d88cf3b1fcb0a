"""ONE-COMMAND real-weights parity runbook (VERDICT round-2 item 7).

The environment has zero egress, so official weights/datasets have never
been loadable (SURVEY.md provenance banner; BASELINE.md gate). The moment
they exist, run:

  python tools/parity_real.py \
      --weights weights/yolov3.weights \
      --reid-ckpt weights/ckpt.t7 \
      --mot-root data/MOT16/train \
      [--coco-list data/coco/5k.txt] [--cfg config/yolov3.cfg]

and it executes, in order:
  1. per-layer weight-compat diff vs the numpy reference oracle
     (tools/verify_weights.py -- App. E layout contract),
  2. ReID checkpoint load + feature sanity (both ckpt layouts supported),
  3. COCO mAP spot-check over a darknet-style image list (App. D/F
     pipeline + utils/metrics mAP machinery),   [skipped without --coco-list]
  4. MOT16 MOTA/IDF1 per sequence (benchmarks/mot_eval.py --seq, public
     detections; add --detector for the full detect+track pipeline),
then writes PARITY_REAL.md with every number next to its BASELINE.md
reference value.

Smoke-tested offline via --standins: synthesizes a random .weights file, a
random ckpt.t7 and a 2-object MOT sequence, then runs the exact same flow
(accuracy numbers are meaningless; the plumbing is proven).

What to drop where when the files arrive:
  weights/yolov3.weights, weights/yolov3-tiny.weights  <- download_weights.sh
  weights/ckpt.t7                                       <- README drive link
  data/MOT16/train/MOT16-*/                             <- MOT16 zip layout
  data/coco/5k.txt + images + labels                    <- darknet COCO list
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print(f"[parity_real] $ {' '.join(cmd)}", file=sys.stderr, flush=True)
    return subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, **kw)


def make_standins(tmp):
    """Synthesize stand-in weights/ckpt/sequence so the whole flow can be
    smoke-tested with zero real files (tests/test_mot_eval_seq.py shapes)."""
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)  # stale standins from prior runs
    os.makedirs(tmp, exist_ok=True)
    from specs.weights_np import random_darknet_weights
    from yolo_deepsort_tpu.cfg import parse_model_config

    wpath = os.path.join(tmp, "yolov3-tiny.weights")
    defs = [d for d in
            parse_model_config(os.path.join(REPO, "config/yolov3-tiny.cfg"))
            if d["type"] != "net"]
    with open(wpath, "wb") as f:
        # well-conditioned: activations stay finite through the net so the
        # per-layer diff is a real layout check, not inf-vs-inf
        f.write(random_darknet_weights(defs, seed=0, well_conditioned=True))

    ckpt = os.path.join(tmp, "ckpt.t7")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch

    from test_reid import TorchNet

    torch.save({"net_dict": TorchNet(num_classes=751).state_dict(),
                "acc": 0.0, "epoch": 0}, ckpt)

    seq = os.path.join(tmp, "MOT16-99")
    from test_mot_eval_seq import _make_mot16_dir

    _make_mot16_dir(seq, n_frames=12, seed=3)

    coco_list = os.path.join(tmp, "coco_list.txt")
    img_dir = os.path.join(tmp, "images")
    lbl_dir = os.path.join(tmp, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    import cv2

    rng = np.random.default_rng(0)
    with open(coco_list, "w") as f:
        for i in range(3):
            ip = os.path.join(img_dir, f"im{i}.jpg")
            cv2.imwrite(ip, rng.integers(0, 255, (240, 320, 3), np.uint8))
            with open(os.path.join(lbl_dir, f"im{i}.txt"), "w") as lf:
                lf.write("0 0.5 0.5 0.2 0.3\n")
            f.write(ip + "\n")
    return dict(weights=wpath, cfg="config/yolov3-tiny.cfg",
                reid_ckpt=ckpt, mot_root=tmp, coco_list=coco_list)


def coco_map_spotcheck(args, lines):
    """Detect over the list images and score mAP@0.5 with the reference's
    machinery (utils.py ap_per_class analogue)."""
    import jax

    jax.config.update("jax_platforms", jax.default_backend())
    from yolo_deepsort_tpu.api import Darknet, ImageDetector
    from yolo_deepsort_tpu.utils.metrics import (
        ap_per_class,
        get_batch_statistics,
    )

    model = Darknet(args.cfg, img_size=args.img_size)
    model.load_darknet_weights(args.weights)
    det = ImageDetector(model, conf_thres=0.5, nms_thres=0.4)
    import cv2

    paths = [ln.strip() for ln in open(args.coco_list) if ln.strip()]
    paths = paths[: args.coco_limit]
    stats, labels_all = [], []
    for p in paths:
        img = cv2.imread(p)[:, :, ::-1]
        h, w = img.shape[:2]
        out = det.detect(img)  # (N, 7) x1 y1 x2 y2 obj cls_conf cls
        lp = (p.replace("images", "labels")
              .rsplit(".", 1)[0] + ".txt")
        rows = []
        if os.path.exists(lp):
            for ln in open(lp):
                c, cx, cy, bw, bh = (float(v) for v in ln.split())
                rows.append([c, (cx - bw / 2) * w, (cy - bh / 2) * h,
                             (cx + bw / 2) * w, (cy + bh / 2) * h])
        target = np.asarray(rows, np.float32).reshape(-1, 5)
        labels_all.extend(target[:, 0].tolist())
        preds = np.asarray(out, np.float32).reshape(-1, 7)
        # score column for the mAP machinery = obj conf
        stats.extend(get_batch_statistics(
            [np.concatenate([preds[:, :5], preds[:, 5:7]], 1)],
            np.concatenate(
                [np.zeros((len(target), 1), np.float32), target], 1),
            iou_threshold=0.5))
    if stats:
        tp, conf, cls = [np.concatenate(x, 0) for x in zip(*stats)]
        p, r, ap, f1, cls_u = ap_per_class(tp, conf, cls,
                                           np.asarray(labels_all))
        m = float(ap.mean()) if len(ap) else 0.0
    else:
        m = 0.0
    lines.append(f"| COCO mAP@0.5 ({len(paths)} imgs) | {m:.4f} | "
                 "YOLOv3 paper 57.9 AP50 (608) / 55.3 (416) |")
    return m


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights")
    p.add_argument("--cfg", default="config/yolov3.cfg")
    p.add_argument("--img-size", type=int, default=416)
    p.add_argument("--reid-ckpt")
    p.add_argument("--mot-root")
    p.add_argument("--coco-list")
    p.add_argument("--coco-limit", type=int, default=200)
    p.add_argument("--detector", action="store_true",
                   help="MOT eval with the full detect+track pipeline "
                        "instead of public detections")
    p.add_argument("--standins", action="store_true",
                   help="smoke mode: synthesize fake weights/ckpt/sequence")
    p.add_argument("--out", default="PARITY_REAL.md")
    args = p.parse_args()

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.standins:
        tmp = os.path.join("/tmp", "ydt_parity_standins")
        st = make_standins(tmp)
        args.weights = st["weights"]
        args.cfg = st["cfg"]
        args.reid_ckpt = st["reid_ckpt"]
        args.mot_root = st["mot_root"]
        args.coco_list = st["coco_list"]

    t0 = time.time()
    lines = ["# PARITY_REAL -- real-weight validation run",
             "",
             f"Generated by tools/parity_real.py on "
             f"{time.strftime('%Y-%m-%d %H:%M')}"
             + (" **(STAND-IN inputs -- plumbing smoke only; accuracy "
                "numbers are meaningless)**" if args.standins else ""),
             "", "| check | result | reference |", "|---|---|---|"]
    failures = []

    # 1. per-layer weight compat
    if args.weights:
        r = run([sys.executable, "tools/verify_weights.py",
                 "--cfg", args.cfg, "--weights", args.weights])
        tail = [ln for ln in r.stdout.splitlines() if ln.strip()][-2:]
        ok = r.returncode == 0
        if not ok:
            failures.append("per-layer diff")
        lines.append(f"| per-layer oracle diff ({os.path.basename(args.weights)}) "
                     f"| {'OK' if ok else 'DIVERGES'}: {tail[-2] if tail else ''} "
                     f"| App. E layout contract |")
    else:
        lines.append("| per-layer oracle diff | SKIPPED (no --weights) | |")

    # 2. ReID checkpoint
    if args.reid_ckpt:
        try:
            from yolo_deepsort_tpu.models.reid import (
                feat_dim_of,
                load_reid_checkpoint,
                reid_apply,
            )

            params = load_reid_checkpoint(args.reid_ckpt)
            rng = np.random.default_rng(0)
            x = rng.uniform(0, 1, (4, 128, 64, 3)).astype(np.float32)
            f = np.asarray(reid_apply(params, x))
            norms = np.linalg.norm(f, axis=1)
            ok = f.shape[1] == feat_dim_of(params) and np.allclose(
                norms, 1.0, atol=1e-3)
            if not ok:
                failures.append("reid ckpt")
            lines.append(f"| ckpt.t7 load + L2-norm features | "
                         f"{'OK' if ok else 'FAIL'} (dim {f.shape[1]}) | "
                         "App. E.3 |")
        except Exception as e:  # noqa: BLE001 -- report, don't crash the run
            failures.append("reid ckpt")
            lines.append(f"| ckpt.t7 load | ERROR: {e} | App. E.3 |")
    else:
        lines.append("| ckpt.t7 load | SKIPPED (no --reid-ckpt) | |")

    # 3. COCO mAP spot-check
    if args.coco_list and args.weights:
        try:
            coco_map_spotcheck(args, lines)
        except Exception as e:  # noqa: BLE001
            failures.append("coco map")
            lines.append(f"| COCO mAP@0.5 | ERROR: {e} | |")
    else:
        lines.append("| COCO mAP@0.5 | SKIPPED (no --coco-list) | |")

    # 4. MOT sequences
    if args.mot_root:
        seqs = sorted(
            d for d in os.listdir(args.mot_root)
            if os.path.isdir(os.path.join(args.mot_root, d, "img1")))
        for seq in seqs:
            cmd = [sys.executable, "benchmarks/mot_eval.py",
                   "--seq", os.path.join(args.mot_root, seq)]
            if args.detector and args.weights:
                cmd += ["--detector", "yolov3-416", "--weights", args.weights]
            if args.reid_ckpt:
                cmd += ["--reid-ckpt", args.reid_ckpt]
            r = run(cmd)
            js = [ln for ln in r.stdout.splitlines()
                  if ln.startswith("{")]
            if r.returncode == 0 and js:
                m = json.loads(js[-1])
                lines.append(
                    f"| {seq} MOTA / IDsw / IDF1 | {m.get('mota')} / "
                    f"{m.get('idsw')} / {m.get('idf1', 'n/a')} | DeepSORT "
                    "paper MOT16: MOTA 61.4, 781 IDsw |")
            else:
                failures.append(f"mot {seq}")
                tailerr = (r.stderr or r.stdout).splitlines()[-1:] or [""]
                lines.append(f"| {seq} | ERROR: {tailerr[0][:120]} | |")
    else:
        lines.append("| MOT sequences | SKIPPED (no --mot-root) | |")

    lines += ["",
              f"Wall time: {time.time() - t0:.0f}s. "
              f"Failures: {failures if failures else 'none'}."]
    with open(os.path.join(REPO, args.out), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"ok": not failures, "failures": failures,
                      "out": args.out}))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
