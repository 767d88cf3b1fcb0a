"""Per-layer weight-compatibility harness.

SURVEY.md section 7 hard part 4: "darknet layout/BN-folding/transposition
bugs are silent accuracy killers; a per-layer diff harness is non-negotiable."

Loads a cfg (+ optionally a real .weights file; random weights otherwise),
runs the same input through the JAX network and the pure-numpy oracle
(specs/model_np.py), and reports the max abs/rel deviation per module --
any layout or fold bug shows up at the exact layer it occurs.

  python tools/verify_weights.py --cfg config/yolov3.cfg \
      [--weights weights/yolov3.weights] [--img-size 416] [--batch 1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--f32", action="store_true", default=True)
    p.add_argument("--threshold", type=float, default=1e-2,
                   help="flag layers whose max abs diff exceeds this")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # determinism for diffs

    from specs import model_np
    from yolo_deepsort_tpu.cfg import parse_model_config
    from yolo_deepsort_tpu.models import weights as W
    from yolo_deepsort_tpu.models.darknet import build_network, network_apply

    module_defs = parse_model_config(args.cfg)
    plan = build_network(module_defs, img_size=args.img_size)
    defs = plan.defs()

    if args.weights:
        _, raw = W.load_darknet_weights(args.weights, defs)
        missing = [i for i, *_ in W.conv_layer_shapes(defs) if i not in raw]
        if missing:
            print(f"note: cutoff load; random-init for modules {missing}")
            rnd = W.random_raw_params(defs, seed=args.seed)
            raw = {**rnd, **raw}
    else:
        print("no --weights given: using random weights (layout check only)")
        raw = W.random_raw_params(defs, seed=args.seed)

    params = W.fold_inference_params(raw, defs)
    rng = np.random.default_rng(args.seed)
    x = rng.uniform(0, 1, (args.batch, 3, plan.img_size, plan.img_size))
    x = x.astype(np.float32)

    # oracle in f32 like the jax path: random/garbage weights can overflow
    # the yolo exp() decode, and f64-finite-vs-f32-inf would flag a fake
    # divergence; matching non-finites (inf same sign, nan) compare equal
    _, oracle_layers = model_np.forward(defs, raw, x.astype(np.float32),
                                        img_dim=plan.img_size)
    _, jax_layers = network_apply(
        plan, params, np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
        capture_all_layers=True,
    )

    worst = (0.0, -1)
    print(f"{'idx':>4} {'type':<14} {'shape':<22} {'max abs':>10} {'max rel':>10}")
    for i, (mdef, o, j) in enumerate(zip(defs, oracle_layers, jax_layers)):
        j = np.asarray(j)
        if mdef["type"] != "yolo" and j.ndim == 4:
            j = j.transpose(0, 3, 1, 2)  # NHWC -> oracle's NCHW
        j64, o = j.astype(np.float64), np.asarray(o, np.float64)
        same_special = (np.isnan(j64) & np.isnan(o)) | (
            np.isinf(j64) & np.isinf(o) & (np.sign(j64) == np.sign(o)))
        d = np.where(same_special, 0.0, np.abs(j64 - o))
        rel = d / (np.abs(o) + 1e-6)
        flag = " <-- DIVERGES" if d.max() > args.threshold else ""
        # matched non-finites compare equal but make the layer unverifiable
        # (both sides overflowing identically proves nothing) -- say so
        n_special = int(same_special.sum())
        if n_special:
            flag += f" [non-finite at layer {i}: {n_special} matched values compared equal -- unverifiable]"
        print(f"{i:>4} {mdef['type']:<14} {str(o.shape):<22} "
              f"{d.max():>10.2e} {rel.max():>10.2e}{flag}")
        if d.max() > worst[0]:
            worst = (d.max(), i)
    print(f"\nworst layer: {worst[1]} (max abs diff {worst[0]:.3e})")
    if worst[0] > args.threshold:
        sys.exit(1)
    print("OK: all layers within tolerance")


if __name__ == "__main__":
    main()
