"""int8 accuracy gate for the ReID embed stage (VERDICT round-2 item 4).

Zero egress means no Market-1501 / real ckpt, so the gate is
framework-internal: train the ReID net on SYNTHETIC identities (textured
person-ish crops with pose/brightness/noise variation), then compare the
served quantity -- rank-1 retrieval and raw feature fidelity -- across
f32 (reference), bf16 (today's serving dtype) and real-int8-arithmetic
W8A8 (yolo_deepsort_tpu/models/quantize.py, the exact semantics a Pallas
int8 kernel implements).

Gate rule (consumed by docs/ROADMAP.md lever 2): int8 may go on the
serving path only if rank-1 drops < 1 point vs bf16 AND mean cosine
similarity of int8-vs-f32 features is >= 0.99 (cosine distance drives the
tracker's appearance matching; 1 - 0.99 is well under the 0.2 matching
threshold).

Usage: python tools/int8_gate.py [--ids 32] [--steps 300] [--views 8]
Prints one JSON line; exit 0 iff the gate passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def render_identity(rng, palette, n_views):
    """n_views 128x64 crops of one synthetic identity: 3-band body with
    per-identity colors + stable texture, under per-view jitter (shift,
    brightness, contrast, noise, occluder)."""
    head, shirt, pants = palette
    tex = rng.normal(0, 1, (128, 64, 1)).astype(np.float32)
    views = np.empty((n_views, 128, 64, 3), np.float32)
    for v in range(n_views):
        img = np.empty((128, 64, 3), np.float32)
        dy = int(rng.integers(-6, 7))
        b0, b1 = 24 + dy, 64 + dy  # head/shirt and shirt/pants boundaries
        img[:b0] = head
        img[b0:b1] = shirt
        img[b1:] = pants
        img += 0.12 * tex  # identity-stable texture
        img *= rng.uniform(0.7, 1.3)  # brightness
        img += rng.uniform(-0.1, 0.1, 3)  # color cast
        img += rng.normal(0, 0.05, img.shape)  # sensor noise
        if rng.uniform() < 0.3:  # partial occluder
            ox = int(rng.integers(0, 40))
            oy = int(rng.integers(0, 100))
            img[oy:oy + 24, ox:ox + 20] = rng.uniform(0, 1, 3)
        views[v] = np.clip(img, 0.0, 1.0)
    return (views - IMAGENET_MEAN) / IMAGENET_STD


def make_dataset(n_ids, n_views, seed):
    rng = np.random.default_rng(seed)
    palettes = rng.uniform(0.05, 0.95, (n_ids, 3, 3)).astype(np.float32)
    x = np.stack([render_identity(rng, palettes[i], n_views)
                  for i in range(n_ids)])  # (ids, views, 128, 64, 3)
    y = np.repeat(np.arange(n_ids, dtype=np.int32), n_views)
    return x.reshape(-1, 128, 64, 3), y, palettes, rng


def rank1(qf, gf, qy, gy):
    """rank-1 retrieval accuracy: nearest gallery feature by cosine."""
    sim = np.asarray(qf, np.float64) @ np.asarray(gf, np.float64).T
    return float((gy[np.argmax(sim, 1)] == qy).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ids", type=int, default=32)
    p.add_argument("--views", type=int, default=8, help="train views/id")
    p.add_argument("--eval-views", type=int, default=6)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yolo_deepsort_tpu.models.quantize import (
        quantize_reid_params,
        quantize_reid_params_resident,
        reid_apply_f32_via_graph,
        reid_apply_int8,
        reid_apply_int8_resident,
    )
    from yolo_deepsort_tpu.models.reid import fold_train_params, reid_apply
    from yolo_deepsort_tpu.train.reid_train import (
        init_train_params,
        make_train_step,
    )

    t0 = time.time()
    # ---- train on synthetic identities
    x_train, y_train, palettes, rng = make_dataset(
        args.ids, args.views, args.seed)
    params, stats = init_train_params(num_classes=args.ids, seed=args.seed)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)
    opt_init, train_step = make_train_step(lr=args.lr)
    opt_state = opt_init(params)
    step = jax.jit(train_step)

    n = len(x_train)
    losses, accs = [], []
    for it in range(args.steps):
        idx = rng.choice(n, size=min(args.batch, n), replace=False)
        params, opt_state, stats, loss, acc = step(
            params, opt_state, stats, x_train[idx], y_train[idx])
        if it % 20 == 0 or it == args.steps - 1:
            losses.append(float(loss))
            accs.append(float(acc))
            print(f"[int8_gate] step {it} loss {losses[-1]:.3f} "
                  f"acc {accs[-1]:.3f}", file=sys.stderr, flush=True)
    train_acc = accs[-1]

    folded = fold_train_params(jax.device_get(params), jax.device_get(stats))

    # ---- held-out eval sets (fresh renders of the SAME identities)
    def fresh(seed_off):
        r = np.random.default_rng(args.seed + seed_off)
        x = np.stack([render_identity(r, palettes[i], args.eval_views)
                      for i in range(args.ids)])
        return (x.reshape(-1, 128, 64, 3),
                np.repeat(np.arange(args.ids), args.eval_views))

    gx, gy = fresh(1000)
    qx, qy = fresh(2000)

    # ---- three inference paths
    qparams = quantize_reid_params(folded, x_train[:64])
    embed_f32 = jax.jit(lambda x: reid_apply(folded, x))
    embed_bf16 = jax.jit(
        lambda x: reid_apply(folded, x, compute_dtype=jnp.bfloat16))
    embed_int8 = jax.jit(lambda x: reid_apply_int8(qparams, x))
    embed_walk = jax.jit(lambda x: reid_apply_f32_via_graph(folded, x))
    # resident path: int8 activations END-TO-END between stage-2..4 convs
    # (the dataflow the Pallas conv kernel serves); adds one int8 rounding
    # on down-block shortcuts vs the per-layer path -- gated separately
    qres = quantize_reid_params_resident(folded, x_train[:64])
    embed_res = jax.jit(lambda x: reid_apply_int8_resident(qres, x))

    feats = {}
    for name, fn in [("f32", embed_f32), ("bf16", embed_bf16),
                     ("int8", embed_int8), ("int8_res", embed_res)]:
        feats[name] = (np.asarray(fn(qx)), np.asarray(fn(gx)))
    # walker self-check: the int8 path's graph walker in f32 must agree
    # with models.reid.reid_apply to float tolerance
    walk_q = np.asarray(embed_walk(qx))
    walker_max_diff = float(np.abs(walk_q - feats["f32"][0]).max())

    r1 = {k: rank1(q, g, qy, gy) for k, (q, g) in feats.items()}
    cos_int8 = float(np.mean(np.sum(
        feats["int8"][0] * feats["f32"][0], axis=1)))
    cos_bf16 = float(np.mean(np.sum(
        feats["bf16"][0] * feats["f32"][0], axis=1)))
    cos_res = float(np.mean(np.sum(
        feats["int8_res"][0] * feats["f32"][0], axis=1)))

    ok = (walker_max_diff < 1e-4
          and train_acc > 0.9
          and r1["int8"] >= r1["bf16"] - 0.01
          and cos_int8 >= 0.99
          and r1["int8_res"] >= r1["bf16"] - 0.01
          and cos_res >= 0.99)
    rec = {
        "metric": "int8 embed accuracy gate",
        "ok": ok,
        "train_acc": round(train_acc, 4),
        "rank1_f32": round(r1["f32"], 4),
        "rank1_bf16": round(r1["bf16"], 4),
        "rank1_int8": round(r1["int8"], 4),
        "rank1_int8_res": round(r1["int8_res"], 4),
        "cos_bf16_vs_f32": round(cos_bf16, 5),
        "cos_int8_vs_f32": round(cos_int8, 5),
        "cos_int8_res_vs_f32": round(cos_res, 5),
        "walker_max_diff": walker_max_diff,
        "ids": args.ids,
        "steps": args.steps,
        "secs": round(time.time() - t0, 1),
    }
    print(json.dumps(rec))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
