"""ReID classifier training in JAX/optax.

Contract: SURVEY.md section 3.5 (reference: deep_sort/deep/train.py): Net
with classifier head on Market-1501 crops (3x128x64), SGD lr=0.1 momentum=0.9
weight_decay=5e-4, CrossEntropy, top-1 eval, checkpoint dict
{'net_dict', 'acc', 'epoch'}.

TPU-first: the train step is one jitted function over a raw-parameter pytree
(unfolded BN). Batch statistics are computed globally: under a dp-sharded
batch, jnp.mean over the batch axis makes XLA insert the cross-device
all-reduce automatically -- true synchronized BatchNorm, which the
single-device reference approximates trivially. The classifier matmuls can
be tensor-sharded over an "mp" axis via sharding annotations.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # torch convention: running = (1-m)*running... see note

# torch BatchNorm2d(momentum=0.1 default); the reference model uses default
# 0.1 for ReID (only the darknet BN uses 0.9). running' = (1-0.1)*running +
# 0.1*batch.
BN_UPDATE = 0.1

STAGES = [(64, 64, False), (64, 128, True), (128, 256, True), (256, 512, True)]


def _conv_init(rng, ci, co, k):
    std = np.sqrt(2.0 / (ci * k * k))
    return (rng.normal(0, std, (k, k, ci, co))).astype(np.float32)


def init_train_params(num_classes: int = 751, seed: int = 0):
    """(params, bn_state): raw conv/bn/fc params + running BN statistics."""
    rng = np.random.default_rng(seed)

    def bn(c):
        return {"gamma": np.ones(c, np.float32), "beta": np.zeros(c, np.float32)}

    def bn_stats(c):
        return {"mean": np.zeros(c, np.float32), "var": np.ones(c, np.float32)}

    params: Dict = {
        "stem": {"w": _conv_init(rng, 3, 64, 3), "b": np.zeros(64, np.float32),
                 "bn": bn(64)},
        "layers": [],
        "classifier": {
            "fc1_w": rng.normal(0, 0.05, (512, 256)).astype(np.float32),
            "fc1_b": np.zeros(256, np.float32),
            "bn": bn(256),
            "fc2_w": rng.normal(0, 0.05, (256, num_classes)).astype(np.float32),
            "fc2_b": np.zeros(num_classes, np.float32),
        },
    }
    stats: Dict = {"stem": bn_stats(64), "layers": [], "classifier": bn_stats(256)}
    for ci, co, down in STAGES:
        blocks, sblocks = [], []
        for bi in range(2):
            first = bi == 0
            cin = ci if first else co
            block = {
                "conv1": {"w": _conv_init(rng, cin, co, 3), "bn": bn(co)},
                "conv2": {"w": _conv_init(rng, co, co, 3), "bn": bn(co)},
                "down": (
                    {"w": _conv_init(rng, cin, co, 1), "bn": bn(co)}
                    if (first and (down or cin != co))
                    else None
                ),
            }
            sblock = {
                "conv1": bn_stats(co),
                "conv2": bn_stats(co),
                "down": bn_stats(co) if block["down"] is not None else None,
            }
            blocks.append(block)
            sblocks.append(sblock)
        params["layers"].append(blocks)
        stats["layers"].append(sblocks)
    return params, stats


def _conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _bn(x, bn_params, stats, train: bool):
    """BatchNorm over (N, H, W) axes. In train mode the batch statistics are
    global means -- XLA all-reduces across a sharded batch automatically.
    Returns (out, new_stats)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x - mean), axis=(0, 1, 2))
        new_stats = {
            "mean": (1 - BN_UPDATE) * stats["mean"] + BN_UPDATE * lax.stop_gradient(mean),
            "var": (1 - BN_UPDATE) * stats["var"] + BN_UPDATE * lax.stop_gradient(var),
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = lax.rsqrt(var + BN_EPS)
    out = (x - mean) * inv * bn_params["gamma"] + bn_params["beta"]
    return out, new_stats


def reid_train_apply(params, stats, x, train: bool = True,
                     features_only: bool = False):
    """Forward with explicit BN. x (N, 128, 64, 3). Returns (logits,
    new_stats); with ``features_only`` returns (L2-normed 512-d features,
    new_stats) -- the reid=True head of the reference Net."""
    new_stats = {"layers": []}
    out = _conv(x, params["stem"]["w"], 1, 1) + params["stem"]["b"]
    out, new_stats["stem"] = _bn(out, params["stem"]["bn"], stats["stem"], train)
    out = jnp.maximum(out, 0.0)
    out = lax.reduce_window(
        out, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for blocks, sblocks in zip(params["layers"], stats["layers"]):
        nblocks = []
        for block, sblock in zip(blocks, sblocks):
            stride = 1
            if block["down"] is not None and block["conv1"]["w"].shape[2] != \
                    block["conv1"]["w"].shape[3]:
                stride = 2
            y = _conv(out, block["conv1"]["w"], stride, 1)
            y, s1 = _bn(y, block["conv1"]["bn"], sblock["conv1"], train)
            y = jnp.maximum(y, 0.0)
            y = _conv(y, block["conv2"]["w"], 1, 1)
            y, s2 = _bn(y, block["conv2"]["bn"], sblock["conv2"], train)
            if block["down"] is not None:
                s = _conv(out, block["down"]["w"], stride, 0)
                s, sd = _bn(s, block["down"]["bn"], sblock["down"], train)
            else:
                s, sd = out, None
            out = jnp.maximum(y + s, 0.0)
            nblocks.append({"conv1": s1, "conv2": s2, "down": sd})
        new_stats["layers"].append(nblocks)

    feat = jnp.mean(out, axis=(1, 2))  # (N, 512)
    if features_only:
        new_stats["classifier"] = stats["classifier"]
        norm = jnp.maximum(jnp.linalg.norm(feat, axis=1, keepdims=True), 1e-12)
        return feat / norm, new_stats
    c = params["classifier"]
    h = feat @ c["fc1_w"] + c["fc1_b"]
    # BatchNorm1d on (N, 256)
    if train:
        m = jnp.mean(h, axis=0)
        v = jnp.mean(jnp.square(h - m), axis=0)
        cstats = {
            "mean": (1 - BN_UPDATE) * stats["classifier"]["mean"]
            + BN_UPDATE * lax.stop_gradient(m),
            "var": (1 - BN_UPDATE) * stats["classifier"]["var"]
            + BN_UPDATE * lax.stop_gradient(v),
        }
    else:
        m, v = stats["classifier"]["mean"], stats["classifier"]["var"]
        cstats = stats["classifier"]
    h = (h - m) * lax.rsqrt(v + BN_EPS) * c["bn"]["gamma"] + c["bn"]["beta"]
    h = jnp.maximum(h, 0.0)
    logits = h @ c["fc2_w"] + c["fc2_b"]
    new_stats["classifier"] = cstats
    return logits, new_stats


def make_train_step(lr: float = 0.1, momentum: float = 0.9,
                    weight_decay: float = 5e-4):
    """SGD(momentum, weight_decay) + CE, like deep/train.py. Returns
    (init_opt_state, train_step)."""
    import optax

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=lr, momentum=momentum),
    )

    def loss_fn(params, stats, images, labels):
        logits, new_stats = reid_train_apply(params, stats, images, train=True)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
        return ce, (new_stats, acc)

    def train_step(params, opt_state, stats, images, labels):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats, images, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        return params, opt_state, new_stats, loss, acc

    return tx.init, train_step
