"""DeepSORT ReID embedding network in JAX.

Contract: SURVEY.md section 2.3 "ReID Net" + Appendix E.3 (reference:
deep_sort/deep/model.py:~1-110 + feature_extractor.py:~1-55).

Topology (input 3 x 128H x 64W):
  stem: conv3x3 3->64 + BN + ReLU + maxpool(3, stride 2, pad 1)
  4 residual stages of 2 BasicBlocks: 64->64, 64->128(down), 128->256(down),
  256->512(down); BasicBlock = conv3x3+BN+ReLU, conv3x3+BN, (+1x1 shortcut
  conv+BN when shape changes), ReLU after the add
  avgpool(8, 4) -> 512
  reid head: x / ||x||_2  (512-d)  |  classifier head: 512->256->num_classes

Inference params are BN-folded {w: HWIO, b}; the classifier head (training /
eval CLIs) keeps explicit BN. The ``ckpt.t7`` torch checkpoint loader maps
the reference's state-dict names (conv.0..., layer1.0.conv1..., classifier...)
into this pytree.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5

# (c_in, c_out, downsample) per stage; 2 blocks per stage
STAGES = [(64, 64, False), (64, 128, True), (128, 256, True), (256, 512, True)]
FEAT_DIM = 512
INPUT_HW = (128, 64)


def _fold(conv_w_oihw, bn_w, bn_b, bn_m, bn_v, conv_b=None):
    scale = bn_w / np.sqrt(bn_v + BN_EPS)
    w = conv_w_oihw * scale[:, None, None, None]
    # the stem conv carries a bias (Conv2d default) that feeds the BN
    pre = conv_b if conv_b is not None else 0.0
    b = bn_b + (pre - bn_m) * scale
    return {
        "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32),
        "b": b.astype(np.float32),
    }


def load_reid_checkpoint(path: str) -> Dict:
    """Load a ReID checkpoint into folded inference params.

    Two formats: the reference's ``ckpt.t7`` (torch pickle with params
    under 'net_dict'; requires torch CPU), dispatching on the state-dict
    layout -- the default deep/model.py Net (512-d, ReLU) vs
    deep/original_model.py (128-d, ELU, dense head); or this framework's
    own ``.npz`` training checkpoint (train/reid_cli.py), whose unfolded
    BN train params fold here so a net trained with our CLI deploys
    straight into DeepSort/VideoTracker/Extractor."""
    if str(path).endswith(".npz"):
        from ..utils.checkpoint import load_reid_checkpoint_npz

        ck = load_reid_checkpoint_npz(path)
        return fold_train_params(ck["net_dict"], ck["stats"])
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in state["net_dict"].items()}
    if "dense.1.weight" in sd:
        return original_params_from_state_dict(sd)
    return params_from_state_dict(sd)


def fold_train_params(params: Dict, stats: Dict) -> Dict:
    """Fold train-layout ReID params (HWIO convs + explicit BN gamma/beta +
    running stats, train/reid_train.py layout) into inference params."""

    def fold(p, st):
        scale = (np.asarray(p["bn"]["gamma"], np.float32)
                 / np.sqrt(np.asarray(st["var"], np.float32) + BN_EPS))
        w = np.asarray(p["w"], np.float32) * scale  # HWIO: scale over O
        pre = np.asarray(p.get("b", 0.0), np.float32)
        b = (np.asarray(p["bn"]["beta"], np.float32)
             + (pre - np.asarray(st["mean"], np.float32)) * scale)
        return {"w": w.astype(np.float32), "b": b.astype(np.float32)}

    out: Dict = {"stem": fold(params["stem"], stats["stem"]), "layers": []}
    for blocks, sblocks in zip(params["layers"], stats["layers"]):
        folded = []
        for block, sblock in zip(blocks, sblocks):
            folded.append({
                "conv1": fold(block["conv1"], sblock["conv1"]),
                "conv2": fold(block["conv2"], sblock["conv2"]),
                "down": (fold(block["down"], sblock["down"])
                         if block["down"] is not None else None),
            })
        out["layers"].append(folded)
    if "classifier" in params:
        c, sc = params["classifier"], stats["classifier"]
        out["classifier"] = {
            "fc1_w": np.asarray(c["fc1_w"], np.float32),
            "fc1_b": np.asarray(c["fc1_b"], np.float32),
            "bn_w": np.asarray(c["bn"]["gamma"], np.float32),
            "bn_b": np.asarray(c["bn"]["beta"], np.float32),
            "bn_m": np.asarray(sc["mean"], np.float32),
            "bn_v": np.asarray(sc["var"], np.float32),
            "fc2_w": np.asarray(c["fc2_w"], np.float32),
            "fc2_b": np.asarray(c["fc2_b"], np.float32),
        }
    return out


def feat_dim_of(params: Dict) -> int:
    """Embedding width of a loaded ReID param pytree (128 for the
    original_model.py layout, 512 for the default Net)."""
    return 128 if "dense" in params else FEAT_DIM


def params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Map the reference Net's state-dict to folded JAX params."""

    def fold(prefix_conv, prefix_bn):
        return _fold(
            sd[f"{prefix_conv}.weight"],
            sd[f"{prefix_bn}.weight"],
            sd[f"{prefix_bn}.bias"],
            sd[f"{prefix_bn}.running_mean"],
            sd[f"{prefix_bn}.running_var"],
            conv_b=sd.get(f"{prefix_conv}.bias"),
        )

    params: Dict = {"stem": fold("conv.0", "conv.1"), "layers": []}
    for li in range(1, 5):
        blocks: List[Dict] = []
        for bi in range(2):
            p = f"layer{li}.{bi}"
            block = {
                "conv1": fold(f"{p}.conv1", f"{p}.bn1"),
                "conv2": fold(f"{p}.conv2", f"{p}.bn2"),
                "down": None,
            }
            if f"{p}.downsample.0.weight" in sd:
                block["down"] = fold(f"{p}.downsample.0", f"{p}.downsample.1")
            blocks.append(block)
        params["layers"].append(blocks)
    if "classifier.0.weight" in sd:
        params["classifier"] = {
            "fc1_w": sd["classifier.0.weight"].T.astype(np.float32),
            "fc1_b": sd["classifier.0.bias"].astype(np.float32),
            "bn_w": sd["classifier.1.weight"].astype(np.float32),
            "bn_b": sd["classifier.1.bias"].astype(np.float32),
            "bn_m": sd["classifier.1.running_mean"].astype(np.float32),
            "bn_v": sd["classifier.1.running_var"].astype(np.float32),
            "fc2_w": sd["classifier.4.weight"].T.astype(np.float32),
            "fc2_b": sd["classifier.4.bias"].astype(np.float32),
        }
    return params


# ---- original_model.py layout (deep_sort/deep/original_model.py:~1-110):
# the net matching the original DeepSORT cosine-metric-learning checkpoint
# (mars-small128): two ELU stem convs 3->32->32 + maxpool, three residual
# stages (32->32, 32->64 down, 64->128 down) of 2 ELU BasicBlocks, then a
# dense 128*16*8 -> 128 head. The reid branch applies ONLY the dense Linear
# (dropout/BN/ELU skipped at inference) and L2-normalizes -- 128-d features.
# Reconstructed from public knowledge of the upstream file (reference mount
# empty); validated against a torch replica in tests/test_reid.py.

ORIGINAL_STAGES = [(32, 32, False), (32, 64, True), (64, 128, True)]
ORIGINAL_FEAT_DIM = 128


def original_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Map the original_model.py state-dict to folded JAX params."""

    def fold(prefix_conv, prefix_bn):
        return _fold(
            sd[f"{prefix_conv}.weight"],
            sd[f"{prefix_bn}.weight"],
            sd[f"{prefix_bn}.bias"],
            sd[f"{prefix_bn}.running_mean"],
            sd[f"{prefix_bn}.running_var"],
            conv_b=sd.get(f"{prefix_conv}.bias"),
        )

    params: Dict = {
        "stem": fold("conv.0", "conv.1"),
        "stem2": fold("conv.3", "conv.4"),
        "layers": [],
    }
    for li in range(1, 4):
        blocks: List[Dict] = []
        for bi in range(2):
            p = f"layer{li}.{bi}"
            block = {
                "conv1": fold(f"{p}.conv1", f"{p}.bn1"),
                "conv2": fold(f"{p}.conv2", f"{p}.bn2"),
                "down": None,
            }
            if f"{p}.downsample.0.weight" in sd:
                block["down"] = fold(f"{p}.downsample.0", f"{p}.downsample.1")
            blocks.append(block)
        params["layers"].append(blocks)
    params["dense"] = {
        "w": sd["dense.1.weight"].T.astype(np.float32),
        "b": sd["dense.1.bias"].astype(np.float32),
    }
    return params


def random_original_reid_params(seed: int = 0) -> Dict:
    """Random folded params in the original_model.py layout (tests)."""
    rng = np.random.default_rng(seed)

    def conv(ci, co, k):
        std = np.sqrt(2.0 / (ci * k * k))
        return {
            "w": rng.normal(0, std, (k, k, ci, co)).astype(np.float32),
            "b": rng.normal(0, 0.1, co).astype(np.float32),
        }

    params: Dict = {"stem": conv(3, 32, 3), "stem2": conv(32, 32, 3),
                    "layers": []}
    for ci, co, down in ORIGINAL_STAGES:
        blocks = []
        for bi in range(2):
            first = bi == 0
            blocks.append({
                "conv1": conv(ci if first else co, co, 3),
                "conv2": conv(co, co, 3),
                "down": conv(ci, co, 1) if (first and (down or ci != co)) else None,
            })
        params["layers"].append(blocks)
    params["dense"] = {
        "w": rng.normal(0, 0.01, (128 * 16 * 8, 128)).astype(np.float32),
        "b": np.zeros(128, np.float32),
    }
    return params


def random_reid_params(seed: int = 0, num_classes: Optional[int] = None) -> Dict:
    """Random folded params with the right shapes (tests / cold start)."""
    rng = np.random.default_rng(seed)

    def conv(ci, co, k):
        std = np.sqrt(2.0 / (ci * k * k))
        return {
            "w": rng.normal(0, std, (k, k, ci, co)).astype(np.float32),
            "b": rng.normal(0, 0.1, co).astype(np.float32),
        }

    params: Dict = {"stem": conv(3, 64, 3), "layers": []}
    for ci, co, down in STAGES:
        blocks = []
        for bi in range(2):
            first = bi == 0
            blocks.append(
                {
                    "conv1": conv(ci if first else co, co, 3),
                    "conv2": conv(co, co, 3),
                    "down": conv(ci, co, 1) if (first and (down or ci != co)) else None,
                }
            )
        params["layers"].append(blocks)
    if num_classes:
        params["classifier"] = {
            "fc1_w": rng.normal(0, 0.05, (512, 256)).astype(np.float32),
            "fc1_b": np.zeros(256, np.float32),
            "bn_w": np.ones(256, np.float32),
            "bn_b": np.zeros(256, np.float32),
            "bn_m": np.zeros(256, np.float32),
            "bn_v": np.ones(256, np.float32),
            "fc2_w": rng.normal(0, 0.05, (256, num_classes)).astype(np.float32),
            "fc2_b": np.zeros(num_classes, np.float32),
        }
    return params


def _conv(x, p, stride, pad, compute_dtype):
    out = lax.conv_general_dilated(
        x.astype(compute_dtype),
        jnp.asarray(p["w"], compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + jnp.asarray(p["b"], jnp.float32)[None, None, None, :]


def _original_apply(params: Dict, x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """original_model.py forward: ELU net -> dense Linear -> L2 norm, 128-d."""
    import jax.nn

    elu = jax.nn.elu
    out = elu(_conv(x, params["stem"], 1, 1, compute_dtype))
    out = elu(_conv(out.astype(compute_dtype), params["stem2"], 1, 1,
                    compute_dtype)).astype(compute_dtype)
    out = lax.reduce_window(
        out, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for blocks in params["layers"]:
        for block in blocks:
            stride = 1
            if block["down"] is not None:
                ci = block["conv1"]["w"].shape[2]
                co = block["conv1"]["w"].shape[3]
                stride = 2 if ci != co else 1
            y = elu(_conv(out, block["conv1"], stride, 1, compute_dtype))
            y = _conv(y.astype(compute_dtype), block["conv2"], 1, 1,
                      compute_dtype)
            if block["down"] is not None:
                shortcut = _conv(out, block["down"], stride, 0, compute_dtype)
            else:
                shortcut = out.astype(jnp.float32)
            out = elu(y + shortcut).astype(compute_dtype)
    # torch flattens NCHW: (N, 128, 16, 8) -> (N, 16384)
    n = out.shape[0]
    flat = out.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(n, -1)
    feat = flat @ jnp.asarray(params["dense"]["w"]) + jnp.asarray(
        params["dense"]["b"]
    )
    norm = jnp.linalg.norm(feat, axis=1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-12)


def reid_apply(
    params: Dict,
    x: jnp.ndarray,
    compute_dtype=jnp.float32,
    classify: bool = False,
) -> jnp.ndarray:
    """Forward pass. x: (N, 128, 64, 3) NHWC, already /255 + ImageNet-normed.

    reid mode (default): (N, 512) L2-normalized features -- or (N, 128) when
    ``params`` carries the original_model.py layout (dispatched on the
    presence of its dense head; layout is static at trace time).
    classify mode: (N, num_classes) logits (eval-mode classifier: BN affine,
    dropout off) -- used by the Market-1501 eval CLI."""
    if "dense" in params:
        if classify:
            raise ValueError(
                "classify mode is not supported for the original_model.py "
                "layout (its classifier head is not loaded)"
            )
        return _original_apply(params, x, compute_dtype)
    out = _conv(x, params["stem"], 1, 1, compute_dtype)
    out = jnp.maximum(out, 0.0).astype(compute_dtype)
    # maxpool 3x3 stride 2 pad 1 (-inf padding, like torch MaxPool2d)
    out = lax.reduce_window(
        out,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    for blocks in params["layers"]:
        for block in blocks:
            # the reference downsamples (conv1 stride 2 + 1x1 stride-2
            # projection) exactly when the block changes channel count;
            # a same-channel projection block (not used here) keeps stride 1.
            stride = 1
            if block["down"] is not None:
                ci = block["conv1"]["w"].shape[2]
                co = block["conv1"]["w"].shape[3]
                stride = 2 if ci != co else 1
            y = _conv(out, block["conv1"], stride, 1, compute_dtype)
            y = jnp.maximum(y, 0.0).astype(compute_dtype)
            y = _conv(y, block["conv2"], 1, 1, compute_dtype)
            if block["down"] is not None:
                shortcut = _conv(out, block["down"], stride, 0, compute_dtype)
            else:
                shortcut = out
            out = jnp.maximum(y + shortcut, 0.0).astype(compute_dtype)

    feat = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # avgpool (8,4) -> (N, 512)

    if classify:
        c = params["classifier"]
        h = feat @ jnp.asarray(c["fc1_w"]) + jnp.asarray(c["fc1_b"])
        scale = jnp.asarray(c["bn_w"]) / jnp.sqrt(jnp.asarray(c["bn_v"]) + BN_EPS)
        h = (h - jnp.asarray(c["bn_m"])) * scale + jnp.asarray(c["bn_b"])
        h = jnp.maximum(h, 0.0)
        return h @ jnp.asarray(c["fc2_w"]) + jnp.asarray(c["fc2_b"])

    norm = jnp.linalg.norm(feat, axis=1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-12)
