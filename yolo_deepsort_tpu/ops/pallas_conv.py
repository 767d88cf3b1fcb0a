"""Hand-scheduled MXU conv kernels for the detector backbone (Pallas, TPU).

Round-3 measurements that motivate this (docs/ROADMAP.md):
  * the Darknet backbone runs at ~47% MFU through XLA's conv for this
    architecture -- every cheap reformulation (layouts, space-to-depth
    stem, int8-via-XLA) measured negative, leaving custom kernels as the
    only lever on the single largest block (~90 ms of a ~244 ms chunk);
  * in-graph int8 matmuls reach ~1.56x bf16 on this MXU, but XLA's int8
    conv is SLOWER than bf16 -- the int8 path needs a hand-written kernel.

Formulation: a KxK conv is K*K shifted MXU matmuls. Each program takes G
frames' input feature map resident in VMEM; for each tap (dy, dx) a
window of rows flattens to (G*strip*Wo, Ci) and one dot accumulates into
f32 (bf16 weights) or int32 (int8 weights). Two scheduling dimensions
bound VMEM:

  * **H strips** (grid dim 1): the output is produced strip rows at a
    time while the input block stays resident (its block index is
    constant across the strip dimension, so Mosaic fetches it once).
    Without this, the 9 live tap copies of a 52x52 layer overflow the
    16 MB scoped-VMEM stack (measured on v5e: 16.14M > 16.00M).
  * **Cout tiles** (grid dim 2) when the weight block would not fit VMEM
    (the 3x3 512->1024 head convs).

Stride-2 convs are PHASE-SPLIT on the XLA side (space-to-depth): the
padded input is decomposed into its four (row, col)-parity planes stacked
on a new axis, after which every tap read inside the kernel is a
stride-1 static slice of one plane. This avoids the strided-decimation
reshape ((G,Ho,2,Wo,2,Ci) -> take-every-other), which Mosaic rejects
("infer-vector-layout: unsupported shape cast", measured on v5e).
Stride-2 1x1 convs are pre-decimated outside the kernel for the same
reason.

The epilogue fuses bias + activation (leaky/linear/mish); int8 mode also
fuses the activation quantization (per-tensor static scale) in the tap
loads and the per-channel dequant in the epilogue, so the graph keeps
bf16 activations between layers and only the MACs run int8 (W8A8 with
bf16 glue).

Exactness: bf16 mode is bit-comparable to XLA's lax.conv with bf16 inputs
and f32 accumulation (same products, reassociated sums -- tested to f32
tolerance); int8 mode matches the XLA int8-conv twin in
models/quantize._int8_conv semantics. The phase-split preserves the tap
accumulation order, so both modes produce the same sums as the unsplit
formulation.

Reference parity anchor: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160 conv stack); this file changes scheduling and
(optionally) arithmetic precision, never topology.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(y, act: str):
    if act == "leaky":
        return jnp.where(y > 0, y, 0.1 * y)
    if act == "mish":  # matches models.darknet._activate (v4 backbone)
        return y * jnp.tanh(jnp.logaddexp(0.0, y))
    if act in ("linear", ""):
        return y
    raise ValueError(act)


def _conv_kernel(
    x_ref, w_ref, b_ref, *rest,
    g: int, k: int, ci: int, ho: int, wo: int, co_blk: int, strip: int,
    phased: bool, act: str, int8_mode: bool, out_dtype,
):
    """One program: G frames x one H strip x one Cout block.

    x_ref: (G, HP, WP, Ci) bf16 stride-1, or (G, 4, HP2, WP2, Ci) bf16
    phase-split (stride-2); int8 mode quantizes each tap load in-kernel.
    w_ref (k*k*Ci, co_blk) bf16|int8 tap-major; b_ref (1, co_blk) f32.
    int8 mode appends scale_ref (1, co_blk) f32 (xscale*wscale) and
    xinv_ref (1, 1) f32 (1/xscale) in SMEM."""
    if int8_mode:
        scale_ref, xinv_ref, out_ref = rest
    else:
        (out_ref,) = rest

    h0 = pl.program_id(1) * strip
    rows = g * strip * wo
    acc_dtype = jnp.int32 if int8_mode else jnp.float32
    acc = jnp.zeros((rows, co_blk), acc_dtype)
    for dy in range(k):
        for dx in range(k):
            if phased:
                # tap (dy, dx) lives on parity plane (dy%2, dx%2) at
                # intra-plane offset (dy//2, dx//2)
                p = (dy % 2) * 2 + (dx % 2)
                tap = x_ref[:, p, pl.ds(h0 + dy // 2, strip),
                            dx // 2:dx // 2 + wo, :]
            else:
                tap = x_ref[:, pl.ds(h0 + dy, strip), dx:dx + wo, :]
            tap = tap.reshape(rows, ci)
            if int8_mode:
                tap = jnp.clip(
                    jnp.round(tap.astype(jnp.float32) * xinv_ref[0, 0]),
                    -127, 127).astype(jnp.int8)
            wk = w_ref[(dy * k + dx) * ci:(dy * k + dx + 1) * ci, :]
            acc = acc + jax.lax.dot_general(
                tap, wk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
    y = acc.astype(jnp.float32)
    if int8_mode:
        y = y * scale_ref[0, :]
    y = _apply_act(y + b_ref[0, :], act)
    out_ref[...] = y.reshape(g, strip, wo, co_blk).astype(out_dtype)


def _phase_split(xp: jnp.ndarray) -> jnp.ndarray:
    """(N, HP, WP, C) -> (N, 4, HP//2, WP//2, C): the four (row, col)
    parity planes, stacked. HP/WP must be even (pad guarantees it for
    even inputs). Plane p = 2*py + px holds xp[:, py::2, px::2, :]."""
    n, hp, wp, c = xp.shape
    assert hp % 2 == 0 and wp % 2 == 0, (hp, wp)
    return jnp.stack(
        [xp[:, py::2, px::2, :] for py in (0, 1) for px in (0, 1)], axis=1)


def _pick_g_frames(n: int, vmem_per_frame: int, hw: int) -> int:
    """Frames per program: fill MXU rows (>=512) while keeping the x/acc
    VMEM footprint under ~10 MB (leaves room for weights + pipelining)."""
    g = 1
    while (g * hw < 512 and g < 16 and n % (g * 2) == 0
           and (g * 2) * vmem_per_frame < 10 * 2**20):
        g *= 2
    return g


def _pick_co_block(k: int, ci: int, co: int, w_bytes: int) -> int:
    """Cout tile: whole Cout unless the weight block exceeds ~4 MB."""
    blk = co
    while k * k * ci * blk * w_bytes > 4 * 2**20 and blk % 2 == 0 and blk > 128:
        blk //= 2
    return blk


def _pick_strip(ho: int, g: int, wo: int, ci: int, co_blk: int,
                x_bytes: int, budget: int = 6 * 2**20) -> int:
    """Output-row strip: the largest divisor of Ho whose per-program
    working set (live tap copies + accumulator + double-buffered output)
    stays under ``budget``. The resident input block is budgeted
    separately by _pick_g_frames; without strips the 9 tap copies of a
    52x52 layer overflow the 16 MB scoped-VMEM stack."""

    def est(s: int) -> int:
        taps = 2 * g * s * wo * ci * x_bytes   # ~2 live tap copies
        acc = g * s * wo * co_blk * 4
        outb = 2 * g * s * wo * co_blk * 2
        return taps + acc + outb

    for s in sorted((d for d in range(1, ho + 1) if ho % d == 0),
                    reverse=True):
        if est(s) <= budget:
            return s
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad", "act", "interpret"),
)
def conv_mxu_bf16(
    x: jnp.ndarray,   # (N, Hi, Wi, Ci) bf16
    w: jnp.ndarray,   # (k, k, Ci, Co) bf16 HWIO
    b: jnp.ndarray,   # (Co,) f32
    *,
    stride: int = 1,
    pad: int = 1,
    act: str = "leaky",
    interpret: bool = False,
) -> jnp.ndarray:
    """bf16 conv + bias + activation, f32 accumulation; returns bf16 NHWC.
    Drop-in for the backbone's _conv+_activate pair on supported shapes."""
    return _conv_mxu(x, w.astype(jnp.bfloat16), b, None, None,
                     stride=stride, pad=pad, act=act, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad", "act", "interpret"),
)
def conv_mxu_int8(
    x: jnp.ndarray,        # (N, Hi, Wi, Ci) bf16/f32
    wq: jnp.ndarray,       # (k, k, Ci, Co) int8 HWIO
    b: jnp.ndarray,        # (Co,) f32
    scale: jnp.ndarray,    # (Co,) f32 = xscale * wscale
    xinv: jnp.ndarray,     # scalar f32 = 1 / xscale
    *,
    stride: int = 1,
    pad: int = 1,
    act: str = "leaky",
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 conv with bf16 glue: quantize-in, int8 MACs, dequant + bias +
    activation out (bf16). Semantics == models/quantize._int8_conv +
    activation (the accuracy-gated scheme)."""
    return _conv_mxu(x, wq, b, scale, xinv, stride=stride, pad=pad, act=act,
                     interpret=interpret)


def _conv_mxu(x, w, b, scale, xinv, *, stride, pad, act, interpret):
    n, hi, wi, ci = x.shape
    k, k2, wci, co = w.shape
    assert k == k2 and k in (1, 3) and wci == ci, (w.shape, x.shape)
    assert pad == ((k - 1) // 2), (k, pad)
    ho = (hi + 2 * pad - k) // stride + 1
    wo = (wi + 2 * pad - k) // stride + 1
    if stride == 2:
        assert hi % 2 == 0 and wi % 2 == 0, (hi, wi)
    int8_mode = scale is not None
    # int8 mode quantizes in-kernel from the caller's dtype (bit-exact vs
    # the XLA twin, which quantizes the same values); bf16 mode casts.
    xdt = jnp.bfloat16 if not int8_mode else x.dtype

    if pad:
        xp = jnp.pad(x.astype(xdt), ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        xp = x.astype(xdt)

    # stride-2 handling on the XLA side: k=1 pre-decimates; k=3
    # phase-splits so the kernel only ever does stride-1 reads
    phased = False
    if stride == 2:
        if k == 1:
            xp = xp[:, ::2, ::2, :]
        else:
            xp = _phase_split(xp)
            phased = True

    if phased:
        _, _, hp, wp, _ = xp.shape
        x_blk_elems = 4 * hp * wp * ci
    else:
        hp, wp = xp.shape[1], xp.shape[2]
        x_blk_elems = hp * wp * ci

    x_bytes = np.dtype(xp.dtype).itemsize
    vmem_per_frame = (x_blk_elems * x_bytes          # resident input block
                      + ho * wo * co * 4             # accumulator
                      + ho * wo * co * 2)            # output block
    g = _pick_g_frames(n, vmem_per_frame, ho * wo)
    co_blk = _pick_co_block(k, ci, co, 1 if int8_mode else 2)
    strip = _pick_strip(ho, g, wo, ci, co_blk, x_bytes)
    grid = (n // g, ho // strip, co // co_blk)

    w2 = w.reshape(k * k * ci, co)
    b2 = b.reshape(1, co).astype(jnp.float32)

    kern = functools.partial(
        _conv_kernel, g=g, k=k, ci=ci, ho=ho, wo=wo, co_blk=co_blk,
        strip=strip, phased=phased, act=act, int8_mode=int8_mode,
        out_dtype=jnp.bfloat16,
    )
    # the input block's index map is constant in (h, j), so Mosaic keeps
    # it resident across the strip/Cout dimensions instead of re-fetching
    if phased:
        x_spec = pl.BlockSpec((g, 4, hp, wp, ci),
                              lambda i, h, j: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((g, hp, wp, ci), lambda i, h, j: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((k * k * ci, co_blk), lambda i, h, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_blk), lambda i, h, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, w2, b2]
    if int8_mode:
        in_specs.append(pl.BlockSpec((1, co_blk), lambda i, h, j: (0, j),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1), lambda i, h, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        args += [scale.reshape(1, co).astype(jnp.float32),
                 jnp.asarray(xinv, jnp.float32).reshape(1, 1)]

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, strip, wo, co_blk),
                               lambda i, h, j: (i, h, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, co), jnp.bfloat16),
        interpret=interpret,
    )(*args)


def backbone_conv_eligible(hi: int, wi: int, ci: int, co: int, k: int,
                           stride: int, act: str,
                           max_hw: int = 64) -> bool:
    """Routing policy for network_apply's conv hook: deep backbone/head
    convs whose full map fits a VMEM block. Spatially large early layers
    (>= 104x104) and non-MXU-friendly channel counts stay on XLA."""
    if k not in (1, 3) or act not in ("leaky", "linear", "mish"):
        return False
    if stride == 2 and (hi % 2 or wi % 2):
        return False
    if max(hi, wi) > max_hw:
        return False
    return ci >= 128 and co >= 128


def make_backbone_conv_impl(*, max_hw: int = 64, interpret: bool = False,
                            layer_whitelist: Optional[frozenset] = None,
                            int8_pkg=None):
    """``conv_impl`` hook for models.darknet.network_apply: route eligible
    convs through conv_mxu_bf16, return None (XLA fallback) otherwise.

    ``layer_whitelist`` optionally restricts the kernel to specific module
    indices (for per-layer A/B attribution). ``int8_pkg`` (from
    models.quantize_darknet.quantize_darknet_convs) additionally routes
    packaged layers through the W8A8 kernel -- accuracy-gated by
    tools/int8_gate.py --detector before serving use."""

    def impl(x, w, b, stride, pad, act, layer_idx):
        hi, wi, ci = int(x.shape[1]), int(x.shape[2]), int(x.shape[3])
        co = int(w.shape[3])
        k = int(w.shape[0])
        if layer_whitelist is not None and layer_idx not in layer_whitelist:
            return None
        if pad != (k - 1) // 2:  # unpadded k=3 convs (rare cfg) stay on XLA
            return None
        if not backbone_conv_eligible(hi, wi, ci, co, k, stride, act,
                                      max_hw=max_hw):
            return None
        qp = None if int8_pkg is None else int8_pkg.get(layer_idx)
        if qp is not None:
            return conv_mxu_int8(
                x, jnp.asarray(qp["wq"]), jnp.asarray(qp["b"], jnp.float32),
                jnp.asarray(qp["scale"], jnp.float32),
                jnp.asarray(qp["xinv"], jnp.float32),
                stride=stride, pad=pad, act=act, interpret=interpret,
            )
        return conv_mxu_bf16(
            x.astype(jnp.bfloat16),
            jnp.asarray(w, jnp.bfloat16),
            jnp.asarray(b, jnp.float32),
            stride=stride, pad=pad, act=act, interpret=interpret,
        )

    return impl


def pallas_conv_supported() -> bool:
    """True when the kernel may compile natively on this backend."""
    return jax.default_backend() == "tpu"


def load_conv_whitelist(model: str, img_size: int, batch: int,
                        tuned_dir: Optional[str] = None):
    """Load a per-layer conv routing whitelist emitted by
    tools/autotune_conv.py.

    Returns {"bf16": frozenset(layer_idx), "int8": frozenset(layer_idx)} --
    consumable by the serving steps' ``use_pallas_conv=`` argument -- or
    None when no tuned file exists for this (model, img_size, batch) or it
    was tuned on a different backend than the current one (per-shape
    winners are chip-specific; a CPU run must not inherit TPU routing).
    """
    import json
    import os

    if tuned_dir is None:
        tuned_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "tuned")
    path = os.path.join(
        tuned_dir, f"conv_whitelist_{model}_{img_size}_b{batch}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    if d.get("backend") != jax.default_backend():
        # per-shape winners are chip-specific: a file without a backend
        # field (or from another backend) must not be inherited
        return None
    return {"bf16": frozenset(d.get("bf16", ())),
            "int8": frozenset(d.get("int8", ()))}
