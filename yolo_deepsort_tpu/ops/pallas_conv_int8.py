"""Fused W8A8 int8 conv kernels for the ReID embed net (Pallas, TPU).

Round-3 verdicts that shape this design (docs/ROADMAP.md):
  * the MXU runs int8 matmuls at ~1.56x bf16 in-graph, but routing int8
    through ``lax.conv`` measured SLOWER than bf16 twice -- XLA does not
    reach the int8 MXU path for these conv shapes, so the kernel is
    hand-written;
  * the accuracy gate (tools/int8_gate.py) passed for the W8A8 scheme in
    models/quantize.py; this kernel keeps activations int8 END-TO-END
    between convs (quantize fused into each conv's epilogue), which adds
    one int8 rounding on residual shortcuts vs the per-layer XLA path --
    re-gated by the resident-semantics rows of the gate.

One ``pallas_call`` per conv layer, grid over the crop batch (G crops per
program). A 3x3 conv is 9 shifted MXU matmuls: for each tap (dy, dx) the
padded input window slides, rows flatten to (G*Ho*Wo, Cin) and one
int8 x int8 -> int32 ``jnp.dot`` accumulates. The epilogue fuses dequant
(per-output-channel combined scale), bias, optional residual add (int8 +
its scale), ReLU, and requantization to the NEXT conv's int8 scale -- so
activations never round-trip HBM in f32.

Semantics contract: bit-exact (same int8 codes) vs the XLA twin
``models.quantize.reid_apply_int8_resident(..., conv_impl=None)`` --
tested in tests/test_pallas_conv_int8.py; both paths round with
``jnp.round`` (ties-to-even) and clip to [-127, 127].

Reference parity anchor: SURVEY.md section 2.3 ReID Net row
(deep_sort/deep/model.py:~1-110); this file only changes arithmetic
precision, not topology.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(acc_f32, bias, res, res_scale, relu, out_inv_scale, out_dtype):
    """Shared dequantized-accumulator epilogue: bias -> +residual -> ReLU ->
    (requantize | f32). acc_f32 already carries the combined
    xscale*wscale per-channel dequant."""
    y = acc_f32 + bias
    if res is not None:
        y = y + res.astype(jnp.float32) * res_scale
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_dtype == jnp.int8:
        q = jnp.clip(jnp.round(y * out_inv_scale), -127, 127)
        return q.astype(jnp.int8)
    return y.astype(jnp.float32)


def _conv_kernel_3x3(
    x_ref, w_ref, scale_ref, bias_ref, *rest,
    g: int, hi: int, wi: int, ci: int, ho: int, wo: int, co: int,
    stride: int, relu: bool, out_dtype, has_res: bool,
):
    """One program: G crops. x_ref (G, Hi+2, Wi+2, Ci) int8 pre-padded
    for stride 1, or (G, 4, (Hi+2)/2, (Wi+2)/2, Ci) phase-split planes
    for stride 2 (Mosaic rejects the strided-decimation reshape the
    unsplit formulation needs: "unsupported shape cast", v5e);
    w_ref (9*Ci, Co) int8 (tap-major); scale_ref (1, Co) f32 combined
    xscale*wscale; bias_ref (1, Co) f32. Optional residual ref
    (G, Ho, Wo, Co) int8 + (1,1) res_scale + (1,1) out_inv_scale in SMEM."""
    if has_res:
        res_ref, rs_ref, oinv_ref, out_ref = rest
    else:
        res_ref, rs_ref = None, None
        oinv_ref, out_ref = rest

    rows = g * ho * wo
    acc = jnp.zeros((rows, co), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            if stride == 1:
                tap = x_ref[:, dy:dy + ho, dx:dx + wo, :]
            else:
                # tap (dy, dx) lives on parity plane (dy%2, dx%2) at
                # intra-plane offset (dy//2, dx//2) -- stride-1 reads only
                p = (dy % 2) * 2 + (dx % 2)
                tap = x_ref[:, p, dy // 2:dy // 2 + ho,
                            dx // 2:dx // 2 + wo, :]
            wk = w_ref[(dy * 3 + dx) * ci:(dy * 3 + dx + 1) * ci, :]
            acc = acc + jax.lax.dot_general(
                tap.reshape(rows, ci), wk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    y = acc.astype(jnp.float32) * scale_ref[0, :]
    res = res_ref[...].reshape(rows, co) if has_res else None
    rs = rs_ref[0, 0] if has_res else None
    out = _epilogue(y, bias_ref[0, :], res, rs, relu, oinv_ref[0, 0],
                    out_dtype)
    out_ref[...] = out.reshape(g, ho, wo, co)


def _conv_kernel_1x1(
    x_ref, w_ref, scale_ref, bias_ref, oinv_ref, out_ref,
    g: int, hi: int, wi: int, ci: int, ho: int, wo: int, co: int,
    stride: int, relu: bool, out_dtype,
):
    """1x1 (projection/downsample) conv: one matmul. Stride-2 inputs are
    pre-decimated OUTSIDE the kernel (XLA strided slice) -- Mosaic rejects
    the in-kernel decimation reshape -- so x_ref is always (G, Ho, Wo, Ci)
    int8."""
    x = x_ref[...]
    rows = g * ho * wo
    acc = jax.lax.dot_general(
        x.reshape(rows, ci), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[0, :]
    out = _epilogue(y, bias_ref[0, :], None, None, relu, oinv_ref[0, 0],
                    out_dtype)
    out_ref[...] = out.reshape(g, ho, wo, co)


def _pick_g(n: int, hw: int) -> int:
    """Crops per program: the smallest power of two whose g*Ho*Wo matmul
    rows reach ~512 (full MXU tiles) without ballooning VMEM; must divide
    the batch (always a multiple of the frame count here)."""
    g = 1
    while g * hw < 512 and g < 32 and n % (g * 2) == 0:
        g *= 2
    return g


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad", "relu", "out_int8", "interpret"),
)
def conv_int8(
    xq: jnp.ndarray,            # (N, Hi, Wi, Ci) int8
    wq: jnp.ndarray,            # (kh, kw, Ci, Co) int8 HWIO
    scale: jnp.ndarray,         # (Co,) f32 = xscale * wscale
    bias: jnp.ndarray,          # (Co,) f32
    out_inv_scale: jnp.ndarray,  # scalar f32 (1/next xscale); ignored if f32 out
    residual: Optional[jnp.ndarray] = None,   # (N, Ho, Wo, Co) int8
    res_scale: Optional[jnp.ndarray] = None,  # scalar f32
    *,
    stride: int = 1,
    pad: int = 1,
    relu: bool = True,
    out_int8: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 conv + dequant + bias (+residual) (+ReLU) (+requant).

    Returns (N, Ho, Wo, Co) int8 (out_int8=True) or f32. 3x3 convs take
    pad=1; 1x1 take pad=0 and no residual.
    """
    n, hi, wi, ci = xq.shape
    kh, kw, wci, co = wq.shape
    assert wci == ci, (wci, ci)
    assert kh == kw and kh in (1, 3), (kh, kw)
    ho = (hi + 2 * pad - kh) // stride + 1
    wo = (wi + 2 * pad - kw) // stride + 1
    out_dtype = jnp.int8 if out_int8 else jnp.float32

    g = _pick_g(n, ho * wo)
    grid = (n // g,)

    scale2 = scale.reshape(1, co).astype(jnp.float32)
    bias2 = bias.reshape(1, co).astype(jnp.float32)
    oinv2 = jnp.asarray(out_inv_scale, jnp.float32).reshape(1, 1)

    if kh == 3:
        assert pad == 1, pad
        # pre-pad outside the kernel (one XLA pad, fused into the producer's
        # requant store in practice); stride-2 inputs are additionally
        # phase-split into their four parity planes so every in-kernel tap
        # read is a stride-1 static slice (see _conv_kernel_3x3)
        assert hi % 2 == 0 and wi % 2 == 0, (hi, wi)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        if stride == 2:
            xp = jnp.stack(
                [xp[:, py::2, px::2, :] for py in (0, 1) for px in (0, 1)],
                axis=1)  # (N, 4, (Hi+2)/2, (Wi+2)/2, Ci)
            x_spec = pl.BlockSpec(
                (g, 4, (hi + 2) // 2, (wi + 2) // 2, ci),
                lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM)
        else:
            x_spec = pl.BlockSpec((g, hi + 2, wi + 2, ci),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        w2 = wq.reshape(kh * kw * ci, co)  # tap-major rows
        kern = functools.partial(
            _conv_kernel_3x3, g=g, hi=hi, wi=wi, ci=ci, ho=ho, wo=wo,
            co=co, stride=stride, relu=relu, out_dtype=out_dtype,
            has_res=residual is not None,
        )
        in_specs = [
            x_spec,
            pl.BlockSpec((kh * kw * ci, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [xp, w2, scale2, bias2]
        if residual is not None:
            in_specs.append(
                pl.BlockSpec((g, ho, wo, co), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM))
            args += [residual,
                     jnp.asarray(res_scale, jnp.float32).reshape(1, 1)]
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(oinv2)
    else:
        assert pad == 0 and residual is None
        if stride == 2:  # pre-decimate: kernel only sees stride-1 (see doc)
            xq = xq[:, ::2, ::2, :]
        kern = functools.partial(
            _conv_kernel_1x1, g=g, hi=hi, wi=wi, ci=ci, ho=ho, wo=wo,
            co=co, stride=stride, relu=relu, out_dtype=out_dtype,
        )
        in_specs = [
            pl.BlockSpec((g, ho, wo, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        args = [xq, wq.reshape(ci, co), scale2, bias2, oinv2]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, ho, wo, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, co), out_dtype),
        interpret=interpret,
    )(*args)
    return out


def pallas_conv_int8_supported() -> bool:
    """True when the kernel may compile natively on this backend."""
    return jax.default_backend() == "tpu"
