"""Fused residual-block CHAIN kernels for the detector backbone (Pallas).

Round-4 post-mortem (VERDICT r4, docs/ROADMAP.md): per-layer Pallas conv
swaps measured -13% inside the scanned detect step despite winning their
isolated microbenches.  Root causes visible in ops/pallas_conv.py itself:

  * every ``pallas_call`` is an XLA fusion barrier -- the swapped layer's
    pad / phase-split / bias / activation neighbours stop fusing, and the
    layer's input+output round-trip HBM exactly as they did under XLA;
  * ``jnp.pad`` before each call materialises a full padded copy in HBM;
  * per-layer swaps re-do XLA's job (one conv at a time) with *less*
    pipelining -- they cannot reduce HBM traffic, which is the only lever
    XLA leaves on the table for this backbone.

This kernel is the structural fix: it fuses a chain of B consecutive
darknet residual blocks

    x -> conv1x1(Ci->Cm) -> act -> conv3x3(Cm->Ci, pad 1) -> act -> (+x)

with EVERY intermediate resident in VMEM.  Per chain invocation the HBM
traffic is: read x once, write the final block's output once, fetch the
weights once (constant index maps keep them resident across the batch
grid).  Under XLA (and under per-layer Pallas) the same span costs, per
block, a mid write+read and an extra x read for the shortcut -- for the
eight 52x52 blocks of darknet-53 at batch 8 that is ~180 MB of traffic
per scan step that this kernel simply deletes.  No XLA-side ``jnp.pad``
either: the 1x1 conv needs no halo and the 3x3 reads ``mid`` from a
padded VMEM scratch whose border is zeroed in-kernel.

Layout per program (grid = (N//G,) -- batch groups only):
    x_ref   (G, H, W, Ci)   bf16   resident input block
    bufs    2x scratch      bf16   ping-pong chain state (unpadded)
    mid_ref (G, H+2, W+2, Cm)      padded scratch (bf16, or int8 resident)
    out_ref (G, H, W, Ci)   bf16   final block output
Blocks unroll statically; row-chunks run under ``lax.fori_loop`` so the
Mosaic program stays small.  Each conv is (taps x) one MXU matmul over
(G*chunk*W, C) rows, f32 (bf16) or int32 (int8) accumulation.

int8 mode (W8A8, bf16 glue -- same scheme as ops/pallas_conv_int8.py and
the XLA twin in models/quantize_darknet.make_xla_int8_conv_impl): the
chain state stays bf16 (block boundaries are bit-comparable with the
per-layer twin), conv1 quantises its single tap load, and ``mid`` is
quantised ONCE when written to scratch -- fixing the per-layer int8
kernel's 9x re-quantisation (one per tap) -- so conv2's nine taps are
direct int8 loads.  Weights are int8 resident (half the VMEM), MACs run
at the MXU's 2x int8 rate.

Exactness: identical per-layer math to the XLA path at bf16 compute
dtype (conv f32-accumulate -> bias -> act -> bf16 cast -> ... -> bf16
shortcut add), sums reassociated within each conv -- tested to f32
tolerance in tests/test_pallas_resblock.py, plus an end-to-end
network_apply equality check through the block_impl hook.

Reference parity anchor: SURVEY.md section 2.3 module builder
(yolo3/models.py:~90-160 conv/shortcut stack); this file changes
scheduling and (optionally) MAC precision, never topology.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import _apply_act

_VMEM_BUDGET = 13 * 2**20  # conservative share of the 16 MB scoped stack
# int8 chains carry extra Mosaic temporaries the estimate cannot see
# (int8->f32 tap conversions + dequant copies, ~3 MB measured at the
# v3-416 52x52 stage: scoped stack hit 16.17 MB under the 13 MB budget);
# a lower budget makes the picker choose smaller tiles there.
_VMEM_BUDGET_INT8 = 10 * 2**20


def _chain_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
    nblk: int, g: int, h: int, w: int, ci: int, cm: int,
    act: str, chunk: int, int8_mode: bool,
):
    """One program: G frames through ``nblk`` fused residual blocks.

    bf16: w1_ref (nblk*Ci, Cm) bf16, w2_ref (nblk*9*Cm, Ci) bf16.
    int8: both int8, plus s1_ref (nblk, Cm), s2_ref (nblk, Ci) f32
    per-channel dequant scales and xinv_ref (nblk, 2) f32 SMEM input
    scales [1/xscale1, 1/xscale2] per block.
    b1_ref (nblk, Cm) f32, b2_ref (nblk, Ci) f32.
    Scratch: mid (G, H+2, W+2, Cm) bf16 (int8 in int8 mode).

    The chain state lives in ``out_ref`` itself -- no ping-pong buffers:
    conv1 consumes src fully into ``mid`` before conv2 starts, and conv2
    reads each src row-chunk (the shortcut) before overwriting it, so
    src == out_ref for blk > 0 is hazard-free. Chunk loops are STATIC
    Python unrolls: dynamic (traced) slice starts in the sublane
    dimension forced Mosaic relayouts on every tap read in the fori_loop
    version (-6.6%% aggregate, round-5 attribution)."""
    if int8_mode:
        s1_ref, s2_ref, xinv_ref, out_ref, mid_ref = rest
    else:
        out_ref, mid_ref = rest
    nchunk = h // chunk
    rows = g * chunk * w
    acc1_dt = jnp.int32 if int8_mode else jnp.float32

    # zero mid's halo border once (interior is overwritten every block)
    mid_ref[...] = jnp.zeros(mid_ref.shape, mid_ref.dtype)

    for blk in range(nblk):
        src = x_ref if blk == 0 else out_ref
        w1 = w1_ref[blk * ci:(blk + 1) * ci, :]
        b1 = b1_ref[blk, :]
        b2 = b2_ref[blk, :]
        if int8_mode:
            s1 = s1_ref[blk, :]
            s2 = s2_ref[blk, :]
            xi1 = xinv_ref[blk, 0]
            xi2 = xinv_ref[blk, 1]

        # conv1x1 Ci->Cm into mid's interior (quantised once in int8 mode)
        for c in range(nchunk):
            r0 = c * chunk
            tap = src[:, r0:r0 + chunk, :, :].reshape(rows, ci)
            if int8_mode:
                tap = jnp.clip(
                    jnp.round(tap.astype(jnp.float32) * xi1),
                    -127, 127).astype(jnp.int8)
            m = jax.lax.dot_general(
                tap, w1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc1_dt,
            ).astype(jnp.float32)
            if int8_mode:
                m = m * s1
            m = _apply_act(m + b1, act).astype(jnp.bfloat16)
            if int8_mode:
                # quantise ONCE at the write (per-layer kernel pays 9x)
                m = jnp.clip(
                    jnp.round(m.astype(jnp.float32) * xi2),
                    -127, 127).astype(jnp.int8)
            mid_ref[:, 1 + r0:1 + r0 + chunk, 1:1 + w, :] = (
                m.reshape(g, chunk, w, cm))

        # conv3x3 Cm->Ci (9 shifted matmuls) + bias + act + shortcut
        for c in range(nchunk):
            r0 = c * chunk
            acc = jnp.zeros((rows, ci), acc1_dt)
            for dy in range(3):
                for dx in range(3):
                    tap = mid_ref[:, r0 + dy:r0 + dy + chunk,
                                  dx:dx + w, :].reshape(rows, cm)
                    if not int8_mode:
                        tap = tap.astype(jnp.bfloat16)
                    wk = w2_ref[(blk * 9 + dy * 3 + dx) * cm:
                                (blk * 9 + dy * 3 + dx + 1) * cm, :]
                    acc = acc + jax.lax.dot_general(
                        tap, wk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=acc1_dt,
                    )
            y = acc.astype(jnp.float32)
            if int8_mode:
                y = y * s2
            y = _apply_act(y + b2, act).astype(jnp.bfloat16)
            sc = src[:, r0:r0 + chunk, :, :].reshape(rows, ci)
            out_ref[:, r0:r0 + chunk, :, :] = (
                (y + sc).reshape(g, chunk, w, ci))


def _chain_vmem_bytes(nblk: int, g: int, h: int, w: int, ci: int, cm: int,
                      chunk: int, int8_mode: bool) -> int:
    """Conservative per-program VMEM estimate for the picker (state lives
    in out_ref; x/out double-buffered by the grid pipeline)."""
    wb = 1 if int8_mode else 2
    mb = 1 if int8_mode else 2
    weights = nblk * (ci * cm + 9 * cm * ci) * wb
    x_blk = 2 * g * h * w * ci * 2
    out = 2 * g * h * w * ci * 2
    mid = g * (h + 2) * (w + 2) * cm * mb
    rows = g * chunk * w
    acc = rows * ci * 4
    taps = 2 * rows * max(ci, cm) * 2     # ~2 live tap copies
    return weights + x_blk + out + mid + acc + taps


_MAX_UNROLL = 8  # chunk loops unroll statically; bound the program size
# blocks x row-chunks per call: every tile unrolls to ~10 static dots and
# Mosaic compile time grows ~quadratically in program size (measured on
# chip: 10 dots 1.4s, 60 dots 20s, 320 dots 1075s for the v3-416 52x52
# stage).  8 tiles ~= 80 dots keeps each call ~30s while still fusing
# 4-block chains at 52x52 / 3-block at 26x26.
_MAX_CALL_TILES = 8


def plan_chain_schedule(n: int, h: int, w: int, ci: int, cm: int,
                        nblk: int, int8_mode: bool,
                        budget: int | None = None):
    """Pick (g frames/program, blocks/kernel-call, row chunk) under the
    VMEM budget and the Mosaic program-size bound.

    Prefers longer chains (more resident reuse), then larger g, then the
    LARGEST chunk (fewest, biggest matmuls; all slice offsets static).
    Returns (g, per_call_nblks, chunk) where per_call_nblks sums to nblk,
    or None when nothing fits (caller falls back to XLA)."""
    if budget is None:
        budget = _VMEM_BUDGET_INT8 if int8_mode else _VMEM_BUDGET
    divisors = [d for d in range(1, h + 1)
                if h % d == 0 and h // d <= _MAX_UNROLL]
    best = None
    for g in (8, 4, 2, 1):
        if n % g:
            continue
        for b in range(nblk, 0, -1):
            fit = None
            for chunk in sorted(divisors, reverse=True):
                if b * (h // chunk) > _MAX_CALL_TILES:
                    break  # smaller chunks only add tiles
                if _chain_vmem_bytes(b, g, h, w, ci, cm, chunk,
                                     int8_mode) <= budget:
                    fit = chunk
                    break
            if fit is None:
                continue
            ncalls = -(-nblk // b)
            key = (ncalls, -g, -fit)
            if best is None or key < best[0]:
                best = (key, g, b, fit)
            break  # longer b already preferred; smaller b only if no fit
    if best is None:
        return None
    _, g, max_b, chunk = best
    per_call = []
    left = nblk
    while left:
        take = min(max_b, left)
        per_call.append(take)
        left -= take
    return g, per_call, chunk


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def resblock_chain_bf16(
    x: jnp.ndarray,       # (N, H, W, Ci) bf16
    w1: jnp.ndarray,      # (B, Ci, Cm) bf16
    b1: jnp.ndarray,      # (B, Cm) f32
    w2: jnp.ndarray,      # (B, 3, 3, Cm, Ci) bf16 HWIO per block
    b2: jnp.ndarray,      # (B, Ci) f32
    *,
    act: str = "leaky",
    interpret: bool = False,
) -> jnp.ndarray:
    """B fused residual blocks, bf16 MACs / f32 accumulation; bf16 NHWC
    out.  Drop-in for conv1x1+act -> conv3x3+act -> shortcut spans."""
    return _resblock_chain(x, w1, b1, w2, b2, None, None, None,
                           act=act, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def resblock_chain_int8(
    x: jnp.ndarray,       # (N, H, W, Ci) bf16
    w1q: jnp.ndarray,     # (B, Ci, Cm) int8
    b1: jnp.ndarray,      # (B, Cm) f32
    w2q: jnp.ndarray,     # (B, 3, 3, Cm, Ci) int8
    b2: jnp.ndarray,      # (B, Ci) f32
    scale1: jnp.ndarray,  # (B, Cm) f32 = xscale1*wscale1 per channel
    scale2: jnp.ndarray,  # (B, Ci) f32
    xinv: jnp.ndarray,    # (B, 2)  f32 = [1/xscale1, 1/xscale2]
    *,
    act: str = "leaky",
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 fused residual blocks (bf16 chain state, int8-resident mid).
    Per-block semantics == models/quantize_darknet.make_xla_int8_conv_impl
    applied to both convs + the bf16 shortcut add."""
    return _resblock_chain(x, w1q, b1, w2q, b2, scale1, scale2, xinv,
                           act=act, interpret=interpret)


def _resblock_chain(x, w1, b1, w2, b2, scale1, scale2, xinv, *,
                    act, interpret):
    n, h, w, ci = x.shape
    nblk, wci, cm = w1.shape
    assert wci == ci and w2.shape == (nblk, 3, 3, cm, ci), (w1.shape,
                                                            w2.shape)
    int8_mode = scale1 is not None

    sched = plan_chain_schedule(n, h, w, ci, cm, nblk, int8_mode)
    assert sched is not None, "caller must gate on plan_chain_schedule"
    g, per_call, chunk = sched

    out = x.astype(jnp.bfloat16)
    b0 = 0
    for nb in per_call:
        sl = slice(b0, b0 + nb)
        out = _chain_call(
            out, w1[sl], b1[sl], w2[sl], b2[sl],
            None if scale1 is None else scale1[sl],
            None if scale2 is None else scale2[sl],
            None if xinv is None else xinv[sl],
            g=g, chunk=chunk, act=act, interpret=interpret)
        b0 += nb
    return out


def _chain_call(x, w1, b1, w2, b2, scale1, scale2, xinv, *,
                g, chunk, act, interpret):
    n, h, w, ci = x.shape
    nblk, _, cm = w1.shape
    int8_mode = scale1 is not None
    wdt = jnp.int8 if int8_mode else jnp.bfloat16

    # tap-major flat weight layouts (resident via constant index maps)
    w1f = w1.astype(wdt).reshape(nblk * ci, cm)
    w2f = jnp.transpose(w2.astype(wdt), (0, 1, 2, 3, 4)).reshape(
        nblk * 9 * cm, ci)
    b1f = b1.astype(jnp.float32)
    b2f = b2.astype(jnp.float32)

    kern = functools.partial(
        _chain_kernel, nblk=nblk, g=g, h=h, w=w, ci=ci, cm=cm,
        act=act, chunk=chunk, int8_mode=int8_mode,
    )
    const = lambda i: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((g, h, w, ci), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk * ci, cm), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, cm), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk * 9 * cm, ci), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, ci), const, memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16), w1f, b1f, w2f, b2f]
    if int8_mode:
        in_specs += [
            pl.BlockSpec((nblk, cm), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, ci), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 2), const, memory_space=pltpu.SMEM),
        ]
        args += [scale1.astype(jnp.float32), scale2.astype(jnp.float32),
                 xinv.astype(jnp.float32)]

    mid_dt = jnp.int8 if int8_mode else jnp.bfloat16
    return pl.pallas_call(
        kern,
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, h, w, ci), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, ci), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((g, h + 2, w + 2, cm), mid_dt),
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# span discovery + network_apply hook


def find_residual_spans(plan, max_hw: int = 64,
                        min_ci: int = 128) -> List[Tuple[int, ...]]:
    """Fusable residual-block chains in a NetworkPlan.

    A span starts at module index i when defs[i..i+2] is the darknet
    residual pattern -- conv1x1(s1) -> conv3x3(s1, pad1, same act) ->
    shortcut(from=-3, linear) -- and NOTHING outside the span references
    the two intermediate conv outputs.  Consecutive spans with identical
    (Ci, Cm, act) merge into chains.  Returns a list of chains, each a
    tuple of span-start indices.

    Spatial geometry (<= max_hw) is checked by the impl at call time
    (the plan does not know layer resolutions); channel minima here.
    """
    defs = plan.defs()

    def _res(ref, cur):
        return ref if ref >= 0 else cur + ref

    # external reference map: which module indices consume layer L's
    # output through route/shortcut (successor `prev` flow not counted)
    refs: Dict[int, List[int]] = {}
    for i, d in enumerate(defs):
        if d["type"] == "route":
            for l in str(d["layers"]).split(","):
                refs.setdefault(_res(int(l), i), []).append(i)
        elif d["type"] == "shortcut":
            refs.setdefault(_res(int(d["from"]), i), []).append(i)
            refs.setdefault(i - 1, []).append(i)

    spans = []
    i = 0
    while i + 2 < len(defs):
        d0, d1, d2 = defs[i], defs[i + 1], defs[i + 2]
        ok = (
            d0["type"] == "convolutional"
            and int(d0["size"]) == 1 and int(d0.get("stride", 1)) == 1
            and d0.get("activation") in ("leaky", "mish")
            and d1["type"] == "convolutional"
            and int(d1["size"]) == 3 and int(d1.get("stride", 1)) == 1
            and int(d1.get("pad", 0)) == 1
            and d1.get("activation") == d0.get("activation")
            and d2["type"] == "shortcut"
            and _res(int(d2["from"]), i + 2) == i - 1
            and d2.get("activation", "linear") in ("linear", "")
            # intermediates referenced ONLY by this span's own shortcut
            and refs.get(i, []) == []
            and refs.get(i + 1, []) == [i + 2]
        )
        if ok:
            spans.append(i)
            i += 3
        else:
            i += 1

    # merge consecutive spans into chains (same act; channel equality is
    # implied by the shortcut topology and checked at call time)
    chains: List[Tuple[int, ...]] = []
    for s in spans:
        if (chains and chains[-1][-1] + 3 == s
                and defs[chains[-1][-1]].get("activation")
                == defs[s].get("activation")):
            chains[-1] = chains[-1] + (s,)
        else:
            chains.append((s,))
    return chains


def make_resblock_impl(plan, *, int8_pkg=None, max_hw: int = 64,
                       min_ci: int = 128, interpret: bool = False,
                       chain_whitelist=None):
    """``block_impl`` hook for models.darknet.network_apply.

    At module index i, returns ``(out, consumed)`` when i starts a fusable
    chain whose geometry fits the VMEM schedule, else None (XLA / per-layer
    path).  Weights come from the ``params`` network_apply passes at call
    time (traced jit args in the serving steps -- the factory must not
    close over them).  ``int8_pkg``
    (models.quantize_darknet.quantize_darknet_convs) switches a chain to
    W8A8 when it packages BOTH convs of every block in the chain.
    ``chain_whitelist`` optionally restricts fusion to chains whose start
    index is listed (for per-chain A/B attribution)."""
    chains = {c[0]: c for c in find_residual_spans(plan, max_hw=max_hw,
                                                   min_ci=min_ci)}
    if chain_whitelist is not None:
        chains = {s: c for s, c in chains.items() if s in chain_whitelist}
    defs = plan.defs()

    def impl(x, params, i):
        chain = chains.get(i)
        if chain is None:
            return None
        h, w, ci = int(x.shape[1]), int(x.shape[2]), int(x.shape[3])
        cm = int(params[i]["w"].shape[3])
        if max(h, w) > max_hw or ci < min_ci or cm < min_ci:
            return None
        if ci % 128 or cm % 128:
            return None
        act = defs[i].get("activation")
        use_int8 = int8_pkg is not None and all(
            s in int8_pkg and s + 1 in int8_pkg for s in chain)
        if plan_chain_schedule(int(x.shape[0]), h, w, ci, cm, len(chain),
                               use_int8) is None:
            return None
        if use_int8:
            w1 = jnp.stack([jnp.asarray(int8_pkg[s]["wq"]).reshape(ci, cm)
                            for s in chain])
            w2 = jnp.stack([jnp.asarray(int8_pkg[s + 1]["wq"])
                            for s in chain])
            b1 = jnp.stack([jnp.asarray(int8_pkg[s]["b"]) for s in chain])
            b2 = jnp.stack([jnp.asarray(int8_pkg[s + 1]["b"])
                            for s in chain])
            s1 = jnp.stack([jnp.asarray(int8_pkg[s]["scale"])
                            for s in chain])
            s2 = jnp.stack([jnp.asarray(int8_pkg[s + 1]["scale"])
                            for s in chain])
            xinv = jnp.stack([
                jnp.asarray([int8_pkg[s]["xinv"], int8_pkg[s + 1]["xinv"]])
                for s in chain])
            out = resblock_chain_int8(
                x.astype(jnp.bfloat16), w1, b1, w2, b2, s1, s2, xinv,
                act=act, interpret=interpret)
        else:
            w1 = jnp.stack([jnp.asarray(params[s]["w"],
                                        jnp.bfloat16).reshape(ci, cm)
                            for s in chain])
            w2 = jnp.stack([jnp.asarray(params[s + 1]["w"], jnp.bfloat16)
                            for s in chain])
            b1 = jnp.stack([jnp.asarray(params[s]["b"], jnp.float32)
                            for s in chain])
            b2 = jnp.stack([jnp.asarray(params[s + 1]["b"], jnp.float32)
                            for s in chain])
            out = resblock_chain_bf16(
                x.astype(jnp.bfloat16), w1, b1, w2, b2,
                act=act, interpret=interpret)
        consumed = chain[-1] + 3 - i
        return out, consumed

    return impl
