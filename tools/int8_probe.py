"""Capability probe: is int8 matmul actually faster than bf16 on this chip?

Decides docs/ROADMAP.md lever 2 before any conv-kernel work: if neither
the XLA int8 dot nor a Pallas int8 tiled matmul beats the equivalent bf16
matmul on MXU-shaped GEMMs, the int8 conv lever is dead on this stack and
gets recorded as a measured negative (round-1 already measured XLA int8
CONV at 0.61x bf16; this isolates the matmul unit itself).

GEMM shapes mirror the ReID embed's implicit-GEMM decomposition at the
serving batch (576 crops): (M=B*H*W, K=Cin, N=Cout) per 3x3 tap.

Timing: chained-readback loop (block_until_ready lies through the axon
tunnel -- memory: tpu-bench-discipline), each variant in its own jit
graph; this is a CAPABILITY probe, not a serving-path attribution.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_ms(fn, x, iters, inner):
    """Per-matmul ms with the work INSIDE the graph: fn runs `inner`
    data-chained matmuls per dispatch, so per-dispatch tunnel overhead
    (~15-25 ms -- it swamped the first version of this probe, which
    'measured' 0.2 TOPS on a 197-TFLOPs part) amortizes away."""
    out = fn(x)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out if out.shape == x.shape and out.dtype == x.dtype else x)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / (iters * inner) * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=32768)
    p.add_argument("--k", type=int, default=256)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--inner", type=int, default=50,
                   help="data-chained matmuls per dispatch")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k, n = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    inner = args.inner

    @jax.jit
    def xla_bf16(x):
        def body(_, v):
            o = jnp.dot(v, wb, preferred_element_type=jnp.float32)
            return o.astype(jnp.bfloat16)[:, : v.shape[1]]
        return jax.lax.fori_loop(0, inner, body, x)

    @jax.jit
    def xla_int8(x):
        def body(_, v):
            o = jnp.dot(v, wi, preferred_element_type=jnp.int32)
            # renormalize back to int8 range so chaining keeps int8 inputs
            return jnp.clip(o // (8 * k), -127, 127).astype(jnp.int8)[
                :, : v.shape[1]]
        return jax.lax.fori_loop(0, inner, body, x)

    # Pallas tiled matmuls: grid over M tiles, full K and N resident
    def pl_kernel(x_ref, w_ref, o_ref, acc_dtype, out_dtype, shift):
        accum = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=acc_dtype)
        if shift:
            accum = jnp.clip(accum // (8 * k), -127, 127)
        o_ref[:] = accum.astype(out_dtype)

    def make_pallas(in_dtype, acc_dtype, out_dtype, shift, tm):
        kern = functools.partial(pl_kernel, acc_dtype=acc_dtype,
                                 out_dtype=out_dtype, shift=shift)
        call = pl.pallas_call(
            kern,
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((tm, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        )

        @jax.jit
        def fn(x):
            w = wi if in_dtype == jnp.int8 else wb

            def body(_, v):
                return call(v, w)[:, : v.shape[1]]

            return jax.lax.fori_loop(0, inner, body, x)

        return fn

    pallas_bf16 = make_pallas(jnp.bfloat16, jnp.float32, jnp.bfloat16,
                              False, 512)
    pallas_int8 = make_pallas(jnp.int8, jnp.int32, jnp.int8, True, 512)

    flops = 2.0 * m * k * n
    rec = {"probe": "int8-matmul", "m": m, "k": k, "n": n}
    for name, fn, x in [
        ("xla_bf16", xla_bf16, xb),
        ("xla_int8", xla_int8, xi),
        ("pallas_bf16", pallas_bf16, xb),
        ("pallas_int8", pallas_int8, xi),
    ]:
        try:
            ms = chained_ms(fn, x, args.iters, args.inner)
            rec[name + "_ms"] = round(ms, 3)
            rec[name + "_tops"] = round(flops / (ms / 1e3) / 1e12, 1)
        except Exception as e:  # noqa: BLE001 -- capability probe
            rec[name + "_ms"] = None
            rec[name + "_err"] = str(e).splitlines()[0][:160]
    if rec.get("xla_bf16_ms") and rec.get("pallas_int8_ms"):
        rec["int8_speedup_vs_bf16"] = round(
            rec["xla_bf16_ms"]
            / min(x for x in [rec.get("pallas_int8_ms"),
                              rec.get("xla_int8_ms") or 1e9] if x), 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
