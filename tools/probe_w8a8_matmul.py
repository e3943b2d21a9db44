"""Probe: is the int8 MXU path worth a w4a8/w8a8 expert FFN?

The int4 B=88 decode step is COMPUTE-bound (docs/ROOFLINE.md: the expert
fusions run at 148-173 TFLOP/s bf16, 64% of device time, ~6.8 ms/step of
irreducible MXU work).  v5e-class MXUs rate int8 at 2x bf16 throughput
(394 TOPS vs 197 TFLOPS); if XLA lowers s8xs8->s32 einsums to that path,
quantizing ACTIVATIONS per-row to int8 (weights are already s4/s8) could
halve the dominant term of the step.

Measures, at the bench's decode expert shape (E=8, C=112 slots after CFG,
D=2048, F=2816) and a training-ish shape (C=1024):

  bf16        x_bf16 @ w_bf16                         (reference ceiling)
  w8-fused    x_bf16 @ w_s8.astype(bf16) * s          (today's int8 path)
  w4-fused    x_bf16 @ w_s4.astype(bf16) * s          (today's int4 path)
  s8s8        x_s8 @ w_s8 -> s32                      (raw int8 MXU rate)
  s4s8        x_s8 @ w_s4.astype(s8) -> s32           (w4a8 weight read)
  w4a8-ffn    full SwiGLU FFN with in-jit per-row act quant + rescale
  bf16-ffn    full SwiGLU FFN in bf16 (today's compute)

Prints one JSON line per case with ms and TFLOP/s (or TOP/s for int ops).
Decision rule: adopt w4a8 only if w4a8-ffn beats bf16-ffn by >=1.3x AND
the numerics probe (tools/probe_int4_numerics.py pattern) clears the
quality bar.  Run on the real chip; --tiny smoke-checks shapes on CPU.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

TINY = "--tiny" in sys.argv
ITERS = 64  # 8 iters left sub-ms cases under the ~30 ms tunnel fetch floor
if TINY:
    jax.config.update("jax_platforms", "cpu")
    ITERS = 4

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from unimoe_audio_tpu.utils.profiling import timeit_in_jit  # noqa: E402
from unimoe_audio_tpu.ops.quant import _to_packed_int4  # noqa: E402

E, C, D, F = (2, 16, 64, 128) if TINY else (8, 112, 2048, 2816)
CASES_C = [C] if TINY else [C, 1024]

key = jax.random.PRNGKey(0)
kx, kw = jax.random.split(key)
w = jax.random.normal(kw, (E, D, F), jnp.float32) * 0.02
s_w = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
w_s8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
s_w4 = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 7.0
w_s4_vals = jnp.clip(jnp.round(w / s_w4), -7, 7).astype(jnp.int8)
w_s4 = _to_packed_int4(w_s4_vals, w_s4_vals)
w_bf = w.astype(jnp.bfloat16)


def report(tag, c, ms, flops):
    print(json.dumps({"case": tag, "C": c, "ms": round(ms * 1e3, 3),
                      "tflops": round(flops / max(ms, 1e-9) / 1e12, 1)}),
          flush=True)


def act_quant(x):
    """Per-row symmetric int8 activation quant: [E, C, D] -> (s8, scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                    ).astype(jnp.int8), s


for c in CASES_C:
    x = (jax.random.normal(kx, (E, c, D), jnp.float32)).astype(jnp.bfloat16)
    flops = 2.0 * E * c * D * F

    ms = timeit_in_jit(lambda a, b: jnp.einsum("ecd,edf->ecf", a, b),
                       x, w_bf, iters=ITERS)
    report("bf16", c, ms, flops)

    ms = timeit_in_jit(
        lambda a, b, s: jnp.einsum("ecd,edf->ecf", a, b.astype(a.dtype))
        * s.astype(a.dtype), x, w_s8, s_w, iters=ITERS)
    report("w8-fused", c, ms, flops)

    ms = timeit_in_jit(
        lambda a, b, s: jnp.einsum("ecd,edf->ecf", a, b.astype(a.dtype))
        * s.astype(a.dtype), x, w_s4, s_w4, iters=ITERS)
    report("w4-fused", c, ms, flops)

    # int cases quantize the (floating, hence loop-perturbed) activation
    # INSIDE the timed fn: all-int inputs would defeat timeit_in_jit's
    # data dependence and XLA hoists the body out of the loop.
    def s8dot(a, b):
        q, s = act_quant(a)
        y = jnp.einsum("ecd,edf->ecf", q, b,
                       preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * s * 1e-6

    ms = timeit_in_jit(s8dot, x, w_s8, iters=ITERS)
    report("a8+s8s8", c, ms, flops)

    ms = timeit_in_jit(lambda a, b: s8dot(a, b.astype(jnp.int8)), x, w_s4,
                       iters=ITERS)
    report("a8+s4s8", c, ms, flops)

    # --- full FFNs ------------------------------------------------------
    ffn_flops = 2.0 * E * c * D * F * 3  # gate + up + down (down: F->D)

    w_dn_bf = jnp.swapaxes(w_bf, -1, -2)  # [E, F, D] stand-in down proj
    w_dn_s4 = _to_packed_int4(jnp.swapaxes(w_s4_vals, -1, -2),
                              w_s4_vals)
    s_dn4 = jnp.max(jnp.abs(jnp.swapaxes(w, -1, -2)), axis=-2,
                    keepdims=True) / 7.0

    def ffn_bf16(a, wg, wu, wd):
        g = jnp.einsum("ecd,edf->ecf", a, wg)
        u = jnp.einsum("ecd,edf->ecf", a, wu)
        h = jax.nn.silu(g) * u
        return jnp.einsum("ecf,efd->ecd", h, wd)

    ms = timeit_in_jit(ffn_bf16, x, w_bf, w_bf, w_dn_bf, iters=ITERS)
    report("bf16-ffn", c, ms, ffn_flops)

    def ffn_w4a16(a, wg, wu, wd, sg, su, sd):
        g = jnp.einsum("ecd,edf->ecf", a, wg.astype(a.dtype)) * sg.astype(a.dtype)
        u = jnp.einsum("ecd,edf->ecf", a, wu.astype(a.dtype)) * su.astype(a.dtype)
        h = jax.nn.silu(g) * u
        return jnp.einsum("ecf,efd->ecd", h, wd.astype(a.dtype)) * sd.astype(a.dtype)

    ms = timeit_in_jit(ffn_w4a16, x, w_s4, w_s4, w_dn_s4, s_w4, s_w4, s_dn4,
                       iters=ITERS)
    report("w4a16-ffn", c, ms, ffn_flops)

    def ffn_w4a8(a, wg, wu, wd, sg, su, sd):
        q, s = act_quant(a)
        g = jnp.einsum("ecd,edf->ecf", q, wg.astype(jnp.int8),
                       preferred_element_type=jnp.int32)
        u = jnp.einsum("ecd,edf->ecf", q, wu.astype(jnp.int8),
                       preferred_element_type=jnp.int32)
        g = g.astype(jnp.float32) * (s * sg.astype(jnp.float32))
        u = u.astype(jnp.float32) * (s * su.astype(jnp.float32))
        h = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        hq, hs = act_quant(h)
        y = jnp.einsum("ecf,efd->ecd", hq, wd.astype(jnp.int8),
                       preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (hs * sd.astype(jnp.float32))
                ).astype(jnp.bfloat16)

    ms = timeit_in_jit(ffn_w4a8, x, w_s4, w_s4, w_dn_s4, s_w4, s_w4, s_dn4,
                       iters=ITERS)
    report("w4a8-ffn", c, ms, ffn_flops)

print(json.dumps({"probe": "w8a8_matmul", "done": True}), flush=True)
