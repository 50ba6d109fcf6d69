"""Fused phasor+GEMM Pallas engine for the frequency-domain simulator.

The XLA engine (:func:`qups_tpu.ops.greens_freq._freq_gemm`) is bound by
HBM traffic, not FLOPs: the (S, N)/(S, M) complex phasor recurrences are
scan carries and the (B, S, N) GEMM stacks are materialized, so at S=1e5
x 128x128 elements it reaches ~3 TF effective (measured 18.8 s for the
full-band case). This kernel keeps a scatterer chunk's phasors entirely
in VMEM/registers: per grid step it re-initializes the chunk's rx/tx
phasors from sin/cos, extends them over a small bin block with the
multiplicative recurrence, and contracts each bin with four MXU dots.
HBM traffic collapses to streaming the (S, N)/(S, M) geometry once per
bin block plus one write of the (F, N, M) spectrum.

Same math as the reference greens (``/root/reference/src/greens.cu:8-122``)
in the frequency domain:

    G_k[n, m] = sum_s (w1 e^{-i th_k r1})[s, n] (w2 e^{-i th_k r2})[s, m]

with th_k = 2 pi k cinv fs / L. Wrap-free L and the kernel-spectrum band
come from :func:`greens_freq._host_plan`, shared with the XLA engine.

Phase accuracy: angles are built as ``2 pi frac(k * q)`` with
``q = cinv fs r / L  (< 1)``, so the f32 rounding error stays ~1e-4 rad
even at bin 4096 — the recurrence runs at most FB bins from an exact
re-init, so there is no long-chain drift (the XLA engine's recurrence
spans the whole band).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _kernel(q1_ref, w1_ref, q2_ref, w2_ref, out_ref, *, FB: int, k0: int,
            bf16: bool):
    """Grid (nF, nS) — bin blocks OUTER, scatterer chunks INNER so each
    (FB, 2, N, M) spectrum block accumulates in VMEM across the chunk
    sweep. Per step: re-init the chunk phasors at bin kb = k0 + fb*FB
    (4 transcendentals / element), then FB x (recurrence + 4 MXU dots).

    The rx side is stored TRANSPOSED (N, SC) so every dot is the
    canonical (m, k) x (k, n) form — contracting dim 0 of the lhs makes
    Mosaic materialize a per-dot transpose copy."""
    fb = pl.program_id(0)
    s = pl.program_id(1)
    kb = (k0 + fb * FB).astype(jnp.float32)

    q1 = q1_ref[:]  # (N, SC) r1 * cinv * fs / L  in [0, 1)
    w1 = w1_ref[:]
    q2 = q2_ref[:]  # (SC, M)
    w2 = w2_ref[:]

    def init(q, w):
        u = kb * q
        th = (u - jnp.floor(u)) * _TWO_PI
        return w * jnp.cos(th), -w * jnp.sin(th)

    def step_phasor(q):
        th = q * _TWO_PI
        return jnp.cos(th), -jnp.sin(th)

    e1r, e1i = init(q1, w1)
    e2r, e2i = init(q2, w2)
    d1r, d1i = step_phasor(q1)
    d2r, d2i = step_phasor(q2)

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    cdims = (((1,), (0,)), ((), ()))  # (N, SC) x (SC, M) -> (N, M)

    def dot(a, b):
        if bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, cdims, preferred_element_type=jnp.float32,
            precision=(None if bf16 else jax.lax.Precision.HIGHEST))

    for j in range(FB):
        xr = dot(e1r, e2r) - dot(e1i, e2i)
        xi = dot(e1r, e2i) + dot(e1i, e2r)
        out_ref[j, 0] += xr
        out_ref[j, 1] += xi
        if j < FB - 1:  # extend the recurrence to the next bin
            e1r, e1i = (e1r * d1r - e1i * d1i, e1r * d1i + e1i * d1r)
            e2r, e2i = (e2r * d2r - e2i * d2i, e2r * d2i + e2i * d2r)


@functools.partial(jax.jit, static_argnames=("R0", "fsr"))
def _prologue(phc_over_2pi, ps, amp, pn, pv, *, R0: float, fsr: float):
    """Device-side geometry pass -> (q1, w1) (S, N), (q2, w2) (S, M):
    normalized phase slopes q = cinv fs r / L (in [0, 1) by the wrap-free
    choice of L) and amplitude-folded 1/r weights."""
    def geom(pe):  # (E, 3) -> (S, E)
        d = ps[:, None, :] - pe[None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1))

    r1 = geom(pn).T  # rx side transposed (N, S) — canonical dot layout
    r2 = geom(pv)
    w1 = 1.0 / jnp.maximum(r1, R0) if R0 > 0 else jnp.ones_like(r1)
    w2 = (amp.astype(jnp.float32) / fsr)[:, None] * (
        1.0 / jnp.maximum(r2, R0) if R0 > 0 else jnp.ones_like(r2))
    return phc_over_2pi * r1, w1, phc_over_2pi * r2, w2


@functools.partial(jax.jit, static_argnames=("F", "FB", "SC", "k0", "bf16",
                                             "interpret"))
def _gf_call(q1, w1, q2, w2, *, F: int, FB: int, SC: int, k0: int,
             bf16: bool, interpret: bool = False):
    """pallas_call wrapper: pads S/N/M/F to tile multiples and crops the
    result to (F, N, M, 2)."""
    N, S = q1.shape  # rx side transposed (N, S)
    M = q2.shape[1]
    Sp = -(-S // SC) * SC
    Np = -(-N // 8) * 8
    Mp = -(-M // 128) * 128
    nF = -(-F // FB)

    def pad2(a, d0, d1):
        return jnp.pad(a, ((0, d0 - a.shape[0]), (0, d1 - a.shape[1])))

    # zero weights make padded scatterers/elements inert
    q1p, w1p = pad2(q1, Np, Sp), pad2(w1, Np, Sp)
    q2p, w2p = pad2(q2, Sp, Mp), pad2(w2, Sp, Mp)

    grid = (nF, Sp // SC)
    out = pl.pallas_call(
        functools.partial(_kernel, FB=FB, k0=k0, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, SC), lambda fb, s: (0, s)),
            pl.BlockSpec((Np, SC), lambda fb, s: (0, s)),
            pl.BlockSpec((SC, Mp), lambda fb, s: (s, 0)),
            pl.BlockSpec((SC, Mp), lambda fb, s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((FB, 2, Np, Mp), lambda fb, s: (fb, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nF * FB, 2, Np, Mp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(q1p, w1p, q2p, w2p)
    # (nF*FB, 2, Np, Mp) -> (F, N, M, 2)
    return jnp.moveaxis(out[:F, :, :N, :M], 1, -1)


def freq_gemm_pallas(phc, ps, amp, pn, pv, *, L: int, k0: int, F: int,
                     R0: float, fsr: float, precision: str = "highest",
                     B: int = 8, SC: int = 512, interpret: bool = False):
    """Drop-in replacement for :func:`greens_freq._freq_gemm` (same
    signature modulo the tiling knobs; ``B`` is accepted and ignored).
    Requires single sub-element geometry — callers fall back to the XLA
    engine for ``En/Em > 1``. ``precision='bf16'`` runs the MXU dots on
    bf16 phasors with f32 accumulation (~4x dot rate, ~0.2% rel err);
    here the cast is VMEM-resident so, unlike the XLA engine, it costs
    nothing in HBM traffic.
    """
    pn = jnp.asarray(pn, jnp.float32)
    pv = jnp.asarray(pv, jnp.float32)
    if pn.ndim == 3:
        assert pn.shape[1] == 1, "freq_gemm_pallas: single sub-element only"
        pn = pn[:, 0]
    if pv.ndim == 3:
        assert pv.shape[1] == 1, "freq_gemm_pallas: single sub-element only"
        pv = pv[:, 0]
    q1, w1, q2, w2 = _prologue(
        jnp.asarray(phc, jnp.float32) / jnp.float32(_TWO_PI),
        jnp.asarray(ps, jnp.float32), jnp.asarray(amp, jnp.float32),
        pn, pv, R0=float(R0), fsr=float(fsr))
    import os
    SC = int(os.environ.get("QUPS_GF_SC", SC))  # perf-sweep knob
    S = q1.shape[1]  # rx side is (N, S)
    SC = min(SC, -(-S // 128) * 128)  # lane dim of the (N, SC) blocks
    # bin-block size from the VMEM budget for the (FB, 2, Np, Mp) block
    Np = -(-q1.shape[0] // 8) * 8
    Mp = -(-q2.shape[1] // 128) * 128
    FB = int(max(1, min(32, (4 * 2**20) // (2 * Np * Mp * 4))))
    return _gf_call(q1, w1, q2, w2, F=F, FB=FB, SC=SC, k0=k0,
                    bf16=(precision == "bf16"), interpret=interpret)
