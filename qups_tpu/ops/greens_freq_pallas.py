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


def _kernel(*refs, FB: int, k0: int, bf16: bool, has_dir: bool = False,
            att_q: float = 0.0):
    """Grid (nF, nS) — bin blocks OUTER, scatterer chunks INNER so each
    (FB, 2, N, M) spectrum block accumulates in VMEM across the chunk
    sweep. Per step: re-init the chunk phasors at bin kb = k0 + fb*FB
    (4 transcendentals / element), then FB x (recurrence + 4 MXU dots).

    The rx side is stored TRANSPOSED (N, SC) so every dot is the
    canonical (m, k) x (k, n) form — contracting dim 0 of the lhs makes
    Mosaic materialize a per-dot transpose copy.

    ``has_dir``: two extra operands s1 (N, SC) / s2 (SC, M) of per-unit-
    bin sinc slopes; each bin applies the rectangular-element directivity
    ``sinc(s * k)`` to the dot inputs (the simus/MUST analog — the sinc
    has no multiplicative recurrence, so it is evaluated per bin)."""
    if has_dir:
        q1_ref, w1_ref, s1_ref, q2_ref, w2_ref, s2_ref, out_ref = refs
    else:
        q1_ref, w1_ref, q2_ref, w2_ref, out_ref = refs
        s1_ref = s2_ref = None
    fb = pl.program_id(0)
    s = pl.program_id(1)
    kb = (k0 + fb * FB).astype(jnp.float32)

    q1 = q1_ref[:]  # (N, SC) r1 * cinv * fs / L  in [0, 1)
    w1 = w1_ref[:]
    q2 = q2_ref[:]  # (SC, M)
    w2 = w2_ref[:]
    s1 = s1_ref[:] if has_dir else None
    s2 = s2_ref[:] if has_dir else None

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
    if att_q:
        # frequency-linear attenuation exp(-a(f) r): per-bin decay
        # exp(-att_q q) rides the SAME multiplicative recurrence as the
        # phase (att_q = nepers per unit q per bin; q is proportional to
        # r, so no extra geometry operands). Re-init at the absolute bin
        # kb keeps it drift-free like the phase.
        dec1 = jnp.exp(-jnp.float32(att_q) * q1)
        dec2 = jnp.exp(-jnp.float32(att_q) * q2)
        di1 = jnp.exp((-att_q * kb) * q1)
        di2 = jnp.exp((-att_q * kb) * q2)
        e1r, e1i = e1r * di1, e1i * di1
        e2r, e2i = e2r * di2, e2i * di2
        d1r, d1i = d1r * dec1, d1i * dec1
        d2r, d2i = d2r * dec2, d2i * dec2

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

    def sinc(x):
        px = jnp.float32(np.pi) * x
        return jnp.where(jnp.abs(px) < 1e-6, 1.0, jnp.sin(px) / px)

    for j in range(FB):
        if has_dir:
            kf = kb + jnp.float32(j)
            g1 = sinc(s1 * kf)
            g2 = sinc(s2 * kf)
            a1r, a1i = e1r * g1, e1i * g1
            a2r, a2i = e2r * g2, e2i * g2
        else:
            a1r, a1i, a2r, a2i = e1r, e1i, e2r, e2i
        xr = dot(a1r, a2r) - dot(a1i, a2i)
        xi = dot(a1r, a2i) + dot(a1i, a2r)
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
                                             "interpret", "att_q"))
def _gf_call(q1, w1, q2, w2, s1=None, s2=None, *, F: int, FB: int, SC: int,
             k0: int, bf16: bool, interpret: bool = False,
             att_q: float = 0.0):
    """pallas_call wrapper: pads S/N/M/F to tile multiples and crops the
    result to (F, N, M, 2). ``s1``/``s2`` (both or neither): per-unit-bin
    sinc directivity slopes."""
    has_dir = s1 is not None
    N, S = q1.shape  # rx side transposed (N, S)
    M = q2.shape[1]
    Sp = -(-S // SC) * SC
    Np = -(-N // 8) * 8
    Mp = -(-M // 128) * 128
    nF = -(-F // FB)

    def pad2(a, d0, d1):
        return jnp.pad(a, ((0, d0 - a.shape[0]), (0, d1 - a.shape[1])))

    # zero weights make padded scatterers/elements inert
    rx_spec = pl.BlockSpec((Np, SC), lambda fb, s: (0, s))
    tx_spec = pl.BlockSpec((SC, Mp), lambda fb, s: (s, 0))
    ops = [pad2(q1, Np, Sp), pad2(w1, Np, Sp)]
    specs = [rx_spec, rx_spec]
    if has_dir:
        ops.append(pad2(s1, Np, Sp))
        specs.append(rx_spec)
    ops += [pad2(q2, Sp, Mp), pad2(w2, Sp, Mp)]
    specs += [tx_spec, tx_spec]
    if has_dir:
        ops.append(pad2(s2, Sp, Mp))
        specs.append(tx_spec)

    grid = (nF, Sp // SC)
    out = pl.pallas_call(
        functools.partial(_kernel, FB=FB, k0=k0, bf16=bf16,
                          has_dir=has_dir, att_q=att_q),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((FB, 2, Np, Mp), lambda fb, s: (fb, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nF * FB, 2, Np, Mp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the directivity variant keeps ~6 extra (SC, N/M) arrays
            # live; the default 16 MB scoped-vmem limit is too tight
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(*ops)
    # (nF*FB, 2, Np, Mp) -> (F, N, M, 2)
    return jnp.moveaxis(out[:F, :, :N, :M], 1, -1)


def freq_gemm_pallas(phc, ps, amp, pn, pv, *, L: int, k0: int, F: int,
                     R0: float, fsr: float, precision: str = "highest",
                     B: int = 8, SC: int = 512, interpret: bool = False,
                     att: float = 0.0):
    """Drop-in replacement for :func:`greens_freq._freq_gemm` (same
    signature modulo the tiling knobs; ``B`` is accepted and ignored).
    Requires single sub-element geometry — callers fall back to the XLA
    engine for ``En/Em > 1``. ``precision='bf16'`` runs the MXU dots on
    bf16 phasors with f32 accumulation (~4x dot rate, ~0.2% rel err);
    here the cast is VMEM-resident so, unlike the XLA engine, it costs
    nothing in HBM traffic. ``att`` (nepers/m per rfft bin,
    :func:`greens_freq.alpha_np_per_bin`) applies frequency-linear
    attenuation through the phasor recurrence (decay slope proportional
    to the phase slope — no extra operands).
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
    # bin-block size from the VMEM budget for the (FB, 2, Np, Mp) block —
    # measured at S=1e5 x 128x128 (bf16): FB=32 0.86 s, FB=64 0.54 s,
    # FB=128 0.63 s
    Np = -(-q1.shape[0] // 8) * 8
    Mp = -(-q2.shape[1] // 128) * 128
    FB = int(max(1, min(64, (16 * 2**20) // (2 * Np * Mp * 4))))
    FB = int(os.environ.get("QUPS_GF_FB", FB))  # perf-sweep knob
    FB = max(1, min(FB, F))  # narrow bands: don't compute padded bins
    # q = (phc / 2 pi) r  =>  decay exp(-att r) = exp(-att 2 pi / phc q)
    att_q = float(att) * _TWO_PI / float(phc) if att else 0.0
    return _gf_call(q1, w1, q2, w2, F=F, FB=FB, SC=SC, k0=k0,
                    bf16=(precision == "bf16"), interpret=interpret,
                    att_q=att_q)


@functools.partial(jax.jit, static_argnames=("baffle",))
def _simus_prologue(ps, amp, pn, nn_az, pv, nv_az, widths, dq, sl, *,
                    baffle: str):
    """Device-side geometry for the simus/MUST analog (mirrors
    ``ops.simus._simus_spectrum``'s weights): per side returns the
    normalized phase slope q = dq * r, the k-independent weight (1/r,
    obliquity for the soft baffle, amplitudes on tx), and the per-unit-bin
    sinc slope s = width * sl * sin(theta). The rx side is transposed."""
    def geom(pe, az):
        d = ps[:, None, :] - pe[None, :, :].astype(jnp.float32)  # (S, E, 3)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        ca, sa = jnp.cos(az), jnp.sin(az)
        lat = d[..., 0] * ca[None, :] - d[..., 2] * sa[None, :]
        ax = d[..., 2] * ca[None, :] + d[..., 0] * sa[None, :]
        sth = lat / jnp.maximum(r, 1e-12)
        cth = ax / jnp.maximum(r, 1e-12)
        return r, sth, cth

    r_tx, sth_tx, cth_tx = geom(pv, jnp.asarray(nv_az, jnp.float32))
    r_rx, sth_rx, cth_rx = geom(pn, jnp.asarray(nn_az, jnp.float32))
    w_tx = amp.astype(jnp.float32)[:, None] / jnp.maximum(r_tx, 1e-6)
    w_rx = 1.0 / jnp.maximum(r_rx, 1e-6)
    if baffle == "soft":
        w_tx = w_tx * jnp.maximum(cth_tx, 0.0)
        w_rx = w_rx * jnp.maximum(cth_rx, 0.0)
    q1 = (dq * r_rx).T
    w1 = w_rx.T
    s1 = (widths[1] * sl * sth_rx).T
    return q1, w1, s1, dq * r_tx, w_tx, widths[0] * sl * sth_tx


def simus_spectrum_pallas(ps, amp, pn, nn_az, pv, nv_az, widths, *,
                          k0: int, F: int, T: int, fs: float, c0: float,
                          baffle: str = "soft", precision: str = "highest",
                          SC: int = 512, interpret: bool = False,
                          att: float = 0.0):
    """Fused-engine analog of :func:`qups_tpu.ops.simus._simus_spectrum`:
    geometry + rectangular-element sinc directivity spectrum X[k, n, e]
    for bins [k0, k0+F) as device-resident complex64 (F, N, E)."""
    # fs / (T c0) doubles as the phase slope per unit bin (/2 pi) AND the
    # sinc directivity slope per unit bin
    sl = np.float32(fs / (T * c0))
    q1, w1, s1, q2, w2, s2 = _simus_prologue(
        jnp.asarray(ps, jnp.float32), jnp.asarray(amp, jnp.float32),
        jnp.asarray(pn, jnp.float32), jnp.asarray(nn_az, jnp.float32),
        jnp.asarray(pv, jnp.float32), jnp.asarray(nv_az, jnp.float32),
        jnp.asarray(widths, jnp.float32), jnp.float32(sl),
        jnp.float32(sl), baffle=baffle)
    import os
    SC = int(os.environ.get("QUPS_GF_SC", SC))
    S = q1.shape[1]
    SC = min(SC, -(-S // 128) * 128)
    Np = -(-q1.shape[0] // 8) * 8
    Mp = -(-q2.shape[1] // 128) * 128
    FB = int(max(1, min(16, (2 * 2**20) // (2 * Np * Mp * 4))))
    FB = int(os.environ.get("QUPS_GF_FB", FB))  # perf-sweep knob
    FB = max(1, min(FB, F))  # narrow bands: don't compute padded bins
    # q = sl r  =>  per-bin decay exp(-att r) = exp(-(att / sl) q)
    att_q = float(att) / float(sl) if att else 0.0
    G = _gf_call(q1, w1, q2, w2, s1, s2, F=F, FB=FB, SC=SC, k0=k0,
                 bf16=(precision == "bf16"), interpret=interpret,
                 att_q=att_q)
    from ..utils.cpx import cjoin
    return cjoin(G[..., 0], G[..., 1])
