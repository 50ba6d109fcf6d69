"""Fused Pallas engine for the frequency-domain adjoint beamformer.

The XLA engine (:func:`qups_tpu.ops.fdbf.bf_adjoint`) materializes the
(I, M)/(I, N) steering phasors and the (I, V) intermediates in HBM for
every frequency bin — measured 56 ms/bin at the headline config
(I=1024^2, N=M=V=256), and neither XLA-level bf16 GEMMs nor an XLA
phasor recurrence helps because the cost is the HBM round trips, not
the MXU FLOPs (tools/diag_adjoint.py). This kernel keeps a pixel
block's phasors and intermediates entirely in VMEM: grid (pixel blocks
OUTER, bins INNER), so per (p, k) step it re-derives the block's rx/tx
phasors from sin/cos, forms the tx steering product and the rx adjoint
with MXU dots, normalizes, and accumulates the output block in VMEM
across the bin sweep. HBM traffic collapses to streaming the (I, N) /
(I, M) delay tables once per pixel block plus one output write.

Same math as the reference (``/root/reference/src/UltrasoundSystem.m:
4015-4027``) and :func:`fdbf.bf_adjoint`, per selected DFT bin k:

    A(i, v)  = sum_m exp(-2i pi f_k tau_tx[i, m]) (apod * exp(+2i pi
               f_k del_tx))[m, v]                       (tx steering)
    Ahat     = A / ||A||_v                              (power norm)
    y(i, v)  = sum_n exp(+2i pi f_k tau_rx[i, n]) X_k[n, v]
    b(i)    += sum_v y(i, v) conj(Ahat(i, v))

with keep_rx / keep_tx variants keeping the n resp. v axis.

Phase accuracy: angles are built as ``2 pi frac(f_k tau)``; at f_k tau
~ 500 cycles the f32 rounding is ~3e-4 rad. ``precision='bf16'`` runs
the dots on bf16 phasors with f32 accumulation (~4x dot rate, ~0.7%
image rel err — fine inside the -40 dB band); 'f32' uses HIGHEST.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _kernel(fv_ref, taur_ref, taut_ref, s_ref, x_ref, out_ref, *refs,
            K: int, bf16: bool, keep: str, dfr: float = 0.0):
    """Grid (nP, K): pixel blocks outer, bins inner. ``fv_ref`` is the
    (K,) scalar-prefetch bin-frequency array (arbitrary bin sets — no
    contiguity requirement). ``keep``: '' | 'rx' | 'tx'.

    ``dfr`` != 0 enables the phasor RECURRENCE for uniformly spaced bins
    (spacing ``dfr`` Hz): the block's rx/tx phasors live in VMEM scratch,
    initialized by sin/cos at k == 0 and advanced by one complex multiply
    per bin — removing the 2 x (BI, N+M) transcendentals per (p, k) step
    (the dominant non-GEMM cost; same trick as the greens engine,
    ``greens_freq_pallas._kernel``). f32 carries keep the drift ~1e-7
    rad/step."""
    recur = dfr != 0.0
    if recur:
        wt_ref, gt_ref, wr_ref, gr_ref = refs
    k = pl.program_id(1)
    fk = fv_ref[k]

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def phasor(theta_cycles, sign):
        u = theta_cycles - jnp.floor(theta_cycles)
        th = u * jnp.float32(_TWO_PI)
        return jnp.cos(th), sign * jnp.sin(th)

    def dot16(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot(a, b):
        # a manual 3-pass bf16 split (Mosaic lacks Precision.HIGH) was
        # measured SLOWER than HIGHEST (2.65 vs 2.41 s headline) — the
        # f32 arm is not MXU-pass-bound, so only bf16|f32 are offered
        if bf16 == "bf16":
            return dot16(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def cdot(ar, ai, br, bi):
        return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))

    if recur:
        @pl.when(k == 0)
        def _():
            wtr0, wti0 = phasor(fk * taut_ref[:], jnp.float32(-1.0))
            wt_ref[0], wt_ref[1] = wtr0, wti0
            gtr, gti = phasor(jnp.float32(dfr) * taut_ref[:],
                              jnp.float32(-1.0))
            gt_ref[0], gt_ref[1] = gtr, gti
            wrr0, wri0 = phasor(fk * taur_ref[:], jnp.float32(1.0))
            wr_ref[0], wr_ref[1] = wrr0, wri0
            grr, gri = phasor(jnp.float32(dfr) * taur_ref[:],
                              jnp.float32(1.0))
            gr_ref[0], gr_ref[1] = grr, gri
        wtr, wti = wt_ref[0], wt_ref[1]
        wrr_c, wri_c = wr_ref[0], wr_ref[1]
    else:
        wtr, wti = phasor(fk * taut_ref[:], jnp.float32(-1.0))

    # tx steering: A = Wtx @ S_k, (BI, M) x (M, V)
    a_r, a_i = cdot(wtr, wti, s_ref[0, 0], s_ref[0, 1])
    nrm = jnp.sqrt(jnp.sum(a_r * a_r + a_i * a_i, axis=1, keepdims=True))
    inv = jnp.float32(1.0) / jnp.where(nrm == 0, jnp.float32(1.0), nrm)
    ahr, ahi = a_r * inv, a_i * inv  # conj applied at the contraction

    if recur:
        wrr, wri = wrr_c, wri_c
        # advance the carries for the next bin (one complex multiply)
        @pl.when(k < K - 1)
        def _():
            gtr, gti = gt_ref[0], gt_ref[1]
            wt_ref[0] = wtr * gtr - wti * gti
            wt_ref[1] = wtr * gti + wti * gtr
            grr, gri = gr_ref[0], gr_ref[1]
            wr_ref[0] = wrr * grr - wri * gri
            wr_ref[1] = wrr * gri + wri * grr
    else:
        wrr, wri = phasor(fk * taur_ref[:], jnp.float32(1.0))
    if keep == "rx":
        # b(i, n) += Wrx(i, n) * (conj(Ah) @ Xf^T)(i, n):
        # (BI, V) x (V, N) — x_ref holds Xf TRANSPOSED (2, V, N)
        zr, zi = cdot(ahr, -ahi, x_ref[0, 0], x_ref[0, 1])
        out_ref[0] += wrr * zr - wri * zi
        out_ref[1] += wrr * zi + wri * zr
    else:
        # y = Wrx @ Xf, (BI, N) x (N, V)
        yr, yi = cdot(wrr, wri, x_ref[0, 0], x_ref[0, 1])
        br = yr * ahr + yi * ahi  # y * conj(Ah)
        bi = yi * ahr - yr * ahi
        if keep == "tx":
            out_ref[0] += br
            out_ref[1] += bi
        else:
            # (BI, 1) sums broadcast-accumulate over the 128-lane out
            # block (a narrow store would break the (8, 128) tiling);
            # the caller reads lane 0
            out_ref[0] += jnp.sum(br, axis=1, keepdims=True)
            out_ref[1] += jnp.sum(bi, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("BI", "bf16", "keep",
                                             "interpret", "dfr"))
def _adj_call(fvals, taur, taut, s_ri, x_ri, *, BI: int, bf16: str,
              keep: str, interpret: bool = False, dfr: float = 0.0):
    """pallas_call wrapper. ``taur (I, N)``, ``taut (I, M)`` delay tables
    [s]; ``s_ri (K, 2, Mp, Vp)`` per-bin tx spectra (zero-padded);
    ``x_ri (K, 2, Np, Vp)`` per-bin channel spectra — TRANSPOSED to
    (K, 2, Vp, Np) by the caller for ``keep='rx'``. Returns f32 ri:
    summed (2, Ip, 128-reduced), keep_rx (2, Ip, Np), keep_tx
    (2, Ip, Vp)."""
    I, N = taur.shape
    M = taut.shape[1]
    K = int(fvals.shape[0])
    Np = -(-N // 128) * 128
    Mp = -(-M // 128) * 128
    Ip = -(-I // BI) * BI
    Vp = s_ri.shape[-1]
    nP = Ip // BI

    taur = jnp.pad(taur, ((0, Ip - I), (0, Np - N)))
    taut = jnp.pad(taut, ((0, Ip - I), (0, Mp - M)))

    if keep == "rx":
        oshape, oblock = (2, Ip, Np), (2, BI, Np)
    elif keep == "tx":
        oshape, oblock = (2, Ip, Vp), (2, BI, Vp)
    else:
        # the summed image broadcast-accumulates the same (BI, 1) sums
        # into a full 128-lane block (a narrow store would break the
        # (8, 128) tiling); the caller reads lane 0
        oshape, oblock = (2, Ip, 128), (2, BI, 128)

    grid = (nP, K)
    scratch = []
    if dfr:
        scratch = [pltpu.VMEM((2, BI, Mp), jnp.float32),   # wt carry
                   pltpu.VMEM((2, BI, Mp), jnp.float32),   # gt step
                   pltpu.VMEM((2, BI, Np), jnp.float32),   # wr carry
                   pltpu.VMEM((2, BI, Np), jnp.float32)]   # gr step
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, bf16=bf16, keep=keep, dfr=dfr),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BI, Np), lambda p, k, fv: (p, 0)),
                pl.BlockSpec((BI, Mp), lambda p, k, fv: (p, 0)),
                pl.BlockSpec((1, 2, Mp, Vp),
                             lambda p, k, fv: (k, 0, 0, 0)),
                pl.BlockSpec((1, 2) + tuple(x_ri.shape[2:]),
                             lambda p, k, fv: (k, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(oblock,
                                   lambda p, k, fv: (0, p)
                                   + (0,) * (len(oblock) - 2)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(fvals, taur, taut, s_ri, x_ri)
    if keep == "rx":
        return out[:, :I, :N]
    if keep == "tx":
        return out[:, :I]
    return out[:, :I, 0]


@functools.partial(jax.jit, static_argnames=("fs", "fmod"))
def _prep_spectra(x, t0, t0_off, sel, *, fs: float, fmod: float):
    """FFT + per-bin phase corrections + bin gather, shared with the XLA
    engine's prologue (:func:`fdbf.bf_adjoint` lines building X)."""
    from ..utils.cpx import cexp

    T, N, V = x.shape[:3]
    t = jnp.arange(T, dtype=jnp.float32)[:, None, None] / fs
    t0 = jnp.broadcast_to(jnp.asarray(t0, jnp.float32).reshape(-1), (V,))
    t0o = jnp.broadcast_to(jnp.asarray(t0_off, jnp.float32).reshape(-1),
                           (V,))
    xr = jnp.asarray(x)
    if fmod:
        xr = xr * cexp((2 * np.pi * fmod) * (t + t0[None, None, :]))
    X = jnp.fft.fft(xr, axis=0)
    Xk = jnp.take(X, sel, axis=0)  # (K, N, V)
    fk = (sel.astype(jnp.float32) * (fs / T))[:, None, None]
    Xk = Xk * cexp(-2 * np.pi * fk * (t0 - t0o)[None, None, :])
    return Xk


@functools.partial(jax.jit, static_argnames=("keep", "M", "V", "N"))
def _pack(Xk, del_tx, apod_tx, fvals, *, keep: str, M: int, V: int,
          N: int):
    """Per-bin tx spectra S_k and (possibly transposed) channel spectra,
    ri-packed + zero-padded to lane multiples."""
    from ..utils.cpx import cexp

    Mp = -(-M // 128) * 128
    Vp = -(-V // 128) * 128
    Np = -(-N // 128) * 128
    S = apod_tx[None] * cexp(2 * np.pi * fvals[:, None, None]
                             * del_tx[None])
    s_ri = jnp.stack([jnp.real(S), jnp.imag(S)], axis=1)
    s_ri = jnp.pad(s_ri, ((0, 0), (0, 0), (0, Mp - M), (0, Vp - V)))
    if keep == "rx":  # kernel contracts (BI, V) x (V, N)
        xk = jnp.swapaxes(Xk, 1, 2)  # (K, V, N)
        x_ri = jnp.stack([jnp.real(xk), jnp.imag(xk)], axis=1)
        x_ri = jnp.pad(x_ri, ((0, 0), (0, 0), (0, Vp - V), (0, Np - N)))
    else:
        x_ri = jnp.stack([jnp.real(Xk), jnp.imag(Xk)], axis=1)
        x_ri = jnp.pad(x_ri, ((0, 0), (0, 0), (0, Np - N), (0, Vp - V)))
    return s_ri, x_ri


@jax.jit
def _join(v):
    return jax.lax.complex(v[0], v[1])


def _uniform_df(sel_h: np.ndarray, df: float) -> float:
    """Recurrence spacing for uniformly spaced bins (0 = ragged set —
    direct per-bin sin/cos). Honors QUPS_ADJ_RECUR=0."""
    import os

    if sel_h.size <= 1 or os.environ.get("QUPS_ADJ_RECUR", "1") == "0":
        return 0.0
    steps = np.diff(sel_h)
    if (steps == steps[0]).all() and steps[0] != 0:
        return float(steps[0]) * df
    return 0.0


def bf_adjoint_tiled(x, tau_rx, tau_tx, del_tx, apod_tx, t0, t0_off,
                     fbins, *, fs: float, fmod: float = 0.0,
                     keep_rx: bool = False, keep_tx: bool = False,
                     precision: str = "bf16", BI: int = 1024,
                     interpret: bool = False):
    """Fused-Pallas drop-in for :func:`qups_tpu.ops.fdbf.bf_adjoint`
    (same signature + tiling knobs). Returns the complex image (I,) /
    (I, N) / (I, V).

    ``precision``: 'bf16' (default — single-pass MXU dots, ~0.7% image
    rel err, 0.58 s at the 1024^2 x 256^2 x 64-bin headline vs 4.0 s
    XLA = 6.9x) or 'f32' (HIGHEST dots, 2.41 s). ``BI``: pixel rows per
    block (VMEM-bound; 1024 measured best).
    """
    import os

    if keep_rx and keep_tx:
        raise ValueError("keep_rx and keep_tx are mutually exclusive here")
    keep = "rx" if keep_rx else ("tx" if keep_tx else "")
    BI = int(os.environ.get("QUPS_ADJ_BI", BI))
    if precision not in ("bf16", "f32"):
        raise ValueError(f"precision {precision!r} not in bf16|f32")
    bf16 = precision

    x = jnp.asarray(x)
    T, N, V = x.shape[:3]
    M = np.shape(tau_tx)[1]
    # the XLA engine's fbins convention: negative entries are padding
    # ("pad with -1 to skip") — drop them host-side (bin selection is
    # shape-affecting anyway)
    sel_h = np.asarray(fbins, np.int64).reshape(-1)
    sel_h = sel_h[sel_h >= 0]
    if sel_h.size == 0:  # no bins selected -> zero image (XLA parity)
        from ..utils.cpx import czeros

        I = np.shape(tau_rx)[0]
        oshape = (I, N) if keep == "rx" else ((I, V) if keep == "tx"
                                              else (I,))
        return czeros(oshape)
    sel = jnp.asarray(sel_h, jnp.int32)
    K = int(sel.shape[0])
    df = fs / T
    fvals = sel.astype(jnp.float32) * jnp.float32(df)
    # uniformly spaced bins ride the in-VMEM phasor recurrence (one
    # complex multiply instead of 2 x (BI, N+M) sin/cos per bin)
    dfr = _uniform_df(sel_h, df)

    Xk = _prep_spectra(x, t0, t0_off, sel, fs=float(fs), fmod=float(fmod))
    s_ri, x_ri = _pack(Xk, jnp.asarray(del_tx, jnp.float32),
                       jnp.asarray(apod_tx, jnp.float32), fvals,
                       keep=keep, M=M, V=V, N=N)
    out = _adj_call(fvals, jnp.asarray(tau_rx, jnp.float32),
                    jnp.asarray(tau_tx, jnp.float32), s_ri, x_ri,
                    BI=BI, bf16=bf16, keep=keep, interpret=interpret,
                    dfr=dfr)
    if keep == "tx":
        out = out[:, :, :V]  # crop the padded pulse axis
    return _join(out)
