"""Frequency-domain point-scatterer simulator — the native analog of the
MUST/SIMUS interop (``UltrasoundSystem.simus``,
``/root/reference/src/UltrasoundSystem.m:1464-1667``): single-scattering
(Born) synthesis in the frequency domain with far-field element directivity,

    X(f; n, e) = P(f) sum_s a_s D(f, th_es) D(f, th_sn)
                 e^{-2i pi f (r_es + r_sn) / c} / (r_es r_sn)

with ``D(f, th) = sinc(w f sin(th) / c) [cos(th)]`` the rectangular-element
directivity (hard/soft baffle). Per frequency bin this is an
``(N, S) x (S, E)`` complex GEMM — MXU-native — versus the reference's
external MATLAB toolbox. The inverse FFT returns time-domain FSA traces.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("T", "fs", "c0", "baffle"))
def simus_fsa(ps, amp, pn, nn_az, pv, nv_az, widths, spec, bin_idx, *,
              T: int, fs: float, c0: float, baffle: str = "soft"):
    """Frequency-domain FSA synthesis.

    Args:
      ps (S, 3): scatterer positions; amp (S,): real amplitudes.
      pn (N, 3): rx element centers; nn_az (N,): element azimuth [rad].
      pv (E, 3): tx element centers; nv_az (E,): azimuths [rad].
      widths (2,): (tx width, rx width) element widths [m].
      spec (F,): complex pulse spectrum at the selected bins (includes the
        start-time phase ramp).
      bin_idx (F,): int32 rfft bin indices of the selected frequencies.
      T: output samples; fs: sampling rate; c0: sound speed;
      baffle: 'soft' multiplies the obliquity cos(th); 'hard' omits it.

    Returns: real (T, N, E) FSA traces (rfft synthesis).
    """
    ps = jnp.asarray(ps, jnp.float32)
    amp = jnp.asarray(amp, jnp.float32)
    pn = jnp.asarray(pn, jnp.float32)
    pv = jnp.asarray(pv, jnp.float32)

    def geom(pe, az):
        d = ps[:, None, :] - pe[None, :, :]      # (S, E, 3)
        r = jnp.linalg.norm(d, axis=-1)          # (S, E)
        # lateral angle in the element frame (azimuth about y)
        ca, sa = jnp.cos(az), jnp.sin(az)
        lat = d[..., 0] * ca[None, :] - d[..., 2] * sa[None, :]
        ax = d[..., 2] * ca[None, :] + d[..., 0] * sa[None, :]
        sth = lat / jnp.maximum(r, 1e-12)
        cth = ax / jnp.maximum(r, 1e-12)
        return r, sth, cth

    r_tx, sth_tx, cth_tx = geom(pv, jnp.asarray(nv_az, jnp.float32))
    r_rx, sth_rx, cth_rx = geom(pn, jnp.asarray(nn_az, jnp.float32))

    def one_f(carry, inp):
        f, pf = inp

        def steer(r, sth, cth, w):
            arg = w * f * sth / c0
            D = jnp.sinc(arg)
            if baffle == "soft":
                D = D * jnp.maximum(cth, 0.0)
            ph = -2.0 * jnp.pi * f * r / c0
            return D * jnp.exp(1j * ph) / jnp.maximum(r, 1e-6)

        A_tx = steer(r_tx, sth_tx, cth_tx, widths[0])   # (S, E)
        A_rx = steer(r_rx, sth_rx, cth_rx, widths[1])   # (S, N)
        Xf = jnp.einsum("sn,s,se->ne", A_rx, amp.astype(jnp.complex64),
                        A_tx)                            # (N, E)
        return carry, pf * Xf

    bin_idx = jnp.asarray(bin_idx, jnp.int32)
    fbins = bin_idx.astype(jnp.float32) * (fs / T)
    _, Xs = jax.lax.scan(one_f, 0.0, (fbins, jnp.asarray(spec, jnp.complex64)))
    # scatter the selected bins into the rfft spectrum and synthesize
    full = jnp.zeros((T // 2 + 1,) + Xs.shape[1:], jnp.complex64)
    full = full.at[bin_idx].set(Xs)
    return jnp.fft.irfft(full, n=T, axis=0)
