"""Benchmark sweeps — the ParTest benchmark suite equivalents
(``/root/reference/test/ParTest.m:244-318``), each emitting one JSON line
per configuration:

  python benches.py das     # s/frame vs image size (DAS_dev_benchmark)
  python benches.py greens  # us/scatterer vs scatterer count
  python benches.py fdtd    # ms/time-step on a 225x225 grid
  python benches.py all

Knobs: QUPS_BENCH_BUDGET (seconds per sweep, default 60 — sweeps stop when
exceeded, like the reference), QUPS_BENCH_TINY=1 (CI smoke sizes).
"""
import json
import os
import sys
import time

import numpy as np


def _budget():
    return float(os.environ.get("QUPS_BENCH_BUDGET", "60"))


def _tiny():
    return os.environ.get("QUPS_BENCH_TINY", "") == "1"


def _emit(rec):
    print(json.dumps(rec), flush=True)


def bench_das():
    """DAS s/frame vs image size: 2^6..2^12 px/side, T=1024, 128x128 tx/rx
    (``ParTest.m:244-271``)."""
    import jax
    import jax.numpy as jnp
    from qups_tpu.ops.das_pallas import das_tiled

    T, N, M = (256, 16, 4) if _tiny() else (1024, 128, 128)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, N, M)).astype(np.float32))
    pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
                  -1).astype(np.float32)
    th = np.radians(np.linspace(-9, 9, M))
    pv = np.zeros((M, 3), np.float32)
    nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
    t0 = np.zeros(M, np.float32)
    start = time.time()
    sizes = [64, 128] if _tiny() else [64, 128, 256, 512, 1024, 2048, 4096]
    for n in sizes:
        if time.time() - start > _budget():
            break
        zs = np.linspace(5e-3, 45e-3, n)
        xs = np.linspace(-12e-3, 12e-3, n)
        Z, X = np.meshgrid(zs, xs, indexing="ij")
        pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()],
                      -1).astype(np.float32)
        use_pallas = jax.devices()[0].platform != "cpu"
        try:
            def run():
                if use_pallas:
                    return float(jnp.sum(jnp.abs(das_tiled(
                        x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=31.25e6,
                        tx_model="plane", im_shape=(n, n, 1)))))
                from qups_tpu.ops.das import das
                return float(jnp.sum(jnp.abs(das(
                    np.asarray(x), pi, pr, pv, nv, t0, 1 / 1540.0,
                    fs=31.25e6, tx_model="plane", method="linear"))))
            run()  # compile
            t1 = time.time()
            run()
            dt = time.time() - t1
        except Exception as e:  # pragma: no cover
            _emit({"bench": "das", "n": n, "error": str(e)})
            continue
        _emit({"bench": "das", "metric": "s/frame", "n_px_side": n,
               "value": dt, "sums_per_s": n * n * N * M / dt,
               "T": T, "N": N, "M": M})


def bench_greens():
    """greens us/scatterer: 2^4..2^20 diffuse scatterers, 128x128 elements
    (``ParTest.m:272-284``); stops at the time budget."""
    import jax
    import jax.numpy as jnp
    from qups_tpu.ops.greens import greens_splat
    from qups_tpu.ops.greens_pallas import greens_tiled

    N = M = 16 if _tiny() else 128
    K, fs, c0 = 41, 31.25e6, 1540.0
    kern = (np.hanning(K) * np.sin(2 * np.pi * 5e6 * np.arange(K) / fs)
            ).astype(np.float32)
    pn = np.stack([np.linspace(-19e-3, 19e-3, N), np.zeros(N), np.zeros(N)],
                  -1)[:, None, :].astype(np.float32)
    pv = pn.copy()
    rng = np.random.default_rng(0)
    start = time.time()
    smax = 8 if _tiny() else 20
    for p in range(4, smax + 1, 2):
        S = 2 ** p
        if time.time() - start > _budget():
            break
        ps = np.stack([rng.uniform(-15e-3, 15e-3, S), np.zeros(S),
                       rng.uniform(15e-3, 45e-3, S)], -1).astype(np.float32)
        amp = np.ones(S, np.float32)
        s0 = 2 * 14e-3 / c0
        T = int(np.ceil((2 * 50e-3 / c0 - s0) * fs))
        kw = dict(T=T, s0=s0, t0k=-K / 2 / fs, fs=fs, cinv=1 / c0, R0=1e-3)
        on_tpu = jax.devices()[0].platform != "cpu"
        # 'freq' = the MXU per-bin GEMM path (the TPU default); 'pallas'
        # the VPU splat kernel; 'splat' the XLA path (CPU only).
        # QUPS_BENCH_IMPL restricts to one impl — interleaving impls in a
        # single process distorts tunnel timings by >10x (NOTES.md); solo
        # per-impl processes are the trustworthy mode.
        impls = ("freq", "pallas") if on_tpu else ("freq", "splat")
        only = os.environ.get("QUPS_BENCH_IMPL")
        if only:
            if only not in impls:
                raise SystemExit(
                    f"QUPS_BENCH_IMPL={only!r} is not available on this "
                    f"platform (choices: {impls})")
            impls = (only,)
        for impl in impls:
            try:
                def run():
                    if impl == "freq":
                        from qups_tpu.ops.greens_freq import greens_freq
                        return float(jnp.sum(jnp.abs(greens_freq(
                            kern, ps, amp, pn, pv, **kw))))
                    if impl == "pallas":
                        return float(jnp.sum(jnp.abs(greens_tiled(
                            kern, ps, amp, pn, pv, method="linear", **kw))))
                    return float(jnp.sum(jnp.abs(greens_splat(
                        jnp.asarray(kern), ps, amp, pn, pv, method="linear",
                        block=256, **kw))))
                run()
                t1 = time.time()
                run()
                dt = time.time() - t1
            except Exception as e:  # pragma: no cover
                _emit({"bench": "greens", "impl": impl, "S": S,
                       "error": str(e)})
                continue
            _emit({"bench": "greens", "metric": "us/scatterer", "impl": impl,
                   "S": S, "value": dt / S * 1e6, "s_total": dt, "N": N,
                   "M": M, "T": T})


def bench_lut():
    """Full-config LUT-kernel throughput (``bfDAS``/``bfDASLUT``/
    ``bfEikonal`` spine, ``UltrasoundSystem.m:4476-4673``): 1024^2 px from
    256x256 tx/rx geometric delay tables, bf16pair, linear + cubic — the
    bring-your-own-delays counterpart of the bench.py headline."""
    import jax
    import jax.numpy as jnp
    from qups_tpu.ops.das import delay_tables
    from qups_tpu.ops.das_pallas import das_lut_tiled

    T, N, M = (256, 16, 4) if _tiny() else (4096, 256, 256)
    n = 128 if _tiny() else 1024
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
                  -1).astype(np.float32)
    th = np.radians(np.linspace(-9, 9, M))
    pv = np.zeros((M, 3), np.float32)
    nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
    t0 = np.zeros(M, np.float32)
    zs = np.linspace(5e-3, 45e-3, n)
    xs = np.linspace(-12e-3, 12e-3, n)
    Z, X = np.meshgrid(zs, xs, indexing="ij")
    pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()],
                  -1).astype(np.float32)
    tau_rx, tau_tx = delay_tables(pi, pr, pv, nv, 1540.0, tx_model="plane")
    tau_rx = np.asarray(tau_rx, np.float32)
    tau_tx = np.asarray(tau_tx, np.float32)
    on_tpu = jax.devices()[0].platform != "cpu"
    prec = os.environ.get("QUPS_BENCH_PRECISION",
                          "bf16pair" if on_tpu else "f32")
    from qups_tpu.ops.das_pallas import das_lut_plan
    xj = jnp.asarray(x)
    for method in ("linear", "cubic"):
        try:
            # the reusable handle uploads the (I,N)+(I,M) tables ONCE —
            # per-call table re-upload (or jit-constant embedding) costs
            # more than the beamforming at this size
            plan = das_lut_plan(tau_rx, tau_tx, t0, fs=31.25e6, T=T, N=N,
                                M=M, method=method, im_shape=(n, n, 1),
                                out="ri", precision=prec,
                                interpret=not on_tpu)

            def f(xx, plan=plan):
                return float(jnp.sum(jnp.abs(plan(xx))))

            f(xj)  # compile
            t1 = time.time()
            f(xj)
            dt = time.time() - t1
        except Exception as e:  # pragma: no cover
            _emit({"bench": "lut", "method": method, "error": str(e)})
            continue
        _emit({"bench": "lut", "metric": "s/frame", "method": method,
               "value": dt, "sums_per_s": n * n * N * M / dt,
               "n_px_side": n, "T": T, "N": N, "M": M, "precision": prec})


def bench_focus():
    """focusTx / wsinterpd2 (``interpd.cu:345-396``,
    ``UltrasoundSystem.m:3374-3503``): synthesize M'=128 focused transmits
    (and an M'=1 walking-aperture line) from a (T=4096, N=128, M=128) FSA
    set — the op every non-FSA simulation funnels through."""
    import jax
    import jax.numpy as jnp
    import qups_tpu as q

    T, N, M = (256, 16, 16) if _tiny() else (4096, 128, 128)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    xdc = q.TransducerArray(numel=M, pitch=0.2e-3, fc=5e6)
    chd = q.ChannelData(data=jnp.asarray(x), fs=31.25e6, t0=0.0)
    us0 = q.UltrasoundSystem(tx=xdc, rx=xdc,
                             seq=q.Sequence(type="FSA", numpulse=M,
                                            c0=1540.0),
                             scan=q.ScanCartesian(x=np.linspace(-1e-2, 1e-2, 4),
                                                  z=np.linspace(1e-2, 3e-2, 4)),
                             fs=31.25e6)
    # NOTE: the time-domain methods (cubic wsinterpd2) CRASH the TPU
    # worker at this scale (measured: "TPU worker process crashed",
    # 4096x128x128->128) — the freq GEMM is the only viable full-scale
    # path on TPU and the method='auto' default. QUPS_BENCH_FOCUS_METHOD
    # overrides at your own risk.
    meth = os.environ.get("QUPS_BENCH_FOCUS_METHOD", "auto")
    for Mp in (M, 1):
        foc = np.stack([np.linspace(-10e-3, 10e-3, Mp), np.zeros(Mp),
                        np.full(Mp, 30e-3)], 0)
        seq = q.Sequence(type="FC", focus=foc, c0=1540.0)

        def run():
            out = us0.focusTx(chd, seq, method=meth)
            return float(jnp.sum(jnp.abs(out.data)))
        try:
            run()  # compile
            t1 = time.time()
            run()
            dt = time.time() - t1
        except Exception as e:  # pragma: no cover
            _emit({"bench": "focus", "Mp": Mp, "error": str(e)})
            continue
        _emit({"bench": "focus", "metric": "s/focus-synthesis", "value": dt,
               "T": T, "N": N, "M": M, "Mp": Mp, "method": meth,
               "resamples_per_s": T * N * M * Mp / dt})


def bench_coherence():
    """Coherence imaging on TPU: keep_rx DAS (Pallas fast path, rx axis
    kept) + cohfac/slsc aperture reductions via ri-jit — the BASELINE
    config-5 workload (reference: ``kern/slsc.m``/``kern/cohfac.m`` on SYN
    images from ``bf.cu`` flag bit 3). QUPS_BENCH_SIZE=full runs the
    1024^2 x 256x256 headline config (keep_rx at full size)."""
    import jax
    import jax.numpy as jnp
    from qups_tpu.ops.das_pallas import das_tiled
    from qups_tpu.ops.coherence import cohfac, slsc

    full = os.environ.get("QUPS_BENCH_SIZE") == "full"
    T, N, M = (512, 16, 4) if _tiny() else \
        ((4096, 256, 256) if full else (2048, 128, 64))
    n = 128 if _tiny() else (1024 if full else 512)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, N, M)).astype(np.float32))
    pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
                  -1).astype(np.float32)
    th = np.radians(np.linspace(-9, 9, M))
    pv = np.zeros((M, 3), np.float32)
    nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
    t0 = np.zeros(M, np.float32)
    zs = np.linspace(5e-3, 45e-3, n)
    xs = np.linspace(-12e-3, 12e-3, n)
    Z, X = np.meshgrid(zs, xs, indexing="ij")
    pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()],
                  -1).astype(np.float32)
    use_pallas = jax.devices()[0].platform != "cpu"
    prec = os.environ.get("QUPS_BENCH_PRECISION",
                          "bf16pair" if use_pallas else "f32")

    for name, post in (("cohfac", lambda brx: cohfac(brx, axis=1)),
                       ("slsc", lambda brx: slsc(brx, axis=1,
                                                 lags=max(2, N // 8)))):
        def run(post=post):
            if use_pallas:
                brx = das_tiled(x, pi, pr, pv, nv, t0, 1 / 1540.0,
                                fs=31.25e6, tx_model="plane",
                                im_shape=(n, n, 1), keep_rx=True,
                                precision=prec)
            else:
                from qups_tpu.ops.das import das
                brx = das(np.asarray(x), pi, pr, pv, nv, t0, 1 / 1540.0,
                          fs=31.25e6, tx_model="plane", method="linear",
                          keep_rx=True)
            img = post(brx[..., 0] if use_pallas else brx)
            return float(jnp.sum(jnp.abs(img)))
        try:
            run()
            t1 = time.time()
            run()
            dt = time.time() - t1
        except Exception as e:  # pragma: no cover
            _emit({"bench": "coherence", "which": name, "error": str(e)})
            continue
        _emit({"bench": "coherence", "which": name,
               "metric": "s/frame (keep_rx DAS + reduction)", "value": dt,
               "sums_per_s": n * n * N * M / dt, "n_px_side": n,
               "T": T, "N": N, "M": M, "precision": prec})


def bench_adjoint():
    """bfAdjoint at the headline config (1024^2 px from 256x256 tx/rx,
    T=4096): per-frequency steering GEMMs — the most MXU-native beamformer
    in the repo (``UltrasoundSystem.m:3770-4050`` hot-paths exactly this,
    bin-thresholded). QUPS_BENCH_ADJ_BINS caps the bin count (default 64,
    the -40 dB band of a 2-cycle pulse at this T)."""
    import jax
    import jax.numpy as jnp
    import qups_tpu as q

    T, N, M = (256, 16, 16) if _tiny() else (4096, 256, 256)
    n = 64 if _tiny() else 1024
    nb = int(os.environ.get("QUPS_BENCH_ADJ_BINS", "16" if _tiny()
                            else "64"))
    fs, fc = 31.25e6, 5e6
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    xdc = q.TransducerArray(numel=N, pitch=0.2e-3, fc=fc)
    us = q.UltrasoundSystem(
        tx=xdc, rx=xdc, seq=q.Sequence(type="FSA", numpulse=M, c0=1540.0),
        scan=q.ScanCartesian(x=np.linspace(-12e-3, 12e-3, n),
                             z=np.linspace(5e-3, 45e-3, n)), fs=fs)
    chd = q.ChannelData(data=jnp.asarray(x), fs=fs, t0=0.0)
    # explicit bins around fc: bin selection is shape-affecting, so fixing
    # it keeps the repeated call jit-clean (and the count comparable)
    k0 = int(round(fc / fs * T))
    bins = np.arange(k0 - nb // 2, k0 + nb - nb // 2, dtype=np.int32)

    # kernel='auto' rides the fused Pallas engine on TPU (0.58 s vs 4.0 s
    # XLA at this config); QUPS_BENCH_ADJ_KERNEL=xla times the XLA engine
    kern = os.environ.get("QUPS_BENCH_ADJ_KERNEL", "auto")

    def run():
        b = us.bfAdjoint(chd, bins=bins, kernel=kern)
        return float(jnp.sum(jnp.abs(b)))
    try:
        run()  # compile
        t1 = time.time()
        run()
        dt = time.time() - t1
    except Exception as e:  # pragma: no cover
        _emit({"bench": "adjoint", "error": str(e)})
        return
    # per-bin work: two complex GEMMs, (I,N)x(N,1)-ish steering products
    _emit({"bench": "adjoint", "metric": "s/frame", "value": dt,
           "n_px_side": n, "T": T, "N": N, "M": M, "bins": int(bins.size),
           "kernel": kern, "pix_bins_per_s": n * n * bins.size / dt})


def bench_refocus():
    """refocus (REFoCUS transmit decoding, ``UltrasoundSystem.m:3505-3768``)
    at full scale: decode a Hadamard-encoded (T=4096, N=256, M=256) set
    back to FSA — the tikhonov per-bin GEMM that gates all encoded-sequence
    work."""
    import jax.numpy as jnp
    import qups_tpu as q

    T, N, M = (256, 16, 16) if _tiny() else (4096, 256, 256)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    xdc = q.TransducerArray(numel=M, pitch=0.2e-3, fc=5e6)
    us = q.UltrasoundSystem(
        tx=xdc, rx=xdc, seq=q.Sequence(type="FSA", numpulse=M, c0=1540.0),
        scan=q.ScanCartesian(x=[0.0], z=[20e-3]), fs=31.25e6)

    def hadamard(n):
        H = np.array([[1.0]])
        while H.shape[0] < n:
            H = np.block([[H, H], [H, -H]])
        return H

    seq_enc = q.Sequence(type="FSA", numpulse=M, c0=1540.0,
                         apd=hadamard(M), del_=np.zeros((M, M)))
    chd = q.ChannelData(data=jnp.asarray(x), fs=31.25e6, t0=0.0)

    from qups_tpu.system import _REFOCUS_OP_CACHE

    def run(c):
        dec = us.refocus(c, seq_enc, gamma=0.0)
        return float(jnp.sum(jnp.abs(dec.data)))
    try:
        run(chd)  # compile
        _REFOCUS_OP_CACHE.clear()
        t1 = time.time()
        run(chd)  # full decode: operator build + apply
        dt = time.time() - t1
        # repeated frame, same sequence: the cached decode operator makes
        # this FFT + transmit-GEMM only
        chd2 = chd.replace(data=chd.data * 0.5)
        t1 = time.time()
        run(chd2)
        dt2 = time.time() - t1
    except Exception as e:  # pragma: no cover
        _emit({"bench": "refocus", "error": str(e)})
        return
    _emit({"bench": "refocus", "metric": "s/decode", "value": dt,
           "s_per_decode_cached_op": dt2,
           "T": T, "N": N, "M": M,
           "resamples_per_s": T * N * M * M / dt})


def bench_fdtd():
    """FDTD ms/time-step, 225x225 grid (``ParTest.m:298-318``)."""
    import jax.numpy as jnp
    from qups_tpu.sim.fdtd import kspace_sim_2d

    n = 64 if _tiny() else 225
    c0, h = 1500.0, 0.2e-3
    dt = 0.3 * h / c0
    steps = 50 if _tiny() else 400
    cmap = np.full((n, n), c0, np.float32)
    rmap = np.full((n, n), 1000.0, np.float32)
    t = np.arange(steps) * dt
    sig = (np.sin(2 * np.pi * 2e6 * t)
           * np.exp(-((t - 1e-6) / 0.5e-6) ** 2))[:, None].astype(np.float32)
    src = (np.array([20]), np.array([n // 2]))
    kw = dict(steps=steps, dt=dt, dx=h, c_ref=c0, record_rows=(n - 20,))

    def run():
        return float(jnp.sum(jnp.abs(kspace_sim_2d(cmap, rmap, *src, sig,
                                                   **kw))))
    run()
    t1 = time.time()
    run()
    dtw = time.time() - t1
    _emit({"bench": "fdtd", "metric": "ms/step", "grid": [n, n],
           "steps": steps, "value": dtw / steps * 1e3, "s_total": dtw})


def bench_eikonal():
    """MSFM travel-time maps: ms/map vs grid size (the bfEikonal delay
    backbone; the reference logs every kernel family,
    ``ParTest.m:244-318``). Host C++/numpy solver — grid-size sweep."""
    from qups_tpu.ops.eikonal import msfm

    sizes = (64, 128) if _tiny() else (128, 256, 512, 1024)
    t_stop = time.time() + _budget()
    for n in sizes:
        if time.time() > t_stop:
            _emit({"bench": "eikonal", "skipped": n, "reason": "budget"})
            break
        F = np.full((n, n), 1540.0)
        F[n // 3:, :] = 1650.0  # heterogeneous layer
        src = np.array([[0, n // 2]])
        msfm(F, 0.2e-3, src)  # warm (native .so load / fallback trace)
        reps = 3
        t1 = time.time()
        for _ in range(reps):
            msfm(F, 0.2e-3, src)
        dt = (time.time() - t1) / reps
        _emit({"bench": "eikonal", "metric": "ms/map", "grid": [n, n],
               "value": dt * 1e3, "cells_per_s": n * n / dt})


def bench_migration():
    """Stolt f-k migration s/frame at the PW headline scale
    (``UltrasoundSystem.m:4740-4860``)."""
    import jax.numpy as jnp
    from qups_tpu.ops.fdbf import stolt_migration
    from qups_tpu.utils.cpx import ri_split

    T, N, M = (512, 64, 4) if _tiny() else (4096, 256, 16)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    th = np.linspace(-9.0, 9.0, M)
    del_tx = np.zeros((N, M), np.float32)
    import jax

    @jax.jit
    def run(xj):
        img = stolt_migration(xj, 0.0, del_tx, tuple(th), fs=31.25e6,
                              c0=1540.0, pitch=0.15e-3, out="complex")
        return ri_split(img)

    xj = jnp.asarray(x)
    jax.block_until_ready(run(xj))  # compile + warm
    reps = 3
    t1 = time.time()
    for _ in range(reps):
        jax.block_until_ready(run(xj))
    dt = (time.time() - t1) / reps
    _emit({"bench": "migration", "metric": "s/frame", "shape": [T, N, M],
           "value": dt, "pix_tx_per_s": T * N * M / dt})


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("das", "all"):
        bench_das()
    if which in ("greens", "all"):
        bench_greens()
    if which in ("coherence", "all"):
        bench_coherence()
    if which in ("lut", "all"):
        bench_lut()
    if which in ("focus", "all"):
        bench_focus()
    if which in ("adjoint", "all"):
        bench_adjoint()
    if which in ("refocus", "all"):
        bench_refocus()
    if which in ("fdtd", "all"):
        bench_fdtd()
    if which in ("eikonal", "all"):
        bench_eikonal()
    if which in ("migration", "all"):
        bench_migration()


if __name__ == "__main__":
    main()
