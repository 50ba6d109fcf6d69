"""Pallas TPU Green's-function splat kernel.

The TPU-native form of the reference's greens simulator hot loop
(``/root/reference/src/greens.cu:8-86`` with the range-sorted scatterer
block windows of ``src/UltrasoundSystem.m:628-715``). The splat+convolve
factorization of :mod:`qups_tpu.ops.greens` is kept — each scatterer
deposits interpolation weights at its fractional two-way delay, then ONE
batched FFT convolution applies the pulse kernel — but the deposit loop,
which XLA scatter (`.at[].add`) scalarizes into unusability on TPU, becomes
a Pallas kernel built from broadcast-compare splatting:

* the deposit grid is laid out ``(M, G, N)`` — time rows on sublanes, rx
  elements on lanes — and tiled ``(1, 8, 128)``;
* scatterers are range-sorted host-side; per ``(m, time-tile)`` a window of
  sorted-scatterer *chunks* is precomputed from pure geometry (the
  ``iblock`` trick), passed as scalar-prefetch arrays that drive the chunk
  BlockSpec index map — out-of-window chunks are skipped with ``pl.when``;
* per group of 8 scatterers (sublanes) x 128 rx (lanes): radii ``r1``
  (8, 128) and ``r2`` (8, 1) are computed in-register from packed
  positions, the fractional deposit row ``p`` and the 1/r-loss weight are
  formed, and each of the 8 output rows accumulates
  ``w * B(p - row)`` — ``B`` the linear tent (or Catmull-Rom) splat basis —
  via a sublane reduction. Scatterers outside the tile contribute exactly
  zero, so windows are purely a performance optimization, never a
  correctness risk;
* a per-rx integer row offset ``ofs[n]`` (the median geometric delay to
  that element) is subtracted from every deposit and re-added as a static
  slice after the convolution, which shrinks the per-tile delay spread —
  and with it the number of visited tiles — by aligning each channel's
  echo hyperbola.

Real (f32) kernels/amplitudes only; complex falls back to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splat_kernel(lo_ref, nc_ref, scat_hbm, pn_ref, ofs_ref, pv_ref, o_ref,
                  scratch, sem, *, CS: int, cinv_fs: float, pconst: float,
                  R0: float, basis: str):
    """Grid (NB, M, T_tiles). The per-(m, t) chunk window is streamed
    INSIDE the kernel with double-buffered DMA from the HBM-resident
    scat array (8, Spad) — FIELDS on sublanes [x, y, z, amp, 0...],
    scatterers on lanes, so chunks are dense in HBM (a (CS, 8) layout
    lane-pads 16x). The in-kernel fori has the exact per-tile trip count,
    so no grid steps are wasted on pl.when-skipped chunk slots (the
    previous CHUNKS grid dim padded every tile to the global max and
    spent ~half the grid steps skipping). Groups of 8 scatterers are
    transposed in-register. pn (8, 128) rx rows [x, y, z]; ofs (1, 128)
    f32 per-rx row offset; pv (8, Mpad) SMEM tx rows [x, y, z];
    o (1, 8, 128) deposit tile, written once per grid step."""
    m = pl.program_id(1)
    t = pl.program_id(2)
    nb = pl.program_id(0)
    lo = lo_ref[nb, m, t]
    nchunks = nc_ref[nb, m, t]

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            scat_hbm.at[:, pl.ds((lo + c) * CS, CS)],
            scratch.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _warm():
        get_dma(0, 0).start()

    pnx = pn_ref[0:1, :]  # (1, 128)
    pny = pn_ref[1:2, :]
    pnz = pn_ref[2:3, :]
    ofs = ofs_ref[0:1, :]
    pvx = pv_ref[0, m]
    pvy = pv_ref[1, m]
    pvz = pv_ref[2, m]
    row0 = (t * 8).astype(jnp.float32)

    def _group_body(blk, acc):  # blk (8, 8): [x y z a ...] per scatterer
        sx = blk[:, 0:1]  # (8, 1)
        sy = blk[:, 1:2]
        sz = blk[:, 2:3]
        a = blk[:, 3:4]
        dx = sx - pnx  # (8, 128)
        dy = sy - pny
        dz = sz - pnz
        r1 = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # (8, 128)
        ex = sx - pvx
        ey = sy - pvy
        ez = sz - pvz
        r2 = jnp.sqrt(ex * ex + ey * ey + ez * ez)  # (8, 1)
        # fractional deposit row within this tile
        p = (cinv_fs * (r1 + r2) + pconst) - ofs - row0  # (8, 128)
        if R0 > 0:
            w = a / (jnp.maximum(r1, R0) * jnp.maximum(r2, R0))
        else:
            w = a * jnp.ones_like(r1)
        rows = []
        for r in range(8):
            d = p - float(r)
            if basis == "linear":
                b = jnp.maximum(0.0, 1.0 - jnp.abs(d))
            else:  # cubic Catmull-Rom splat basis (interpd.cu:89-113)
                ad = jnp.abs(d)
                inner = ((1.5 * ad - 2.5) * ad) * ad + 1.0
                outer = ((-0.5 * ad + 2.5) * ad - 4.0) * ad + 2.0
                b = jnp.where(ad <= 1.0, inner,
                              jnp.where(ad < 2.0, outer, 0.0))
            rows.append(jnp.sum(w * b, axis=0, keepdims=True))  # (1,128)
        return acc + jnp.concatenate(rows, axis=0)  # (8, 128)

    def _chunk_body(c, acc):
        slot = c % 2
        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()
        get_dma(slot, c).wait()
        blk = scratch[slot]  # (8, CS)
        # static unroll over the chunk's 8-scatterer groups; each group is
        # an (8 fields, 8 scatterers) static slice transposed in-register
        # to (scatterers, fields) so the grouped vector math applies
        for g in range(CS // 8):
            acc = _group_body(blk[:, g * 8:(g + 1) * 8].T, acc)
        return acc

    acc = jax.lax.fori_loop(0, nchunks, _chunk_body,
                            jnp.zeros((8, 128), jnp.float32))
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=(
    "Gtime", "CS", "cinv_fs", "pconst", "R0", "basis", "interpret"))
def _splat_tiled(lo, nc, scat, pn, ofs, pv, *, Gtime: int, CS: int,
                 cinv_fs: float, pconst: float, R0: float,
                 basis: str, interpret: bool = False):
    NB, M, TT = lo.shape
    kern = functools.partial(_splat_kernel, CS=CS, cinv_fs=cinv_fs,
                             pconst=pconst, R0=R0, basis=basis)
    grid = (NB, M, TT)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            # scat stays HBM-resident: the kernel streams chunk windows
            # itself with double-buffered DMA (dynamic per-(m,t) trip
            # count — no padded CHUNKS grid dim, no pl.when-skipped steps)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, 128), lambda nb, m, t, *_: (0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda nb, m, t, *_: (0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pv (8, Mpad)
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda nb, m, t, *_: (m, t, nb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 8, CS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, Gtime, NB * 128), jnp.float32),
        interpret=interpret,
    )(lo, nc, scat, pn, ofs, pv)
    return out


def _plan_scat_windows(sort_u, sort_U, a2, ntiles, CS, Q: int = 4):
    """Chunk windows per (m, tile) from sorted per-scatterer deposit-row
    intervals. ``sort_u/sort_U`` (S,) are the rx-wise min/max of the
    ofs-shifted one-way deposit rows (sorted order); ``a2`` (S, M) the
    per-tx additive term. Returns (lo_chunk, n_chunk) each (M, ntiles).

    ``Q``: window starts are quantized DOWN to multiples of Q chunks (ends
    rounded up) so consecutive tiles share the same scatterer block index
    sequence — the Pallas pipeline then skips the (lane-padded, ~128 KB)
    chunk re-fetch between most grid steps, which otherwise dominates the
    runtime (out-of-window scatterers deposit exactly zero, so widening is
    always safe)."""
    S, M = a2.shape
    lo_chunk = np.zeros((M, ntiles), np.int32)
    n_chunk = np.zeros((M, ntiles), np.int32)
    tq = np.arange(ntiles)
    for m in range(M):
        t0s = np.floor((sort_u + a2[:, m]) / 8.0).astype(np.int64) - 1
        t1s = np.ceil((sort_U + a2[:, m]) / 8.0).astype(np.int64) + 1
        # first scatterer that can reach tile t: running max of t1
        D = np.maximum.accumulate(t1s)
        losc = np.searchsorted(D, tq, side="left")
        # last scatterer that can reach tile t: running min (from the right)
        E = np.minimum.accumulate(t0s[::-1])[::-1]
        hisc = np.searchsorted(E, tq, side="right")
        SB = -(-S // CS)  # total chunks
        lo_c = np.minimum(losc // CS, max(0, SB - 1))
        hi_c = -(-np.maximum(hisc, losc) // CS)
        lo_c = (lo_c // Q) * Q
        # widen to the quantum but NEVER past the last chunk: the kernel's
        # clamped chunk index map would re-process (= re-deposit) it
        hi_c = np.minimum(-(-hi_c // Q) * Q, SB)
        lo_chunk[m] = lo_c
        n_chunk[m] = np.maximum(0, hi_c - lo_c)
    return lo_chunk, n_chunk


def greens_tiled(kern, ps, amp, pn, pv, *, T: int, s0: float, t0k: float,
                 fs: float, cinv, R0: float, fsr: float = 1.0,
                 method: str = "linear", interpret: bool = False,
                 CS: int = 256, out: str = "auto"):
    """Fast Pallas Green's-function FSA simulation.

    Same contract as :func:`qups_tpu.ops.greens.greens_splat`: ``kern`` (K,)
    sampled at ``fsr * fs`` (real or complex — the deposit grid is
    kernel-independent, so a complex kernel costs ONE splat pass plus two
    convolutions); ``ps`` (S, 3) scatterer positions; ``amp`` (S,) real
    amplitudes; ``pn`` (N, En, 3) rx sub-element positions; ``pv``
    (M, Em, 3) tx sub-element positions.

    Returns FSA data (T, N, M) f32 for a real kernel; for a complex kernel,
    ``out='ri'`` (the default on TPU via 'auto') returns the boundary-safe
    ri pair (T, N, M, 2) and ``out='complex'`` a complex64 array.

    ``method``: 'linear' or 'cubic' — the splat basis (== the interpolation
    method of the dense oracle when ``fsr == 1``).
    """
    if method not in ("linear", "cubic"):
        raise ValueError("greens_tiled supports linear/cubic splat only")
    kern = np.asarray(kern)
    assert not np.iscomplexobj(np.asarray(amp)), \
        "greens_tiled needs real amplitudes; split re/im passes for complex"
    ps = np.asarray(ps, np.float32)
    amp = np.asarray(amp, np.float32)

    # very large scatterer clouds: process in slabs host-side (traces add
    # linearly) — bounds the per-(m, tile) chunk-window length and the
    # grid size, which otherwise grow with S (the reference's tall-array /
    # bsize blocking, ``UltrasoundSystem.m:756-762``)
    SLAB = 131072
    if ps.shape[0] > SLAB:
        acc = None
        for s0_ in range(0, ps.shape[0], SLAB):
            part = greens_tiled(kern, ps[s0_:s0_ + SLAB],
                                amp[s0_:s0_ + SLAB], pn, pv, T=T, s0=s0,
                                t0k=t0k, fs=fs, cinv=cinv, R0=R0, fsr=fsr,
                                method=method, interpret=interpret, CS=CS,
                                out=out)
            acc = part if acc is None else jax.jit(jnp.add)(acc, part)
        return acc
    pn = np.asarray(pn, np.float32)
    pv = np.asarray(pv, np.float32)
    if pn.ndim == 2:
        pn = pn[:, None, :]
    if pv.ndim == 2:
        pv = pv[:, None, :]
    N, En = pn.shape[:2]
    M, Em = pv.shape[:2]
    S = ps.shape[0]
    cinv = float(np.asarray(cinv).reshape(()))

    if fsr != 1.0:  # resample the kernel to the output rate (host, cheap)
        from .interp import interp1
        K0 = kern.shape[0]
        Kn = int(np.ceil(K0 / fsr))
        kern = np.asarray(interp1(jnp.asarray(kern),
                                  jnp.arange(Kn, dtype=jnp.float32) * fsr,
                                  method="cubic" if method == "cubic" else "linear"))
    K = kern.shape[0]

    # ---- host-side geometry planning (numpy, exact) ----
    # one-way rx delay rows (S, N) using element centers; sub-elements only
    # widen the bounds below
    cn = pn.mean(axis=1)  # (N, 3)
    cm = pv.mean(axis=1)  # (M, 3)
    r1c = np.linalg.norm(ps[:, None, :] - cn[None], axis=-1)  # (S, N)
    a1 = cinv * fs * r1c  # rows
    # per-rx alignment offset: median deposit row for that channel
    ofs = np.round(np.median(a1, axis=0)).astype(np.int64)  # (N,)
    a1s = a1 - ofs[None, :]
    # widen by the sub-element geometric radius (bound on |r_sub - r_center|)
    sub_r1 = float(np.max(np.linalg.norm(pn - cn[:, None, :], axis=-1))) if En > 1 else 0.0
    sub_r2 = float(np.max(np.linalg.norm(pv - cm[:, None, :], axis=-1))) if Em > 1 else 0.0
    pad_rows = cinv * fs * (sub_r1 + sub_r2)
    u = a1s.min(axis=1) - pad_rows  # (S,)
    U = a1s.max(axis=1) + pad_rows
    r2c = np.linalg.norm(ps[:, None, :] - cm[None], axis=-1)  # (S, M)
    a2r = cinv * fs * r2c
    tshift_rows = (t0k - s0) * fs

    # support margin of the splat basis
    marg = 2.0 if method == "linear" else 3.0
    # deposit row bounds (pre-P0), clipped to the useful output range:
    # deposits whose kernel support cannot reach [0, T) are dropped
    dep_lo = u.min() + a2r.min() + tshift_rows
    dep_hi = U.max() + a2r.max() + tshift_rows
    # deposits ride the ofs-shifted space p = ti - ofs[n]; the useful ti
    # range is [-(K+marg), T+marg], so the union over channels is:
    need_lo = -(K + marg + 2) - float(ofs.max())
    need_hi = T + marg + 2 - float(ofs.min())
    p_lo = max(dep_lo, need_lo)
    p_hi = min(dep_hi, need_hi)
    if p_hi < p_lo:  # nothing lands in the output window
        return jnp.zeros((T, N, M), jnp.float32)
    P0 = int(np.ceil(-p_lo + marg + 1))
    Gtime = int(np.ceil(p_hi + P0 + marg + 2))
    Gtime = -(-Gtime // 8) * 8
    ntiles = Gtime // 8

    # sort scatterers by the m-independent delay center
    key = (u + U) / 2 + a2r.mean(axis=1)
    order = np.argsort(key)
    ps_s = ps[order]
    amp_s = amp[order]
    u_s = (u + tshift_rows + P0)[order]
    U_s = (U + tshift_rows + P0)[order]
    a2_s = a2r[order]

    # pack scatterers (8, Spad): rows [x, y, z, amp, 0...] — scatterers on
    # LANES so the HBM chunk blocks are dense (see _splat_kernel)
    Spad = -(-S // CS) * CS
    scat = np.zeros((8, Spad), np.float32)
    scat[0:3, :S] = ps_s.T
    scat[3, :S] = amp_s
    if Spad > S:  # replicate last position with zero amplitude
        scat[0:3, S:] = ps_s[-1][:, None]

    # rx lanes (pad to 128 multiples); pads replicate the last element so
    # radii stay finite; their columns are cropped after the kernel
    Npad = -(-N // 128) * 128
    NB = Npad // 128
    ofs_pad = np.zeros(Npad, np.int64)
    ofs_pad[:N] = ofs
    ofs_pad[N:] = ofs[-1]

    lo_all = np.zeros((NB, M, ntiles), np.int32)
    nc_all = np.zeros((NB, M, ntiles), np.int32)
    # Q=1: with the chunk stream inside the kernel there is no inter-step
    # block reuse to preserve, so windows can be exact (fewest chunks)
    lo_c, nc_c = _plan_scat_windows(u_s, U_s, a2_s, ntiles, CS, Q=1)
    for nb in range(NB):  # windows are rx-global (u/U span all rx)
        lo_all[nb] = lo_c
        nc_all[nb] = nc_c

    Mpad = -(-M // 128) * 128
    cinv_fs = cinv * fs
    pconst = float(tshift_rows + P0)

    # accumulate the deposit grid over sub-element pairs, then convolve once
    grid_sum = None
    for en in range(En):
        for em in range(Em):
            pnk = np.zeros((8, Npad), np.float32)
            pnk[0, :N] = pn[:, en, 0]
            pnk[1, :N] = pn[:, en, 1]
            pnk[2, :N] = pn[:, en, 2]
            pnk[0, N:] = pn[-1, en, 0]
            pnk[1, N:] = pn[-1, en, 1]
            pnk[2, N:] = pn[-1, en, 2]
            pvk = np.zeros((8, Mpad), np.float32)
            pvk[0, :M] = pv[:, em, 0]
            pvk[1, :M] = pv[:, em, 1]
            pvk[2, :M] = pv[:, em, 2]
            g = _splat_tiled(jnp.asarray(lo_all), jnp.asarray(nc_all),
                             jnp.asarray(scat), jnp.asarray(pnk),
                             jnp.asarray(ofs_pad[None, :].astype(np.float32)),
                             jnp.asarray(pvk), Gtime=Gtime, CS=CS,
                             cinv_fs=cinv_fs, pconst=pconst,
                             R0=float(R0), basis=method, interpret=interpret)
            grid_sum = g if grid_sum is None else grid_sum + g

    # ---- convolve with the pulse kernel along the deposit axis, then undo
    # the per-rx offset. Two strategies (QUPS_GREENS_FINISH=conv|fft):
    # 'conv' (default) = depthwise lax.conv + per-rx static slices;
    # 'fft' = one rfft/irfft pass with per-rx-lane phase ramps
    # exp(+2j pi k sh_n / L) realizing x[t,n,m] = full[m, t+sh_n, n]. ----
    @functools.partial(jax.jit, static_argnames=("T", "P0", "ofs_t", "how"))
    def finish(grid, kv, *, T, P0, ofs_t, how="conv"):
        M_, G_, Npad_ = grid.shape
        Nn = len(ofs_t)
        K_ = kv.shape[0]
        Gf = G_ + K_ - 1
        sh = np.asarray([P0 - o for o in ofs_t], np.int64)
        maxsh = int(sh.max())
        minsh = int(sh.min())
        if how == "fft":
            # circular-shift safety: out-of-range taps land on zero-pad
            L = max(Gf, maxsh + T, Gf - minsh)
            L = int(2 ** np.ceil(np.log2(max(2, L))))  # fast FFT size
            F = jnp.fft.rfft(grid[:, :, :Nn], n=L, axis=1)  # (M, L/2+1, N)
            Kf = jnp.fft.rfft(kv, n=L)  # (L/2+1,)
            k = np.arange(L // 2 + 1)
            ph = np.exp(2j * np.pi / L * k[None, :] * sh[:, None])
            mix = (Kf[None, :, None]
                   * jnp.asarray(ph.T[None], jnp.complex64))  # (1,L/2+1,N)
            x = jnp.fft.irfft(F * mix, n=L, axis=1)[:, :T]  # (M, T, N)
            return jnp.transpose(x, (1, 2, 0))
        # depthwise conv along the deposit axis (rides the conv unit; the
        # (K,1,Npad) depthwise rhs measured 33 ms at config-#4 shape)
        rhs = jnp.tile(kv[::-1].reshape(K_, 1, 1), (1, 1, Npad_))
        full = jax.lax.conv_general_dilated(
            grid, rhs, window_strides=(1,), padding=[(K_ - 1, K_ - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=Npad_)  # (M, Gf, Npad)
        padlo = max(0, -minsh)
        padhi = max(0, maxsh + T - Gf)
        fullp = jnp.pad(full, ((0, 0), (padlo, padhi), (0, 0)))
        cols = [fullp[:, (s + padlo):(s + padlo + T), n]
                for n, s in enumerate(sh)]
        x = jnp.stack(cols, axis=-1)  # (M, T, N)
        return jnp.transpose(x, (1, 2, 0))

    import os
    ofs_t = tuple(int(o) for o in ofs_pad[:N])
    how = os.environ.get("QUPS_GREENS_FINISH", "conv")
    if np.iscomplexobj(kern):
        xr = finish(grid_sum, jnp.asarray(kern.real, jnp.float32), T=T,
                    P0=P0, ofs_t=ofs_t, how=how)
        xi = finish(grid_sum, jnp.asarray(kern.imag, jnp.float32), T=T,
                    P0=P0, ofs_t=ofs_t, how=how)
        if out == "complex":
            from ..utils.cpx import cjoin
            return cjoin(xr, xi)
        return jnp.stack([xr, xi], axis=-1)  # boundary-safe ri pair
    return finish(grid_sum, jnp.asarray(kern, jnp.float32), T=T, P0=P0,
                  ofs_t=ofs_t, how=how)
