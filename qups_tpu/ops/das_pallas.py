"""Pallas TPU delay-and-sum kernel.

The fused DAS hot loop (``src/bf.cu:50-142``) built for TPU v5e's actual
ISA. The hard part (SURVEY.md §7): DAS is a per-(pixel, rx, tx) gather, and
TPU has no general hardware gather — XLA lowers it to a scalar loop
(~1e8 gathers/s measured on-chip). Mosaic *does* support a same-shape
``take_along_axis`` along the lane axis — a per-element 128-way select
within a row. This kernel is built around that primitive plus the
range-block trick of ``greens.cu:628-715``:

* image tile = 8 scan rows (sublanes) x 128 row-pixels (lanes), where scan
  rows are iso-depth (cartesian z / polar r) so the delay spread within a
  tile is bounded by geometry;
* per (tile, rx n, tx m): compute the two-way delay in-register, take the
  tile's min sample index k0 (scalar), dynamic-slice W = 128 contiguous
  trace samples into a lane vector, broadcast across sublanes, and fetch
  both linear-interp taps with lane gathers at ``idx - k0``; tiles whose
  spread exceeds one window use J > 1 shifted windows with masked selects
  (J is static, computed host-side from pure geometry);
* the transmit loop is the innermost grid dimension so the output tile
  accumulates in place (revisited block), and rx is an in-kernel loop over
  the (T, N) trace block held in VMEM.

Real f32 data (RF); IQ/complex data beamforms as two real channels via the
wrapper in :func:`das_tiled`, with the ``fmod`` phasor applied in-kernel.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel(pz_ref, px_ref, py_ref, pr_ref, pv_ref, *refs,
            N: int, T: int, J: int, fs: float, cinv: float, tx_model: str,
            planar: bool = False, iq: bool = False, fmod: float = 0.0,
            MC: int = 1, W: int = 128):
    """Grid: (RB, CB, M). Blocks: pz/px/py (8, 128) pixel coords;
    pr (8, Npad) rx positions rows [x, y, z]; pv (8, Mpad) per-tx rows
    [pvx, pvy, pvz, nvx, nvy, nvz, t0]; x (1, N, T) traces of tx m (time on
    lanes so trace windows slice directly onto a vector register);
    o (8, 128) image tile (accumulated over the m grid dim). In IQ mode the
    trace/output are (re, im) ref pairs and the ``fmod`` remodulation phasor
    ``exp(2j pi fmod tau)`` (``bf.cu:117``) rotates each sample."""
    if iq:
        xre_ref, xim_ref, ore_ref, oim_ref = refs
    else:
        (x_ref, o_ref) = refs
    mc = pl.program_id(2)

    @pl.when(mc == 0)
    def _init():
        if iq:
            ore_ref[:] = jnp.zeros_like(ore_ref)
            oim_ref[:] = jnp.zeros_like(oim_ref)
        else:
            o_ref[:] = jnp.zeros_like(o_ref)

    pz = pz_ref[:]
    px = px_ref[:]
    py = py_ref[:]

    def tx_body(c, outer_accs):
        m = mc * MC + c  # global transmit index (into pv's packed params)
        pvx = pv_ref[0, m]
        pvy = pv_ref[1, m]
        pvz = pv_ref[2, m]
        nvx = pv_ref[3, m]
        nvy = pv_ref[4, m]
        nvz = pv_ref[5, m]
        t0m = pv_ref[6, m]

        # transmit path length (shared across rx); planar skips y math
        rvx = px - pvx
        rvz = pz - pvz
        if planar:
            rdotn = rvx * nvx + rvz * nvz
            r2 = rvx * rvx + rvz * rvz
        else:
            rvy = py - pvy
            rdotn = rvx * nvx + rvy * nvy + rvz * nvz
            r2 = rvx * rvx + rvy * rvy + rvz * rvz
        if tx_model == "plane":
            dv = rdotn
        else:
            rnorm = jnp.sqrt(r2)
            dv = rnorm if tx_model == "diverging" else jnp.where(
                rdotn >= 0, rnorm, -rnorm)

        def rx_group_body(g, accs):
            # process 8 receive elements per iteration: slab loads need 8-aligned
            # sublane starts, and adjacent elements share (almost) the same
            # delay window, so the aligned chunks are shared across the group
            accre, accim = accs
            n8 = pl.multiple_of(g * 8, 8)
            tis = []
            us_ = []
            valids = []
            for r in range(8):
                n = n8 + r
                ex = pr_ref[0, n]
                ez = pr_ref[2, n]
                dx_ = px - ex
                dz_ = pz - ez
                if planar:
                    dr = jnp.sqrt(dx_ * dx_ + dz_ * dz_)
                else:
                    dy_ = py - pr_ref[1, n]
                    dr = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
                ti = (cinv * (dv + dr) - t0m) * fs
                i0f = jnp.floor(ti)
                u = ti - i0f
                i0 = i0f.astype(jnp.int32)
                valids.append((ti >= 0) & (ti <= T - 1))
                tis.append(jnp.clip(i0, 0, T - 2))
                us_.append(u)
            qmin = jnp.min(tis[0])
            for r in range(1, 8):
                qmin = jnp.minimum(qmin, jnp.min(tis[r]))
            q0 = jnp.clip(qmin // W, 0, T // W - 1)

            nch = 2 if iq else 1
            val0 = [[jnp.zeros((8, 128), jnp.float32) for _ in range(8)]
                    for _ in range(nch)]
            val1 = [[jnp.zeros((8, 128), jnp.float32) for _ in range(8)]
                    for _ in range(nch)]
            for j in range(J):
                qj = jnp.clip(q0 + j, 0, T // W - 1)
                ws = pl.multiple_of(qj * W, W)
                slabs = [xr[c, pl.ds(n8, 8), pl.ds(ws, W)]
                         for xr in ((xre_ref, xim_ref) if iq else (x_ref,))]
                for r in range(8):
                    lj = tis[r] - ws
                    sel0 = (lj >= 0) & (lj < W)
                    sel1 = (lj >= -1) & (lj < W - 1)
                    l0 = jnp.clip(lj, 0, W - 1)
                    l1 = jnp.clip(lj + 1, 0, W - 1)
                    for ch, slab in enumerate(slabs):
                        wrow = jnp.broadcast_to(slab[r].reshape(1, W), (8, W))
                        g0 = jnp.take_along_axis(wrow, l0, axis=1)
                        g1 = jnp.take_along_axis(wrow, l1, axis=1)
                        val0[ch][r] = jnp.where(sel0, g0, val0[ch][r])
                        val1[ch][r] = jnp.where(sel1, g1, val1[ch][r])
            for r in range(8):
                vre = val0[0][r] * (1.0 - us_[r]) + val1[0][r] * us_[r]
                vre = jnp.where(valids[r], vre, 0.0)
                if iq:
                    vim = val0[1][r] * (1.0 - us_[r]) + val1[1][r] * us_[r]
                    vim = jnp.where(valids[r], vim, 0.0)
                    if fmod != 0.0:
                        # tau (seconds) = ti / fs; phasor exp(2j pi fmod tau)
                        ph = (2.0 * np.pi * fmod / fs) * (tis[r] + us_[r])
                        cph = jnp.cos(ph)
                        sph = jnp.sin(ph)
                        vre, vim = vre * cph - vim * sph, vre * sph + vim * cph
                    accim = accim + vim
                accre = accre + vre
            return (accre, accim)

        z8 = jnp.zeros((8, 128), jnp.float32)
        are_, aim_ = jax.lax.fori_loop(0, N // 8, rx_group_body, (z8, z8))
        ore_o, oim_o = outer_accs
        return (ore_o + are_, oim_o + aim_)

    z8o = jnp.zeros((8, 128), jnp.float32)
    accre, accim = jax.lax.fori_loop(0, MC, tx_body, (z8o, z8o))
    if iq:
        ore_ref[:] += accre
        oim_ref[:] += accim
    else:
        o_ref[:] += accre


def _plan_windows(pz, px, py, pr, pv, nv, t0, fs, cinv, T, tx_model,
                  W=128):
    """Host-side: per-row-stripe (8 image rows) max delay-index spread over
    (true 8x128 tile x 8-rx-group x tx) -> static window count J per stripe
    (the range-block trick of ``greens.cu:628-715``, geometry only)."""
    I1, I2 = pz.shape
    RB, CB = I1 // 8, I2 // 128
    # tiles (RB*CB, 1024, 3) in kernel layout
    g = np.stack([px, py, pz], -1).reshape(RB, 8, CB, 128, 3)
    tiles = np.moveaxis(g, 2, 1).reshape(RB * CB, 8 * 128, 3)
    N = pr.shape[0]
    spread = np.zeros(RB * CB)
    gstarts = np.unique((np.linspace(0, max(0, N - 8), 8) // 8).astype(int) * 8)
    msel = np.unique(np.linspace(0, pv.shape[0] - 1, 8).astype(int))
    for mi in msel:
        rv = tiles - pv[mi]
        if tx_model == "plane":
            dv = (rv * nv[mi]).sum(-1)
        else:
            r = np.linalg.norm(rv, axis=-1)
            dv = r if tx_model == "diverging" else np.where(
                (rv * nv[mi]).sum(-1) >= 0, r, -r)
        for g0 in gstarts:
            nn = np.arange(g0, min(g0 + 8, N))
            dr = np.linalg.norm(tiles[:, None] - pr[nn][None, :, None],
                                axis=-1)  # (RB*CB, 8, P)
            ti = (cinv * (dv[:, None] + dr) - t0[mi]) * fs
            sgrp = ti.max(axis=(1, 2)) - ti.min(axis=(1, 2))
            spread = np.maximum(spread, sgrp)
    Jt = np.ceil((spread * 1.1 + 8) / W).astype(int) + 1
    # one J per row stripe: max over its column tiles
    return np.maximum(1, Jt.reshape(RB, CB).max(axis=1))  # (RB,)


@functools.partial(jax.jit, static_argnames=(
    "fs", "tx_model", "J", "planar", "fmod", "interpret"))
def _das_tiled_real(x, pz, px, py, pr, pv, *, fs, tx_model, J,
                    planar=False, fmod=0.0, xim=None, interpret=False):
    RB = pz.shape[0] // 8
    CB = pz.shape[1] // 128
    M = x.shape[0]
    N, T = x.shape[1], x.shape[2]
    iq = xim is not None
    # transmit chunk size: keep the double-buffered trace blocks within a
    # VMEM budget; chunking cuts HBM re-streaming of the traces per tile
    per_tx = N * T * 4 * (2 if iq else 1)
    MC = int(max(1, min(M, (6 * 2**20) // max(per_tx, 1))))
    while M % MC:
        MC -= 1
    kern = functools.partial(_kernel, N=N, T=T, J=J, fs=fs,
                             cinv=1.0, tx_model=tx_model, planar=planar,
                             iq=iq, fmod=fmod, MC=MC)
    # cinv is folded into the positions upstream (scaled by cinv) to keep
    # the kernel argument list scalar-free
    grid = (RB, CB, M // MC)
    tile = pl.BlockSpec((8, 128), lambda rb, cb, m: (rb, cb),
                        memory_space=pltpu.VMEM)
    trace = pl.BlockSpec((MC, N, T), lambda rb, cb, m: (m, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [tile, tile, tile,
                pl.BlockSpec(memory_space=pltpu.SMEM),   # pr (8, Npad)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # pv (8, Mpad)
                trace] + ([trace] if iq else [])
    oshape = jax.ShapeDtypeStruct(pz.shape, jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(tile, tile) if iq else tile,
        out_shape=(oshape, oshape) if iq else oshape,
        interpret=interpret,
    )(pz, px, py, pr, pv, x, *((xim,) if iq else ()))
    return out


def das_tiled(x, pi, pr, pv, nv, t0, cinv, *, fs: float,
              tx_model: str = "virtual", method: str = "linear",
              fmod: float = 0.0, im_shape: Optional[Tuple[int, ...]] = None,
              out: str = "complex", interpret: bool = False):
    """Fast Pallas DAS (single-tx-model, linear interp, rx+tx summed).

    Same contract as :func:`qups_tpu.ops.das.das` for the common path:
    ``x (T, N, M)`` real or complex; pixels ``pi (I, 3)`` ordered so that
    consecutive groups of 128 lie on an iso-depth scan row (true for
    cartesian 'ZXY' and polar 'RAY' grids flattened in C order when I2 is a
    multiple of 128 — the wrapper pads otherwise). Returns (I, 1, 1).
    """
    x_in = x
    cplx = bool(np.iscomplexobj(np.empty(0, dtype=getattr(x, "dtype", np.float32))))
    if not cplx:
        x = jnp.asarray(x)
    pi = np.asarray(pi, np.float32)
    pr_np = np.asarray(pr, np.float32)
    pv_np = np.asarray(pv, np.float32)
    nv_np = np.asarray(nv, np.float32)
    T, N, M = x.shape[:3]
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    cinv = float(np.asarray(cinv).reshape(()))
    I = pi.shape[0]

    if im_shape is None:
        im_shape = (I, 1, 1)
    I1, I2, I3 = im_shape
    assert I3 == 1, "das_tiled supports planar scans (I3 == 1)"
    # pad image to (8k rows, 128k cols)
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    grid2 = pi.reshape(I1, I2, 3)
    gpad = np.pad(grid2, ((0, I1p - I1), (0, I2p - I2), (0, 0)), mode="edge")
    pz = np.ascontiguousarray(gpad[:, :, 2])
    px = np.ascontiguousarray(gpad[:, :, 0])
    py = np.ascontiguousarray(gpad[:, :, 1])

    # pack rx / tx params into lane-padded (8, K) f32 arrays
    Npad = -(-N // 128) * 128
    Mpad = -(-M // 128) * 128
    prk = np.zeros((8, Npad), np.float32)
    prk[0, :N] = pr_np[:, 0]
    prk[1, :N] = pr_np[:, 1]
    prk[2, :N] = pr_np[:, 2]
    # padded (zero-trace) elements replicate the last real position so the
    # shared group window min is not skewed by out-of-geometry dummies
    prk[0, N:] = pr_np[-1, 0]
    prk[1, N:] = pr_np[-1, 1]
    prk[2, N:] = pr_np[-1, 2]
    pvk = np.zeros((8, Mpad), np.float32)
    pvk[0, :M] = pv_np[:, 0]
    pvk[1, :M] = pv_np[:, 1]
    pvk[2, :M] = pv_np[:, 2]
    pvk[3, :M] = nv_np[:, 0]
    pvk[4, :M] = nv_np[:, 1]
    pvk[5, :M] = nv_np[:, 2]
    pvk[6, :M] = t0[:M]

    # fold cinv into the geometry: scale distances by cinv so the kernel
    # computes tau = dv' + dr' - t0 directly (cinv == 1 in-kernel)
    sc = cinv
    pzs, pxs, pys = pz * sc, px * sc, py * sc
    prs = prk.copy()
    prs[:3] *= sc
    pvs = pvk.copy()
    pvs[:3] *= sc  # positions scaled; normals stay unit; t0 already seconds

    Tp = -(-T // 128) * 128
    Np8 = -(-N // 8) * 8
    if not cplx:
        if Tp != T or Np8 != N:
            # zero traces contribute nothing regardless of geometry
            x = jnp.pad(x, ((0, Tp - T), (0, Np8 - N), (0, 0)))
        xT = jnp.transpose(x, (2, 1, 0))  # (M, Np8, T): time on lanes

    planar = bool(np.all(pys == 0) and np.all(prs[1] == 0)
                  and np.all(pvs[1] == 0))
    Jrb = _plan_windows(pzs, pxs, pys, prs[:3].T[:N], pvs[:3].T[:M], nv_np,
                        t0, fs, 1.0, Tp, tx_model)  # (RB,)

    # bucket row stripes by J so deep (small-spread) regions don't pay the
    # worst-case window count of the shallow rows
    buckets = {}
    for rb, j in enumerate(Jrb):
        buckets.setdefault(int(j), []).append(rb)

    def run(xr, xi=None):
        outs = [jnp.zeros((pzs.shape[0], pzs.shape[1]), jnp.float32)
                for _ in range(2 if xi is not None else 1)]
        for j, rbs in sorted(buckets.items()):
            rows = np.concatenate([np.arange(rb * 8, rb * 8 + 8)
                                   for rb in rbs])
            o = _das_tiled_real(xr, jnp.asarray(pzs[rows]),
                                jnp.asarray(pxs[rows]),
                                jnp.asarray(pys[rows]), jnp.asarray(prs),
                                jnp.asarray(pvs), fs=float(fs),
                                tx_model=tx_model, J=j, planar=planar,
                                fmod=float(fmod), xim=xi,
                                interpret=interpret)
            o = o if isinstance(o, tuple) else (o,)
            rj = jnp.asarray(rows)
            outs = [oo.at[rj].set(oj) for oo, oj in zip(outs, o)]
        outs = [oo[:I1, :I2].reshape(I, 1, 1) for oo in outs]
        if xi is not None:
            if out == "ri":
                # TPU-boundary-safe: never materialize device complex
                return jnp.stack(outs, axis=-1)
            return (outs[0] + 1j * outs[1]).astype(jnp.complex64)
        if out == "ri":
            return jnp.stack([outs[0], jnp.zeros_like(outs[0])], axis=-1)
        return outs[0]

    if cplx:
        # split re/im without eager device-complex ops (boundary-restricted
        # on some TPU backends): host split for host arrays, one jit for
        # device arrays
        if isinstance(x_in, np.ndarray) or not isinstance(x_in, jnp.ndarray):
            xh = np.transpose(np.asarray(x_in), (2, 1, 0))
            if Tp != T or Np8 != N:
                xh = np.pad(xh, ((0, 0), (0, Np8 - N), (0, Tp - T)))
            return run(jnp.asarray(xh.real, jnp.float32),
                       jnp.asarray(xh.imag, jnp.float32))
        xre, xim = jax.jit(
            lambda v: (jnp.real(jnp.transpose(v, (2, 1, 0))).astype(jnp.float32),
                       jnp.imag(jnp.transpose(v, (2, 1, 0))).astype(jnp.float32)))(x_in)
        if Tp != T or Np8 != N:
            pad = ((0, 0), (0, Np8 - N), (0, Tp - T))
            xre = jnp.pad(xre, pad)
            xim = jnp.pad(xim, pad)
        return run(xre, xim)
    if fmod != 0.0:  # real data with remodulation -> complex output
        return run(xT.astype(jnp.float32), jnp.zeros_like(xT, jnp.float32))
    return run(xT.astype(jnp.float32))
