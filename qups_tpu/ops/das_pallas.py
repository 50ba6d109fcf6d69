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
  rx-group's min sample index (scalar), dynamic-slice W = 128 contiguous
  trace samples into a lane vector, broadcast across sublanes, and fetch
  both linear-interp taps with lane gathers; tiles whose spread exceeds one
  window use J > 1 shifted windows. J is per-row-stripe, host-computed from
  a conservative geometry bound, and passed as a SCALAR-PREFETCH array so
  every stripe shares ONE compiled kernel (a dynamic ``fori_loop`` bound);
* grid order is (frames, rx-chunks, tx-chunks, row-tiles, col-tiles) with
  the image tiles INNERMOST: each (MC x NC x T) trace block is streamed
  from HBM exactly once and swept against every tile while resident in
  VMEM, so trace traffic is O(M N T) total instead of O(tiles * M N T).
  Accumulation across the outer chunk dims uses input/output aliasing
  (the partial image rides HBM between revisits);
* apodization is FUSED GEOMETRY, not a materialized (I, N, M) tensor: the
  aperture-growth / acceptance-angle / scanline / multiline / parallelogram
  masks of ``UltrasoundSystem.m:4892-5428`` are a few VPU ops from operands
  the kernel already holds (pixel coords, element positions/normals,
  transmit params) — the TPU-native answer to the reference's streamed
  apodization tensors (``kern/das_spec.m:256-260``).

Real f32 data (RF); IQ/complex data beamforms as two real channels with the
``fmod`` phasor applied in-kernel. ``keep_rx`` keeps the receive axis for
coherence imaging (``bf.cu`` flag bit 3).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class Fused:
    """A fused-geometry apodization descriptor for the Pallas DAS kernel.

    kind: 'aperture_growth' (params: f, Dmax), 'acceptance_angle'
    (params: theta degrees), 'tx_scanline' (params: tol; arrays: lat_tx),
    'tx_multiline' (params: none; arrays: lat_tx), 'tx_parallelogram'
    (params: phi degrees aperture spread; arrays: lat_tx -> steering angle
    degrees). ``materialize(us)`` returns the dense (I1,I2,I3,N,M)
    broadcastable array for the XLA path.
    """
    kind: str
    params: Tuple[Tuple[str, float], ...] = ()

    def __init__(self, kind: str, **params):
        object.__setattr__(self, "kind", kind)
        object.__setattr__(self, "params", tuple(sorted(params.items())))

    @property
    def p(self):
        return dict(self.params)

    def materialize(self, us):
        from ..system import (_ap_aperture_growth, _ap_acceptance_angle,
                              _ap_scanline, _ap_multiline,
                              _ap_tx_parallelogram)
        p = self.p
        if self.kind == "aperture_growth":
            return _ap_aperture_growth(us, f=p.get("f", 1.5),
                                       Dmax=p.get("Dmax", np.inf))
        if self.kind == "acceptance_angle":
            return _ap_acceptance_angle(us, theta=p.get("theta", 45.0))
        if self.kind == "tx_scanline":
            return _ap_scanline(us, tol=p.get("tol"))
        if self.kind == "tx_multiline":
            return _ap_multiline(us)
        if self.kind == "tx_parallelogram":
            return _ap_tx_parallelogram(us)
        raise ValueError(f"unknown fused apodization {self.kind!r}")


def _rx_apod_weight(kind, prm, px, pz, py, dx_, dy_, dz_, dr, pr_ref, n,
                    planar):
    """In-register rx-dependent apodization weight (8, 128) for pixel tile
    vs receive element n. Operands: dx_/dy_/dz_ = pixel - element, dr its
    norm (already computed by the delay path)."""
    if kind == "aperture_growth":
        # f-number growth, element-frame lateral offset d and depth z
        # (``UltrasoundSystem.apApertureGrowth``, ``:5165``); sin/cos of the
        # element azimuth ride pr rows 6/7
        sa = pr_ref[6, n]
        ca = pr_ref[7, n]
        d = dx_ * ca - dz_ * sa
        z = dz_ * ca + dx_ * sa
        f = prm.get("f", 1.5)
        m = jnp.abs(z) > (2.0 * f) * jnp.abs(d)
        Dmax = prm.get("Dmax", np.inf)
        if np.isfinite(Dmax):
            m = m & (2.0 * jnp.abs(d) < Dmax)
        return m.astype(jnp.float32)
    if kind == "acceptance_angle":
        # <element normal, unit(pixel - element)> >= cos(theta)  (``:5303``)
        nx = pr_ref[3, n]
        ny = pr_ref[4, n]
        nz = pr_ref[5, n]
        if planar:
            c = dx_ * nx + dz_ * nz
        else:
            c = dx_ * nx + dy_ * ny + dz_ * nz
        cth = float(np.cos(np.radians(prm.get("theta", 45.0))))
        return (c >= cth * dr).astype(jnp.float32)
    raise ValueError(kind)


def _tx_apod_weight(kind, prm, lat, pz, px, pv_ref, m):
    """In-register tx-dependent apodization weight (8, 128) for pixel tile
    vs transmit m. ``lat`` is the pixel lateral coordinate tile; the
    per-transmit lateral value rides pv row 7."""
    lm = pv_ref[7, m]
    if kind == "tx_scanline":
        # (``UltrasoundSystem.apScanline``, ``:4892``)
        return (jnp.abs(lat - lm) < prm["tol"]).astype(jnp.float32)
    if kind == "tx_multiline":
        # linear interp between the two nearest scanlines (uniform spacing)
        # (``UltrasoundSystem.apMultiline``, ``:4970``)
        return jnp.maximum(0.0, 1.0 - jnp.abs(lat - lm) / prm["dlat"])
    if kind == "tx_parallelogram":
        # plane-wave parallelogram: project pixel to z=0 along steering
        # (``UltrasoundSystem.apTxParallelogram``, ``:5269``); pv rows 3/5
        # hold the steering unit vector
        nvx = pv_ref[3, m]
        nvz = pv_ref[5, m]
        x0 = px - nvx * (pz / nvz)
        return ((x0 > prm["xlo"]) & (x0 <= prm["xhi"])).astype(jnp.float32)
    raise ValueError(kind)


def _kernel(jref, *refs, N: int, T: int, W: int, fs: float,
            tx_model: str, planar: bool, iq: bool, fmod: float,
            MC: int, NC: int, F: int, keep_rx: bool, keep_tx: bool,
            rx_apods: tuple, tx_apods: tuple, has_lat: bool,
            pair: bool = False):
    """See module docstring. Grid: ([F,] NCc, MTc, RB, CB). refs order:
    pz, px, py, [lat], pr(SMEM), pv(SMEM), x (1|2), accin (1|2), out (1|2).
    """
    k = 0
    pz_ref = refs[k]; k += 1
    px_ref = refs[k]; k += 1
    py_ref = refs[k]; k += 1
    lat_ref = None
    if has_lat:
        lat_ref = refs[k]; k += 1
    pr_ref = refs[k]; k += 1
    pv_ref = refs[k]; k += 1
    nch = 2 if iq else 1
    x_refs = refs[k:k + nch]; k += nch
    acc_refs = refs[k:k + nch]; k += nch
    out_refs = refs[k:k + nch]; k += nch

    goff = 1 if F > 1 else 0
    ncc = pl.program_id(goff + 0)
    mtc = pl.program_id(goff + 1)
    rb = pl.program_id(goff + 2)
    J = jref[rb]

    pz = pz_ref[:]
    px = px_ref[:]
    py = py_ref[:]
    lat = lat_ref[:] if has_lat else None

    def tx_geom(m):
        """Per-transmit one-way path dv (8,128) + start time + tx apod."""
        pvx = pv_ref[0, m]
        pvy = pv_ref[1, m]
        pvz = pv_ref[2, m]
        nvx = pv_ref[3, m]
        nvy = pv_ref[4, m]
        nvz = pv_ref[5, m]
        t0m = pv_ref[6, m]
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
        txw = None
        for kind, prm in tx_apods:
            w = _tx_apod_weight(kind, dict(prm), lat, pz, px, pv_ref, m)
            txw = w if txw is None else txw * w
        return dv, t0m, txw

    # per-chunk transmit geometry, hoisted out of the rx-group loop (dv is
    # rx-independent; MC is small and static, so the stack lives in vregs —
    # selected by a where-chain since Mosaic lacks value dynamic_slice)
    geoms = [tx_geom(mtc * MC + c) for c in range(MC)]

    def select_c(c, items):
        if isinstance(c, int):  # static transmit lane (keep_tx path)
            return items[c]
        v = items[0]
        for cc in range(1, MC):
            v = jnp.where(c == cc, items[cc], v)
        return v

    def rx_group(g, accs64, c_only=None):
        """Accumulate the 8 receive elements of group g of chunk ncc, over
        all MC transmits of the chunk (or the single static transmit lane
        ``c_only`` for keep_tx), into accs64 — per-channel (64, 128)
        stacks holding one 8-row image-tile band per rx element.

        Everything past the per-element geometry runs on (64, 128)
        registers: the two lane gathers per window cover ALL 8 rx in one
        ``take_along_axis`` each — 8x fewer gather nodes keeps both
        Mosaic's compile and the inner loop fast."""
        n8 = ncc * NC + g * 8  # global rx index of the group start
        drs = []
        wrs = []
        for r in range(8):
            n = n8 + r
            ex = pr_ref[0, n]
            ez = pr_ref[2, n]
            dx_ = px - ex
            dz_ = pz - ez
            if planar:
                dy_ = None
                dr = jnp.sqrt(dx_ * dx_ + dz_ * dz_)
            else:
                dy_ = py - pr_ref[1, n]
                dr = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
            drs.append(dr)
            wr = None
            for kind, prm in rx_apods:
                w = _rx_apod_weight(kind, dict(prm), px, pz, py,
                                    dx_, dy_, dz_, dr, pr_ref, n, planar)
                wr = w if wr is None else wr * w
            wrs.append(wr)
        DR = jnp.concatenate(drs, axis=0)  # (64, 128)
        WR = jnp.concatenate(wrs, axis=0) if rx_apods else None

        def cbody(c, accs64):
            dv = select_c(c, [d for d, _, _ in geoms])
            dv64 = jnp.broadcast_to(dv[None], (8, 8, 128)).reshape(64, 128)
            t0m = select_c(c, [t for _, t, _ in geoms])
            TI = (dv64 + DR - t0m) * fs  # pre-scaled by cinv upstream
            I0F = jnp.floor(TI)
            U = TI - I0F
            TIS = jnp.clip(I0F.astype(jnp.int32), 0, T - 2)
            VAL = (TI >= 0) & (TI <= T - 1)
            WT = jnp.where(VAL, 1.0, 0.0)
            if WR is not None:
                WT = WT * WR
            if tx_apods:
                tw = select_c(c, [w for _, _, w in geoms])
                WT = WT * jnp.broadcast_to(tw[None],
                                           (8, 8, 128)).reshape(64, 128)
            W0 = WT - U * WT
            W1 = U * WT
            q0 = jnp.clip(jnp.min(TIS) // W, 0, T // W - 1)
            # exact window count for THIS (group, transmit) from the tile's
            # true index range — the host J is a stripe-level conservative
            # bound (maxed over all groups/transmits/column-tiles and worst
            # window alignment) and overshoots by ~1 window at typical
            # geometries; a wasted window costs ~1/3 of the inner loop
            # (measured). +1 inside: the second tap reads TIS + 1 (pair
            # mode fetches both taps at TIS, so no +1 there).
            tap_hi = jnp.max(TIS) if pair else jnp.max(TIS) + 1
            Jact = tap_hi // W - q0 + 1

            def jbody(j, part):
                ws = pl.multiple_of((q0 + j) * W, W)
                if F > 1:
                    slabs = [xr[0, c, pl.ds(g * 8, 8), pl.ds(ws, W)]
                             for xr in x_refs]
                else:
                    slabs = [xr[c, pl.ds(g * 8, 8), pl.ds(ws, W)]
                             for xr in x_refs]
                LJ = TIS - ws
                # 0 <= lj < W via one unsigned compare per tap (measured
                # identical to two signed compares on this Mosaic - kept
                # for the smaller expression)
                m0 = LJ.astype(jnp.uint32) < W
                l0 = LJ & (W - 1)
                a0 = jnp.where(m0, W0, 0.0)
                if pair:
                    # both taps ride ONE 32-bit gather: the packed trace
                    # holds bf16(x[t]) in the low and bf16(x[t+1]) in the
                    # high half of lane t (the TPU analog of the
                    # reference's half2 trace path, ``bf.cu:170``); a
                    # bf16's bits are the top half of an f32, so unpacking
                    # is a shift/mask + bitcast, and the pair never
                    # straddles a window boundary
                    a1 = jnp.where(m0, W1, 0.0)
                else:
                    LJ1 = LJ + 1
                    m1 = LJ1.astype(jnp.uint32) < W
                    l1 = LJ1 & (W - 1)
                    a1 = jnp.where(m1, W1, 0.0)
                new = list(part)
                for ch in range(nch):
                    # rx r's trace row, repeated across its 8 image rows
                    srep = jnp.broadcast_to(slabs[ch][:, None, :],
                                            (8, 8, W)).reshape(64, W)
                    if pair:
                        gi = jnp.take_along_axis(srep, l0, axis=1)  # i32
                        g0 = jax.lax.bitcast_convert_type(
                            gi << 16, jnp.float32)
                        g1 = jax.lax.bitcast_convert_type(
                            gi & jnp.int32(-65536), jnp.float32)
                    else:
                        g0 = jnp.take_along_axis(srep, l0, axis=1)
                        g1 = jnp.take_along_axis(srep, l1, axis=1)
                    new[ch] = new[ch] + (g0 * a0 + g1 * a1)
                return tuple(new)

            # windows q0 .. q0+Jeff-1 stay in-range: no per-window clamping
            Jeff = jnp.minimum(Jact, T // W - q0)
            if iq and fmod != 0.0:
                z64 = jnp.zeros((64, 128), jnp.float32)
                part = jax.lax.fori_loop(0, Jeff, jbody,
                                         tuple(z64 for _ in range(nch)))
                # rotate by the remodulation phasor exp(2j pi fmod tau)
                # (``bf.cu:117``; constant over j -> applies to partials)
                ph = (2.0 * np.pi * fmod / fs) * TI
                cph = jnp.cos(ph)
                sph = jnp.sin(ph)
                tre, tim = part
                return (accs64[0] + tre * cph - tim * sph,
                        accs64[1] + tre * sph + tim * cph)
            return jax.lax.fori_loop(0, Jeff, jbody, accs64)

        if c_only is not None:
            return cbody(c_only, accs64)
        return jax.lax.fori_loop(0, MC, cbody, accs64)

    # --- accumulate ---
    def oref(ref, *idx):
        """Index past the leading frame block dim when present."""
        return ref[(0,) + idx] if F > 1 else (ref[idx] if idx else ref[:])

    def oset(ref, val, *idx):
        if F > 1:
            ref[(0,) + idx] = val
        elif idx:
            ref[idx] = val
        else:
            ref[:] = val

    z64 = jnp.zeros((64, 128), jnp.float32)
    G = NC // 8
    if keep_rx:
        for g in range(G):
            accs64 = rx_group(g, tuple(z64 for _ in range(nch)))
            for ch in range(nch):
                band = accs64[ch].reshape(8, 8, 128)
                for r in range(8):
                    row = g * 8 + r
                    oset(out_refs[ch], oref(acc_refs[ch], row) + band[r],
                         row)
    elif keep_tx:
        for c in range(MC):
            def gbody(g, accs64, c=c):
                return rx_group(g, accs64, c_only=c)

            accs64 = jax.lax.fori_loop(0, G, gbody,
                                       tuple(z64 for _ in range(nch)))
            for ch in range(nch):
                tile = jnp.sum(accs64[ch].reshape(8, 8, 128), axis=0)
                oset(out_refs[ch], oref(acc_refs[ch], c) + tile, c)
    else:
        def gbody(g, accs64):
            return rx_group(g, accs64)

        accs64 = jax.lax.fori_loop(0, G, gbody,
                                   tuple(z64 for _ in range(nch)))
        for ch in range(nch):
            tile = jnp.sum(accs64[ch].reshape(8, 8, 128), axis=0)
            oset(out_refs[ch], oref(acc_refs[ch]) + tile)


def _plan_windows(pz, px, py, pr, pv, nv, t0, fs, cinv, T, tx_model,
                  W=128):
    """Host-side: per-row-stripe (8 image rows) max delay-index spread over
    (true 8x128 tile x 8-rx-group x tx) -> window count J per stripe (the
    range-block trick of ``greens.cu:628-715``, geometry only).

    The bound is CONSERVATIVE and covers ALL transmits and rx groups (not a
    sample): per tile it uses the axis-aligned bounding box of the tile's
    pixels — distance-to-box for the min path length (a lower bound) and the
    max over the 8 box corners for the max (exact: the norm is convex).
    spread(tile) <= max_tx range(dv) + max_group range(dr)."""
    I1, I2 = pz.shape
    RB, CB = I1 // 8, I2 // 128
    K = RB * CB
    g = np.stack([px, py, pz], -1).reshape(RB, 8, CB, 128, 3)
    tiles = np.moveaxis(g, 2, 1).reshape(K, 8 * 128, 3)
    lo = tiles.min(1)  # (K, 3)
    hi = tiles.max(1)
    # the 8 box corners (K, 8, 3)
    corners = np.stack([np.where(np.array(b)[None, :], hi, lo)
                        for b in np.ndindex(2, 2, 2)], axis=1)

    def dist_minmax(e):  # element positions (E, 3) -> dmin, dmax (K, E)
        c = np.clip(e[None, :, :], lo[:, None, :], hi[:, None, :])
        dmin = np.linalg.norm(c - e[None], axis=-1)  # point-to-box (lower bd)
        dmax = np.linalg.norm(corners[:, :, None, :] - e[None, None, :, :],
                              axis=-1).max(axis=1)   # max over corners (exact)
        return dmin, dmax

    # receive term: per-8-group range, max over groups
    N = pr.shape[0]
    drmin, drmax = dist_minmax(pr)
    Gn = -(-N // 8)
    pad = Gn * 8 - N
    if pad:  # pad replicates the last element (matches the kernel's padding)
        drmin = np.pad(drmin, ((0, 0), (0, pad)), mode="edge")
        drmax = np.pad(drmax, ((0, 0), (0, pad)), mode="edge")
    rng_rx = (drmax.reshape(K, Gn, 8).max(-1)
              - drmin.reshape(K, Gn, 8).min(-1)).max(-1)  # (K,)

    # transmit term
    if tx_model == "plane":
        # dv = (p - pv) . nv is linear in p: corner min/max are exact
        dvc = np.einsum("kcd,md->kcm", corners, nv) \
            - np.einsum("md,md->m", pv, nv)[None, None, :]  # (K, 8, M)
        rng_tx = (dvc.max(1) - dvc.min(1)).max(-1)
    else:
        rmin, rmax = dist_minmax(pv)  # (K, M)
        if tx_model == "diverging":
            rng_tx = (rmax - rmin).max(-1)
        else:  # virtual: dv = copysign(|r|, (p-pv).nv); sign may flip in-tile
            rdc = np.einsum("kcd,md->kcm", corners, nv) \
                - np.einsum("md,md->m", pv, nv)[None, None, :]
            pos = rdc.min(1) >= 0   # (K, M) whole tile in front
            neg = rdc.max(1) <= 0
            rng = np.where(pos | neg, rmax - rmin, 2 * rmax)
            rng_tx = rng.max(-1)

    spread = (rng_tx + rng_rx) * cinv * fs
    Jt = np.ceil((spread + 8) / W).astype(int) + 1
    # one J per row stripe: max over its column tiles
    return np.maximum(1, Jt.reshape(RB, CB).max(axis=1))  # (RB,)


@jax.jit
def _pack_pairs(xr):
    """f32 ``(..., T)`` -> int32 bf16-pair lanes: lane ``t`` holds
    ``bf16(x[t])`` in its low 16 bits and ``bf16(x[t+1])`` in its high 16
    (last lane pairs with 0). A bf16's bits are an f32's top half, so the
    round-to-nearest conversion is ``(bits + 0x8000) >> 16``."""
    u = jax.lax.bitcast_convert_type(xr, jnp.uint32)
    b = (u + jnp.uint32(0x8000)) >> 16
    hi = jnp.concatenate([b[..., 1:], jnp.zeros_like(b[..., :1])], axis=-1)
    return jax.lax.bitcast_convert_type(b | (hi << 16), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "fs", "tx_model", "planar", "fmod", "keep_rx", "keep_tx", "rx_apods",
    "tx_apods", "MC", "NC", "interpret", "pair"))
def _das_call(jrb, pz, px, py, lat, pr, pv, xs, accs, *, fs, tx_model,
              planar, fmod, keep_rx, keep_tx=False, rx_apods, tx_apods,
              MC, NC, interpret=False, pair=False):
    """One pallas_call covering the whole image: grid ([F,] NCc, MTc, RB,
    CB) with image tiles innermost (trace blocks stream once)."""
    RB = pz.shape[0] // 8
    CB = pz.shape[1] // 128
    nch = len(xs)
    iq = nch == 2
    has_lat = lat is not None
    xsh = xs[0].shape  # (F, M, N, T) or (M, N, T)
    F = xsh[0] if len(xsh) == 4 else 1
    M, N, T = xsh[-3], xsh[-2], xsh[-1]
    NCc = N // NC
    MTc = M // MC
    goff = 1 if F > 1 else 0

    kern = functools.partial(
        _kernel, N=N, T=T, W=128, fs=fs, tx_model=tx_model, planar=planar,
        iq=iq, fmod=fmod, MC=MC, NC=NC, F=F, keep_rx=keep_rx,
        keep_tx=keep_tx, rx_apods=rx_apods, tx_apods=tx_apods,
        has_lat=has_lat, pair=pair)

    grid = ((F,) if F > 1 else ()) + (NCc, MTc, RB, CB)

    def tidx(*a):
        # (..., ncc, mtc, rb, cb, jref) -> tile block (rb, cb)
        return (a[goff + 2], a[goff + 3])

    tile = pl.BlockSpec((8, 128), tidx, memory_space=pltpu.VMEM)
    if F > 1:
        trace = pl.BlockSpec((1, MC, NC, T),
                             lambda f, ncc, mtc, rb, cb, *_: (f, mtc, ncc, 0),
                             memory_space=pltpu.VMEM)
    else:
        trace = pl.BlockSpec((MC, NC, T),
                             lambda ncc, mtc, rb, cb, *_: (mtc, ncc, 0),
                             memory_space=pltpu.VMEM)

    if keep_rx:
        if F > 1:
            ospec = pl.BlockSpec(
                (1, NC, 8, 128),
                lambda f, ncc, mtc, rb, cb, *_: (f, ncc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((F, N, pz.shape[0], pz.shape[1]),
                                          jnp.float32)
        else:
            ospec = pl.BlockSpec(
                (NC, 8, 128),
                lambda ncc, mtc, rb, cb, *_: (ncc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((N, pz.shape[0], pz.shape[1]),
                                          jnp.float32)
    elif keep_tx:
        if F > 1:
            ospec = pl.BlockSpec(
                (1, MC, 8, 128),
                lambda f, ncc, mtc, rb, cb, *_: (f, mtc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((F, M, pz.shape[0], pz.shape[1]),
                                          jnp.float32)
        else:
            ospec = pl.BlockSpec(
                (MC, 8, 128),
                lambda ncc, mtc, rb, cb, *_: (mtc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((M, pz.shape[0], pz.shape[1]),
                                          jnp.float32)
    else:
        if F > 1:
            ospec = pl.BlockSpec(
                (1, 8, 128), lambda f, ncc, mtc, rb, cb, *_: (f, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((F,) + pz.shape, jnp.float32)
        else:
            ospec = tile
            oshape = jax.ShapeDtypeStruct(pz.shape, jnp.float32)

    in_specs = [tile, tile, tile]
    if has_lat:
        in_specs.append(tile)
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),   # pr (8, Npad)
                 pl.BlockSpec(memory_space=pltpu.SMEM)]   # pv (8, Mpad)
    in_specs += [trace] * nch
    in_specs += [ospec] * nch  # aliased accumulator inputs

    # input_output_aliases: indices count ALL operands incl. scalar-prefetch
    n_lead = 1 + len(in_specs) - nch
    aliases = {n_lead + ch: ch for ch in range(nch)}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([ospec] * nch) if nch > 1 else ospec,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple([oshape] * nch) if nch > 1 else oshape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(jrb, pz, px, py, *((lat,) if has_lat else ()), pr, pv, *xs, *accs)
    return out if nch > 1 else (out,)


def _choose_chunks(M, N, T, nch, vmem_budget=8 * 2**20, itemsize=4):
    """Pick (MC, NC) trace-chunk sizes: maximize resident transmits within
    the VMEM budget (double-buffered), NC a multiple of 8 dividing Npad."""
    per_t = T * itemsize * 2 * nch  # bytes/(tx,rx) trace row w/ 2 buffers
    cap = max(1, vmem_budget // per_t)  # max MC*NC
    # cap NC at 64: several transmits resident (MC > 1) amortizes the
    # per-group receive geometry across the chunk
    nc = min(N, 64)
    while nc > 8 and (cap // nc) < 1:
        nc //= 2
    nc = max(8, nc)
    while N % nc:
        nc -= 8
    mc = max(1, min(M, cap // nc))
    while M % mc:
        mc -= 1
    return mc, nc


def prep_sharded(pi, pr, pv, nv, t0, cinv, *, fs: float, T: int,
                 tx_model: str, im_shape: Tuple[int, int, int],
                 nrx: int = 1, ntx: int = 1):
    """Host-side prep for the shard_map-composed kernel: per-(rx-shard,
    tx-shard) packed geometry + per-stripe window counts, stacked along
    leading mesh axes so they shard with ``P('rx', ...)`` / ``P('tx', ...)``.

    Returns ``(arrays, statics)`` where arrays = dict(pz, px, py, prs
    (nrx, 8, 128k), pvs (ntx, 8, 128k), jrb (nrx, ntx, RB), pads) and
    statics = dict(planar, MC, NC, Tp, Nsh, Msh). The trace tensor must be
    padded to (Tp, Nsh*nrx, Msh*ntx) by the caller (zero rows are inert).
    """
    pi = np.asarray(pi, np.float32)
    pr_np = np.asarray(pr, np.float32)
    pv_np = np.asarray(pv, np.float32)
    nv_np = np.asarray(nv, np.float32)
    N = pr_np.shape[0]
    M = pv_np.shape[0]
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    cinv = float(np.asarray(cinv).reshape(()))
    I1, I2, I3 = im_shape
    assert I3 == 1
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    grid2 = pi.reshape(I1, I2, 3)
    gpad = np.pad(grid2, ((0, I1p - I1), (0, I2p - I2), (0, 0)), mode="edge")
    sc = cinv
    pz = np.ascontiguousarray(gpad[:, :, 2]) * sc
    px = np.ascontiguousarray(gpad[:, :, 0]) * sc
    py = np.ascontiguousarray(gpad[:, :, 1]) * sc

    # shard sizes (rx padded to 8-multiples per shard)
    Nsh = -(-N // (nrx * 8)) * 8
    Msh = -(-M // ntx)
    Tp = -(-T // 128) * 128
    Npad = -(-Nsh // 128) * 128
    Mpad = -(-Msh // 128) * 128

    prs = np.zeros((nrx, 8, Npad), np.float32)
    pvs = np.zeros((ntx, 8, Mpad), np.float32)
    RB = I1p // 8
    jrb = np.ones((nrx, ntx, RB), np.int32)
    pr_pad = np.concatenate([pr_np, np.repeat(pr_np[-1:], Nsh * nrx - N, 0)])
    pv_pad = np.concatenate([pv_np, np.repeat(pv_np[-1:], Msh * ntx - M, 0)])
    nv_pad = np.concatenate([nv_np, np.repeat(nv_np[-1:], Msh * ntx - M, 0)])
    t0_pad = np.concatenate([t0, np.repeat(t0[-1:], Msh * ntx - M)])
    for i in range(nrx):
        blk = pr_pad[i * Nsh:(i + 1) * Nsh]
        prs[i, 0, :Nsh] = blk[:, 0] * sc
        prs[i, 1, :Nsh] = blk[:, 1] * sc
        prs[i, 2, :Nsh] = blk[:, 2] * sc
        for rrow in range(3):
            prs[i, rrow, Nsh:] = prs[i, rrow, Nsh - 1]
        prs[i, 5] = 1.0
        prs[i, 7] = 1.0
    for j in range(ntx):
        blk = pv_pad[j * Msh:(j + 1) * Msh]
        pvs[j, 0, :Msh] = blk[:, 0] * sc
        pvs[j, 1, :Msh] = blk[:, 1] * sc
        pvs[j, 2, :Msh] = blk[:, 2] * sc
        nblk = nv_pad[j * Msh:(j + 1) * Msh]
        pvs[j, 3, :Msh] = nblk[:, 0]
        pvs[j, 4, :Msh] = nblk[:, 1]
        pvs[j, 5, :Msh] = nblk[:, 2]
        pvs[j, 6, :Msh] = t0_pad[j * Msh:(j + 1) * Msh]
    planar = bool(np.all(py == 0) and np.all(prs[:, 1] == 0)
                  and np.all(pvs[:, 1] == 0))
    for i in range(nrx):
        for j in range(ntx):
            jrb[i, j] = _plan_windows(
                pz, px, py, prs[i, :3].T[:Nsh] / 1.0, pvs[j, :3].T[:Msh],
                nv_pad[j * Msh:(j + 1) * Msh], t0_pad[j * Msh:(j + 1) * Msh],
                fs, 1.0, Tp, tx_model).astype(np.int32)
    MC, NC = _choose_chunks(Msh, Nsh, Tp, 1)
    arrays = dict(pz=pz.astype(np.float32), px=px.astype(np.float32),
                  py=py.astype(np.float32), prs=prs, pvs=pvs, jrb=jrb)
    statics = dict(planar=planar, MC=MC, NC=NC, Tp=Tp, Nsh=Nsh, Msh=Msh,
                   I1p=I1p, I2p=I2p)
    return arrays, statics


def das_tiled(x, pi, pr, pv, nv, t0, cinv, *, fs: float,
              tx_model: str = "virtual", method: str = "linear",
              fmod: float = 0.0, im_shape: Optional[Tuple[int, ...]] = None,
              out: str = "complex", apod=(), keep_rx: bool = False,
              keep_tx: bool = False, lat: Optional[np.ndarray] = None,
              interpret: bool = False,
              orientations: Optional[np.ndarray] = None,
              precision: str = "f32"):
    """Fast Pallas DAS (linear interp; summed or keep_rx output).

    Same contract as :func:`qups_tpu.ops.das.das` for the common path:
    ``x (T, N, M[, F])`` real or complex; pixels ``pi (I, 3)`` ordered so
    consecutive groups of 128 lie on an iso-depth scan row (true for
    cartesian 'ZXY' and polar 'RAY' grids flattened in C order; the wrapper
    pads otherwise). Returns (I, 1, 1[, F]) or (I, N, 1[, F]) with keep_rx.

    ``precision``: 'f32' (default) or 'bf16' — bf16 stores the trace
    slabs at half the width; weights and accumulation stay f32. ~8-bit
    mantissa on the raw samples: fine for display-dynamic-range imaging,
    not strict numeric parity. NOTE: the current Mosaic toolchain rejects
    bf16 ``dynamic_gather`` ("indices and result have different
    bitwidths"), so bf16 only runs in interpret mode today; it raises
    otherwise so the failure is explicit rather than a remote-compile
    error.

    ``apod``: tuple of :class:`Fused` geometry-apodization descriptors,
    evaluated in-register (see module docstring). ``lat``: per-pixel
    lateral coordinate (I,) for tx apodizations on non-cartesian scans
    (default: the pixel x coordinate). ``orientations``: (2, N) [azimuth
    sin, cos] of the rx elements for convex-aware aperture growth (default
    planar: az = 0).
    """
    if method != "linear":
        raise ValueError(
            f"das_tiled implements linear interpolation only, got {method!r};"
            " use qups_tpu.ops.das.das for other methods")
    if keep_rx and keep_tx:
        raise ValueError("das_tiled keeps at most one of rx/tx; use"
                         " qups_tpu.ops.das.das for the BF (keep both) mode")
    if precision not in ("f32", "bf16", "bf16pair"):
        raise ValueError(f"unknown precision {precision!r}")
    if precision == "bf16" and not interpret:
        raise NotImplementedError(
            "precision='bf16' requires bf16 dynamic_gather, which the"
            " current Mosaic TPU toolchain does not implement; use"
            " precision='bf16pair' (packed-pair taps, one i32 gather)")
    apod = tuple(apod if isinstance(apod, (tuple, list)) else (apod,))
    for a in apod:
        if not isinstance(a, Fused):
            raise ValueError("das_tiled apodization must be Fused descriptors")

    x_in = x
    cplx = bool(np.iscomplexobj(np.empty(0, dtype=getattr(x, "dtype", np.float32))))
    pi = np.asarray(pi, np.float32)
    pr_np = np.asarray(pr, np.float32)
    pv_np = np.asarray(pv, np.float32)
    nv_np = np.asarray(nv, np.float32)
    T, N, M = x.shape[:3]
    Fn = x.shape[3] if np.ndim(x) >= 4 else None
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    cinv = float(np.asarray(cinv).reshape(()))
    I = pi.shape[0]

    if im_shape is None:
        im_shape = (I, 1, 1)
    I1, I2, I3 = im_shape
    assert I3 == 1, "das_tiled supports planar scans (I3 == 1)"
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    grid2 = pi.reshape(I1, I2, 3)
    gpad = np.pad(grid2, ((0, I1p - I1), (0, I2p - I2), (0, 0)), mode="edge")
    pz = np.ascontiguousarray(gpad[:, :, 2])
    px = np.ascontiguousarray(gpad[:, :, 0])
    py = np.ascontiguousarray(gpad[:, :, 1])

    # ---- split fused apods by side, prepare their operands ----
    rx_apods = []
    tx_apods = []
    lat_tx = None
    lat_needed = False
    lat_spatial = lat is None
    for a in apod:
        p = a.p
        if a.kind in ("aperture_growth", "acceptance_angle"):
            prm = {k: float(v) for k, v in p.items()
                   if isinstance(v, (int, float))}
            if a.kind == "aperture_growth" and "Dmax" in prm and lat_spatial:
                prm["Dmax"] = prm["Dmax"] * cinv  # scaled-geometry space
            rx_apods.append((a.kind, tuple(sorted(prm.items()))))
        elif a.kind in ("tx_scanline", "tx_multiline", "tx_parallelogram"):
            lat_needed = a.kind != "tx_parallelogram"
            prm = {}
            lt = p.get("lat_tx")
            if lt is not None:
                lat_tx = np.asarray(lt, np.float32)
            if a.kind == "tx_scanline":
                prm["tol"] = float(p["tol"])
            if a.kind == "tx_multiline":
                prm["dlat"] = float(p["dlat"])
            if a.kind == "tx_parallelogram":
                prm["xlo"] = float(p["xlo"]) * cinv
                prm["xhi"] = float(p["xhi"]) * cinv
            tx_apods.append((a.kind, tuple(sorted(prm.items()))))
        else:
            raise ValueError(f"unknown fused apodization {a.kind!r}")

    # pack rx params (8, Npad): [x, y, z, nx, ny, nz, sin_az, cos_az]
    Npad = -(-N // 128) * 128
    Mpad = -(-M // 128) * 128
    prk = np.zeros((8, Npad), np.float32)
    prk[0, :N] = pr_np[:, 0]
    prk[1, :N] = pr_np[:, 1]
    prk[2, :N] = pr_np[:, 2]
    for rrow in range(3):  # replicate last real position for padded lanes
        prk[rrow, N:] = pr_np[-1, rrow]
    if orientations is not None:
        saz = np.asarray(orientations[0], np.float32)
        caz = np.asarray(orientations[1], np.float32)
    else:
        saz = np.zeros(N, np.float32)
        caz = np.ones(N, np.float32)
    # element normals from azimuth (planar arrays: (sin, 0, cos) of az)
    prk[3, :N] = saz
    prk[4, :N] = 0.0
    prk[5, :N] = caz
    prk[6, :N] = saz
    prk[7, :N] = caz
    prk[5, N:] = 1.0
    prk[7, N:] = 1.0

    pvk = np.zeros((8, Mpad), np.float32)
    pvk[0, :M] = pv_np[:, 0]
    pvk[1, :M] = pv_np[:, 1]
    pvk[2, :M] = pv_np[:, 2]
    pvk[3, :M] = nv_np[:, 0]
    pvk[4, :M] = nv_np[:, 1]
    pvk[5, :M] = nv_np[:, 2]
    pvk[6, :M] = t0[:M]
    if lat_tx is not None:
        pvk[7, :M] = lat_tx * (cinv if lat_spatial else 1.0)

    # fold cinv into the geometry: scale distances by cinv so the kernel
    # computes tau = dv' + dr' - t0 directly
    sc = cinv
    pzs, pxs, pys = pz * sc, px * sc, py * sc
    prs = prk.copy()
    prs[:3] *= sc
    pvs = pvk.copy()
    pvs[:3] *= sc  # positions scaled; normals stay unit; t0 already seconds

    lat_tile = None
    if lat_needed or tx_apods:
        if lat is None:
            lat_tile = pxs  # pixel x in scaled space
        else:
            lt = np.asarray(lat, np.float32).reshape(I1, I2)
            lat_tile = np.pad(lt, ((0, I1p - I1), (0, I2p - I2)), mode="edge")

    Tp = -(-T // 128) * 128
    Np8 = -(-N // 8) * 8
    planar = bool(np.all(pys == 0) and np.all(prs[1] == 0)
                  and np.all(pvs[1] == 0))
    Jrb = _plan_windows(pzs, pxs, pys, prs[:3].T[:N], pvs[:3].T[:M], nv_np,
                        t0, fs, 1.0, Tp, tx_model).astype(np.int32)  # (RB,)

    nch = 2 if (cplx or fmod != 0.0) else 1
    itemsize = 2 if precision == "bf16" else 4
    MC, NC = _choose_chunks(M, Np8, Tp, nch, itemsize=itemsize)

    def prep_real(xr):
        """(T, N, M[, F]) -> (F?, M, Np8, Tp) padded."""
        if Tp != T or Np8 != N:
            padc = [(0, Tp - T), (0, Np8 - N)] + [(0, 0)] * (xr.ndim - 2)
            xr = jnp.pad(xr, padc)
        if precision == "bf16":
            xr = xr.astype(jnp.bfloat16)
        if Fn is not None:
            xr = jnp.transpose(xr, (3, 2, 1, 0))  # (F, M, N, T)
        else:
            xr = jnp.transpose(xr, (2, 1, 0))  # (M, N, T)
        if precision == "bf16pair":
            xr = _pack_pairs(xr)
        return xr

    def run(xr, xi=None):
        xs = (xr,) if xi is None else (xr, xi)
        keep_n = (Np8,) if keep_rx else ((M,) if keep_tx else ())
        oshape = ((Fn,) if Fn else ()) + keep_n + (I1p, I2p)
        accs = tuple(jnp.zeros(oshape, jnp.float32) for _ in xs)
        outs = _das_call(
            jnp.asarray(Jrb), jnp.asarray(pzs), jnp.asarray(pxs),
            jnp.asarray(pys),
            jnp.asarray(lat_tile) if lat_tile is not None else None,
            jnp.asarray(prs), jnp.asarray(pvs), xs, accs, fs=float(fs),
            tx_model=tx_model, planar=planar, fmod=float(fmod),
            keep_rx=keep_rx, keep_tx=keep_tx, rx_apods=tuple(rx_apods),
            tx_apods=tuple(tx_apods), MC=MC, NC=NC, interpret=interpret,
            pair=(precision == "bf16pair"))
        # crop to (I, N', M'[, F])
        res = []
        for o in outs:
            if Fn:
                o = jnp.moveaxis(o, 0, -1)  # (..., F)
            if keep_rx:
                # (N, I1p, I2p[, F]) -> (I, N, 1[, F])
                o = jnp.moveaxis(o[:N, :I1, :I2], 0, 2)
                o = o.reshape((I, N, 1) + o.shape[3:])
            elif keep_tx:
                # (M, I1p, I2p[, F]) -> (I, 1, M[, F])
                o = jnp.moveaxis(o[:M, :I1, :I2], 0, 2)
                o = o.reshape((I, 1, M) + o.shape[3:])
            else:
                o = o[:I1, :I2].reshape((I, 1, 1) + o.shape[2:])
            res.append(o)
        return res

    def pack_out(res):
        if len(res) == 2:
            if out == "ri":
                # TPU-boundary-safe: never materialize device complex
                return jnp.stack(res, axis=-1)
            return (res[0] + 1j * res[1]).astype(jnp.complex64)
        if out == "ri":
            return jnp.stack([res[0], jnp.zeros_like(res[0])], axis=-1)
        return res[0]

    if cplx:
        # split re/im without eager device-complex ops (boundary-restricted
        # on some TPU backends)
        if isinstance(x_in, np.ndarray) or not isinstance(x_in, jnp.ndarray):
            xh = np.asarray(x_in)
            return pack_out(run(prep_real(jnp.asarray(xh.real, jnp.float32)),
                                prep_real(jnp.asarray(xh.imag, jnp.float32))))
        xre, xim = jax.jit(lambda v: (jnp.real(v).astype(jnp.float32),
                                      jnp.imag(v).astype(jnp.float32)))(x_in)
        return pack_out(run(prep_real(xre), prep_real(xim)))
    xr = prep_real(jnp.asarray(x, jnp.float32))
    if fmod != 0.0:  # real data with remodulation -> complex output
        return pack_out(run(xr, jnp.zeros_like(xr)))
    return pack_out(run(xr))
