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
  the interp taps with lane gathers — all four reference samplers
  (nearest/linear/cubic/lanczos3) run in-kernel, and under ``bf16pair``
  the 4 cubic taps ride TWO packed gathers; tiles whose spread exceeds one
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


# op-split profiling knob (perf forensics only — not API): a set of
# {"nomask", "nogather", "noweights", "noloop", "fastonly", "cond",
#  "noroll", "nounpack", "noindex", "fusedmix"} that deletes or swaps one
# piece of the inner loop so its cost can be measured by difference. Read
# at trace time; call jax.clear_caches() after changing it.
_ABLATE: frozenset = frozenset()


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


def _method_exts(method: str, pair: bool, quad: bool = False):
    """(lo_ext, hi_ext) window-bound extensions in samples for a sampler:
    how far the gather lanes extend below the tap base / above the planned
    hi index. linear gathers at [base, base+1] (pair: one packed gather at
    base); 4-tap methods gather at [base-1, base+2] (pair: two packed
    gathers at base-1 and base+1; quad/'i8x4': ONE int8x4 gather at base —
    all four taps ride the gathered 32-bit word)."""
    if method in ("cubic", "lanczos3"):
        if quad:
            return 0, 0
        return 1, (1 if pair else 2)
    if method == "nearest":
        return 0, 0
    return 0, (0 if pair else 1)


def _kernel(boxes_ref, gbox_ref, *refs, N: int, T: int, W: int, fs: float,
            tx_model: str, planar: bool, iq: bool, fmod: float,
            MC: int, NC: int, has_f: bool, keep_rx: bool, keep_tx: bool,
            rx_apods: tuple, tx_apods: tuple, has_lat: bool,
            pair: bool = False, quad: bool = False,
            allfast: bool = False,
            interp_mode: bool = False, lut: bool = False,
            method: str = "linear", vmax: float = 0.0,
            lut_tiles: bool = False, CB: int = 0,
            stream_rx: bool = False, stream_tx: bool = False,
            hostwin: bool = False):
    """See module docstring. Grid: ([F,] NCc, MTc, RB, CB). refs order:
    pz, px, py, [lat], pr(SMEM), pv(SMEM), x (1|2), accin (1|2), out (1|2).

    ``boxes_ref`` (RB, CB, 6 = [zlo, zhi, xlo, xhi, ylo, yhi]) and
    ``gbox_ref`` (G, 6 = [exlo, exhi, eylo, eyhi, ezlo, ezhi]) are
    scalar-prefetch (SMEM) bounding boxes of each image tile's pixels and
    each 8-receive group's elements, in cinv-scaled coordinates. The
    per-(tile, group, transmit) trace-window range is planned ENTIRELY on
    the scalar core from these boxes (conservative interval arithmetic,
    exact pixel boxes): replacing the in-kernel vector min/max reductions
    removed the vector->scalar round-trip that serialized the inner loop
    (measured -37% kernel time at the full trace size).

    ``lut`` mode (bring-your-own-delays: bfDAS/bfDASLUT/bfEikonal): the
    per-pixel delays come from LUT TILES instead of geometry —
    refs order: taur (VMEM (NC, 8, 128) seconds), taut (VMEM
    (MC, 8, 128)), tv (SMEM (1, Mpad) per-tx t0), x/accin/out as above;
    ``boxes_ref`` holds per-(row-stripe, rx-group) LUT bounds
    (RB, G, 2 = [lo, hi] seconds) and ``gbox_ref`` per-(stripe, tx-chunk)
    union bounds (RB, MTc, 2) — host-reduced from the actual tables, so
    the scalar window chain is two adds per (g, c). Apodization and fmod
    remodulation are geometry-free and unsupported here (callers
    validate).

    ``lut_tiles`` mode: PER-TILE window bounds — per-stripe bounds span
    the full 128*CB-lane row, whose delay spread forces the multi-window
    arm at imaging sizes (measured 4x the geometry kernel at the full
    config; per-tile bounds restore 0.72 s vs 2.64 s). Bounds come packed
    as int16 sample pairs (lo | hi << 16) in int32 SMEM arrays with tiles
    on the LANE axis (no SMEM lane padding): ``boxes_ref (G, RB*CB)``
    rx-group bounds, ``gbox_ref (MTc, RB*CB)`` tx-chunk bounds (t0 folded
    on host); unpacking is two scalar shifts. 16-bit sample indices bound
    T < 32768 — the planner falls back to stripe mode beyond that."""
    k = 0
    if lut:
        taur_ref = refs[k]; k += 1
        taut_ref = refs[k]; k += 1
        tv_ref = refs[k]; k += 1
        pz_ref = px_ref = py_ref = lat_ref = pr_ref = pv_ref = None
    else:
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
    if stream_rx or stream_tx:
        # streaming keep_rx/keep_tx (see _das_call): no aliased
        # accumulator inputs — kept bands accumulate across the summed
        # chunk axis in VMEM scratch refs, which trail the output refs
        acc_refs = None
        out_refs = refs[k:k + nch]; k += nch
        scratch_refs = refs[k:k + nch]; k += nch
    else:
        acc_refs = refs[k:k + nch]; k += nch
        out_refs = refs[k:k + nch]; k += nch

    goff = 1 if has_f else 0
    if stream_rx:
        # grid ([F,] NCc, CB, MTc, RB): transmit chunks sweep INSIDE each
        # pixel-column stripe so the kept-rx band accumulates in VMEM
        ncc = pl.program_id(goff + 0)
        cb = pl.program_id(goff + 1)
        mtc = pl.program_id(goff + 2)
        rb = pl.program_id(goff + 3)
    elif stream_tx:
        # grid ([F,] MTc, CB, NCc, RB): rx chunks sweep inside each
        # stripe; the kept-tx tiles accumulate in VMEM
        mtc = pl.program_id(goff + 0)
        cb = pl.program_id(goff + 1)
        ncc = pl.program_id(goff + 2)
        rb = pl.program_id(goff + 3)
    else:
        ncc = pl.program_id(goff + 0)
        mtc = pl.program_id(goff + 1)
        rb = pl.program_id(goff + 2)
        cb = pl.program_id(goff + 3)
    if not lut and not hostwin:
        zlo = boxes_ref[rb, cb, 0]
        zhi = boxes_ref[rb, cb, 1]
        xbl = boxes_ref[rb, cb, 2]
        xbh = boxes_ref[rb, cb, 3]
        ybl = boxes_ref[rb, cb, 4]
        ybh = boxes_ref[rb, cb, 5]

    def igap(alo, ahi, blo, bhi):
        """Scalar distance between intervals [alo,ahi], [blo,bhi] (0 if
        they overlap)."""
        return jnp.maximum(0.0, jnp.maximum(blo - ahi, alo - bhi))

    def ispan(alo, ahi, blo, bhi):
        """Scalar max |a - b| over the two intervals."""
        return jnp.maximum(ahi - blo, bhi - alo)

    pz = pz_ref[:] if not lut else None
    px = px_ref[:] if not lut else None
    py = py_ref[:] if not lut else None
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
    geoms = [tx_geom(mtc * MC + c) for c in range(MC)] if not lut else None

    def tx_bounds(c):
        """Scalar-core transmit-path window bounds for (tile, transmit c):
        conservative [dvlo, dvhi] of the one-way path over the tile's pixel
        box, already shifted by t0 and scaled to samples. Hoisted out of
        the per-(rx-group, transmit) loop — they depend only on the tile
        and the transmit, and the per-(g, c) scalar planning chain was
        measured at 19% of kernel time (the 'fixedwin' ablation); after
        this hoist only ~6 scalar ops remain per (g, c)."""
        m_ = mtc * MC + c
        pvxs = pv_ref[0, m_]
        pvzs = pv_ref[2, m_]
        t0m = pv_ref[6, m_]
        if tx_model == "plane":
            nvxs = pv_ref[3, m_]
            nvzs = pv_ref[5, m_]
            ax0 = nvxs * (xbl - pvxs)
            ax1 = nvxs * (xbh - pvxs)
            az0 = nvzs * (zlo - pvzs)
            az1 = nvzs * (zhi - pvzs)
            dvlo = jnp.minimum(ax0, ax1) + jnp.minimum(az0, az1)
            dvhi = jnp.maximum(ax0, ax1) + jnp.maximum(az0, az1)
            if not planar:
                nvys = pv_ref[4, m_]
                pvys = pv_ref[1, m_]
                ay0 = nvys * (ybl - pvys)
                ay1 = nvys * (ybh - pvys)
                dvlo = dvlo + jnp.minimum(ay0, ay1)
                dvhi = dvhi + jnp.maximum(ay0, ay1)
        else:
            gtx = igap(xbl, xbh, pvxs, pvxs)
            stx = ispan(xbl, xbh, pvxs, pvxs)
            gtz = igap(zlo, zhi, pvzs, pvzs)
            stz = ispan(zlo, zhi, pvzs, pvzs)
            if planar:
                rlo = jnp.sqrt(gtx * gtx + gtz * gtz)
                rhi = jnp.sqrt(stx * stx + stz * stz)
            else:
                pvys = pv_ref[1, m_]
                gty = igap(ybl, ybh, pvys, pvys)
                sty = ispan(ybl, ybh, pvys, pvys)
                rlo = jnp.sqrt(gtx * gtx + gty * gty + gtz * gtz)
                rhi = jnp.sqrt(stx * stx + sty * sty + stz * stz)
            if tx_model == "diverging":
                dvlo, dvhi = rlo, rhi
            else:  # virtual: sign((p - pv) . nv) * |p - pv|
                nvxs = pv_ref[3, m_]
                nvzs = pv_ref[5, m_]
                bx0 = nvxs * (xbl - pvxs)
                bx1 = nvxs * (xbh - pvxs)
                bz0 = nvzs * (zlo - pvzs)
                bz1 = nvzs * (zhi - pvzs)
                rdlo = jnp.minimum(bx0, bx1) + jnp.minimum(bz0, bz1)
                rdhi = jnp.maximum(bx0, bx1) + jnp.maximum(bz0, bz1)
                if not planar:
                    nvys = pv_ref[4, m_]
                    pvys = pv_ref[1, m_]
                    by0 = nvys * (ybl - pvys)
                    by1 = nvys * (ybh - pvys)
                    rdlo = rdlo + jnp.minimum(by0, by1)
                    rdhi = rdhi + jnp.maximum(by0, by1)
                dvlo = jnp.where(rdlo >= 0, rlo, -rhi)
                dvhi = jnp.where(rdhi <= 0, -rlo, rhi)
        # pre-shift by t0 and scale to samples (± the f32-skew margin)
        return ((dvlo - t0m) * fs - 2.0, (dvhi - t0m) * fs + 2.0)

    if (lut or hostwin) and lut_tiles:
        # per-TILE packed int16 sample bounds (see docstring): one scalar
        # load + two shifts for the whole transmit chunk. Layout: tiles on
        # the LAST (lane) axis so the SMEM arrays need no lane padding —
        # boxes_ref (G, RB*CB) rx, gbox_ref (MTc, RB*CB) tx, both int32.
        # ``hostwin`` routes the GEOMETRY kernel through this same branch
        # (bounds host-planned by plan_hostwin; delays stay in-kernel).
        tq = rb * CB + cb
        vtx = gbox_ref[mtc, tq]
        tlo = ((vtx << 16) >> 16).astype(jnp.float32) - 2.0
        thi = (vtx >> 16).astype(jnp.float32) + 2.0
        txb = [(tlo, thi)] * MC
    elif lut:
        # per-(stripe, tx-chunk) union bounds, host-reduced from the LUT
        # (lo/hi interleaved on the 2nd axis: a trailing size-2 axis gets
        # lane-padded to 128 in SMEM — 512 KB per prefetch array!)
        t0c = gbox_ref[rb, 2 * mtc]
        t1c = gbox_ref[rb, 2 * mtc + 1]
        txb = [((t0c - tv_ref[0, mtc * MC + c]) * fs - 2.0,
                (t1c - tv_ref[0, mtc * MC + c]) * fs + 2.0)
               for c in range(MC)]
    else:
        txb = [tx_bounds(c) for c in range(MC)]

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
        if lut:
            # per-pixel receive delays come straight from the LUT tile
            DRF = jnp.concatenate(
                [taur_ref[g * 8 + r] for r in range(8)], axis=0) * fs
            WR = None
            gg = ncc * (NC // 8) + g
            if lut_tiles:
                vrx = boxes_ref[gg, rb * CB + cb]
                drlo = ((vrx << 16) >> 16).astype(jnp.float32)
                drhi = (vrx >> 16).astype(jnp.float32)
            else:
                drlo = boxes_ref[rb, 2 * gg] * fs
                drhi = boxes_ref[rb, 2 * gg + 1] * fs
        else:
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
            # pre-scale by the sample rate once per GROUP (amortized over
            # the MC transmits): TI = DRF + dvF is then 2 vector ops
            DRF = jnp.concatenate(drs, axis=0) * fs  # (64, 128) in samples
            WR = jnp.concatenate(wrs, axis=0) if rx_apods else None

            # scalar-core receive-distance bounds for this (tile, group):
            # box-to-box interval arithmetic, amortized over the MC
            # transmits of the chunk (or one packed SMEM read when the
            # bounds were host-planned, QUPS_DAS_HOSTWIN=1)
            gg = ncc * (NC // 8) + g
            if hostwin:
                vrx = boxes_ref[gg, rb * CB + cb]
                drlo = ((vrx << 16) >> 16).astype(jnp.float32)
                drhi = (vrx >> 16).astype(jnp.float32)
            else:
                exlo = gbox_ref[gg, 0]
                exhi = gbox_ref[gg, 1]
                ezlo = gbox_ref[gg, 4]
                ezhi = gbox_ref[gg, 5]
                gx = igap(xbl, xbh, exlo, exhi)
                sx = ispan(xbl, xbh, exlo, exhi)
                gz = igap(zlo, zhi, ezlo, ezhi)
                sz = ispan(zlo, zhi, ezlo, ezhi)
                if planar:
                    drlo = jnp.sqrt(gx * gx + gz * gz) * fs
                    drhi = jnp.sqrt(sx * sx + sz * sz) * fs
                else:
                    eylo = gbox_ref[gg, 2]
                    eyhi = gbox_ref[gg, 3]
                    gy = igap(ybl, ybh, eylo, eyhi)
                    sy = ispan(ybl, ybh, eylo, eyhi)
                    drlo = jnp.sqrt(gx * gx + gy * gy + gz * gz) * fs
                    drhi = jnp.sqrt(sx * sx + sy * sy + sz * sz) * fs

        def cbody(c, accs64):
            if lut:
                assert isinstance(c, int), "lut mode requires MC <= 8"
                t0m = tv_ref[0, mtc * MC + c]
                dvF = (taut_ref[c] - t0m) * fs  # (8, 128) per-tx LUT tile
            else:
                dv = select_c(c, [d for d, _, _ in geoms])
                t0m = pv_ref[6, mtc * MC + c]  # scalar, cheap
                dvF = (dv - t0m) * fs  # (8, 128): 1/8-cost per-tx part
            dvF64 = jnp.broadcast_to(dvF[None], (8, 8, 128)).reshape(64, 128)
            TI = dvF64 + DRF
            I0F = jnp.floor(TI)
            U = TI - I0F
            Ki = I0F.astype(jnp.int32)
            four = method in ("cubic", "lanczos3")
            if method == "nearest":
                # round-half-even to match jnp.round on the XLA path;
                # valid domain is the tau-level 0 <= tau <= T_true-1
                # (vmax = T_true), matching ops/interp._taps exactly
                Kn = jax.lax.round(
                    TI, jax.lax.RoundingMethod.TO_NEAREST_EVEN
                ).astype(jnp.int32)
                VAL = (TI >= 0.0) & (TI <= vmax - 1.0)
                TIS = jnp.clip(Kn, 0, T - 2)
                raw_w = (None,)  # weight 1 (mask/apods applied below)
            elif four:
                # 4-tap samplers: the caller edge-replicated one sample at
                # each trace end and shifted t0 by -1/fs, so TI here is the
                # true fractional index + 1 and taps [Ki-1, Ki+2] reproduce
                # the XLA path's clamp-replicated edge taps exactly. Valid
                # domain: 1 <= TI <= vmax (= true T, i.e. tau <= T-1).
                VAL = (TI >= 1.0) & (TI <= vmax)
                TIS = jnp.clip(Ki, 1, T - 3)
                if method == "cubic":
                    # Catmull-Rom (``interpd.cu:89-113``; ops/interp._taps)
                    raw_w = (0.5 * (U * (-1.0 + U * (2.0 - U))),
                             0.5 * (2.0 + U * U * (-5.0 + 3.0 * U)),
                             0.5 * (U * (1.0 + U * (4.0 - 3.0 * U))),
                             0.5 * (U * U * (U - 1.0)))
                else:
                    # Lanczos-3 (a=2): w(v) = 2 sin(pi v) sin(pi v/2)/(pi v)^2
                    # at v = U+1, U, U-1, U-2 — folded onto two base sins
                    # via shift identities (sin(pi(U±k)) = ±sin(pi U), etc.)
                    pu = jnp.float32(np.pi) * U
                    s1 = jnp.sin(pu)
                    s2 = jnp.sin(0.5 * pu)
                    c2 = jnp.cos(0.5 * pu)
                    pi2 = jnp.float32(np.pi * np.pi)
                    safe = jnp.where(U == 0.0, 1.0, U)
                    w0c = jnp.where(
                        U == 0.0, 1.0,
                        2.0 * s1 * s2 / (pi2 * safe * safe))
                    up1 = U + 1.0
                    um1 = U - 1.0
                    um2 = U - 2.0
                    raw_w = (-2.0 * s1 * c2 / (pi2 * up1 * up1),
                             w0c,
                             2.0 * s1 * c2 / (pi2 * um1 * um1),
                             -2.0 * s1 * s2 / (pi2 * um2 * um2))
            else:
                # valid <=> both taps in [0, T-1] <=> 0 <= Ki <= T-2, as ONE
                # unsigned compare (negative Ki wraps huge). Matches the
                # reference's whole-sample bounds check (``interpd.cu:84``).
                VAL = Ki.astype(jnp.uint32) <= jnp.uint32(T - 2)
                TIS = jnp.clip(Ki, 0, T - 2)
                raw_w = (1.0 - U, U)
            WTm = None  # multiplicative weight (apods), for the fused mix
            if WR is not None or tx_apods:
                WT = jnp.where(VAL, 1.0, 0.0)
                if WR is not None:
                    WT = WT * WR
                if tx_apods:
                    tw = select_c(c, [w for _, _, w in geoms])
                    WT = WT * jnp.broadcast_to(tw[None],
                                               (8, 8, 128)).reshape(64, 128)
                WTm = WT
                WS = tuple(WT if w is None else w * WT for w in raw_w)
            else:
                # fold the mask directly into the tap weights
                WS = tuple(jnp.where(VAL, 1.0 if w is None else w, 0.0)
                           for w in raw_w)
            if quad and not lut:
                # per-TRANSMIT int8 quantization scale (s_m / 127, pv row
                # 8): folded into the tap weights so dequantization costs
                # nothing and per-tx amplitude variation (FSA geometric
                # decay) keeps full int8 resolution per transmit. The LUT
                # path has no pv block and keeps a per-call global scale.
                scq = pv_ref[8, mtc * MC + c]  # scalar
                WS = tuple(w * scq for w in WS)
            if not four and method != "nearest":
                W0, W1 = WS  # legacy names for the linear fast/slow arms
            # scalar-core window range for THIS (group, transmit): the
            # group's receive bounds + the hoisted per-(tile, transmit)
            # one-way bounds (see tx_bounds; ±2-sample margin absorbs f32
            # rounding skew between the scalar chain and the vector TI).
            if "sharedwin" in _ABLATE and isinstance(c, int):
                # probe: ONE window per (group, chunk) — the union of the
                # chunk's transmit bounds — so all MC slab offsets resolve
                # from one scalar chain (results stay correct only if the
                # union span fits W; perf-indicative regardless).
                # MEASURED: 0.647 s vs 0.662 s baseline (~2%, within the
                # run-to-run band; checksum identical) — not worth the
                # host-side union-span proof to productize
                lo_t = drlo + functools.reduce(
                    jnp.minimum, [t[0] for t in txb])
                hi_t = drhi + functools.reduce(
                    jnp.maximum, [t[1] for t in txb])
            else:
                lo_t = drlo + select_c(c, [t[0] for t in txb])
                hi_t = drhi + select_c(c, [t[1] for t in txb])
            if "fixedwin" in _ABLATE:  # probe: scalar planning chain cost
                lo_t = jnp.float32(0.0)
                hi_t = jnp.float32(64.0)
            lo_ext, hi_ext = _method_exts(method, pair, quad)
            lo_i = jnp.clip(lo_t.astype(jnp.int32) - lo_ext, 0, T - 2)
            hi_i = jnp.clip(hi_t.astype(jnp.int32) + 1, 0, T - 2)
            ws0 = lo_i
            q0 = lo_i >> 7
            tap_hi = jnp.minimum(hi_i + hi_ext, T - 1)
            Jact = (tap_hi >> 7) - q0 + 1
            # loop-invariant gather state, hoisted out of jbody: the lane
            # index within ANY aligned window is TIS % W, and tap0's
            # window id is TIS // W — per window only ONE compare
            # (window-id == q0 + j) remains. 4-tap methods track the two
            # gather lanes TIS-1 / TIS+1 (pair) or all four (f32).
            assert W == 128
            four = method in ("cubic", "lanczos3")
            if four:
                if quad:  # 'i8x4': all 4 taps in one gathered word
                    glanes = (TIS,)
                elif pair:
                    glanes = (TIS - 1, TIS + 1)
                else:
                    glanes = (TIS - 1, TIS, TIS + 1, TIS + 2)
            elif method == "nearest":
                glanes = (TIS,)
            else:
                glanes = (TIS,) if pair else (TIS, TIS + 1)
            lids = tuple(t & (W - 1) for t in glanes)
            wids = tuple(t >> 7 for t in glanes)

            def slab_at(q):
                ws = pl.multiple_of(q * W, W)
                if has_f:
                    return [xr[0, c, pl.ds(g * 8, 8), pl.ds(ws, W)]
                            for xr in x_refs]
                return [xr[c, pl.ds(g * 8, 8), pl.ds(ws, W)]
                        for xr in x_refs]

            def fast(part):
                """Single UNALIGNED window: when the tile's whole tap range
                [ws0, tap_hi] spans < W samples (the common case — tile
                delay spread is bounded by geometry), build the window
                starting exactly at ws0 from the two aligned slabs it
                straddles with a dynamic lane roll + iota select. No
                per-window masks (every tap is in range by construction)
                and exactly ONE gather per channel. Measured 74.0 vs 45.2
                Gsums/s against the aligned-window loop at the full bench
                config (window planning makes every span fit: identical
                checksums); selected STATICALLY per launch by the host-side
                ``plan_allfast`` — a dynamic lax.cond dispatch measured 27%
                SLOWER than the aligned loop."""
                mm = ws0 - q0 * W  # 0 <= mm < W
                q0b = jnp.minimum(q0 + 1, T // W - 1)
                if "oneslab" in _ABLATE:  # probe: 2nd VMEM slab-read cost
                    q0b = q0
                s0s = slab_at(q0)
                s1s = slab_at(q0b)
                LJ = TIS - ws0
                lane = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
                sel = lane < (W - mm)

                def roll_lanes(v):
                    if interp_mode:
                        # pltpu.roll has no interpret-mode rule; emulate the
                        # right-roll with a modular lane gather
                        return jnp.take_along_axis(v, (lane + mm) % W, axis=1)
                    return pltpu.roll(v, W - mm, axis=1)

                new = list(part)
                for ch in range(nch):
                    if "noroll" in _ABLATE:
                        v = s0s[ch]
                    elif "oneroll" in _ABLATE:
                        # measured SLOWER (0.684 vs 0.657 s at the full
                        # bench): the pre-roll select serializes on both
                        # slabs + mm, while two independent rolls schedule
                        # as each slab lands — kept only as a probe.
                        # roll(u, W-mm)[l] = u[(l+mm) % W] = s0[l+mm] for
                        # l < W-mm, s1[l+mm-W] otherwise
                        u = jnp.where(lane >= mm, s0s[ch], s1s[ch])
                        v = roll_lanes(u)
                    else:
                        v0 = roll_lanes(s0s[ch])
                        v1 = roll_lanes(s1s[ch])
                        v = jnp.where(sel, v0, v1)
                    srep = jnp.broadcast_to(v[:, None, :],
                                            (8, 8, W)).reshape(64, W)
                    if method != "linear":
                        # generic tap sweep (nearest / cubic / lanczos3):
                        # pair mode covers taps [k-1, k] and [k+1, k+2]
                        # with ONE packed gather each — 4 cubic taps ride
                        # 2 gathers, the TPU analog of the reference's
                        # half2 4-tap path (``interpd.cu:89-113``)
                        acc = None
                        if quad and four:
                            # all four taps ride ONE int8x4 gather
                            if "nogather" in _ABLATE:  # probe
                                gi = srep
                            else:
                                gi = jnp.take_along_axis(srep, LJ, axis=1)
                            acc = _quad_mix(gi, WS)
                        elif pair:
                            if four:
                                pairs = ((LJ - 1, WS[0], WS[1]),
                                         (LJ + 1, WS[2], WS[3]))
                            else:  # nearest: lo half only
                                pairs = ((LJ, WS[0], None),)
                            for lq, wlo, whi in pairs:
                                if "nogather" in _ABLATE:  # probe
                                    gi = srep
                                else:
                                    gi = jnp.take_along_axis(srep, lq,
                                                             axis=1)
                                glo = jax.lax.bitcast_convert_type(
                                    gi << 16, jnp.float32)
                                if "noweights" in _ABLATE:  # probe
                                    t = glo
                                else:
                                    t = glo * wlo
                                if whi is not None:
                                    ghi = jax.lax.bitcast_convert_type(
                                        gi & jnp.int32(-65536), jnp.float32)
                                    if "noweights" not in _ABLATE:
                                        t = t + ghi * whi
                                acc = t if acc is None else acc + t
                        else:
                            offs = (-1, 0, 1, 2) if four else (0,)
                            for k, off in enumerate(offs):
                                gk = jnp.take_along_axis(srep, LJ + off,
                                                         axis=1)
                                t = gk * WS[k]
                                acc = t if acc is None else acc + t
                        new[ch] = new[ch] + acc
                        continue
                    if "nogather" in _ABLATE:
                        g0 = g1 = (jax.lax.bitcast_convert_type(
                            srep, jnp.float32) if pair else srep)
                    elif pair:
                        gi = jnp.take_along_axis(srep, LJ, axis=1)
                        if "nounpack" in _ABLATE:
                            g0 = g1 = jax.lax.bitcast_convert_type(
                                gi, jnp.float32)
                        else:
                            g0 = jax.lax.bitcast_convert_type(
                                gi << 16, jnp.float32)
                            g1 = jax.lax.bitcast_convert_type(
                                gi & jnp.int32(-65536), jnp.float32)
                    else:
                        g0 = jnp.take_along_axis(srep, LJ, axis=1)
                        g1 = jnp.take_along_axis(srep, LJ + 1, axis=1)
                    if "noweights" in _ABLATE:
                        new[ch] = new[ch] + g0
                    elif "fusedmix" in _ABLATE:
                        # candidate trim: one lerp + one mask instead of two
                        # pre-masked tap weights (same math, fewer vector ops)
                        vmix = g0 + U * (g1 - g0)
                        if WTm is not None:
                            new[ch] = new[ch] + WTm * vmix
                        else:
                            new[ch] = new[ch] + jnp.where(VAL, vmix, 0.0)
                    else:
                        new[ch] = new[ch] + (g0 * W0 + g1 * W1)
                return tuple(new)

            def jbody(j, part):
                slabs = slab_at(q0 + j)
                if method != "linear":
                    if quad and four:
                        # one int8x4 gather; mask all 4 tap weights on the
                        # single gather lane's window id
                        if "noloop" in _ABLATE:
                            return part
                        mq = wids[0] == q0 + j
                        wsm = tuple(jnp.where(mq, w, 0.0) for w in WS)
                        new = list(part)
                        for ch in range(nch):
                            srep = jnp.broadcast_to(
                                slabs[ch][:, None, :],
                                (8, 8, W)).reshape(64, W)
                            gq = jnp.take_along_axis(srep, lids[0], axis=1)
                            new[ch] = new[ch] + _quad_mix(gq, wsm)
                        return tuple(new)
                    # generic per-gather window masks: each gather lane has
                    # its own window id; a gather contributes only in its
                    # matching window j
                    if pair:
                        # packed gather q covers taps (2q, 2q+1) of the
                        # 4-tap stencil (or the single nearest tap)
                        tapw = [(WS[2 * q], WS[2 * q + 1] if four else None)
                                for q in range(len(glanes))]
                    else:
                        tapw = [(WS[q], None) for q in range(len(glanes))]
                    masked = [
                        (lids[q],
                         jnp.where(wids[q] == q0 + j, tapw[q][0], 0.0),
                         (jnp.where(wids[q] == q0 + j, tapw[q][1], 0.0)
                          if tapw[q][1] is not None else None))
                        for q in range(len(glanes))]
                    if "noloop" in _ABLATE:
                        return part
                    new = list(part)
                    for ch in range(nch):
                        srep = jnp.broadcast_to(slabs[ch][:, None, :],
                                                (8, 8, W)).reshape(64, W)
                        acc = None
                        for lq, alo, ahi in masked:
                            gq = jnp.take_along_axis(srep, lq, axis=1)
                            if pair:
                                glo = jax.lax.bitcast_convert_type(
                                    gq << 16, jnp.float32)
                                t = glo * alo
                                if ahi is not None:
                                    ghi = jax.lax.bitcast_convert_type(
                                        gq & jnp.int32(-65536), jnp.float32)
                                    t = t + ghi * ahi
                            else:
                                t = gq * alo
                            acc = t if acc is None else acc + t
                        new[ch] = new[ch] + acc
                    return tuple(new)
                l0, w0id = lids[0], wids[0]
                m0 = w0id == q0 + j
                if "nomask" in _ABLATE:
                    a0, a1 = W0, W1
                elif pair:
                    a0 = jnp.where(m0, W0, 0.0)
                    # both taps ride ONE 32-bit gather: the packed trace
                    # holds bf16(x[t]) in the low and bf16(x[t+1]) in the
                    # high half of lane t (the TPU analog of the
                    # reference's half2 trace path, ``bf.cu:170``); a
                    # bf16's bits are the top half of an f32, so unpacking
                    # is a shift/mask + bitcast, and the pair never
                    # straddles a window boundary
                    a1 = jnp.where(m0, W1, 0.0)
                else:
                    l1, w1id = lids[1], wids[1]
                    m1 = w1id == q0 + j
                    a0 = jnp.where(m0, W0, 0.0)
                    a1 = jnp.where(m1, W1, 0.0)
                if "noweights" in _ABLATE:
                    a0 = 1.0
                    a1 = 0.0
                if "noloop" in _ABLATE:
                    return part
                new = list(part)
                for ch in range(nch):
                    # rx r's trace row, repeated across its 8 image rows
                    srep = jnp.broadcast_to(slabs[ch][:, None, :],
                                            (8, 8, W)).reshape(64, W)
                    if "nogather" in _ABLATE:
                        g0 = g1 = srep[:, :128].astype(jnp.float32) * 0 + 1
                    elif pair:
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

            # windows q0 .. q0+Jact-1 stay in-range by construction
            # (hi_i <= T-2 so the last tap window index is <= T//W - 1)
            span_fits = (tap_hi - ws0) < W

            def slow(part):
                # peel window 0 (always executes; with scalar-core planning
                # most tiles need exactly one window) so its gather sits in
                # the straight-line block where Mosaic can schedule it
                # against neighboring transmits' arithmetic; the loop then
                # usually runs 0 iterations
                part = jbody(0, part)
                return jax.lax.fori_loop(1, Jact, jbody, part)

            def sweep(part):
                # static dispatch: 'allfast' is proven by the host planner
                # (every span fits one window); otherwise the aligned-window
                # loop handles arbitrary spreads
                if "fastonly" in _ABLATE or (allfast
                                             and "noallfast" not in _ABLATE):
                    return fast(part)
                if "cond" in _ABLATE:
                    return jax.lax.cond(span_fits, fast, slow, part)
                return slow(part)

            if iq and fmod != 0.0:
                z64 = jnp.zeros((64, 128), jnp.float32)
                part = sweep(tuple(z64 for _ in range(nch)))
                # rotate by the remodulation phasor exp(2j pi fmod tau)
                # (``bf.cu:117``; constant over j -> applies to partials).
                # 4-tap methods run on the +1-shifted index (edge-replicated
                # trace pad) — un-shift for the true tau.
                ph = (2.0 * np.pi * fmod / fs) * (TI - 1.0 if four else TI)
                cph = jnp.cos(ph)
                sph = jnp.sin(ph)
                tre, tim = part
                return (accs64[0] + tre * cph - tim * sph,
                        accs64[1] + tre * sph + tim * cph)
            return sweep(accs64)

        if c_only is not None:
            return cbody(c_only, accs64)
        if MC <= 8:
            # unroll the transmit chunk: static c kills the select_c
            # where-chains and gives the compiler one straight-line block
            # to overlap gathers and FMAs across transmits
            for c in range(MC):
                accs64 = cbody(c, accs64)
            return accs64
        return jax.lax.fori_loop(0, MC, cbody, accs64)

    # --- accumulate ---
    def oref(ref, *idx):
        """Index past the leading frame block dim when present."""
        return ref[(0,) + idx] if has_f else (ref[idx] if idx else ref[:])

    def oset(ref, val, *idx):
        val = val.astype(ref.dtype)  # bf16 kept-axis accumulator (acc16)
        if has_f:
            ref[(0,) + idx] = val
        elif idx:
            ref[idx] = val
        else:
            ref[:] = val

    z64 = jnp.zeros((64, 128), jnp.float32)
    G = NC // 8
    if keep_rx and keep_tx:
        # BF mode — keep BOTH axes (``bf.cu`` flag bits 3+4 together):
        # one (8, 8, 128) band per (transmit, rx-group); output block
        # (MC, NC, 8, 128). Output traffic is I*N*M floats — small
        # configs only (the XLA path covers the rest identically).
        for c in range(MC):
            for g in range(G):
                accs64 = rx_group(g, tuple(z64 for _ in range(nch)),
                                  c_only=c)
                for ch in range(nch):
                    band = accs64[ch].reshape(8, 8, 128)
                    sl = slice(g * 8, g * 8 + 8)
                    odt = out_refs[ch].dtype
                    if has_f:
                        out_refs[ch][0, c, sl] = (
                            acc_refs[ch][0, c, sl] + band).astype(odt)
                    else:
                        out_refs[ch][c, sl] = (
                            acc_refs[ch][c, sl] + band).astype(odt)
    elif keep_rx and stream_rx:
        # streaming keep_rx: the (NC, 8, 128) band for this (tile, rx
        # chunk) accumulates across the MTc transmit chunks in a VMEM
        # scratch column (NC, I1p, 128) — the old aliased-HBM accumulator
        # cost MTc read+write sweeps of the (N, I1, I2) image (~128 GB at
        # the full 1024^2 x 256x256 config, the measured 1.6x keep_rx
        # overhead); here the band leaves VMEM exactly once, on the final
        # transmit chunk (the out index map parks earlier steps on a
        # dummy row block that the caller crops).
        MTcg = pl.num_programs(goff + 2)
        for g in range(G):
            accs64 = rx_group(g, tuple(z64 for _ in range(nch)))
            gsl = pl.ds(g * 8, 8)
            rsl = pl.ds(rb * 8, 8)
            for ch in range(nch):
                band = accs64[ch].reshape(8, 8, 128)
                if MTcg == 1:  # single transmit chunk: direct write
                    oset(out_refs[ch], band, gsl)
                    continue
                sref = scratch_refs[ch]

                @pl.when(mtc == 0)
                def _(sref=sref, band=band, gsl=gsl, rsl=rsl):
                    sref[gsl, rsl] = band

                @pl.when(mtc != 0)
                def _(sref=sref, band=band, gsl=gsl, rsl=rsl):
                    sref[gsl, rsl] = sref[gsl, rsl] + band

                @pl.when(mtc == MTcg - 1)
                def _(sref=sref, ch=ch, gsl=gsl, rsl=rsl):
                    oset(out_refs[ch], sref[gsl, rsl], gsl)
    elif keep_rx:
        for g in range(G):
            accs64 = rx_group(g, tuple(z64 for _ in range(nch)))
            for ch in range(nch):
                # one (8, 8, 128) slice write per group, not 8 row writes
                band = accs64[ch].reshape(8, 8, 128)
                sl = slice(g * 8, g * 8 + 8)
                odt = out_refs[ch].dtype
                if has_f:
                    out_refs[ch][0, sl] = (
                        acc_refs[ch][0, sl] + band).astype(odt)
                else:
                    out_refs[ch][sl] = (
                        acc_refs[ch][sl] + band).astype(odt)
    elif keep_tx and stream_tx:
        # streaming keep_tx: per-transmit tiles accumulate across the
        # NCc receive chunks in VMEM scratch (MC, I1p, 128); written out
        # once on the final rx chunk (dummy-row parking, as keep_rx)
        NCcg = pl.num_programs(goff + 2)
        rsl = pl.ds(rb * 8, 8)
        for c in range(MC):
            def gbody(g, accs64, c=c):
                return rx_group(g, accs64, c_only=c)

            accs64 = jax.lax.fori_loop(0, G, gbody,
                                       tuple(z64 for _ in range(nch)))
            for ch in range(nch):
                tile = jnp.sum(accs64[ch].reshape(8, 8, 128), axis=0)
                if NCcg == 1:  # single rx chunk: direct write
                    oset(out_refs[ch], tile, c)
                    continue
                sref = scratch_refs[ch]

                @pl.when(ncc == 0)
                def _(sref=sref, tile=tile, c=c, rsl=rsl):
                    sref[c, rsl] = tile

                @pl.when(ncc != 0)
                def _(sref=sref, tile=tile, c=c, rsl=rsl):
                    sref[c, rsl] = sref[c, rsl] + tile

                @pl.when(ncc == NCcg - 1)
                def _(sref=sref, ch=ch, c=c, rsl=rsl):
                    oset(out_refs[ch], sref[c, rsl], c)
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
        accs64 = tuple(z64 for _ in range(nch))
        if G <= 8 and "nounrollg" not in _ABLATE:
            # unroll the rx-group loop too: one straight-line block per
            # (tile, tx-chunk) lets the VLIW scheduler overlap gathers
            # and arithmetic across groups
            for g in range(G):
                accs64 = rx_group(g, accs64)
        else:
            def gbody(g, accs64):
                return rx_group(g, accs64)

            accs64 = jax.lax.fori_loop(0, G, gbody, accs64)
        for ch in range(nch):
            tile = jnp.sum(accs64[ch].reshape(8, 8, 128), axis=0)
            oset(out_refs[ch], oref(acc_refs[ch]) + tile)


def _tile_boxes(pz, px, py):
    """Host-side: exact per-tile (8 x 128) pixel bounding boxes
    ``(RB, CB, 6) = [zlo, zhi, xlo, xhi, ylo, yhi]`` for the kernel's
    scalar-core window planner (inputs already cinv-scaled). The TPU-native
    replacement for the reference's range-block trick
    (``greens.cu:628-715``): the GPU sorts work into range blocks, the TPU
    plans trace windows on the scalar core from these boxes."""
    RB, CB = pz.shape[0] // 8, pz.shape[1] // 128

    def mm(a):
        t = a.reshape(RB, 8, CB, 128)
        return t.min(axis=(1, 3)), t.max(axis=(1, 3))

    zlo, zhi = mm(pz)
    xlo, xhi = mm(px)
    ylo, yhi = mm(py)
    return np.stack([zlo, zhi, xlo, xhi, ylo, yhi], -1).astype(np.float32)


def _group_boxes(prs, Np8):
    """Host-side: per-8-receive-group element bounding boxes
    ``(G, 6) = [exlo, exhi, eylo, eyhi, ezlo, ezhi]`` from the packed
    (scaled) receive table ``prs (8, Npad)``."""
    G = Np8 // 8
    ex = prs[0, :Np8].reshape(G, 8)
    ey = prs[1, :Np8].reshape(G, 8)
    ez = prs[2, :Np8].reshape(G, 8)
    return np.stack([ex.min(1), ex.max(1), ey.min(1), ey.max(1),
                     ez.min(1), ez.max(1)], -1).astype(np.float32)


def _interval_bounds(boxes, gbox, pvs, M, *, fs, tx_model, planar):
    """Host f32 box-to-box interval bounds shared by :func:`plan_allfast`
    and :func:`plan_hostwin` — mirrors the kernel's scalar-core interval
    math exactly (any change here must track the in-kernel rx/tx bounds
    branches). Returns ``(drlo, drhi)`` rx distances in SAMPLES
    ((TB, G)), ``(dvlo, dvhi)`` tx distances in seconds ((TB, M)), and
    ``t0m`` ((1, M))."""
    f32 = np.float32
    B = np.asarray(boxes, f32).reshape(-1, 6)
    Gb = np.asarray(gbox, f32)
    zlo, zhi = B[:, 0:1], B[:, 1:2]
    xbl, xbh = B[:, 2:3], B[:, 3:4]
    ybl, ybh = B[:, 4:5], B[:, 5:6]
    exlo, exhi = Gb[None, :, 0], Gb[None, :, 1]
    eylo, eyhi = Gb[None, :, 2], Gb[None, :, 3]
    ezlo, ezhi = Gb[None, :, 4], Gb[None, :, 5]

    def igap(alo, ahi, blo, bhi):
        return np.maximum(f32(0), np.maximum(blo - ahi, alo - bhi))

    def ispan(alo, ahi, blo, bhi):
        return np.maximum(ahi - blo, bhi - alo)

    gx, sx = igap(xbl, xbh, exlo, exhi), ispan(xbl, xbh, exlo, exhi)
    gz, sz = igap(zlo, zhi, ezlo, ezhi), ispan(zlo, zhi, ezlo, ezhi)
    if planar:
        drlo = np.sqrt(gx * gx + gz * gz) * f32(fs)
        drhi = np.sqrt(sx * sx + sz * sz) * f32(fs)
    else:
        gy, sy = igap(ybl, ybh, eylo, eyhi), ispan(ybl, ybh, eylo, eyhi)
        drlo = np.sqrt(gx * gx + gy * gy + gz * gz) * f32(fs)
        drhi = np.sqrt(sx * sx + sy * sy + sz * sz) * f32(fs)

    pvs = np.asarray(pvs, f32)
    pvx, pvy, pvz = pvs[0, :M][None], pvs[1, :M][None], pvs[2, :M][None]
    nvx, nvy, nvz = pvs[3, :M][None], pvs[4, :M][None], pvs[5, :M][None]
    t0m = pvs[6, :M][None]
    if tx_model == "plane":
        ax0, ax1 = nvx * (xbl - pvx), nvx * (xbh - pvx)
        az0, az1 = nvz * (zlo - pvz), nvz * (zhi - pvz)
        dvlo = np.minimum(ax0, ax1) + np.minimum(az0, az1)
        dvhi = np.maximum(ax0, ax1) + np.maximum(az0, az1)
        if not planar:
            ay0, ay1 = nvy * (ybl - pvy), nvy * (ybh - pvy)
            dvlo = dvlo + np.minimum(ay0, ay1)
            dvhi = dvhi + np.maximum(ay0, ay1)
    else:
        gtx, stx = igap(xbl, xbh, pvx, pvx), ispan(xbl, xbh, pvx, pvx)
        gtz, stz = igap(zlo, zhi, pvz, pvz), ispan(zlo, zhi, pvz, pvz)
        if planar:
            rlo = np.sqrt(gtx * gtx + gtz * gtz)
            rhi = np.sqrt(stx * stx + stz * stz)
        else:
            gty, sty = igap(ybl, ybh, pvy, pvy), ispan(ybl, ybh, pvy, pvy)
            rlo = np.sqrt(gtx * gtx + gty * gty + gtz * gtz)
            rhi = np.sqrt(stx * stx + sty * sty + stz * stz)
        if tx_model == "diverging":
            dvlo, dvhi = rlo, rhi
        else:
            bx0, bx1 = nvx * (xbl - pvx), nvx * (xbh - pvx)
            bz0, bz1 = nvz * (zlo - pvz), nvz * (zhi - pvz)
            rdlo = np.minimum(bx0, bx1) + np.minimum(bz0, bz1)
            rdhi = np.maximum(bx0, bx1) + np.maximum(bz0, bz1)
            if not planar:
                by0, by1 = nvy * (ybl - pvy), nvy * (ybh - pvy)
                rdlo = rdlo + np.minimum(by0, by1)
                rdhi = rdhi + np.maximum(by0, by1)
            dvlo = np.where(rdlo >= 0, rlo, -rhi)
            dvhi = np.where(rdhi <= 0, -rlo, rhi)
    return drlo, drhi, dvlo, dvhi, t0m


_ALLFAST_CACHE: dict = {}


def plan_allfast_cached(boxes, gbox, pvs, M, **kw):
    """Memoized :func:`plan_allfast` — repeated eager ``system.DAS`` calls
    on a fixed geometry re-prove the same plan (~120 ms host at the full
    config); the operands hash in well under a millisecond."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    for a in (boxes, gbox, pvs):
        a = np.ascontiguousarray(a)
        # shape/dtype delimiters: concatenated raw bytes alone would let
        # different row splits of the same bytes collide to one key
        h.update(repr((a.shape, a.dtype.str)).encode())
        h.update(a.tobytes())
    key = (h.hexdigest(), M, tuple(sorted(kw.items())))
    if key not in _ALLFAST_CACHE:
        if len(_ALLFAST_CACHE) > 64:
            _ALLFAST_CACHE.clear()
        _ALLFAST_CACHE[key] = plan_allfast(boxes, gbox, pvs, M, **kw)
    return _ALLFAST_CACHE[key]


def plan_allfast(boxes, gbox, pvs, M, *, fs, tx_model, planar, T, pair,
                 W=128, safety=2, method="linear"):
    """Host-side proof that EVERY (tile, rx-group, transmit) tap range fits
    one W-lane window, mirroring the kernel's scalar-core interval math in
    f32. When true, the kernel compiles the unaligned single-window 'fast'
    arm unconditionally — one gather per (group, tx, channel), no window
    masks (measured 74.0 vs 45.2 Gsums/s at the full bench config). The
    ``safety`` margin absorbs host-vs-scalar-core f32 rounding skew on top
    of the kernel's own ±2-sample planning margin."""
    drlo, drhi, dvlo, dvhi, t0m = _interval_bounds(
        boxes, gbox, pvs, M, fs=fs, tx_model=tx_model, planar=planar)
    B = np.asarray(boxes, np.float32).reshape(-1, 6)
    f32 = np.float32

    # combine per (tile, group, tx) in tile chunks to bound memory
    lo_ext, hi_ext = _method_exts(method, pair)
    TB = B.shape[0]
    step = max(1, 2 ** 24 // max(1, drlo.shape[1] * M))
    for i0 in range(0, TB, step):
        s = slice(i0, i0 + step)
        lo_t = drlo[s, :, None] + (dvlo[s, None, :] - t0m[None]) * f32(fs) \
            - f32(2)
        hi_t = drhi[s, :, None] + (dvhi[s, None, :] - t0m[None]) * f32(fs) \
            + f32(2)
        lo_i = np.clip(lo_t.astype(np.int32) - lo_ext, 0, T - 2)
        hi_i = np.clip(hi_t.astype(np.int32) + 1, 0, T - 2)
        tap_hi = np.minimum(hi_i + hi_ext, T - 1)
        if int((tap_hi - lo_i).max()) >= W - safety:
            return False
    return True


def plan_hostwin(boxes, gbox, pvs, M, MC, *, fs, tx_model, planar, T,
                 pair, method="linear", W=128, safety=2):
    """Host-planned per-(tile, rx-group) / per-(tile, tx-chunk) packed
    int16 window bounds for the GEOMETRY kernel (``QUPS_DAS_HOSTWIN=1``) —
    the VERDICT-r3 'compile-time-static windows' experiment, isolated from
    the LUT kernel's delay-table streaming: the kernel reads ONE packed
    SMEM word per (group, chunk) instead of running the scalar interval
    chain. NOTE this does NOT make the window starts trace-time constants
    (they remain data-dependent scalars feeding dynamic slices); it
    measures how much of the 19% 'fixedwin' gap is window *computation*
    vs the irreducible scalar->dynamic-slice dependency.

    Returns ``(rxb (G, pad(RB*CB)) int32, txb (MTc, pad(RB*CB)) int32,
    allfast, ok)``; ``ok=False`` when the bounds exceed int16 (caller
    falls back to in-kernel planning)."""
    f32 = np.float32
    drlo, drhi, dvlo, dvhi, t0m = _interval_bounds(
        boxes, gbox, pvs, M, fs=fs, tx_model=tx_model, planar=planar)
    B = np.asarray(boxes, f32).reshape(-1, 6)

    # per-(tile, chunk) transmit unions in samples, t0 folded (the kernel
    # unpack adds the +-2 f32-skew margin, matching tx_bounds)
    TB = B.shape[0]
    MTc = M // MC
    tvlo = ((dvlo - t0m) * f32(fs)).reshape(TB, MTc, MC).min(2)
    tvhi = ((dvhi - t0m) * f32(fs)).reshape(TB, MTc, MC).max(2)
    rlo_i = np.floor(drlo).astype(np.int64).T     # (G, TB)
    rhi_i = np.ceil(drhi).astype(np.int64).T
    tlo_i = np.floor(tvlo).astype(np.int64).T     # (MTc, TB)
    thi_i = np.ceil(tvhi).astype(np.int64).T
    bmin = min(rlo_i.min(), tlo_i.min())
    bmax = max(rhi_i.max(), thi_i.max())
    if not (-32768 <= bmin and bmax <= 32767):
        return None, None, False, False
    rxb = _pack_bounds16(rlo_i, rhi_i)
    txb = _pack_bounds16(tlo_i, thi_i)
    # allfast proof with the packed ints (mirrors plan_allfast's window)
    lo_ext, hi_ext = _method_exts(method, pair)
    lo_t = rlo_i[:, None, :] + tlo_i[None] - 2    # (G, MTc, TB)
    hi_t = rhi_i[:, None, :] + thi_i[None] + 2
    lo_i = np.clip(lo_t - lo_ext, 0, T - 2)
    hi_i = np.clip(hi_t + 1, 0, T - 2)
    tap_hi = np.minimum(hi_i + hi_ext, T - 1)
    allfast = bool(int((tap_hi - lo_i).max()) < W - safety)
    return rxb, txb, allfast, True


def _upload_trace(xh, pair: bool):
    """Host trace array -> device, f32 wire format.

    A half-width bf16 wire format under ``bf16pair`` would be free
    accuracy-wise (the pair pack rounds to bf16 on device regardless),
    but BOTH 16-bit routes are slower than f32 on this environment's
    device tunnel and were REVERTED on measurement: ml_dtypes bf16
    (astype ~90 s host for 268M samples + transfer) and uint16 bf16-bits
    (numpy int RNE is fast but the u16 transfer crawled at ~1 MB/s —
    an unsupported-wire-dtype fallback; 393 s vs 23 s for f32). On a
    directly-attached host, re-enable by returning the u16 bits here
    (``prep_real`` already accepts uint16/bf16 inputs)."""
    if pair and isinstance(xh, np.ndarray) and xh.dtype == np.uint16:
        return jnp.asarray(xh)  # caller-prepared bf16 bits
    return jnp.asarray(xh, jnp.float32)


def _upsample2x_any(x):
    """2x band-limited trace upsample for the ``cubic2x`` sampler,
    tolerant of every trace wire format das_tiled accepts: uint16
    bf16-bits decode first; HOST complex numpy splits into two real
    upsamples recombined on host (spectral zero-padding is linear, so
    U(a + ib) == U(a) + i U(b); eager complex upload is
    boundary-restricted on some TPU backends — utils/cpx contract);
    device arrays (real or complex) upsample directly (complex INSIDE a
    jit is fine everywhere)."""
    from .interp import fft_upsample
    if getattr(x, "dtype", None) == jnp.uint16:
        x = jax.lax.bitcast_convert_type(
            jnp.asarray(x), jnp.bfloat16).astype(jnp.float32)
    host = isinstance(x, np.ndarray) or not isinstance(x, jnp.ndarray)
    if host and np.iscomplexobj(np.asarray(x)):
        xh = np.asarray(x)
        re = np.asarray(fft_upsample(
            jnp.asarray(np.ascontiguousarray(xh.real)), 2, axis=0))
        im = np.asarray(fft_upsample(
            jnp.asarray(np.ascontiguousarray(xh.imag)), 2, axis=0))
        return (re + 1j * im).astype(xh.dtype)
    return fft_upsample(jnp.asarray(x), 2, axis=0)


def _quad_mix(gi, ws):
    """Unpack an int8x4 gathered word (4 signed taps, lowest byte = tap
    t-1) and apply the 4-tap weights — the cubic-in-ONE-gather path
    (``precision='i8x4'``): arithmetic shifts isolate each byte. (A
    biased-byte exponent-bias/bitcast variant measured SLOWER: 1.043 vs
    1.014 s at the full config — the int->f32 converts schedule fine.)"""
    t0 = ((gi << 24) >> 24).astype(jnp.float32)
    t1 = ((gi << 16) >> 24).astype(jnp.float32)
    t2 = ((gi << 8) >> 24).astype(jnp.float32)
    t3 = (gi >> 24).astype(jnp.float32)
    return t0 * ws[0] + t1 * ws[1] + t2 * ws[2] + t3 * ws[3]


@jax.jit
def _pack_quads(xr, scale=None):
    """f32 ``(..., T)`` -> (int32 lanes, scale): lane ``t`` packs the
    4-tap stencil ``int8(x[t-1]), int8(x[t]), int8(x[t+1]), int8(x[t+2])``
    (edge-replicated) — cubic taps then cost ONE 32-bit gather instead
    of two packed-pair gathers (measured 0.45 s of the 1.20 s cubic
    frame; NOTES.md r5). ``scale`` may be a broadcastable array: the
    geometry path passes PER-TRANSMIT scales (folded back in-kernel via
    pv row 8), the LUT path a per-call global. int8 traces are the
    aggressive end of the reference's reduced-precision trace modes
    (``interpd.cu`` halfT / ``bf.cu:170``); opt-in via
    ``precision='i8x4'``."""
    s = jnp.maximum(jnp.max(jnp.abs(xr)), jnp.float32(1e-30)) \
        if scale is None else jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(xr * (127.0 / s)), -127, 127).astype(
        jnp.int32) & 0xFF
    qm1 = jnp.concatenate([q[..., :1], q[..., :-1]], axis=-1)
    qp1 = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
    qp2 = jnp.concatenate([q[..., 2:], q[..., -1:], q[..., -1:]], axis=-1)
    return (qm1 | (q << 8) | (qp1 << 16) | (qp2 << 24)).astype(jnp.int32), \
        s / 127.0


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
    "tx_apods", "MC", "NC", "interpret", "pair", "quad", "allfast",
    "method", "vmax", "hostwin", "acc16"))
def _das_call(boxes, gbox, pz, px, py, lat, pr, pv, xs, accs, *, fs,
              tx_model, planar, fmod, keep_rx, keep_tx=False, rx_apods,
              tx_apods, MC, NC, interpret=False, pair=False, quad=False,
              allfast=False, method="linear", vmax=0.0, hostwin=False,
              acc16=False):
    """One pallas_call covering the whole image: grid ([F,] NCc, MTc, RB,
    CB) with image tiles innermost (trace blocks stream once).

    keep_rx can ride a STREAMING grid ([F,] NCc, CB, MTc, RB) instead:
    transmit chunks sweep inside each pixel-column stripe and the kept
    (NC, 8, 128) bands accumulate in a VMEM scratch column, leaving the
    chip exactly once (on the final transmit chunk, via an out index map
    that parks earlier steps on a dummy row block). MEASURED (r4 A/B,
    full config, identical checksums): the ALIASED accumulator wins —
    0.904 s/frame vs streaming's 1.140 s — because the data-dependent
    out index map costs per-step DMA that outweighs the avoided aliased
    image sweeps. Compiled default: aliased; interpret default:
    streaming (aliases are compiled-only). QUPS_DAS_STREAMRX overrides."""
    import os as _os
    RB = pz.shape[0] // 8
    CB = pz.shape[1] // 128
    nch = len(xs)
    iq = nch == 2
    has_lat = lat is not None
    xsh = xs[0].shape  # (F, M, N, T) or (M, N, T)
    # has_f keys on operand RANK, not F > 1: a frame-sharded shard_map
    # shard sees Fsh == 1 on a 4-D array and still needs 4-D BlockSpecs
    has_f = len(xsh) == 4
    F = xsh[0] if has_f else 1
    M, N, T = xsh[-3], xsh[-2], xsh[-1]
    NCc = N // NC
    MTc = M // MC
    goff = 1 if has_f else 0

    # Streaming vs aliased kept-axis accumulation — MEASURED (r4, full
    # 1024^2 x 256x256 keep_rx+cohfac, solo, device-resident traces,
    # identical checksums): aliased 0.904 s/frame vs streaming 1.140 s
    # (1.26x) — the dummy-row-parked out index map costs more per grid
    # step than the aliased accumulator's HBM sweeps save. Default is
    # therefore ALIASED on compiled runs; interpret mode defaults to
    # streaming because input_output_aliases accumulation is
    # compiled-only (interpret does not replay aliases across steps).
    # QUPS_DAS_STREAMRX=0|1 overrides either way.
    stream_env = _os.environ.get("QUPS_DAS_STREAMRX",
                                 "1" if interpret else "0") == "1"
    stream_rx = (keep_rx and not keep_tx and stream_env
                 and nch * NC * pz.shape[0] * 128 * 4 <= 64 * 2**20)
    stream_tx = (keep_tx and not keep_rx and stream_env
                 and nch * MC * pz.shape[0] * 128 * 4 <= 64 * 2**20)
    scratch_bytes = nch * (NC if stream_rx else MC) * pz.shape[0] * 128 * 4
    # kept-axis output/accumulator dtype: bf16 halves the aliased
    # accumulator's HBM sweep bytes (QUPS_DAS_ACC16 experiment)
    kdt = jnp.bfloat16 if acc16 else jnp.float32

    kern = functools.partial(
        _kernel, N=N, T=T, W=128, fs=fs, tx_model=tx_model, planar=planar,
        iq=iq, fmod=fmod, MC=MC, NC=NC, has_f=has_f, keep_rx=keep_rx,
        keep_tx=keep_tx, rx_apods=rx_apods, tx_apods=tx_apods,
        has_lat=has_lat, pair=pair, quad=quad, allfast=allfast,
        interp_mode=interpret,
        method=method, vmax=vmax, stream_rx=stream_rx, stream_tx=stream_tx,
        hostwin=hostwin, lut_tiles=hostwin, CB=CB)

    if stream_rx or stream_tx:
        # kept-axis chunks OUTER, summed-axis chunks sweep inside each
        # pixel-column stripe (grid ([F,] kept, CB, summed, RB))
        grid = ((F,) if has_f else ()) + (
            (NCc, CB, MTc, RB) if stream_rx else (MTc, CB, NCc, RB))

        def tidx(*a):
            # (..., kept, cb, summed, rb, boxes, gbox) -> tile (rb, cb)
            return (a[goff + 3], a[goff + 1])

        tile = pl.BlockSpec((8, 128), tidx, memory_space=pltpu.VMEM)

        def xix(*a):
            # trace block (mtc, ncc): kept chunk at goff+0, summed at
            # goff+2 — rx-kept means the summed axis is tx and vice versa
            kc, sc = a[goff + 0], a[goff + 2]
            mn = (sc, kc) if stream_rx else (kc, sc)
            return (a[:goff] + mn + (0,))

        trace = pl.BlockSpec(((1,) if has_f else ()) + (MC, NC, T), xix,
                             memory_space=pltpu.VMEM)
    else:
        grid = ((F,) if has_f else ()) + (NCc, MTc, RB, CB)

        def tidx(*a):
            # (..., ncc, mtc, rb, cb, boxes, gbox) -> tile block (rb, cb)
            return (a[goff + 2], a[goff + 3])

        tile = pl.BlockSpec((8, 128), tidx, memory_space=pltpu.VMEM)
        if has_f:
            trace = pl.BlockSpec(
                (1, MC, NC, T),
                lambda f, ncc, mtc, rb, cb, *_: (f, mtc, ncc, 0),
                memory_space=pltpu.VMEM)
        else:
            trace = pl.BlockSpec(
                (MC, NC, T),
                lambda ncc, mtc, rb, cb, *_: (mtc, ncc, 0),
                memory_space=pltpu.VMEM)

    if keep_rx and keep_tx:
        if has_f:
            ospec = pl.BlockSpec(
                (1, MC, NC, 8, 128),
                lambda f, ncc, mtc, rb, cb, *_: (f, mtc, ncc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct(
                (F, M, N, pz.shape[0], pz.shape[1]), kdt)
        else:
            ospec = pl.BlockSpec(
                (MC, NC, 8, 128),
                lambda ncc, mtc, rb, cb, *_: (mtc, ncc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct(
                (M, N, pz.shape[0], pz.shape[1]), kdt)
    elif keep_rx and stream_rx:
        # out rows gain one dummy 8-row block (index RB): non-final
        # transmit-chunk steps park there so the real rows are written
        # exactly once (cropped before returning)
        if has_f:
            ospec = pl.BlockSpec(
                (1, NC, 8, 128),
                lambda f, ncc, cb, mtc, rb, *_: (
                    f, ncc, jnp.where(mtc == MTc - 1, rb, RB), cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct(
                (F, N, pz.shape[0] + 8, pz.shape[1]), kdt)
        else:
            ospec = pl.BlockSpec(
                (NC, 8, 128),
                lambda ncc, cb, mtc, rb, *_: (
                    ncc, jnp.where(mtc == MTc - 1, rb, RB), cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct(
                (N, pz.shape[0] + 8, pz.shape[1]), kdt)
    elif keep_rx:
        if has_f:
            ospec = pl.BlockSpec(
                (1, NC, 8, 128),
                lambda f, ncc, mtc, rb, cb, *_: (f, ncc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((F, N, pz.shape[0], pz.shape[1]),
                                          kdt)
        else:
            ospec = pl.BlockSpec(
                (NC, 8, 128),
                lambda ncc, mtc, rb, cb, *_: (ncc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((N, pz.shape[0], pz.shape[1]),
                                          kdt)
    elif keep_tx and stream_tx:
        # dummy row block (index RB) parks non-final rx-chunk steps
        if has_f:
            ospec = pl.BlockSpec(
                (1, MC, 8, 128),
                lambda f, mtc, cb, ncc, rb, *_: (
                    f, mtc, jnp.where(ncc == NCc - 1, rb, RB), cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct(
                (F, M, pz.shape[0] + 8, pz.shape[1]), kdt)
        else:
            ospec = pl.BlockSpec(
                (MC, 8, 128),
                lambda mtc, cb, ncc, rb, *_: (
                    mtc, jnp.where(ncc == NCc - 1, rb, RB), cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct(
                (M, pz.shape[0] + 8, pz.shape[1]), kdt)
    elif keep_tx:
        if has_f:
            ospec = pl.BlockSpec(
                (1, MC, 8, 128),
                lambda f, ncc, mtc, rb, cb, *_: (f, mtc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((F, M, pz.shape[0], pz.shape[1]),
                                          kdt)
        else:
            ospec = pl.BlockSpec(
                (MC, 8, 128),
                lambda ncc, mtc, rb, cb, *_: (mtc, rb, cb),
                memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((M, pz.shape[0], pz.shape[1]),
                                          kdt)
    else:
        if has_f:
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
    if stream_rx or stream_tx:
        # no aliased accumulator inputs: bands accumulate in VMEM scratch
        aliases = {}
        scratch = [pltpu.VMEM((NC if stream_rx else MC, pz.shape[0], 128),
                              jnp.float32)] * nch
        acc_args = ()
        params = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(scratch_bytes * 1.5) + 32 * 2**20,
                                 100 * 2**20)))
    else:
        in_specs += [ospec] * nch  # aliased accumulator inputs
        # input_output_aliases: indices count ALL operands incl.
        # scalar-prefetch
        n_lead = 2 + len(in_specs) - nch
        aliases = {n_lead + ch: ch for ch in range(nch)}
        scratch = []
        acc_args = tuple(accs)
        params = {}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([ospec] * nch) if nch > 1 else ospec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple([oshape] * nch) if nch > 1 else oshape,
        input_output_aliases=aliases,
        interpret=interpret,
        **params,
    )(boxes, gbox, pz, px, py, *((lat,) if has_lat else ()), pr, pv,
      *xs, *acc_args)
    outs = out if nch > 1 else (out,)
    if stream_rx or stream_tx:  # crop the dummy row block
        outs = tuple(o[..., :pz.shape[0], :] for o in outs)
    return outs


@functools.partial(jax.jit, static_argnames=(
    "fs", "fmod", "keep_rx", "keep_tx", "MC", "NC", "interpret", "pair",
    "quad", "allfast", "method", "vmax", "lut_tiles"))
def _das_lut_call(rxb, txb, taur, taut, tv, xs, accs, *, fs, fmod=0.0,
                  keep_rx=False, keep_tx=False, MC, NC, interpret=False,
                  pair=False, quad=False, allfast=False, method="linear",
                  vmax=0.0, lut_tiles=False):
    """LUT-mode pallas_call: delay tables streamed as per-tile blocks.

    rxb (RB, G, 2) / txb (RB, MTc, 2): per-row-stripe LUT bounds (scalar
    prefetch); taur (N, I1p, I2p) / taut (M, I1p, I2p): per-pixel delay
    tables [s]; tv (1, Mpad): per-transmit t0 [s] (SMEM).

    keep_rx rides the STREAMING grid like :func:`_das_call` (transmit
    chunks inside each column stripe; kept bands accumulate in VMEM
    scratch; out written once through a dummy-row-parked index map) —
    table/trace re-stream costs are unchanged/CB-fold small next to the
    aliased accumulator's MTc image sweeps."""
    import os as _os
    RB = taur.shape[1] // 8
    CB = taur.shape[2] // 128
    nch = len(xs)
    iq = nch == 2
    xsh = xs[0].shape  # (F, M, N, T) or (M, N, T)
    # rank-keyed, not F > 1 — see _das_call (frame-sharded Fsh == 1)
    has_f = len(xsh) == 4
    F = xsh[0] if has_f else 1
    M, N, T = xsh[-3], xsh[-2], xsh[-1]
    NCc = N // NC
    MTc = M // MC
    goff = 1 if has_f else 0

    # aliased by default on compiled runs, streaming under interpret —
    # measured decision, see _das_call
    stream_env = _os.environ.get("QUPS_DAS_STREAMRX",
                                 "1" if interpret else "0") == "1"
    stream_rx = (keep_rx and not keep_tx and stream_env
                 and nch * NC * taur.shape[1] * 128 * 4 <= 64 * 2**20)
    stream_tx = (keep_tx and not keep_rx and stream_env
                 and nch * MC * taur.shape[1] * 128 * 4 <= 64 * 2**20)
    scratch_bytes = nch * (NC if stream_rx else MC) * taur.shape[1] * 128 * 4

    kern = functools.partial(
        _kernel, N=N, T=T, W=128, fs=fs, tx_model="lut", planar=True,
        iq=iq, fmod=fmod, MC=MC, NC=NC, has_f=has_f, keep_rx=keep_rx,
        keep_tx=keep_tx, rx_apods=(), tx_apods=(), has_lat=False,
        pair=pair, quad=quad, allfast=allfast, interp_mode=interpret,
        lut=True,
        method=method, vmax=vmax, lut_tiles=lut_tiles, CB=CB,
        stream_rx=stream_rx, stream_tx=stream_tx)

    if stream_rx:
        grid = ((F,) if has_f else ()) + (NCc, CB, MTc, RB)

        def gix(*a):
            """Grid indices in semantic (ncc, mtc, rb, cb) order."""
            return (a[goff + 0], a[goff + 2], a[goff + 3], a[goff + 1])
    elif stream_tx:
        grid = ((F,) if has_f else ()) + (MTc, CB, NCc, RB)

        def gix(*a):
            """Grid indices in semantic (ncc, mtc, rb, cb) order."""
            return (a[goff + 2], a[goff + 0], a[goff + 3], a[goff + 1])
    else:
        grid = ((F,) if has_f else ()) + (NCc, MTc, RB, CB)

        def gix(*a):
            """Strip the optional leading frame index."""
            return a[goff:goff + 4]

    tile = pl.BlockSpec((8, 128), lambda *a: gix(*a)[2:4],
                        memory_space=pltpu.VMEM)
    taur_spec = pl.BlockSpec(
        (NC, 8, 128),
        lambda *a: (gix(*a)[0], gix(*a)[2], gix(*a)[3]),
        memory_space=pltpu.VMEM)
    taut_spec = pl.BlockSpec(
        (MC, 8, 128),
        lambda *a: (gix(*a)[1], gix(*a)[2], gix(*a)[3]),
        memory_space=pltpu.VMEM)
    trace = pl.BlockSpec(
        ((1,) if has_f else ()) + (MC, NC, T),
        lambda *a: (a[:goff] + (gix(*a)[1], gix(*a)[0], 0)),
        memory_space=pltpu.VMEM)
    I1p, I2p = taur.shape[1], taur.shape[2]
    fdim = (1,) if has_f else ()
    fshape = (F,) if has_f else ()
    if keep_rx and keep_tx:
        # BF mode (bf.cu flag bits 3+4 together) on the LUT path: one
        # (8, 8, 128) band per (transmit, rx-group); block (MC, NC, 8, 128)
        ospec = pl.BlockSpec(
            fdim + (MC, NC, 8, 128),
            lambda *a: (a[:goff] + (gix(*a)[1], gix(*a)[0],
                                    gix(*a)[2], gix(*a)[3])),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(fshape + (M, N, I1p, I2p),
                                      jnp.float32)
    elif keep_rx and stream_rx:
        # dummy row block RB parks non-final transmit-chunk steps (see
        # _das_call); cropped before returning
        ospec = pl.BlockSpec(
            fdim + (NC, 8, 128),
            lambda *a: (a[:goff] + (
                gix(*a)[0],
                jnp.where(gix(*a)[1] == MTc - 1, gix(*a)[2], RB),
                gix(*a)[3])),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(fshape + (N, I1p + 8, I2p),
                                      jnp.float32)
    elif keep_rx:
        ospec = pl.BlockSpec(
            fdim + (NC, 8, 128),
            lambda *a: (a[:goff] + (gix(*a)[0], gix(*a)[2], gix(*a)[3])),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(fshape + (N, I1p, I2p), jnp.float32)
    elif keep_tx and stream_tx:
        ospec = pl.BlockSpec(
            fdim + (MC, 8, 128),
            lambda *a: (a[:goff] + (
                gix(*a)[1],
                jnp.where(gix(*a)[0] == NCc - 1, gix(*a)[2], RB),
                gix(*a)[3])),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(fshape + (M, I1p + 8, I2p),
                                      jnp.float32)
    elif keep_tx:
        ospec = pl.BlockSpec(
            fdim + (MC, 8, 128),
            lambda *a: (a[:goff] + (gix(*a)[1], gix(*a)[2], gix(*a)[3])),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(fshape + (M, I1p, I2p), jnp.float32)
    else:
        ospec = pl.BlockSpec(
            fdim + (8, 128),
            lambda *a: (a[:goff] + gix(*a)[2:4]),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(fshape + (I1p, I2p), jnp.float32)

    in_specs = [taur_spec, taut_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM)]  # tv (1, Mpad)
    in_specs += [trace] * nch
    if stream_rx or stream_tx:
        aliases = {}
        scratch = [pltpu.VMEM((NC if stream_rx else MC, I1p, 128),
                              jnp.float32)] * nch
        acc_args = ()
        params = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(scratch_bytes * 1.5) + 32 * 2**20,
                                 100 * 2**20)))
    else:
        in_specs += [ospec] * nch  # aliased accumulator inputs
        n_lead = 2 + len(in_specs) - nch
        aliases = {n_lead + ch: ch for ch in range(nch)}
        scratch = []
        acc_args = tuple(accs)
        params = {}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([ospec] * nch) if nch > 1 else ospec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple([oshape] * nch) if nch > 1 else oshape,
        input_output_aliases=aliases,
        interpret=interpret,
        **params,
    )(rxb, txb, taur, taut, tv, *xs, *acc_args)
    outs = out if nch > 1 else (out,)
    if stream_rx or stream_tx:  # crop the dummy row block
        outs = tuple(o[..., :I1p, :] for o in outs)
    return outs


def _pack_bounds16(lo, hi):
    """Pack per-tile (K, RB, CB) int sample bounds as int16 pairs
    (lo | hi << 16) with tiles on the LAST axis, padded to a lane
    multiple: returns (K, ceil(RB*CB/128)*128) int32."""
    K = lo.shape[0]
    v = (lo.astype(np.int32) & 0xFFFF) | (hi.astype(np.int32) << 16)
    v = v.reshape(K, -1)
    n = v.shape[1]
    npad = -(-n // 128) * 128
    if npad != n:
        v = np.pad(v, ((0, 0), (0, npad - n)))
    return np.ascontiguousarray(v)


def prep_lut_sharded(tau_rx, tau_tx, t0, *, fs: float, T: int,
                     im_shape: Tuple[int, int, int], nrx: int = 1,
                     ntx: int = 1, method: str = "linear",
                     pair: bool = False, nch: int = 1):
    """Host-side prep for the shard_map-composed LUT kernel: per-shard
    delay-table tiles + window bounds, stacked along leading mesh axes
    (rx tables -> 'rx', tx tables -> 'tx'). The trace tensor must be
    padded to (Tp', Nsh*nrx, Msh*ntx) by the caller (4-tap methods expect
    one edge-replicated sample at each end of the time axis first)."""
    four = method in ("cubic", "lanczos3")
    tau_rx = np.asarray(tau_rx, np.float32)
    tau_tx = np.asarray(tau_tx, np.float32)
    N, M = tau_rx.shape[1], tau_tx.shape[1]
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    if four:
        t0 = t0 - np.float32(1.0) / np.float32(fs)
    I1, I2, I3 = im_shape
    if I3 != 1:
        I2, I3 = I2 * I3, 1
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    Nsh = -(-N // (nrx * 8)) * 8
    Msh = -(-M // ntx)
    Tp = -(-(T + (2 if four else 0)) // 128) * 128

    def table(tab, E):  # (I, e) -> (E, I1p, I2p) edge-padded
        th = tab.T.reshape(tab.shape[1], I1, I2)
        th = np.pad(th, ((0, 0), (0, I1p - I1), (0, I2p - I2)), mode="edge")
        if E > tab.shape[1]:
            th = np.concatenate(
                [th, np.repeat(th[-1:], E - tab.shape[1], 0)], 0)
        return np.ascontiguousarray(th, np.float32)

    taur = table(tau_rx, Nsh * nrx).reshape(nrx, Nsh, I1p, I2p)
    taut = table(tau_tx, Msh * ntx).reshape(ntx, Msh, I1p, I2p)
    t0_pad = np.concatenate([t0, np.repeat(t0[-1:], Msh * ntx - M)])

    MC, NC = _choose_chunks(Msh, Nsh, Tp, nch)
    if MC > 8:
        MC = 8  # lut mode unrolls the transmit chunk (static indexing)
    MTc = Msh // MC
    RB = I1p // 8
    CBn = I2p // 128
    G = Nsh // 8
    Mpad = -(-Msh // 128) * 128
    tv = np.zeros((ntx, 1, Mpad), np.float32)
    for j in range(ntx):
        tv[j, 0, :Msh] = t0_pad[j * Msh:(j + 1) * Msh]

    lo_ext, hi_ext = _method_exts(method, pair)
    tapext = 4 + 2 + lo_ext + hi_ext

    # per-TILE packed int16 bounds per shard (lut_tiles mode; see
    # das_lut_plan) — falls back to per-stripe f32 bounds out of range
    f64 = np.float64
    r7 = taur.reshape(nrx, G, 8, RB, 8, CBn, 128).astype(f64)
    rlo_t = np.floor(r7.min(axis=(2, 4, 6)) * fs).astype(np.int64)
    rhi_t = np.ceil(r7.max(axis=(2, 4, 6)) * fs).astype(np.int64)
    t0sh = t0_pad.reshape(ntx, Msh)
    t7 = (taut.astype(f64) - t0sh[:, :, None, None]).reshape(
        ntx, MTc, MC, RB, 8, CBn, 128)
    tlo_t = np.floor(t7.min(axis=(2, 4, 6)) * fs).astype(np.int64)
    thi_t = np.ceil(t7.max(axis=(2, 4, 6)) * fs).astype(np.int64)
    bmin = min(rlo_t.min(), tlo_t.min())
    bmax = max(rhi_t.max(), thi_t.max())
    lut_tiles = bool(-32768 <= bmin and bmax <= 32767)
    if lut_tiles:
        rxb = np.stack([_pack_bounds16(rlo_t[i], rhi_t[i])
                        for i in range(nrx)])   # (nrx, G, pad(RB*CB))
        txb = np.stack([_pack_bounds16(tlo_t[j], thi_t[j])
                        for j in range(ntx)])   # (ntx, MTc, pad(RB*CB))
        rspan = (rhi_t - rlo_t).max(axis=(0, 1))  # (RB, CB)
        tspan = (thi_t - tlo_t).max(axis=(0, 1))
        allfast = bool((rspan + tspan).max() + tapext < 128 - 2)
    else:
        r5 = taur.reshape(nrx, G, 8, RB, 8, I2p)
        rlo = np.moveaxis(r5.min(axis=(2, 4, 5)), 1, 2)  # (nrx, RB, G)
        rhi = np.moveaxis(r5.max(axis=(2, 4, 5)), 1, 2)
        rxb = np.stack([rlo, rhi], axis=-1).reshape(
            nrx, RB, 2 * G).astype(np.float32)
        t5 = taut.reshape(ntx, MTc, MC, RB, 8, I2p)
        tlo = np.moveaxis(t5.min(axis=(2, 4, 5)), 1, 2)  # (ntx, RB, MTc)
        thi = np.moveaxis(t5.max(axis=(2, 4, 5)), 1, 2)
        txb = np.stack([tlo, thi], axis=-1).reshape(
            ntx, RB, 2 * MTc).astype(np.float32)
        span = ((rhi - rlo).max() + (thi - tlo).max()) * np.float32(fs)
        allfast = bool(span + tapext < 128 - 2)
    arrays = dict(taur=taur, taut=taut, rxb=rxb, txb=txb, tv=tv)
    statics = dict(MC=MC, NC=NC, Tp=Tp, Nsh=Nsh, Msh=Msh, I1p=I1p,
                   I2p=I2p, allfast=allfast, vmax=float(T), method=method,
                   lut_tiles=lut_tiles)
    return arrays, statics


def das_lut_plan(tau_rx, tau_tx, t0, *, fs: float, T: int, N: int, M: int,
                 Fn: Optional[int] = None, cplx: bool = False,
                 im_shape: Optional[Tuple[int, ...]] = None,
                 out: str = "complex", keep_rx: bool = False,
                 keep_tx: bool = False, fmod: float = 0.0,
                 method: str = "linear", interpret: bool = False,
                 precision: str = "f32"):
    """Prepare a REUSABLE LUT delay-and-sum handle: all host planning and
    the (possibly multi-GB) delay-table uploads happen ONCE; the returned
    ``apply(x)`` beamforms any (T, N, M) trace set against the resident
    tables — the analog of the reference's reusable CUDAKernel handle
    (``kern/das_spec.m:72-86``, ``kern/wsinterpd2.m:99``). Use this for
    repeated frames; :func:`das_lut_tiled` is the one-shot wrapper.
    ``keep_rx & keep_tx`` together (BF mode, ``bf.cu:129-140`` bits 3+4)
    keeps the full (I, N, M) volume — small configs only (output traffic
    is I*N*M floats)."""
    if precision not in ("f32", "bf16pair", "i8x4"):
        raise ValueError(f"unknown precision {precision!r}")
    if precision == "i8x4" and method not in ("cubic", "lanczos3"):
        raise ValueError("precision='i8x4' packs the 4-tap stencil — use "
                         "method='cubic'/'lanczos3'")
    if method not in ("nearest", "linear", "cubic", "lanczos3"):
        raise ValueError(f"unknown method {method!r}")
    four = method in ("cubic", "lanczos3")
    tau_rx = np.asarray(tau_rx, np.float32)
    tau_tx = np.asarray(tau_tx, np.float32)
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    I = tau_rx.shape[0]
    if im_shape is None:
        im_shape = (I, 1, 1)
    I1, I2, I3 = im_shape
    if I3 != 1:  # volumetric: iso-depth-major C-order flatten
        I2, I3 = I2 * I3, 1
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    Np8 = -(-N // 8) * 8
    Tp = -(-(T + (2 if four else 0)) // 128) * 128
    if four:
        # +1-shifted index over an edge-replicated trace (see das_tiled)
        t0 = t0 - np.float32(1.0) / np.float32(fs)

    def table(tab, E):  # (I, E) -> (E, I1p, I2p) edge-padded
        th = tab.T.reshape(tab.shape[1], I1, I2)
        th = np.pad(th, ((0, 0), (0, I1p - I1), (0, I2p - I2)), mode="edge")
        if E > tab.shape[1]:  # padded channels: edge values (traces are 0)
            th = np.concatenate(
                [th, np.repeat(th[-1:], E - tab.shape[1], 0)], 0)
        return np.ascontiguousarray(th, np.float32)

    taur = table(tau_rx, Np8)
    taut = table(tau_tx, M)
    RB = I1p // 8
    G = Np8 // 8
    # per-row-stripe LUT bounds (host): rx per 8-group, tx per chunk union
    MC, NC = _choose_chunks(M, Np8, Tp, 2 if (cplx or fmod != 0.0) else 1)
    if MC > 8:
        MC = 8  # lut mode unrolls the transmit chunk (static indexing)
    MTc = M // MC
    # lo/hi INTERLEAVED on the 2nd axis — (RB, 2*G); a trailing size-2
    # axis would be lane-padded to 128 in SMEM (512 KB per prefetch array
    # -> smem OOM at medium size)
    r4 = taur.reshape(G, 8, RB, 8, I2p)
    rlo, rhi = r4.min(axis=(1, 3, 4)).T, r4.max(axis=(1, 3, 4)).T  # (RB, G)
    rxb = np.stack([rlo, rhi], axis=-1).reshape(RB, 2 * G).astype(np.float32)
    t4 = taut.reshape(MTc, MC, RB, 8, I2p)
    tlo, thi = t4.min(axis=(1, 3, 4)).T, t4.max(axis=(1, 3, 4)).T  # (RB, MTc)
    txb = np.stack([tlo, thi], axis=-1).reshape(RB, 2 * MTc).astype(np.float32)
    Mpad = -(-M // 128) * 128
    tv = np.zeros((1, Mpad), np.float32)
    tv[0, :M] = t0

    pair = precision == "bf16pair"
    quad = precision == "i8x4"
    # PER-CALL shared quantization scale (quad): the reusable handle
    # beamforms many frame sets — each apply() re-derives its own scale
    # (a plan-level list would descale every frame with the FIRST
    # frame's scale); one scale covers both IQ channels because the
    # fmod rotation mixes them in-kernel
    qcell = {"s": None}
    lo_ext, hi_ext = _method_exts(method, pair, quad)
    tapext = 4 + 2 + lo_ext + hi_ext

    # per-TILE packed int16 bounds (lut_tiles mode): per-stripe bounds
    # span the full image row and force the multi-window arm at imaging
    # sizes (measured 4x slower than the geometry kernel at the full
    # config); per-(8 x 128)-tile bounds restore the single-window fast
    # arm. Packed (lo | hi << 16) in samples; needs T < 32767.
    CBn = I2p // 128
    f64 = np.float64
    r6 = taur.reshape(G, 8, RB, 8, CBn, 128).astype(f64)
    rlo_t = np.floor(r6.min(axis=(1, 3, 5)) * fs).astype(np.int64)  # (G,RB,CB)
    rhi_t = np.ceil(r6.max(axis=(1, 3, 5)) * fs).astype(np.int64)
    t0m = np.concatenate([t0, np.repeat(t0[-1:], taut.shape[0] - M)])
    t6 = (taut.astype(f64) - t0m[:, None, None]).reshape(
        MTc, MC, RB, 8, CBn, 128)
    tlo_t = np.floor(t6.min(axis=(1, 3, 5)) * fs).astype(np.int64)  # (MTc,..)
    thi_t = np.ceil(t6.max(axis=(1, 3, 5)) * fs).astype(np.int64)
    bmin = min(rlo_t.min(), tlo_t.min())
    bmax = max(rhi_t.max(), thi_t.max())
    lut_tiles = bool(-32768 <= bmin and bmax <= 32767)
    if lut_tiles:
        rxb_k = _pack_bounds16(rlo_t, rhi_t)   # (G, pad(RB*CB)) int32
        txb_k = _pack_bounds16(tlo_t, thi_t)   # (MTc, pad(RB*CB))
        rspan = (rhi_t - rlo_t).max(axis=0)  # (RB, CB)
        tspan = (thi_t - tlo_t).max(axis=0)
        allfast = bool((rspan + tspan).max() + tapext < 128 - 2)
    else:
        rxb_k, txb_k = rxb, txb
        # stripe-mode allfast: t0 cancels between lo and hi, so the span
        # is (rx span + tx-chunk span) * fs + margins + tap extents
        span = ((rhi - rlo)[:, :, None]
                + (thi - tlo)[:, None, :]) * np.float32(fs)
        allfast = bool(span.max() + tapext < 128 - 2)

    def prep_real(xr):
        if xr.dtype == jnp.uint16:  # bf16-bits wire format (_upload_trace)
            xr = jax.lax.bitcast_convert_type(
                xr, jnp.bfloat16).astype(jnp.float32)
        elif xr.dtype == jnp.bfloat16:
            xr = xr.astype(jnp.float32)
        if four:  # edge-replicate one sample each end
            xr = jnp.concatenate([xr[:1], xr, xr[-1:]], axis=0)
        Te = xr.shape[0]
        if Tp != Te or Np8 != N:
            padc = [(0, Tp - Te), (0, Np8 - N)] + [(0, 0)] * (xr.ndim - 2)
            xr = jnp.pad(xr, padc)
        if Fn is not None:
            xr = jnp.transpose(xr, (3, 2, 1, 0))  # (F, M, N, T)
        else:
            xr = jnp.transpose(xr, (2, 1, 0))  # (M, N, T)
        if pair:
            xr = _pack_pairs(xr)
        elif quad:
            xr, _ = _pack_quads(xr, scale=qcell["s"])
        return xr

    # device-resident planning arrays: uploaded ONCE per plan (the tables
    # are O(I*(N+M)) — gigabytes at the full config; per-call re-upload on
    # the tunnel costs more than the beamforming itself)
    rxb_j, txb_j = jnp.asarray(rxb_k), jnp.asarray(txb_k)
    taur_j, taut_j = jnp.asarray(taur), jnp.asarray(taut)
    tv_j = jnp.asarray(tv)

    def run(xr, xi=None):
        xs = (xr,) if xi is None else (xr, xi)
        keep_n = ((M, Np8) if (keep_rx and keep_tx) else
                  ((Np8,) if keep_rx else ((M,) if keep_tx else ())))
        oshape = ((Fn,) if Fn else ()) + keep_n + (I1p, I2p)
        accs = tuple(jnp.zeros(oshape, jnp.float32) for _ in xs)
        outs = _das_lut_call(
            rxb_j, txb_j, taur_j, taut_j, tv_j, xs, accs, fs=float(fs),
            fmod=float(fmod), keep_rx=keep_rx, keep_tx=keep_tx, MC=MC,
            NC=NC, interpret=interpret, pair=pair, quad=quad,
            allfast=allfast,
            method=method, vmax=float(T), lut_tiles=lut_tiles)
        if quad:  # undo this call's shared int8 quantization scale
            outs = tuple(o * (qcell["s"] / 127.0) for o in outs)
        res = []
        for o in outs:
            if Fn:
                o = jnp.moveaxis(o, 0, -1)  # (..., F)
            if keep_rx and keep_tx:
                # (M, N, I1p, I2p[, F]) -> (I, N, M[, F])
                o = jnp.moveaxis(o[:M, :N, :I1, :I2], (0, 1), (3, 2))
                o = o.reshape((I, N, M) + o.shape[4:])
            elif keep_rx:
                o = jnp.moveaxis(o[:N, :I1, :I2], 0, 2)
                o = o.reshape((I, N, 1) + o.shape[3:])
            elif keep_tx:
                o = jnp.moveaxis(o[:M, :I1, :I2], 0, 2)
                o = o.reshape((I, 1, M) + o.shape[3:])
            else:
                o = o[:I1, :I2].reshape((I, 1, 1) + o.shape[2:])
            res.append(o)
        return res

    def pack_out(res):
        if len(res) == 2:
            if out == "ri":
                return jnp.stack(res, axis=-1)
            return (res[0] + 1j * res[1]).astype(jnp.complex64)
        if out == "ri":
            return jnp.stack([res[0], jnp.zeros_like(res[0])], axis=-1)
        return res[0]

    def apply(x_in):
        if quad:
            if isinstance(x_in, np.ndarray) \
                    or not isinstance(x_in, jnp.ndarray):
                qcell["s"] = jnp.float32(
                    max(float(np.max(np.abs(np.asarray(x_in)))), 1e-30))
            else:
                qcell["s"] = jax.jit(lambda v: jnp.maximum(
                    jnp.max(jnp.abs(v)), 1e-30).astype(jnp.float32))(x_in)
        if cplx:
            if isinstance(x_in, np.ndarray) \
                    or not isinstance(x_in, jnp.ndarray):
                xh = np.asarray(x_in)
                return pack_out(run(
                    prep_real(_upload_trace(
                        np.ascontiguousarray(xh.real), pair)),
                    prep_real(_upload_trace(
                        np.ascontiguousarray(xh.imag), pair))))
            xre, xim = jax.jit(
                lambda v: (jnp.real(v).astype(jnp.float32),
                           jnp.imag(v).astype(jnp.float32)))(x_in)
            return pack_out(run(prep_real(xre), prep_real(xim)))
        xr = prep_real(_upload_trace(x_in, pair)
                       if isinstance(x_in, np.ndarray)
                       else (x_in
                             if getattr(x_in, "dtype", None) == jnp.uint16
                             else jnp.asarray(x_in, jnp.float32)))
        if fmod != 0.0:
            return pack_out(run(xr, jnp.zeros_like(xr)))
        return pack_out(run(xr))

    return apply


def das_lut_tiled(x, tau_rx, tau_tx, t0, *, fs: float,
                  im_shape: Optional[Tuple[int, ...]] = None,
                  out: str = "complex", keep_rx: bool = False,
                  keep_tx: bool = False, fmod: float = 0.0,
                  method: str = "linear", interpret: bool = False,
                  precision: str = "f32"):
    """Fast Pallas LUT delay-and-sum — bring-your-own-delays
    (``bfDASLUT`` / ``bfDAS`` / ``bfEikonal``: ``kern/das_spec.m`` with
    explicit tables; same contract as :func:`qups_tpu.ops.das.das_lut`
    for the no-apod path; all four samplers in-kernel).

    ``x (T, N, M)`` real or complex; ``tau_rx (I, N)`` / ``tau_tx (I, M)``
    delay tables [s]; ``t0`` scalar or (M,) per-transmit start times. The
    trace windows are planned from host-reduced per-row-stripe bounds of
    the actual tables, so arbitrary (e.g. eikonal, heterogeneous-medium)
    delays work — wide per-stripe delay spreads fall back to the
    multi-window loop arm automatically. For repeated frames against fixed
    tables use :func:`das_lut_plan` (one table upload, reusable handle).

    Arbitrary trailing frame dims ``(T, N, M, F1, F2, ...)`` fold into one
    frame axis for the kernel and unfold on return (the reference threads
    ``F x ...`` through every kernel, ``kern/das_spec.m:180-181``).
    """
    if method == "cubic2x":  # see das_tiled: 2x upsample + linear taps
        x = _upsample2x_any(x)
        fs = float(fs) * 2.0
        method = "linear"
    x, fdims = _fold_frames(x)
    T, N, M = x.shape[:3]
    Fn = x.shape[3] if np.ndim(x) >= 4 else None
    cplx = bool(np.iscomplexobj(np.empty(0, dtype=getattr(x, "dtype",
                                                          np.float32))))
    plan = das_lut_plan(tau_rx, tau_tx, t0, fs=fs, T=T, N=N, M=M, Fn=Fn,
                        cplx=cplx, im_shape=im_shape, out=out,
                        keep_rx=keep_rx, keep_tx=keep_tx, fmod=fmod,
                        method=method, interpret=interpret,
                        precision=precision)
    return _unfold_frames(plan(x), fdims)


def _fold_frames(x):
    """Fold arbitrary trailing frame dims (T, N, M, F1, F2, ...) into ONE
    frame axis (T, N, M, F) for the Pallas kernels; returns (x, fdims)
    where ``fdims`` is () for plain (T, N, M[, F]) inputs (no unfold
    needed). The reference threads arbitrary ``F x ...`` dims through
    every kernel (``kern/das_spec.m:180-181``)."""
    if np.ndim(x) <= 4:
        return x, ()
    fdims = tuple(x.shape[3:])
    return x.reshape(x.shape[:3] + (int(np.prod(fdims)),)), fdims


def _unfold_frames(img, fdims):
    """Unfold the frame axis of a kernel result (I, n, m, F[, 2]) back to
    the caller's trailing dims (I, n, m, F1, F2, ...[, 2])."""
    if not fdims:
        return img
    return img.reshape(img.shape[:3] + fdims + img.shape[4:])


def _split_fused(apod, cinv, lat_spatial: bool):
    """Split :class:`Fused` apodization descriptors into the kernel's
    static (rx_apods, tx_apods) tuples + the per-transmit lateral array.
    Scale-dependent params (Dmax, parallelogram bounds) are folded into the
    cinv-scaled geometry space. Returns
    ``(rx_apods, tx_apods, lat_tx, lat_needed)``."""
    rx_apods = []
    tx_apods = []
    lat_tx = None
    lat_needed = False
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
    return tuple(rx_apods), tuple(tx_apods), lat_tx, lat_needed


def _choose_chunks(M, N, T, nch, vmem_budget=8 * 2**20, itemsize=4):
    """Pick (MC, NC) trace-chunk sizes within the VMEM budget
    (double-buffered). The full-size sweep under the single-window fast
    arm measured (4, 16) fastest — 102.7 Gsums/s vs 98.2 for (8, 8), 84.8
    for (4, 32), 74.3 for the old (8, 32) default: a chunk product of ~64
    rows keeps the working set small enough to overlap DMA with the sweep.
    MC must divide M (the transmit chunk is fully unrolled; MC > 8 falls
    back to a fori loop and regresses), NC is a multiple of 8 dividing
    Npad. Env override ``QUPS_DAS_CHUNKS=MC,NC`` for perf sweeps."""
    import os
    ov = os.environ.get("QUPS_DAS_CHUNKS")
    if ov:
        mc, nc = (int(v) for v in ov.split(","))
        return mc, nc
    per_t = T * itemsize * 2 * nch  # bytes/(tx,rx) trace row w/ 2 buffers
    cap = max(1, vmem_budget // per_t)  # max MC*NC
    mc = max(1, min(4, M, cap))
    while M % mc:
        mc -= 1
    nc = min(N, 16, max(8, (cap // mc) // 8 * 8))
    while nc > 8 and N % nc:
        nc -= 8
    return mc, max(8, nc)


def prep_sharded(pi, pr, pv, nv, t0, cinv, *, fs: float, T: int,
                 tx_model: str, im_shape: Tuple[int, int, int],
                 nrx: int = 1, ntx: int = 1, method: str = "linear",
                 pair: bool = False, apod=(), orientations=None,
                 lat=None, nch: int = 1):
    """Host-side prep for the shard_map-composed kernel: per-(rx-shard,
    tx-shard) packed geometry + per-stripe window counts, stacked along
    leading mesh axes so they shard with ``P('rx', ...)`` / ``P('tx', ...)``.

    Returns ``(arrays, statics)`` where arrays = dict(pz, px, py, [lat],
    prs (nrx, 8, 128k), pvs (ntx, 8, 128k), boxes (RB, CB, 6), gboxes
    (nrx, G, 6)) and statics = dict(planar, MC, NC, Tp, Nsh, Msh,
    rx_apods, tx_apods, ...). The trace tensor must be padded to
    (Tp', Nsh*nrx, Msh*ntx) by the caller (zero rows are inert;
    Tp' = Tp, with 4-tap methods expecting one edge-replicated sample at
    each end of the time axis before the zero padding — see das_tiled).
    """
    pi = np.asarray(pi, np.float32)
    pr_np = np.asarray(pr, np.float32)
    pv_np = np.asarray(pv, np.float32)
    nv_np = np.asarray(nv, np.float32)
    N = pr_np.shape[0]
    M = pv_np.shape[0]
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    four = method in ("cubic", "lanczos3")
    if four:  # +1-shifted index over the edge-replicated trace
        t0 = t0 - np.float32(1.0) / np.float32(fs)
    cinv = float(np.asarray(cinv).reshape(()))
    I1, I2, I3 = im_shape
    if I3 != 1:  # volumetric: iso-depth-major C-order flatten (das_tiled)
        I2, I3 = I2 * I3, 1
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    grid2 = pi.reshape(I1, I2, 3)
    gpad = np.pad(grid2, ((0, I1p - I1), (0, I2p - I2), (0, 0)), mode="edge")
    sc = cinv
    pz = np.ascontiguousarray(gpad[:, :, 2]) * sc
    px = np.ascontiguousarray(gpad[:, :, 0]) * sc
    py = np.ascontiguousarray(gpad[:, :, 1]) * sc

    rx_apods, tx_apods, lat_tx, lat_needed = _split_fused(
        apod, cinv, lat_spatial=lat is None)

    # shard sizes (rx padded to 8-multiples per shard)
    Nsh = -(-N // (nrx * 8)) * 8
    Msh = -(-M // ntx)
    Tp = -(-(T + (2 if four else 0)) // 128) * 128
    Npad = -(-Nsh // 128) * 128
    Mpad = -(-Msh // 128) * 128

    if orientations is not None:
        saz = np.asarray(orientations[0], np.float32)
        caz = np.asarray(orientations[1], np.float32)
    else:
        saz = np.zeros(N, np.float32)
        caz = np.ones(N, np.float32)

    prs = np.zeros((nrx, 8, Npad), np.float32)
    pvs = np.zeros((ntx, 8, Mpad), np.float32)
    pr_pad = np.concatenate([pr_np, np.repeat(pr_np[-1:], Nsh * nrx - N, 0)])
    saz_pad = np.concatenate([saz, np.repeat(saz[-1:], Nsh * nrx - N)])
    caz_pad = np.concatenate([caz, np.repeat(caz[-1:], Nsh * nrx - N)])
    pv_pad = np.concatenate([pv_np, np.repeat(pv_np[-1:], Msh * ntx - M, 0)])
    nv_pad = np.concatenate([nv_np, np.repeat(nv_np[-1:], Msh * ntx - M, 0)])
    t0_pad = np.concatenate([t0, np.repeat(t0[-1:], Msh * ntx - M)])
    if lat_tx is not None:
        lat_tx = lat_tx * (sc if lat is None else 1.0)
        lat_pad = np.concatenate([lat_tx,
                                  np.repeat(lat_tx[-1:], Msh * ntx - M)])
    for i in range(nrx):
        sl = slice(i * Nsh, (i + 1) * Nsh)
        blk = pr_pad[sl]
        prs[i, 0, :Nsh] = blk[:, 0] * sc
        prs[i, 1, :Nsh] = blk[:, 1] * sc
        prs[i, 2, :Nsh] = blk[:, 2] * sc
        # element normals from azimuth + az sin/cos (das_tiled's prk rows)
        prs[i, 3, :Nsh] = saz_pad[sl]
        prs[i, 5, :Nsh] = caz_pad[sl]
        prs[i, 6, :Nsh] = saz_pad[sl]
        prs[i, 7, :Nsh] = caz_pad[sl]
        for rrow in range(8):
            prs[i, rrow, Nsh:] = prs[i, rrow, Nsh - 1]
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
        if lat_tx is not None:
            pvs[j, 7, :Msh] = lat_pad[j * Msh:(j + 1) * Msh]
    planar = bool(np.all(py == 0) and np.all(prs[:, 1] == 0)
                  and np.all(pvs[:, 1] == 0))
    boxes = _tile_boxes(pz.astype(np.float32), px.astype(np.float32),
                        py.astype(np.float32))
    gboxes = np.stack([_group_boxes(prs[i], Nsh) for i in range(nrx)])
    MC, NC = _choose_chunks(Msh, Nsh, Tp, nch)
    allfast = all(
        plan_allfast(boxes, gboxes[i], pvs[j], Msh, fs=fs,
                     tx_model=tx_model, planar=planar, T=Tp, pair=pair,
                     method=method)
        for i in range(nrx) for j in range(ntx))
    lat_tile = None
    if lat_needed or tx_apods:
        if lat is None:
            lat_tile = px  # pixel x in scaled space (px is already scaled)
        else:
            lt = np.asarray(lat, np.float32).reshape(I1, I2)
            lat_tile = np.pad(lt, ((0, I1p - I1), (0, I2p - I2)),
                              mode="edge")
    arrays = dict(pz=pz.astype(np.float32), px=px.astype(np.float32),
                  py=py.astype(np.float32), prs=prs, pvs=pvs, boxes=boxes,
                  gboxes=gboxes, lat=lat_tile)
    statics = dict(planar=planar, MC=MC, NC=NC, Tp=Tp, Nsh=Nsh, Msh=Msh,
                   I1p=I1p, I2p=I2p, allfast=allfast, rx_apods=rx_apods,
                   tx_apods=tx_apods, vmax=float(T), method=method)
    return arrays, statics


def das_tiled(x, pi, pr, pv, nv, t0, cinv, *, fs: float,
              tx_model: str = "virtual", method: str = "linear",
              fmod: float = 0.0, im_shape: Optional[Tuple[int, ...]] = None,
              out: str = "complex", apod=(), keep_rx: bool = False,
              keep_tx: bool = False, lat: Optional[np.ndarray] = None,
              interpret: bool = False,
              orientations: Optional[np.ndarray] = None,
              precision: str = "f32"):
    """Fast Pallas DAS (summed, keep_rx, keep_tx, or keep-both output).

    ``method``: 'nearest' | 'linear' | 'cubic' | 'lanczos3' — all four
    reference samplers (``interpd.cu:68-167``) run in-kernel. The 4-tap
    methods (cubic Catmull-Rom is the reference default) gather taps
    [k-1, k+2]; in ``bf16pair`` mode the 4 taps ride exactly TWO packed
    gathers (pairs at lanes k-1 and k+1). Edge taps are clamp-replicated
    and the valid domain is ``0 <= tau <= T-1``, matching the XLA path
    (:func:`qups_tpu.ops.interp.interp1`) to f32 rounding.

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
    error. 'bf16pair' packs both linear taps (or each 4-tap half) into
    one 32-bit gather (~0.2% max rel err, ~10% faster — the half2 trace
    mode of ``bf.cu:170``). 'i8x4' (4-tap methods only) packs the WHOLE
    4-tap stencil as int8x4 with one global quantization scale, so cubic
    taps ride ONE gather instead of two — measured 1.014 vs 1.195
    s/frame at the full config (15% — the gather is ~38% of the cubic
    kernel, but the byte unpack returns part of it); ~1.5% max rel err
    on worst-case white-noise traces (int8 is the aggressive end of the
    reference's reduced-precision trace modes) — opt-in.

    ``apod``: tuple of :class:`Fused` geometry-apodization descriptors,
    evaluated in-register (see module docstring). ``lat``: per-pixel
    lateral coordinate (I,) for tx apodizations on non-cartesian scans
    (default: the pixel x coordinate). ``orientations``: (2, N) [azimuth
    sin, cos] of the rx elements for convex-aware aperture growth (default
    planar: az = 0).

    Example:
        import numpy as np
        from qups_tpu.ops.das import das
        from qups_tpu.ops.das_pallas import das_tiled
        rng = np.random.default_rng(0)
        T, N, M = 256, 16, 4
        x = rng.standard_normal((T, N, M)).astype(np.float32)
        zs = np.linspace(5e-3, 45e-3, 16)
        xs = np.linspace(-12e-3, 12e-3, 128)
        Z, X = np.meshgrid(zs, xs, indexing="ij")
        pi = np.stack([X.ravel(), 0 * X.ravel(), Z.ravel()], -1)
        pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N),
                       np.zeros(N)], -1).astype(np.float32)
        pv = np.zeros((M, 3), np.float32)
        nv = np.tile([0.0, 0.0, 1.0], (M, 1)).astype(np.float32)
        t0 = np.zeros(M, np.float32)
        # interpret=True runs the kernel logic off-TPU (parity testing)
        img = das_tiled(x, pi.astype(np.float32), pr, pv, nv, t0,
                        1 / 1540.0, fs=4e6, tx_model="plane",
                        method="cubic", im_shape=(16, 128, 1),
                        interpret=True)
        ref = das(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=4e6,
                  tx_model="plane", method="cubic")
        err = np.abs(np.asarray(img) - np.asarray(ref)).max()
        assert err < 1e-4 * np.abs(np.asarray(ref)).max()
    """
    if method == "cubic2x":
        # cubic-CLASS accuracy via linear taps on 2x band-limited
        # upsampled traces (vs quasi-exact sinc: cubic2x 3.2% / cubic
        # 3.0% / linear 12.8% — tests/test_bf.py). MEASURED SLOWER than
        # true cubic on the TPU loop arm (2.13 vs 1.20 s/frame at the
        # headline config): window count scales with span*fs, so 2x fs
        # doubles the window sweeps (NOTES.md r5). Kept for the XLA
        # paths and API parity; not a default anywhere.
        x = _upsample2x_any(x)
        fs = float(fs) * 2.0
        method = "linear"
    if method not in ("nearest", "linear", "cubic", "lanczos3"):
        raise ValueError(f"unknown method {method!r}")
    keep_both = keep_rx and keep_tx
    if precision not in ("f32", "bf16", "bf16pair", "i8x4"):
        raise ValueError(f"unknown precision {precision!r}")
    if precision == "i8x4" and method not in ("cubic", "lanczos3"):
        raise ValueError(
            "precision='i8x4' packs the 4-tap stencil — use method="
            "'cubic'/'lanczos3' (2-tap methods already ride one gather "
            "via 'bf16pair')")
    if precision == "bf16" and not interpret:
        raise NotImplementedError(
            "precision='bf16' requires bf16 dynamic_gather, which the"
            " current Mosaic TPU toolchain does not implement; use"
            " precision='bf16pair' (packed-pair taps, one i32 gather)")
    apod = tuple(apod if isinstance(apod, (tuple, list)) else (apod,))
    for a in apod:
        if not isinstance(a, Fused):
            raise ValueError("das_tiled apodization must be Fused descriptors")
    pair = precision == "bf16pair"
    quad = precision == "i8x4"

    x, fdims = _fold_frames(x)  # (T, N, M, F1, F2, ...) -> one F axis
    qstx = None
    if quad:
        # PER-TRANSMIT quantization scales (max |x| over time/rx/frames
        # per transmit): FSA amplitude decays geometrically across
        # transmits, so a global scale would bury weak transmits below
        # the int8 floor. One scale covers BOTH IQ channels of a
        # transmit (|complex| max bounds each; the in-kernel fmod
        # rotation mixes the channels, so they must share a scale). The
        # scales fold into the kernel's tap weights via pv row 8 —
        # dequantization is free and the output needs no descale.
        red = (0, 1) + ((3,) if np.ndim(x) >= 4 else ())
        if isinstance(x, np.ndarray) or not isinstance(x, jnp.ndarray):
            qstx = jnp.asarray(np.maximum(
                np.max(np.abs(np.asarray(x)), axis=red), 1e-30),
                jnp.float32)
        else:
            qstx = jax.jit(lambda v: jnp.maximum(
                jnp.max(jnp.abs(v), axis=red), 1e-30).astype(
                    jnp.float32))(x)
    x_in = x
    cplx = bool(np.iscomplexobj(np.empty(0, dtype=getattr(x, "dtype", np.float32))))
    pi = np.asarray(pi, np.float32)
    pr_np = np.asarray(pr, np.float32)
    pv_np = np.asarray(pv, np.float32)
    nv_np = np.asarray(nv, np.float32)
    T, N, M = x.shape[:3]
    Fn = x.shape[3] if np.ndim(x) >= 4 else None
    t0 = np.broadcast_to(np.asarray(t0, np.float32).reshape(-1), (M,)).copy()
    four = method in ("cubic", "lanczos3")
    if four:
        # 4-tap samplers run on a +1-shifted index over an edge-replicated
        # trace (one pad sample each end): taps [Ki-1, Ki+2] stay in-bounds
        # AND reproduce the XLA path's clamped edge taps exactly
        t0 = t0 - np.float32(1.0) / np.float32(fs)
    cinv = float(np.asarray(cinv).reshape(()))
    I = pi.shape[0]

    if im_shape is None:
        im_shape = (I, 1, 1)
    I1, I2, I3 = im_shape
    if I3 != 1:
        # volumetric scan: flatten the trailing axes C-order — with an
        # iso-depth-major order (cartesian 'ZXY', polar 'RAY') every
        # 128-lane row stays iso-depth, so the tile window planning is
        # unchanged (boxes are computed from the true 3-D pixel coords;
        # the kernel's planar=False geometry handles y)
        I2, I3 = I2 * I3, 1
        im_shape = (I1, I2, I3)
    I1p = -(-I1 // 8) * 8
    I2p = -(-I2 // 128) * 128
    grid2 = pi.reshape(I1, I2, 3)
    gpad = np.pad(grid2, ((0, I1p - I1), (0, I2p - I2), (0, 0)), mode="edge")
    pz = np.ascontiguousarray(gpad[:, :, 2])
    px = np.ascontiguousarray(gpad[:, :, 0])
    py = np.ascontiguousarray(gpad[:, :, 1])

    # ---- split fused apods by side, prepare their operands ----
    rx_apods, tx_apods, lat_tx, lat_needed = _split_fused(
        apod, cinv, lat_spatial=lat is None)
    rx_apods, tx_apods = list(rx_apods), list(tx_apods)

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

    # 16 rows (two f32 sublane tiles): rows 0-7 as before, row 8 carries
    # the per-transmit i8x4 quantization scale (set in run(), traced)
    pvk = np.zeros((16, Mpad), np.float32)
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

    Tp = -(-(T + (2 if four else 0)) // 128) * 128
    Np8 = -(-N // 8) * 8
    planar = bool(np.all(pys == 0) and np.all(prs[1] == 0)
                  and np.all(pvs[1] == 0))
    boxes = _tile_boxes(pzs, pxs, pys)
    gbox = _group_boxes(prs, Np8)

    nch = 2 if (cplx or fmod != 0.0) else 1
    itemsize = 2 if precision == "bf16" else 4
    MC, NC = _choose_chunks(M, Np8, Tp, nch, itemsize=itemsize)

    import os as _os
    hostwin = _os.environ.get("QUPS_DAS_HOSTWIN", "0") == "1"
    # bf16 kept-axis accumulator (halves the aliased accumulator's HBM
    # sweeps; ~3 decimal digits — meant for coherence pipelines that
    # normalize). Experiment flag; outputs convert back to f32.
    acc16 = _os.environ.get("QUPS_DAS_ACC16", "0") == "1" \
        and (keep_rx or keep_tx)
    if hostwin:
        # VERDICT-r3 static-window experiment: host-planned packed window
        # bounds replace the in-kernel scalar interval chain (see
        # plan_hostwin — delays stay in-kernel, unlike the LUT path;
        # it also proves allfast, so plan_allfast is skipped entirely)
        rxb_w, txb_w, allfast_w, ok = plan_hostwin(
            boxes, gbox, pvs, M, MC, fs=fs, tx_model=tx_model,
            planar=planar, T=Tp, pair=(precision == "bf16pair"),
            method=method)
        if ok:
            boxes, gbox, allfast = rxb_w, txb_w, allfast_w
        else:
            hostwin = False
    if not hostwin:
        allfast = plan_allfast_cached(boxes, gbox, pvs, M, fs=fs,
                                      tx_model=tx_model, planar=planar,
                                      T=Tp, pair=(precision == "bf16pair"),
                                      method=method)

    def prep_real(xr):
        """(T, N, M[, F]) -> (F?, M, Np8, Tp) padded."""
        if xr.dtype == jnp.uint16:
            # uint16 bf16-bits wire format (see _upload_trace): half the
            # host->device bytes, bit-compatible under bf16pair
            xr = jax.lax.bitcast_convert_type(
                xr, jnp.bfloat16).astype(jnp.float32)
        elif xr.dtype == jnp.bfloat16:
            xr = xr.astype(jnp.float32)
        if four:  # edge-replicate one sample each end (see above)
            xr = jnp.concatenate([xr[:1], xr, xr[-1:]], axis=0)
        Te = xr.shape[0]
        if Tp != Te or Np8 != N:
            padc = [(0, Tp - Te), (0, Np8 - N)] + [(0, 0)] * (xr.ndim - 2)
            xr = jnp.pad(xr, padc)
        if precision == "bf16":
            xr = xr.astype(jnp.bfloat16)
        if Fn is not None:
            xr = jnp.transpose(xr, (3, 2, 1, 0))  # (F, M, N, T)
        else:
            xr = jnp.transpose(xr, (2, 1, 0))  # (M, N, T)
        if precision == "bf16pair":
            xr = _pack_pairs(xr)
        elif quad:
            # per-tx scale broadcast to the packed layout (M, N, T) /
            # (F, M, N, T)
            scv = qstx[:, None, None]
            if xr.ndim == 4:
                scv = scv[None]
            xr, _ = _pack_quads(xr, scale=scv)
        return xr

    def run(xr, xi=None):
        xs = (xr,) if xi is None else (xr, xi)
        keep_n = ((M, Np8) if keep_both else
                  ((Np8,) if keep_rx else ((M,) if keep_tx else ())))
        oshape = ((Fn,) if Fn else ()) + keep_n + (I1p, I2p)
        kdt = jnp.bfloat16 if acc16 else jnp.float32
        accs = tuple(jnp.zeros(oshape, kdt) for _ in xs)
        pv_dev = jnp.asarray(pvs)
        if quad:  # row 8 = s_m / 127: dequantization rides the weights
            pv_dev = pv_dev.at[8, :M].set(qstx / 127.0)
        outs = _das_call(
            jnp.asarray(boxes), jnp.asarray(gbox), jnp.asarray(pzs),
            jnp.asarray(pxs), jnp.asarray(pys),
            jnp.asarray(lat_tile) if lat_tile is not None else None,
            jnp.asarray(prs), pv_dev, xs, accs, fs=float(fs),
            tx_model=tx_model, planar=planar, fmod=float(fmod),
            keep_rx=keep_rx, keep_tx=keep_tx, rx_apods=tuple(rx_apods),
            tx_apods=tuple(tx_apods), MC=MC, NC=NC, interpret=interpret,
            pair=(precision == "bf16pair"), quad=quad, allfast=allfast,
            method=method, vmax=float(T), hostwin=hostwin, acc16=acc16)
        # crop to (I, N', M'[, F])
        res = []
        for o in outs:
            if Fn:
                o = jnp.moveaxis(o, 0, -1)  # (..., F)
            if keep_both:
                # (M, N, I1p, I2p[, F]) -> (I, N, M[, F])
                o = jnp.moveaxis(o[:M, :N, :I1, :I2], (0, 1), (3, 2))
                o = o.reshape((I, N, M) + o.shape[4:])
            elif keep_rx:
                # (N, I1p, I2p[, F]) -> (I, N, 1[, F])
                o = jnp.moveaxis(o[:N, :I1, :I2], 0, 2)
                o = o.reshape((I, N, 1) + o.shape[3:])
            elif keep_tx:
                # (M, I1p, I2p[, F]) -> (I, 1, M[, F])
                o = jnp.moveaxis(o[:M, :I1, :I2], 0, 2)
                o = o.reshape((I, 1, M) + o.shape[3:])
            else:
                o = o[:I1, :I2].reshape((I, 1, 1) + o.shape[2:])
            res.append(o.astype(jnp.float32) if acc16 else o)
        return res

    def pack_out(res):
        if len(res) == 2:
            if out == "ri":
                # TPU-boundary-safe: never materialize device complex
                return _unfold_frames(jnp.stack(res, axis=-1), fdims)
            return _unfold_frames(
                (res[0] + 1j * res[1]).astype(jnp.complex64), fdims)
        if out == "ri":
            return _unfold_frames(
                jnp.stack([res[0], jnp.zeros_like(res[0])], axis=-1), fdims)
        return _unfold_frames(res[0], fdims)

    if cplx:
        # split re/im without eager device-complex ops (boundary-restricted
        # on some TPU backends)
        if isinstance(x_in, np.ndarray) or not isinstance(x_in, jnp.ndarray):
            xh = np.asarray(x_in)
            return pack_out(run(
                prep_real(_upload_trace(np.ascontiguousarray(xh.real), pair)),
                prep_real(_upload_trace(np.ascontiguousarray(xh.imag), pair))))
        xre, xim = jax.jit(lambda v: (jnp.real(v).astype(jnp.float32),
                                      jnp.imag(v).astype(jnp.float32)))(x_in)
        return pack_out(run(prep_real(xre), prep_real(xim)))
    xr = prep_real(_upload_trace(x, pair) if isinstance(x, np.ndarray)
                   else (x if getattr(x, "dtype", None) == jnp.uint16
                         else jnp.asarray(x, jnp.float32)))
    if fmod != 0.0:  # real data with remodulation -> complex output
        return pack_out(run(xr, jnp.zeros_like(xr)))
    return pack_out(run(xr))
