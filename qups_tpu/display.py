"""Display helpers — the reference's first-class visualization surface
(``ChannelData.imagesc/gif`` ``src/ChannelData.m:1497-1640``, ``Scan.plot/
imagesc/gif`` ``src/Scan.m:288-593``, ``Medium.imagesc`` ``src/Medium.m:701``,
``Transducer.plot/patch`` ``src/Transducer.m:992-1123``) built on matplotlib.

All functions accept an optional ``ax`` and return the artist; animation
helpers return a ``matplotlib.animation.FuncAnimation`` (save with
``anim.save(path, writer='pillow')`` — the ``frame2gif`` analog). Pure
host-side: device arrays are pulled with :func:`qups_tpu.utils.cpx.to_host`
(complex downloads ride the ri format — raw complex host<->device transfer
is unimplemented on some TPU runtimes) and displayed as log-envelope via
:func:`qups_tpu.utils.mod2db`.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .core.channel_data import ChannelData
from .core.medium import Medium
from .core.scan import Scan, ScanCartesian, ScanPolar
from .core.scat import Scatterers
from .core.xdc import Transducer
from .utils.cpx import to_host
from .utils.maths import mod2db


def _get_ax(ax=None):
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots()
    return ax


def _host_abs(x):
    return np.abs(to_host(x))


def _image_host(b, scan: Scan, ri=None):
    """Pull a beamformed image to host, joining a trailing ri channel.

    On TPU backends the beamformers default to ``out='ri'`` (real
    ``(..., 2)`` pairs — complex host<->device transfer is unimplemented
    there), so a trailing size-2 axis beyond the scan's dims is treated as
    the ri channel (the repo-wide convention; see ``utils/cpx.py``). Pass
    ``ri=False`` if that axis is genuinely two frames, or ``ri=True`` to
    force the join."""
    x = to_host(b)
    if ri is None:
        ri = (not np.iscomplexobj(x) and x.ndim > len(scan.shape)
              and x.shape[-1] == 2)
    if ri and not np.iscomplexobj(x):
        x = x[..., 0] + 1j * x[..., 1]
    return x


# --------------------------------------------------------------------- data
def chd_imagesc(chd: ChannelData, m: int = 0, frame: int = 0, ax=None,
                db: bool = False, **imshow_kw):
    """Display one transmit's channel traces (time x rx), the
    ``ChannelData.imagesc`` analog (``src/ChannelData.m:1497``)."""
    ax = _get_ax(ax)
    x = to_host(chd.data)
    while x.ndim > 3:
        x = x[..., frame]
    img = x[:, :, m]
    if db or np.iscomplexobj(img):
        img = mod2db(np.abs(img) + 1e-30)
        imshow_kw.setdefault("vmin", float(img.max()) - 60)
    t = np.asarray(chd.time).reshape(-1)
    h = ax.imshow(np.real(img), aspect="auto", origin="upper",
                  extent=[0.5, img.shape[1] + 0.5, t[-1] * 1e6, t[0] * 1e6],
                  **imshow_kw)
    ax.set_xlabel("receive element")
    ax.set_ylabel("time [us]")
    return h


def chd_gif(chd: ChannelData, ax=None, db: bool = True, interval: int = 100):
    """Animate the transmits of a ChannelData (``ChannelData.gif``,
    ``src/ChannelData.m:1575-1640``). Returns a FuncAnimation."""
    from matplotlib import animation
    ax = _get_ax(ax)
    h = chd_imagesc(chd, 0, ax=ax, db=db)

    def update(m):
        x = to_host(chd.data)
        while x.ndim > 3:
            x = x[..., 0]
        img = x[:, :, m]
        if db or np.iscomplexobj(img):
            img = mod2db(np.abs(img) + 1e-30)
        h.set_data(np.real(img))
        return (h,)

    return animation.FuncAnimation(ax.figure, update, frames=chd.M,
                                   interval=interval, blit=True)


# -------------------------------------------------------------------- image
def scan_imagesc(scan: Scan, b, ax=None, dbr: Optional[float] = 60.0,
                 slice: Optional[str] = None, index: int = 0,
                 ri=None, **imshow_kw):
    """Display a beamformed image on its scan's axes (``Scan.imagesc``,
    ``src/Scan.m:288``): cartesian scans use the physical extent; polar
    scans are scan-converted first. ``dbr``: dynamic range in dB (None for
    linear amplitude). For VOLUMES, ``slice``/``index`` pick the plane to
    display (an axis letter of ``scan.order``, default the first axis of
    size > 1 beyond the two image axes — ``Scan.m:385-406``). A trailing
    size-2 axis on real data is joined as the TPU ri channel (see
    :func:`_image_host`; override with ``ri=``)."""
    ax = _get_ax(ax)
    img = _image_host(b, scan, ri=ri)
    img = img.reshape(tuple(scan.shape) + (-1,))[..., 0]
    if isinstance(scan, ScanCartesian) and scan.ny > 1:
        # volumetric: slice along the named (default elevational) axis and
        # display the remaining plane (``Scan.m:385-406``) with each kept
        # axis labeled by its own letter (slicing X leaves a z-y plane)
        order = scan.order
        sdim = order.index(slice.upper()) if slice else order.index("Y")
        img = np.take(img, index, axis=sdim)
        keep = [c for i, c in enumerate(order) if i != sdim]
        axv = {c: np.asarray(getattr(scan, c.lower())) * 1e3 for c in keep}
        ext = [axv[keep[1]][0], axv[keep[1]][-1],
               axv[keep[0]][-1], axv[keep[0]][0]]
        return _imshow_db(ax, _host_abs(img), ext, dbr,
                          keep[1].lower() + " [mm]",
                          keep[0].lower() + " [mm]", **imshow_kw)
    if isinstance(scan, ScanPolar):
        img2, scan_c = scan.scan_convert(_host_abs(img))
        img2 = np.nan_to_num(np.asarray(img2))
        return scan_imagesc(scan_c, img2, ax=ax, dbr=dbr, **imshow_kw)
    elif isinstance(scan, ScanCartesian):
        zdim = scan.order.index("Z")
        xdim = scan.order.index("X")
        dat = _host_abs(np.squeeze(img))
        if xdim < zdim:
            dat = dat.T
        ext = [scan.x[0] * 1e3, scan.x[-1] * 1e3,
               scan.z[-1] * 1e3, scan.z[0] * 1e3]
    else:
        raise TypeError(f"unsupported scan type {type(scan).__name__}")
    return _imshow_db(ax, dat, ext, dbr, "x [mm]", "z [mm]", **imshow_kw)


def _imshow_db(ax, dat, ext, dbr, xlabel, ylabel, **imshow_kw):
    """Shared imshow with optional dB compression and mm-axis labels."""
    if dbr is not None:
        dat = mod2db(dat + 1e-30)
        imshow_kw.setdefault("vmax", float(np.nanmax(dat)))
        imshow_kw.setdefault("vmin", imshow_kw["vmax"] - dbr)
        imshow_kw.setdefault("cmap", "gray")
    h = ax.imshow(dat, extent=ext, origin="upper", aspect="equal",
                  **imshow_kw)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    return h


def scan_plot(scan: Scan, ax=None, **plot_kw):
    """Plot the scan's pixel lattice outline (``Scan.plot``)."""
    ax = _get_ax(ax)
    P = scan.positions().reshape(3, -1)
    plot_kw.setdefault("marker", ".")
    plot_kw.setdefault("linestyle", "none")
    plot_kw.setdefault("markersize", 1)
    h, = ax.plot(P[0] * 1e3, P[2] * 1e3, **plot_kw)
    ax.set_xlabel("x [mm]")
    ax.set_ylabel("z [mm]")
    ax.invert_yaxis()
    return h


def scan_vol3d(scan: Scan, b, axs=None, dbr: Optional[float] = 60.0,
               mode: str = "mip", ri=None, **imshow_kw):
    """3-D volume display (``Scan.vol3d``, ``src/Scan.m:512-562``). The
    reference stacks translucent image planes (the FileExchange ``vol3d``
    renderer); the headless-friendly analog here renders the volume as
    maximum-intensity projections along each scan axis (``mode='mip'``,
    one subplot per projection) or as an alpha-composited plane stack
    (``mode='alpha'``, nearest to the reference's look). Returns the list
    of image handles."""
    import matplotlib.pyplot as plt

    assert isinstance(scan, ScanCartesian), "vol3d expects a cartesian scan"
    vol = np.abs(_image_host(b, scan, ri=ri).reshape(
        tuple(scan.shape) + (-1,))[..., 0])
    if dbr is not None:
        vol = np.asarray(mod2db(vol + 1e-30))
        vmax = float(np.nanmax(vol))
        imshow_kw.setdefault("vmax", vmax)
        imshow_kw.setdefault("vmin", vmax - dbr)
        imshow_kw.setdefault("cmap", "gray")
    order = scan.order
    axvals = {c: np.asarray(getattr(scan, c.lower())) * 1e3 for c in "XYZ"}
    if mode == "alpha":
        # alpha-composited planes along the elevational axis
        first = axs[0] if isinstance(axs, (list, tuple, np.ndarray)) else axs
        ax = _get_ax(first)
        ydim = order.index("Y")
        ny = vol.shape[ydim]
        lo, hi = imshow_kw.get("vmin", vol.min()), imshow_kw.get(
            "vmax", vol.max())
        hs = []
        for i in range(ny):
            pl = np.take(vol, i, axis=ydim)
            a = np.clip((pl - lo) / max(hi - lo, 1e-30), 0, 1)
            h = ax.imshow(pl, alpha=np.clip(0.9 * a * 4 / ny, 0.0, 1.0),
                          aspect="equal", **imshow_kw)
            hs.append(h)
        return hs
    # MIP triptych: project out each axis in turn
    if axs is None:
        _, axs = plt.subplots(1, 3, figsize=(12, 4))
    hs = []
    for k, proj in enumerate("YXZ"):  # z-x (en face), z-y, x-y planes
        pdim = order.index(proj)
        mip = vol.max(axis=pdim)
        keep = [c for i, c in enumerate(order) if i != pdim]
        ext = [axvals[keep[1]][0], axvals[keep[1]][-1],
               axvals[keep[0]][-1], axvals[keep[0]][0]]
        h = axs[k].imshow(mip, extent=ext, origin="upper", aspect="equal",
                          **imshow_kw)
        axs[k].set_xlabel(f"{keep[1].lower()} [mm]")
        axs[k].set_ylabel(f"{keep[0].lower()} [mm]")
        axs[k].set_title(f"MIP over {proj.lower()}")
        hs.append(h)
    return hs


def image_gif(scan: Scan, frames, ax=None, dbr: float = 60.0,
              interval: int = 100):
    """Animate a stack of beamformed images (last axis = frame) on a scan
    (``Scan.gif``, ``src/Scan.m:423``)."""
    from matplotlib import animation
    ax = _get_ax(ax)
    fr = to_host(frames)
    h = scan_imagesc(scan, fr[..., 0], ax=ax, dbr=dbr)

    def update(i):
        img = _host_abs(fr[..., i]).squeeze()
        h.set_data(mod2db(img + 1e-30))
        return (h,)

    return animation.FuncAnimation(ax.figure, update, frames=fr.shape[-1],
                                   interval=interval, blit=True)


# ------------------------------------------------------------------- medium
def medium_imagesc(med: Medium, scan: Scan, prop: str = "c", ax=None,
                   **imshow_kw):
    """Display a Medium property map sampled on a scan (``Medium.imagesc``,
    ``src/Medium.m:701``)."""
    ax = _get_ax(ax)
    m = med.props(scan, prop)
    return scan_imagesc(scan, m, ax=ax, dbr=None, **imshow_kw)


# ---------------------------------------------------------------- transducer
def xdc_plot(xdc: Transducer, ax=None, **plot_kw):
    """Plot element positions + normals (``Transducer.plot``,
    ``src/Transducer.m:992``)."""
    ax = _get_ax(ax)
    p = xdc.positions()
    _, _, n, _, _ = xdc.orientations()
    plot_kw.setdefault("marker", "s")
    plot_kw.setdefault("linestyle", "none")
    h, = ax.plot(p[0] * 1e3, p[2] * 1e3, **plot_kw)
    L = xdc.width * 2e3
    for i in range(0, xdc.numel, max(1, xdc.numel // 16)):
        ax.plot([p[0, i] * 1e3, p[0, i] * 1e3 + L * n[0, i]],
                [p[2, i] * 1e3, p[2, i] * 1e3 + L * n[2, i]],
                color=h.get_color(), linewidth=0.5)
    ax.set_xlabel("x [mm]")
    ax.set_ylabel("z [mm]")
    return h


def scat_plot(scat: Scatterers, ax=None, **plot_kw):
    """Plot scatterer positions (``Scatterers.plot``)."""
    ax = _get_ax(ax)
    plot_kw.setdefault("marker", "o")
    plot_kw.setdefault("linestyle", "none")
    h, = ax.plot(scat.pos[0] * 1e3, scat.pos[2] * 1e3, **plot_kw)
    ax.set_xlabel("x [mm]")
    ax.set_ylabel("z [mm]")
    ax.invert_yaxis()
    return h


# bind as methods (the reference exposes these on the objects)
ChannelData.imagesc = chd_imagesc
ChannelData.gif = chd_gif
Scan.imagesc = scan_imagesc
Scan.plot = scan_plot
Scan.gif = image_gif
Medium.imagesc = medium_imagesc
Transducer.plot = xdc_plot
Scatterers.plot = scat_plot
