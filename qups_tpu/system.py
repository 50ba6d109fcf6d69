"""UltrasoundSystem — the synthesis/orchestration layer.

TPU-native counterpart of QUPS's ``UltrasoundSystem``
(``/root/reference/src/UltrasoundSystem.m:52-6015``): one object combining a
transmit/receive Transducer, a Sequence, a Scan, and a simulation sampling
frequency, whose methods are the simulators and beamformers.

Host-side geometry (numpy) feeds jitted XLA/Pallas compute (arrays only), so
parameter changes never trigger recompiles; shapes do.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional, Sequence as Seq, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .core.channel_data import ChannelData
from .core.scan import Scan, ScanCartesian, ScanPolar
from .core.scat import Scatterers
from .core.seq import Sequence
from .core.waveform import Waveform
from .core.xdc import Transducer, TransducerArray, TransducerConvex, TransducerMatrix
from .ops.das import das, das_lut, delay_tables
from .ops.greens import greens_dense, greens_splat


@dataclass(frozen=True)
class UltrasoundSystem:
    tx: Transducer = None
    rx: Transducer = None
    seq: Sequence = None
    scan: Scan = None
    fs: float = None  # simulation sampling frequency [Hz]

    def __post_init__(self):
        # defaults mirror the reference constructor
        # (``UltrasoundSystem.m:143-190``)
        if self.rx is None and self.tx is None:
            object.__setattr__(self, "rx", TransducerArray.P4_2v())
        if self.tx is None:
            object.__setattr__(self, "tx", self.rx)
        if self.rx is None:
            object.__setattr__(self, "rx", self.tx)
        if self.fs is None:
            object.__setattr__(self, "fs", float(2 * max(
                2 * self.tx.fc, self.tx.bw[1], 2 * self.rx.fc, self.rx.bw[1])))
        if self.seq is None:
            object.__setattr__(self, "seq", Sequence(
                type="FSA", numpulse=self.tx.numel))
        if self.scan is None:
            lam4 = self.lmbda / 4
            if isinstance(self.rx, TransducerConvex):
                c = self.rx.center
                scan = ScanPolar(origin=c,
                                 r=np.arange(0, 40e-3 + np.linalg.norm(c), lam4),
                                 a=np.arange(-45.0, 45.5, 1.0))
            else:
                scan = ScanCartesian().with_resolution(dx=lam4, dz=lam4)
            object.__setattr__(self, "scan", scan)

    # ------------------------------------------------------------ properties
    @property
    def xdc(self) -> Transducer:
        assert self.tx is self.rx or self.tx == self.rx, "tx and rx differ"
        return self.rx

    @property
    def fc(self) -> float:
        return self.rx.fc

    @property
    def lmbda(self) -> float:
        """Wavelength at the center frequency (``us.lambda``)."""
        return self.seq.c0 / self.fc if self.seq is not None else 1540.0 / self.fc

    def replace(self, **changes) -> "UltrasoundSystem":
        return dataclasses.replace(self, **changes)

    def scale(self, dist: float = 1.0, time: float = 1.0) -> "UltrasoundSystem":
        """Consistent unit rescale of all linked objects
        (``UltrasoundSystem.m:411-461``) — e.g. ``scale(dist=1e3, time=1e6)``
        for mm/us units."""
        same = self.tx is self.rx
        tx = self.tx.scale(dist=dist, time=time)
        return dataclasses.replace(
            self, tx=tx, rx=tx if same else self.rx.scale(dist=dist, time=time),
            seq=self.seq.scale(dist=dist, time=time),
            scan=self.scan.scale(dist=dist), fs=self.fs / time)

    # ------------------------------------------------------- geometry helpers
    def _tx_geometry(self):
        """Per-sequence-type (pv, nv, tx_model) dispatch
        (``UltrasoundSystem.DAS``, ``UltrasoundSystem.m:3340-3352``)."""
        st = self.seq.type
        if st == "FSA":
            pv = self.tx.positions().T  # (M, 3)
            _, _, nf, _, _ = self.tx.orientations()
            return pv, nf.T, "diverging"
        if st == "PW":
            f = self.seq.focus_array  # unit directions
            M = f.shape[1]
            return np.zeros((M, 3)), f.T, "plane"
        # FC / DV / VS: virtual sources at the foci
        f = self.seq.focus_array
        nf = f - self.tx.origin[:, None]
        nf = nf / np.linalg.norm(nf, axis=0, keepdims=True)
        model = "diverging" if st == "DV" else "virtual"
        return f.T, nf.T, model

    def _pixels(self) -> np.ndarray:
        return self.scan.positions().reshape(3, -1).T.astype(np.float32)  # (I, 3)

    # ------------------------------------------------------------- simulators
    def greens(self, scat: Scatterers, element_subdivisions: Tuple[int, int] = (1, 1),
               R0: Optional[float] = None, method: str = "cubic",
               impl: str = "splat", fsk: Optional[float] = None,
               block: int = 32) -> ChannelData:
        """Simulate echoes from point scatterers via a shifted Green's
        function, then apply the transmit Sequence via :meth:`focusTx`
        (``UltrasoundSystem.greens``, ``UltrasoundSystem.m:463-882``).
        """
        fs = float(self.fs)
        fsk = float(fsk or fs)
        c0 = float(scat.c0)
        R0 = float(self.lmbda if R0 is None else R0)

        # sub-element positions (N, E, 3)
        if element_subdivisions == (1, 1):
            pn = self.rx.positions().T[:, None, :]
            pv = self.tx.positions().T[:, None, :]
        else:
            pn = np.moveaxis(self.rx.bary_centers(element_subdivisions), 0, -1)
            pv = np.moveaxis(self.tx.bary_centers(element_subdivisions), 0, -1)

        # convolved kernel waveform: rx impulse (x) tx impulse (x) seq pulse
        # (``UltrasoundSystem.m:584-588``)
        wv = self.rx.impulse.conv(self.tx.impulse.conv(self.seq.pulse, fsk), fsk)
        wv = dataclasses.replace(wv, fs=fsk)
        kern = np.asarray(wv.samples)

        # time bounds from exact geometry (reference uses transducer-bound
        # corners, ``UltrasoundSystem.m:566-615``)
        ps = scat.pos  # (3, S)
        r_rx = np.linalg.norm(ps.T[:, None, :] - pn.reshape(-1, 3)[None], axis=-1)
        r_tx = np.linalg.norm(ps.T[:, None, :] - pv.reshape(-1, 3)[None], axis=-1)
        tau = (r_rx.min(1) + r_tx.min(1), r_rx.max(1) + r_tx.max(1))
        tmin = tau[0].min() / c0 + wv.t0 - wv.duration
        tmax = tau[1].max() / c0 + wv.tend
        n0 = math.floor(tmin * fs)
        ne = math.ceil(tmax * fs)
        T = ne - n0 + 1
        s0 = n0 / fs

        fn = greens_splat if impl == "splat" else greens_dense
        kwargs = dict(T=T, s0=s0, t0k=float(wv.t0), fs=fs, cinv=1.0 / c0,
                      R0=R0, fsr=fsk / fs, method=method)
        if impl == "splat":
            kwargs["block"] = block
        x = fn(jnp.asarray(kern), jnp.asarray(ps.T, jnp.float32),
               jnp.asarray(scat.amp), jnp.asarray(pn, jnp.float32),
               jnp.asarray(pv, jnp.float32), **kwargs)

        chd = ChannelData(data=x, fs=fs, t0=s0)
        return self.focusTx(chd, self.seq, method=method)

    # ---------------------------------------------------- transmit synthesis
    def focusTx(self, chd: ChannelData, seq: Optional[Sequence] = None,
                method: str = "cubic", buffer: int = 0) -> ChannelData:
        """Synthesize transmits from FSA data: delay-and-sum *across
        transmits* (``UltrasoundSystem.focusTx``,
        ``UltrasoundSystem.m:3374-3503``)."""
        seq = seq or self.seq
        tau = -seq.delays(self.tx)          # (M, M')
        apd = seq.apodization(self.tx)      # (M, M')

        if seq.type == "FSA" and not np.count_nonzero(tau) \
                and np.array_equal(apd, np.eye(self.tx.numel)):
            return chd  # true FSA: identity

        # resample only within the window where data exists
        # (``UltrasoundSystem.m:3457-3463``)
        mask = apd.astype(bool) | np.zeros_like(tau, bool)
        nmin = math.floor(np.min(tau[mask]) * chd.fs)
        nmax = math.ceil(np.max(tau[mask]) * chd.fs)
        chd = chd.replace(t0=jnp.asarray(chd.t0) + nmin / chd.fs)
        tau = tau - nmin / chd.fs
        chd = chd.zeropad(0, (nmax - nmin) + buffer)

        # sample at time + delays, weighted, summed over the old tx dim
        # tau2 (1, 1, M, M'), weights (1, 1, M, M')
        t2 = -tau[None, None, :, :]
        w = apd[None, None, :, :]
        z = chd.sample2sep(chd.time, t2, method=method, w=w, sdim=2)
        z = jnp.moveaxis(z[:, :, 0], -1, 2) if z.ndim > 3 else z
        return chd.replace(data=z)

    # ------------------------------------------------------------ beamformers
    def DAS(self, chd: ChannelData, apod=(), fmod: float = 0.0,
            c0: Optional[Union[float, np.ndarray]] = None,
            keep_tx: bool = False, keep_rx: bool = False,
            method: str = "cubic"):
        """Compute-optimized delay-and-sum beamformer
        (``UltrasoundSystem.DAS``, ``UltrasoundSystem.m:3172-3372``).

        Returns the image shaped ``(*scan.shape, N', M', *F)`` where the rx/tx
        dims are kept (N/M) or summed (1) per the flags.
        """
        pv, nv, model = self._tx_geometry()
        c0v = self.seq.c0 if c0 is None else c0
        cinv = np.reciprocal(np.asarray(c0v, np.float32))
        if cinv.ndim > 1:  # per-pixel map on the scan grid
            cinv = cinv.reshape(-1)
        t0 = np.asarray(jax.device_get(jnp.asarray(chd.t0))).reshape(-1)
        img = das(chd.data, self._pixels(), self.rx.positions().T, pv, nv,
                  t0, cinv, fs=float(chd.fs), apod=apod, fmod=float(fmod),
                  tx_model=model, keep_rx=keep_rx, keep_tx=keep_tx,
                  method=method)
        return img.reshape(self.scan.shape + img.shape[1:])

    def das_delay_tables(self, c0: Optional[float] = None):
        """Separable geometric delay LUTs for the current system:
        ``(tau_rx (I, N), tau_tx (I, M))`` including the sequence's t=0
        convention (used by :meth:`bfDAS`;
        ``UltrasoundSystem.bfDAS``, ``UltrasoundSystem.m:4430-4463``)."""
        pv, nv, model = self._tx_geometry()
        c0v = float(c0 if c0 is not None else self.seq.c0)
        tau_rx, tau_tx = delay_tables(self._pixels(), self.rx.positions().T,
                                      pv, nv, c0v, tx_model=model)
        return tau_rx, tau_tx

    def bfDAS(self, chd: ChannelData, apod=(), fmod: float = 0.0,
              c0: Optional[float] = None, keep_tx: bool = False,
              keep_rx: bool = False, method: str = "cubic"):
        """Generic delay-and-sum via delay tables
        (``UltrasoundSystem.bfDAS``, ``UltrasoundSystem.m:4334-4474``)."""
        tau_rx, tau_tx = self.das_delay_tables(c0=c0)
        return self.bfDASLUT(chd, tau_rx, tau_tx, apod=apod, fmod=fmod,
                             keep_tx=keep_tx, keep_rx=keep_rx, method=method)

    def bfDASLUT(self, chd: ChannelData, tau_rx, tau_tx, apod=(),
                 fmod: float = 0.0, keep_tx: bool = False,
                 keep_rx: bool = False, method: str = "cubic"):
        """Beamform from arbitrary rx/tx delay tables — the "bring your own
        delays" API (``UltrasoundSystem.bfDASLUT``,
        ``UltrasoundSystem.m:4476-4673``)."""
        t0 = np.asarray(jax.device_get(jnp.asarray(chd.t0))).reshape(-1)
        img = das_lut(chd.data, tau_rx, tau_tx, t0, fs=float(chd.fs),
                      apod=apod, fmod=float(fmod), keep_rx=keep_rx,
                      keep_tx=keep_tx, method=method)
        return img.reshape(self.scan.shape + img.shape[1:])
