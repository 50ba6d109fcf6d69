"""k-space pseudospectral full-wave simulation (k-Wave-class).

TPU-native equivalent of the reference's k-Wave interop
(``UltrasoundSystem.kspaceFirstOrder``,
``/root/reference/src/UltrasoundSystem.m:2458-3170``): a first-order coupled
acoustic PSTD stepper on a staggered grid with k-space correction and a
split-field PML, simulating full-wave propagation through a heterogeneous
``Medium`` — built natively in JAX rather than via the external k-Wave
toolbox (SURVEY.md §7 item 7).

Equations (2-D, linear, lossless):

    du/dt   = -(1/rho0) grad(p)        (staggered spatial shifts)
    drho/dt = -rho0 div(u) + source
    p       = c^2 rho

Spectral derivatives with the k-space correction ``kappa = sinc(c_ref k dt /
2)`` give unconditional dispersion accuracy for homogeneous media; the PML
absorbs at the boundary. This maps cleanly to TPU: each step is FFTs +
elementwise math under ``lax.fori_loop``, all static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pml_profile(n: int, npml: int, alpha_max: float, dt: float):
    """Exponential PML absorption profile along one axis (length n)."""
    x = np.zeros(n)
    if npml > 0:
        ramp = (np.arange(1, npml + 1) / npml) ** 4
        x[:npml] = ramp[::-1]
        x[-npml:] = ramp
    return np.exp(-alpha_max * x * dt / 2)


@partial(jax.jit, static_argnames=("steps", "dt", "dx", "c_ref", "record_rows"))
def kspace_sim_2d(c, rho, src_rows, src_cols, src_sig, *, steps: int,
                  dt: float, dx: float, c_ref: float,
                  record_rows: Tuple[int, ...]):
    """2-D k-space PSTD simulation.

    Args:
      c: sound-speed map (Nz, Nx) [m/s] (PML region included).
      rho: density map (Nz, Nx) [kg/m^3].
      src_rows, src_cols: (Q,) int32 source node indices.
      src_sig: (steps, Q) source waveform (added to pressure) per node.
      steps: number of time steps; dt: time step [s]; dx: isotropic grid
        spacing [m]; c_ref: k-space correction reference speed.
      record_rows: grid rows whose full pressure line is recorded each step
        (row-slices are TPU-friendly; element projection happens on host).

    Returns: recorded pressure (steps, len(record_rows), Nx).
    """
    c = jnp.asarray(c, jnp.float32)
    rho = jnp.asarray(rho, jnp.float32)
    Nz, Nx = c.shape
    kz = np.fft.fftfreq(Nz, dx) * 2 * np.pi  # (Nz,)
    kx = np.fft.fftfreq(Nx, dx) * 2 * np.pi  # (Nx,)
    KZ = jnp.asarray(kz[:, None], jnp.float32)
    KX = jnp.asarray(kx[None, :], jnp.float32)
    # k-space correction kappa = sinc(c_ref |k| dt / 2) (unnormalized sinc)
    Knp = np.sqrt(kz[:, None] ** 2 + kx[None, :] ** 2)
    kappa = jnp.asarray(np.sinc(c_ref * Knp * dt / 2 / np.pi), jnp.float32)
    # staggered-grid phase shifts (+dx/2 forward, -dx/2 backward)
    ez_f = jnp.exp(+1j * KZ * dx / 2)
    ez_b = jnp.exp(-1j * KZ * dx / 2)
    ex_f = jnp.exp(+1j * KX * dx / 2)
    ex_b = jnp.exp(-1j * KX * dx / 2)

    npml = 10
    alpha = 2.0 * c_ref / dx  # strong absorption
    pml_z = jnp.asarray(_pml_profile(Nz, npml, alpha, dt), jnp.float32)[:, None]
    pml_x = jnp.asarray(_pml_profile(Nx, npml, alpha, dt), jnp.float32)[None, :]

    rho0 = rho
    c2 = c * c

    def ddz(f, stag):
        F = jnp.fft.fft(f, axis=0)
        return jnp.real(jnp.fft.ifft(1j * KZ * kappa * stag * F, axis=0))

    def ddx(f, stag):
        F = jnp.fft.fft(f, axis=1)
        return jnp.real(jnp.fft.ifft(1j * KX * kappa * stag * F, axis=1))

    rows = jnp.asarray(np.asarray(record_rows, np.int32))

    def step_fn(i, state):
        uz, ux, rz, rx, rec = state
        p = c2 * (rz + rx)
        # velocity update (staggered forward shift)
        uz = pml_z * (pml_z * uz - dt / rho0 * ddz(p, ez_f))
        ux = pml_x * (pml_x * ux - dt / rho0 * ddx(p, ex_f))
        # density update (staggered backward shift), split per axis for PML
        rz = pml_z * (pml_z * rz - dt * rho0 * ddz(uz, ez_b))
        rx = pml_x * (pml_x * rx - dt * rho0 * ddx(ux, ex_b))
        # additive pressure source: inject as density (p = c^2 rho)
        s = src_sig[i]
        rz = rz.at[src_rows, src_cols].add(s / (2 * c2[src_rows, src_cols]))
        rx = rx.at[src_rows, src_cols].add(s / (2 * c2[src_rows, src_cols]))
        p = c2 * (rz + rx)
        rec = rec.at[i].set(p[rows, :])
        return uz, ux, rz, rx, rec

    z = jnp.zeros((Nz, Nx), jnp.float32)
    rec0 = jnp.zeros((steps, len(record_rows), Nx), jnp.float32)
    _, _, _, _, rec = jax.lax.fori_loop(0, steps, step_fn,
                                        (z, z, z, z, rec0))
    return rec


@partial(jax.jit, static_argnames=("steps", "dt", "dx", "c_ref", "record_rows"))
def kspace_sim_3d(c, rho, src_idx, src_sig, *, steps: int, dt: float,
                  dx: float, c_ref: float, record_rows: Tuple[int, ...]):
    """3-D k-space PSTD simulation (volumetric ``kspaceFirstOrder3D``
    capability, ``UltrasoundSystem.m:2458``).

    Args:
      c, rho: (Nz, Nx, Ny) maps; src_idx: (3, Q) int32 node indices
      (z, x, y); src_sig: (steps, Q); record_rows: z-planes recorded fully.

    Returns: (steps, len(record_rows), Nx, Ny) pressure.
    """
    c = jnp.asarray(c, jnp.float32)
    rho = jnp.asarray(rho, jnp.float32)
    Nz, Nx, Ny = c.shape
    ks = [np.fft.fftfreq(n, dx) * 2 * np.pi for n in (Nz, Nx, Ny)]
    KZ = jnp.asarray(ks[0][:, None, None], jnp.float32)
    KX = jnp.asarray(ks[1][None, :, None], jnp.float32)
    KY = jnp.asarray(ks[2][None, None, :], jnp.float32)
    Knp = np.sqrt(ks[0][:, None, None] ** 2 + ks[1][None, :, None] ** 2
                  + ks[2][None, None, :] ** 2)
    kappa = jnp.asarray(np.sinc(c_ref * Knp * dt / 2 / np.pi), jnp.float32)
    sh = [jnp.exp(s * 1j * K * dx / 2)
          for K in (KZ, KX, KY) for s in (+1, -1)]
    ez_f, ez_b, ex_f, ex_b, ey_f, ey_b = sh

    npml = 8
    alpha = 2.0 * c_ref / dx
    pml = [jnp.asarray(_pml_profile(n, npml, alpha, dt), jnp.float32)
           for n in (Nz, Nx, Ny)]
    pml_z = pml[0][:, None, None]
    pml_x = pml[1][None, :, None]
    pml_y = pml[2][None, None, :]

    rho0 = rho
    c2 = c * c

    def dd(f, K, stag, axis):
        F = jnp.fft.fft(f, axis=axis)
        return jnp.real(jnp.fft.ifft(1j * K * kappa * stag * F, axis=axis))

    rows = jnp.asarray(np.asarray(record_rows, np.int32))
    sz, sx, sy = (jnp.asarray(src_idx[i], jnp.int32) for i in range(3))

    def step_fn(i, state):
        uz, ux, uy, rz, rx_, ry, rec = state
        p = c2 * (rz + rx_ + ry)
        uz = pml_z * (pml_z * uz - dt / rho0 * dd(p, KZ, ez_f, 0))
        ux = pml_x * (pml_x * ux - dt / rho0 * dd(p, KX, ex_f, 1))
        uy = pml_y * (pml_y * uy - dt / rho0 * dd(p, KY, ey_f, 2))
        rz = pml_z * (pml_z * rz - dt * rho0 * dd(uz, KZ, ez_b, 0))
        rx_ = pml_x * (pml_x * rx_ - dt * rho0 * dd(ux, KX, ex_b, 1))
        ry = pml_y * (pml_y * ry - dt * rho0 * dd(uy, KY, ey_b, 2))
        s = src_sig[i] / (3 * c2[sz, sx, sy])
        rz = rz.at[sz, sx, sy].add(s)
        rx_ = rx_.at[sz, sx, sy].add(s)
        ry = ry.at[sz, sx, sy].add(s)
        p = c2 * (rz + rx_ + ry)
        rec = rec.at[i].set(p[rows])
        return uz, ux, uy, rz, rx_, ry, rec

    z = jnp.zeros((Nz, Nx, Ny), jnp.float32)
    rec0 = jnp.zeros((steps, len(record_rows), Nx, Ny), jnp.float32)
    out = jax.lax.fori_loop(0, steps, step_fn, (z, z, z, z, z, z, rec0))
    return out[-1]
