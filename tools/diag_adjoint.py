"""Diagnose the bfAdjoint slowdown: time each per-bin sub-op of
``bf_adjoint`` at the headline config (I=1024^2, N=M=V=256) in isolation.

Usage: python tools/diag_adjoint.py [nbins]
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from qups_tpu.utils.cpx import cexp, czeros  # noqa: E402

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
I, N, M, V, T = 1024 * 1024, 256, 256, 256, 4096
rng = np.random.default_rng(0)
tau_rx = jnp.asarray(rng.uniform(0, 3e-5, (I, N)).astype(np.float32))
tau_tx = jnp.asarray(rng.uniform(0, 3e-5, (I, M)).astype(np.float32))
del_tx = jnp.asarray(rng.uniform(0, 1e-6, (M, V)).astype(np.float32))
apod = jnp.asarray(rng.standard_normal((M, V)).astype(np.float32))
Xf_ri = jnp.asarray(rng.standard_normal((N, V, 2)).astype(np.float32))
fb = jnp.asarray(np.arange(100, 100 + NB, dtype=np.int32))
fs, df = 31.25e6, 31.25e6 / T


def tm(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(*args)
    jax.block_until_ready(r)
    dt = time.time() - t0
    print(json.dumps({"op": name, "s": dt, "s_per_bin": dt / NB}),
          flush=True)
    return r


def scan_wrap(body):
    def run(*args):
        def step(acc, k):
            return acc + body(k.astype(jnp.float32) * df, *args), None
        out, _ = jax.lax.scan(step, czeros((I,)), fb)
        return out
    return run


# 1. phasor exp only
tm("cexp_Wtx", scan_wrap(
    lambda fk, tt: jnp.sum(cexp(-2 * np.pi * fk * tt), axis=1)), tau_tx)

# 2. tx steering GEMM: (I,M)@(M,V)
tm("Wtx_gemm", scan_wrap(
    lambda fk, tt, dl, ap: jnp.sum(
        cexp(-2 * np.pi * fk * tt) @ (ap * cexp(2 * np.pi * fk * dl)
                                      ).astype(jnp.complex64), axis=1)),
   tau_tx, del_tx, apod)

# 3. rx adjoint GEMM: (I,N)@(N,V)
Xf = jax.jit(lambda r: jax.lax.complex(r[..., 0], r[..., 1]))(Xf_ri)
tm("Wrx_gemm", scan_wrap(
    lambda fk, tr, xf: jnp.sum(
        cexp(2 * np.pi * fk * tr) @ xf, axis=1)), tau_rx, Xf)

# 4. full per-bin body (no FFT/prep)
def body(fk, tr, tt, dl, ap, xf):
    Wtx = cexp(-2 * np.pi * fk * tt)
    S = ap * cexp(2 * np.pi * fk * dl)
    A = Wtx @ S.astype(jnp.complex64)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(A) ** 2, axis=1, keepdims=True))
    Ah = A / jnp.where(nrm == 0, 1.0, nrm)
    Wrx = cexp(2 * np.pi * fk * tr)
    return jnp.sum((Wrx @ xf) * jnp.conj(Ah), axis=1)


tm("full_body", scan_wrap(body), tau_rx, tau_tx, del_tx, apod, Xf)


# ---- round-4 experiments: bf16 ri-split GEMMs + phasor recurrence ----
def cmm_bf16(ar, ai, br, bi):
    """Complex GEMM as 4 real bf16 MXU dots with f32 accumulation."""
    f32 = jnp.float32
    b16 = jnp.bfloat16
    ar, ai, br, bi = (v.astype(b16) for v in (ar, ai, br, bi))
    cr = (jnp.dot(ar, br, preferred_element_type=f32)
          - jnp.dot(ai, bi, preferred_element_type=f32))
    ci = (jnp.dot(ar, bi, preferred_element_type=f32)
          + jnp.dot(ai, br, preferred_element_type=f32))
    return cr, ci


def body_bf16(fk, tr, tt, dl, ap, xf):
    th_t = -2 * np.pi * fk * tt
    wtr, wti = jnp.cos(th_t), jnp.sin(th_t)
    th_s = 2 * np.pi * fk * dl
    sr, si = ap * jnp.cos(th_s), ap * jnp.sin(th_s)
    a_r, a_i = cmm_bf16(wtr, wti, sr, si)
    nrm = jnp.sqrt(jnp.sum(a_r * a_r + a_i * a_i, axis=1, keepdims=True))
    nrm = jnp.where(nrm == 0, 1.0, nrm)
    ahr, ahi = a_r / nrm, a_i / nrm
    th_r = 2 * np.pi * fk * tr
    wrr, wri = jnp.cos(th_r), jnp.sin(th_r)
    yr, yi = cmm_bf16(wrr, wri, jnp.real(xf), jnp.imag(xf))
    # sum_v (y * conj(Ah))
    br = jnp.sum(yr * ahr + yi * ahi, axis=1)
    bi = jnp.sum(yi * ahr - yr * ahi, axis=1)
    return jax.lax.complex(br, bi)


tm("full_body_bf16", scan_wrap(body_bf16),
   tau_rx, tau_tx, del_tx, apod, Xf)


def run_recur(tr, tt, dl, ap, xf):
    """Contiguous-bin recurrence: W_{k+1} = W_k * G, no per-bin exp."""
    f0 = fb[0].astype(jnp.float32) * df
    wt0 = cexp(-2 * np.pi * f0 * tt)
    wr0 = cexp(2 * np.pi * f0 * tr)
    gt = cexp(-2 * np.pi * df * tt)
    gr = cexp(2 * np.pi * df * tr)

    def step(carry, k):
        wt, wr = carry
        fk = k.astype(jnp.float32) * df
        S = ap * cexp(2 * np.pi * fk * dl)
        A = wt @ S.astype(jnp.complex64)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(A) ** 2, axis=1, keepdims=True))
        Ah = A / jnp.where(nrm == 0, 1.0, nrm)
        y = jnp.sum((wr @ xf) * jnp.conj(Ah), axis=1)
        return (wt * gt, wr * gr), y

    (_, _), ys = jax.lax.scan(step, (wt0, wr0), fb)
    return jnp.sum(ys, axis=0)


tm("full_body_recur", run_recur, tau_rx, tau_tx, del_tx, apod, Xf)

# parity of bf16 vs f32 on the accumulated image
f = jax.jit(scan_wrap(body))
r0 = f(tau_rx, tau_tx, del_tx, apod, Xf)
f1 = jax.jit(scan_wrap(body_bf16))
r1 = f1(tau_rx, tau_tx, del_tx, apod, Xf)
num = jax.jit(lambda a, b: (jnp.linalg.norm(a - b), jnp.linalg.norm(a)))
d, n0 = num(r0, r1)
print(json.dumps({"op": "bf16_rel_err", "rel": float(d / n0)}), flush=True)
