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
