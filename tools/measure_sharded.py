"""Single-chip degenerate measurements of the SHARDED compositions.

Usage:  python tools/measure_sharded.py [lut|adjoint]

'lut'     — das_lut_sharded_pallas on a 1-device mesh at the full
            1024^2 x 256x256 config (linear, bf16pair, summed output).
            The sharded LUT path carries per-shard lut_tiles packed
            bounds; single-chip it should match the plain das_lut_tiled
            lut_tiles rate (0.717 s / 9.6e10 sums/s, NOTES.md).
'adjoint' — bf_adjoint_sharded on a 1-device mesh at the adjoint
            headline config (1024^2 px, 256x256, 64 bins, bf16);
            the plain fused engine measured 0.58 s kernel (NOTES.md).

Solo-process timings only (NOTES.md). Tables upload once (plan cache +
device-resident arrays); the first call pays upload + compile.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from qups_tpu.parallel import make_mesh  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "lut"
dev = jax.devices()[0]
interp = dev.platform == "cpu"
n = 1024 if not interp else 64
T, N, M = (4096, 256, 256) if not interp else (512, 16, 8)
c0 = 1540.0
rng = np.random.default_rng(0)

xs = np.linspace(-12e-3, 12e-3, n)
zs = np.linspace(5e-3, 45e-3, n)
Z, X = np.meshgrid(zs, xs, indexing="ij")
pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()], -1).astype(np.float32)
pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
              -1).astype(np.float32)
th = np.radians(np.linspace(-9, 9, M))
nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
tau_rx = (np.linalg.norm(pi[:, None, :] - pr[None], axis=-1)
          / c0).astype(np.float32)
tau_tx = (pi @ nv.T / c0 + 2 * 5e-3 / c0).astype(np.float32)
x = rng.standard_normal((T, N, M)).astype(np.float32)

print(json.dumps({"phase": "start", "mode": mode, "device": str(dev),
                  "shapes": [T, N, M, n]}), flush=True)
mesh = make_mesh([dev], axes=("rx", "tx"))
t_up = time.time()
xj = jnp.asarray(x)  # device-resident ONCE (tunnel re-upload trap)
taur_j = jnp.asarray(tau_rx)
taut_j = jnp.asarray(tau_tx)
jax.block_until_ready((xj, taur_j, taut_j))
print(json.dumps({"phase": "uploaded", "s": time.time() - t_up,
                  "GB": (x.nbytes + tau_rx.nbytes + tau_tx.nbytes) / 1e9}),
      flush=True)

if mode == "lut":
    # Plan ONCE outside the timed loop (table tiling + upload happen
    # here); time apply(x) only — the eager wrapper's content key would
    # otherwise put table hashing inside the loop on a cold memo.
    from qups_tpu.parallel import das_lut_sharded_pallas_plan

    t_pl = time.time()
    apply_lut = das_lut_sharded_pallas_plan(
        mesh, taur_j, taut_j, np.zeros(M, np.float32),
        fs=31.25e6, T=T, N=N, M=M, im_shape=(n, n, 1), method="linear",
        interpret=interp, precision="bf16pair" if not interp else "f32")
    print(json.dumps({"phase": "planned", "s": time.time() - t_pl}),
          flush=True)

    def run():
        return float(jnp.sum(apply_lut(xj)))
    work = n * n * N * M
    unit = "sums_per_s"
elif mode == "adjoint":
    from qups_tpu.parallel import bf_adjoint_sharded

    K = 64 if not interp else 8
    kf0 = T // 8
    fbins = np.arange(kf0, kf0 + K, dtype=np.int32)
    del_tx = np.zeros((M, M), np.float32)
    apod_tx = np.eye(M, dtype=np.float32)
    t0v = np.full(M, 2 * 5e-3 / c0, np.float32)

    def run():
        b = bf_adjoint_sharded(
            mesh, xj, taur_j, taut_j, del_tx, apod_tx, t0v,
            np.zeros(M, np.float32), fbins, fs=31.25e6,
            precision="bf16" if not interp else "f32", interpret=interp)
        return float(jnp.sum(jnp.abs(b)))
    work = n * n * len(fbins)
    unit = "pixbins_per_s"
elif mode == "refocus":
    # bin-sharded operator + rx-sharded decode at the refocus headline
    # (T=4096, 256 rx, 256 tx); the unsharded cached decode measured
    # 5.7 s first / 0.19 s repeated (NOTES r4)
    from qups_tpu.parallel import refocus_op_sharded, refocus_sharded

    # V=128: the 1-device degenerate must hold Hi (K, M, V) c64 TWICE
    # (the resident copy + the program's gathered copy) next to the
    # (T, N, V) spectra — V=256 OOMs a single v5e, which is exactly the
    # memory pressure the multi-chip sharding splits (per-chip X shrinks
    # with the rx shard). The unsharded cached decode fits at V=256
    # because nothing crosses a shard_map boundary.
    Vr = min(M, 128) if not interp else M
    taur = rng.uniform(0, 1e-6, (N, Vr)).astype(np.float32)
    apdr = np.ones((N, Vr), np.float32)
    t_op = time.time()
    Hi = refocus_op_sharded(mesh, taur, apdr, T=T, fs=31.25e6)  # (T,N,Vr)
    Hi.block_until_ready()
    print(json.dumps({"phase": "op_built", "s": time.time() - t_op}),
          flush=True)

    # ONE jitted program (pad + shard_map decode + reduce): the eager
    # composition's boundary copies of four (T, N, V) complex tensors
    # exceed HBM at this scale; under jit XLA frees buffers between
    # stages (same reason the unsharded cached decode fits)
    xv = jax.block_until_ready(jnp.asarray(x[:, :, :Vr]))

    @jax.jit
    def _dec(xx, hi):
        y, _ = refocus_sharded(mesh, xx, taur, apdr,
                               np.zeros(Vr, np.float32), fs=31.25e6,
                               Hi=hi)
        return jnp.sum(jnp.abs(jnp.real(y)))

    def run():
        return float(_dec(xv, Hi))
    work = T * N * Vr
    unit = "samples_per_s"
elif mode == "migration":
    # PW-realistic angle count (16, the benches.py headline) and ONE
    # jitted program per rep — an eager M=256 run measured 58.8 s/frame
    # of pure retrace+remap overhead (not a kernel property)
    from qups_tpu.parallel import migration_sharded

    Mm = 16 if not interp else M
    xm = jax.block_until_ready(jnp.asarray(x[:, :, :Mm]))
    th_m = tuple(np.degrees(th)[:Mm])
    del_m = np.zeros((N, Mm), np.float32)

    @jax.jit
    def _mig(xx):
        b = migration_sharded(mesh, xx, np.zeros(Mm, np.float32), del_m,
                              th_m, fs=31.25e6, c0=1540.0,
                              pitch=24e-3 / N, out="ri")
        return jnp.sum(jnp.abs(b))

    def run():
        return float(_mig(xm))
    work = T * N * Mm
    unit = "pix_tx_per_s"
else:
    raise SystemExit(f"unknown mode {mode!r}")

t0c = time.time()
chk = run()
compile_s = time.time() - t0c
print(json.dumps({"phase": "compiled+first-run", "s": compile_s}),
      flush=True)
times = []
for _ in range(2):
    t1 = time.time()
    run()
    times.append(time.time() - t1)
dt = min(times)
print(json.dumps({
    "bench": "sharded_1dev", "mode": mode, "s_per_frame": dt,
    unit: work / dt, "compile_s": compile_s, "check": chk,
    "device": str(dev)}))
