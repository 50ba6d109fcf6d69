"""Full-config keep_rx (coherence) measurement — ONE mode per process.

Usage:  python tools/measure_keeprx.py [stream|alias|acc16|mesh] [geom|lut]

Runs the 1024^2 x 256x256 keep_rx DAS (bf16pair, linear) + cohfac
reduction, warm-timed, and prints one JSON line. 'alias' sets
QUPS_DAS_STREAMRX=0 (the pre-streaming aliased-HBM accumulator) for the
A/B; 'mesh' runs the IN-MESH reduction (das_sharded_pallas_plan with
post='cohfac' on a 1-device mesh — the single-chip degenerate of the
multi-chip coherence path, in-kernel rx-band reduction + psum
composition included). Run each mode in its OWN process (solo timings
only — NOTES.md).
"""
import json
import os
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
kernel = sys.argv[2] if len(sys.argv) > 2 else "geom"
if mode == "alias":
    os.environ["QUPS_DAS_STREAMRX"] = "0"
elif mode == "acc16":  # aliased + bf16 kept-axis accumulator
    os.environ["QUPS_DAS_STREAMRX"] = "0"
    os.environ["QUPS_DAS_ACC16"] = "1"
elif mode == "stream":
    os.environ["QUPS_DAS_STREAMRX"] = "1"

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from qups_tpu.ops.coherence import cohfac  # noqa: E402
from qups_tpu.ops.das_pallas import das_tiled, das_lut_tiled  # noqa: E402

T, N, M, n = 4096, 256, 256, 1024
rng = np.random.default_rng(0)
x = rng.standard_normal((T, N, M)).astype(np.float32)
xs = np.linspace(-12e-3, 12e-3, n)
zs = np.linspace(5e-3, 45e-3, n)
Z, X = np.meshgrid(zs, xs, indexing="ij")
pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()], -1).astype(np.float32)
pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
              -1).astype(np.float32)
th = np.radians(np.linspace(-9, 9, M))
pv = np.zeros((M, 3), np.float32)
nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
t0 = np.full(M, 2 * 5e-3 / 1540.0, np.float32)
dev = jax.devices()[0]
interp = dev.platform == "cpu"
prec = "bf16pair" if not interp else "f32"

# device-resident ONCE: a numpy trace array would re-upload 1 GB per rep
# through the tunnel (measured 126 s/GB in degraded transport mode) and
# swamp the kernel time entirely
x = jnp.asarray(x)

if mode == "mesh":
    if kernel != "geom":
        raise SystemExit("mesh mode measures the geometry kernel "
                         "(das_sharded_pallas_plan post='cohfac')")
    from qups_tpu.parallel import make_mesh
    from qups_tpu.parallel.mesh import das_sharded_pallas_plan

    mesh = make_mesh([dev], axes=("rx", "tx"))
    apply = das_sharded_pallas_plan(
        mesh, pi, pr, pv, nv, t0, 1 / 1540.0, fs=31.25e6, T=T, N=N, M=M,
        tx_model="plane", im_shape=(n, n, 1), interpret=interp,
        precision=prec, post="cohfac")

    def run():
        return float(jnp.sum(apply(x)))
elif kernel == "lut":
    c0 = 1540.0
    tau_rx = (np.linalg.norm(pi[:, None, :] - pr[None], axis=-1)
              / c0).astype(np.float32)
    tau_tx = (pi @ nv.T / c0 + 2 * 5e-3 / c0).astype(np.float32)

    def run():
        brx = das_lut_tiled(x, tau_rx, tau_tx, np.zeros(M, np.float32),
                            fs=31.25e6, im_shape=(n, n, 1), keep_rx=True,
                            interpret=interp, precision=prec)
        return float(jnp.sum(cohfac(brx[..., 0], axis=1)))
else:
    def run():
        brx = das_tiled(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=31.25e6,
                        tx_model="plane", im_shape=(n, n, 1), keep_rx=True,
                        interpret=interp, precision=prec)
        return float(jnp.sum(cohfac(brx[..., 0], axis=1)))

print(json.dumps({"phase": "start", "mode": mode, "kernel": kernel,
                  "device": str(dev)}), flush=True)
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
    "bench": "keeprx_ab", "mode": mode, "kernel": kernel,
    "s_per_frame": dt, "sums_per_s": n * n * N * M / dt,
    "compile_s": compile_s, "check": chk, "device": str(dev),
    "precision": prec}))
