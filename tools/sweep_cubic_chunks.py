"""Full-config CUBIC chunk sweep: QUPS_DAS_CHUNKS on the summed geometry
kernel (the r3 (4,16) optimum was measured on LINEAR; cubic's denser
gather/weight schedule may prefer a different working set).

Usage: python tools/sweep_cubic_chunks.py MC,NC
"""
import json
import os
import sys
import time

chunks = sys.argv[1] if len(sys.argv) > 1 else ""
if chunks:
    os.environ["QUPS_DAS_CHUNKS"] = chunks

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from qups_tpu.ops.das_pallas import das_tiled  # noqa: E402

T, N, M, n = 4096, 256, 256, 1024
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, N, M)).astype(np.float32))
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


def run():
    b = das_tiled(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=31.25e6,
                  tx_model="plane", im_shape=(n, n, 1), method="cubic",
                  precision="bf16pair")
    return float(jnp.sum(jnp.abs(b)))


t0c = time.time()
chk = run()
compile_s = time.time() - t0c
times = []
for _ in range(2):
    t1 = time.time()
    run()
    times.append(time.time() - t1)
dt = min(times)
print(json.dumps({"bench": "cubic_chunks", "chunks": chunks or "default",
                  "s_per_frame": dt, "sums_per_s": n * n * N * M / dt,
                  "compile_s": compile_s, "check": chk}))
