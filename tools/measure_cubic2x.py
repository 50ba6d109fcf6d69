"""Solo measurement: cubic vs cubic2x vs linear at the headline DAS
config (1024^2 px, 256x256, T=4096, bf16pair) — the VERDICT r4 lever:
linear taps on 2x FFT-upsampled traces should trade the ~0.54 s/frame
4-tap premium for ~10 ms of one-time HBM traffic, at cubic-class
accuracy (tests/test_bf.py::test_cubic2x_cubic_class_accuracy).

Prints one JSON line per method with solo-median latency + checksum, and
a final accuracy line (max |cubic2x - cubic| / max|cubic| on device).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402
from qups_tpu.ops.das_pallas import das_tiled         # noqa: E402

dev = jax.devices()[0]
interp = dev.platform == "cpu"
n = 256 if interp else 1024
T, N, M = (512, 16, 8) if interp else (4096, 256, 256)
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
prec = "f32" if interp else "bf16pair"
sums = n * n * N * M
reps = int(os.environ.get("QUPS_BENCH_REPS", "3"))

xj = jax.block_until_ready(jnp.asarray(x))
print(json.dumps({"phase": "uploaded", "GB": x.nbytes / 1e9}), flush=True)


def make(m):
    return jax.jit(lambda xx: jnp.sum(jnp.abs(das_tiled(
        xx, pi, pr, pv, nv, t0, np.float32(1 / 1540.0), fs=31.25e6,
        tx_model="plane", method=m, im_shape=(n, n, 1),
        precision=prec, interpret=interp))))


results = {}
for m in ("cubic", "cubic2x", "linear"):
    f = make(m)
    t0c = time.time()
    chk = float(f(xj))
    comp = time.time() - t0c
    times = []
    for _ in range(reps):
        t1 = time.time()
        float(f(xj))
        times.append(time.time() - t1)
    dt = float(np.median(times))
    results[m] = dt
    print(json.dumps({"method": m, "s_per_frame": dt,
                      "sums_per_s": sums / dt, "compile_s": comp,
                      "times": times, "check": chk, "precision": prec}),
          flush=True)

# on-device accuracy: cubic2x vs cubic image delta
img = {m: jax.jit(lambda xx, mm=m: das_tiled(
    xx, pi, pr, pv, nv, t0, np.float32(1 / 1540.0), fs=31.25e6,
    tx_model="plane", method=mm, im_shape=(n, n, 1), precision=prec,
    interpret=interp))(xj) for m in ("cubic", "cubic2x")}
num, den = jax.jit(lambda a, b: (jnp.abs(a - b).max(), jnp.abs(b).max()))(
    img["cubic2x"], img["cubic"])
print(json.dumps({"accuracy": "cubic2x_vs_cubic_maxrel",
                  "value": float(num) / float(den),
                  "speedup_vs_cubic": results["cubic"] / results["cubic2x"],
                  "premium_vs_linear":
                      results["cubic2x"] / results["linear"]}))
