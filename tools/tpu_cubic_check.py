"""TPU check: cubic/all-method Pallas DAS at the bench config — parity
(medium) + throughput (full)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from qups_tpu.ops.das_pallas import das_tiled
from bench import das_problem

print("devices:", jax.devices(), flush=True)

# --- parity at small config on hardware ---
cfg = dict(T=1024, N=64, M=16, n=256)
x, pi, pr, pv, nv, t0 = das_problem(**cfg)
from qups_tpu.ops.das import das
ref = np.asarray(das(x, pi, pr, pv, nv, t0, 1/1540.0, fs=31.25e6,
                     tx_model="plane", method="cubic",
                     im_shape=(cfg["n"], cfg["n"], 1)))
for prec in ("f32", "bf16pair"):
    got = np.asarray(das_tiled(x, pi, pr, pv, nv, t0, 1/1540.0, fs=31.25e6,
                               tx_model="plane", method="cubic",
                               im_shape=(cfg["n"], cfg["n"], 1),
                               out="ri", precision=prec))[..., 0]
    err = np.abs(got.ravel() - ref.real.ravel()).max() / np.abs(ref.real).max()
    print(f"cubic parity on TPU ({prec}): rel={err:.3e}", flush=True)

# --- throughput at full config ---
cfg = dict(T=4096, N=256, M=256, n=1024)
x, pi, pr, pv, nv, t0 = das_problem(**cfg)
n = cfg["n"]; sums = n*n*cfg["M"]*cfg["N"]
xj = jnp.asarray(x); float(jnp.sum(xj[:1,:1,:1]))
for method in ("linear", "cubic"):
    f = jax.jit(lambda xx, m=method: jnp.sum(jnp.abs(das_tiled(
        xx, pi, pr, pv, nv, t0, 1.0/1540.0, fs=31.25e6, tx_model="plane",
        method=m, im_shape=(n, n, 1), precision="bf16pair"))))
    t0c = time.time(); chk = float(f(xj)); comp = time.time() - t0c
    ts = []
    for _ in range(3):
        t1 = time.time(); float(f(xj)); ts.append(time.time() - t1)
    dt = min(ts)
    print(json.dumps({"method": method, "latency_s": dt,
                      "sums_per_s": sums/dt, "compile_s": comp,
                      "check": chk}), flush=True)
