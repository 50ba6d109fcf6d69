"""Sync-timed (result downloaded per rep) A/B of the fused adjoint."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from qups_tpu.ops.fdbf import bf_adjoint
from qups_tpu.ops.fdbf_pallas import bf_adjoint_tiled

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
I, N, M, V, T = 1024 * 1024, 256, 256, 256, 4096
fs = 31.25e6
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, N, V)).astype(np.float32))
tau_rx = jnp.asarray(rng.uniform(0, 3e-5, (I, N)).astype(np.float32))
tau_tx = jnp.asarray(rng.uniform(0, 3e-5, (I, M)).astype(np.float32))
del_tx = jnp.asarray(rng.uniform(0, 1e-6, (M, V)).astype(np.float32))
apod = jnp.asarray(rng.standard_normal((M, V)).astype(np.float32))
k0 = int(round(5e6 / fs * T))
bins = np.arange(k0 - NB // 2, k0 + NB - NB // 2, dtype=np.int32)
jax.block_until_ready((x, tau_rx, tau_tx))

norm = jax.jit(lambda r: jnp.linalg.norm(jnp.abs(r)))
def run(name, fn, reps=3):
    try:
        chk = float(norm(fn()))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            c = float(norm(fn()))  # download forces completion
            ts.append(time.time() - t0)
        print(json.dumps({"arm": name, "s_median": sorted(ts)[len(ts)//2],
                          "s_all": ts, "check": chk}), flush=True)
    except Exception as e:
        print(json.dumps({"arm": name, "error": str(e)[:400]}), flush=True)

args = (x, tau_rx, tau_tx, del_tx, apod, 0.0, np.zeros(V, np.float32), bins)
for a in (sys.argv[2:] or ["pallas_bf16", "pallas_f32", "xla"]):
    if a == "xla":
        run("xla_f32", lambda: bf_adjoint(*args, fs=fs))
    elif a == "pallas_bf16":
        run("pallas_bf16", lambda: bf_adjoint_tiled(*args, fs=fs, precision="bf16"))
    elif a == "pallas_f32":
        run("pallas_f32", lambda: bf_adjoint_tiled(*args, fs=fs, precision="f32"))
    elif a.startswith("bi"):
        bi = int(a[2:])
        run(f"pallas_bf16_BI{bi}", lambda: bf_adjoint_tiled(*args, fs=fs, precision="bf16", BI=bi))
