"""Sweep (MC, NC) trace-chunk shapes for the DAS kernel at full size."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from bench import das_problem


def main():
    cfg = dict(T=4096, N=256, M=256, n=1024)
    x, pi, pr, pv, nv, t0 = das_problem(**cfg)
    n = cfg["n"]
    sums = n * n * cfg["M"] * cfg["N"]
    xj = jnp.asarray(x)
    float(jnp.sum(xj[:1, :1, :1]))
    variants = sys.argv[1:] or ["8,32", "4,64", "8,64", "4,32", "2,64", "8,16"]
    for v in variants:
        os.environ["QUPS_DAS_CHUNKS"] = v
        jax.clear_caches()
        # re-import path reads env at trace time via _choose_chunks
        from qups_tpu.ops.das_pallas import das_tiled
        f = jax.jit(lambda xx: jnp.sum(jnp.abs(das_tiled(
            xx, pi, pr, pv, nv, t0, 1.0 / 1540.0, fs=31.25e6,
            tx_model="plane", method="linear", im_shape=(n, n, 1),
            precision="bf16pair"))))
        try:
            t0c = time.time()
            chk = float(f(xj))
            cs = time.time() - t0c
            times = []
            for _ in range(3):
                t1 = time.time()
                float(f(xj))
                times.append(time.time() - t1)
            dt = min(times)
            print(json.dumps({"chunks": v, "latency_s": round(dt, 4),
                              "gsums_per_s": round(sums / dt / 1e9, 2),
                              "compile_s": round(cs, 1), "check": chk}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"chunks": v, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
