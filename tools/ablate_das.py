"""Op-split profiling of the DAS Pallas kernel's fast arm (solo process).

Usage: python tools/ablate_das.py <ablation|none> [size] [method]
Prints one JSON line: {"ablate": ..., "sums_per_s": ..., "latency_s": ...}.

Ablations delete one piece of the inner loop so its cost is measured by
difference against "none" (see ``qups_tpu.ops.das_pallas._ABLATE``).
Run each in its OWN process: interleaved variants in one process distort
timings on the tunnel (NOTES.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ab = sys.argv[1] if len(sys.argv) > 1 else "none"
    size = sys.argv[2] if len(sys.argv) > 2 else "full"
    reps = int(os.environ.get("QUPS_BENCH_REPS", "3"))

    import jax
    import jax.numpy as jnp
    from qups_tpu.ops import das_pallas
    if ab != "none":
        das_pallas._ABLATE = frozenset(ab.split("+"))

    import bench
    cfg = {
        "small": dict(T=1024, N=64, M=16, n=256),
        "medium": dict(T=2048, N=128, M=64, n=512),
        "full": dict(T=4096, N=256, M=256, n=1024),
    }[size]
    x, pi, pr, pv, nv, t0 = bench.das_problem(**cfg)
    sums = cfg["n"] ** 2 * cfg["N"] * cfg["M"]
    prec = os.environ.get("QUPS_BENCH_PRECISION", "bf16pair")

    method = sys.argv[3] if len(sys.argv) > 3 else "linear"
    f = jax.jit(lambda xx: jnp.sum(jnp.abs(das_pallas.das_tiled(
        xx, pi, pr, pv, nv, t0, 1.0 / 1540.0, fs=31.25e6, tx_model="plane",
        method=method, im_shape=(cfg["n"], cfg["n"], 1), precision=prec))))
    xj = jnp.asarray(x)
    float(jnp.sum(xj[:1, :1, :1]))

    t0c = time.time()
    chk = float(f(xj))
    compile_s = time.time() - t0c
    times = []
    for _ in range(reps):
        t1 = time.time()
        float(f(xj))
        times.append(time.time() - t1)
    dt = min(times)
    print(json.dumps({
        "ablate": ab, "size": size, "method": method,
        "sums_per_s": sums / dt,
        "latency_s": dt, "compile_s": compile_s, "check": chk,
        "precision": prec,
    }), flush=True)


if __name__ == "__main__":
    main()
