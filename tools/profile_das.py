"""Op-split profiling for the Pallas DAS kernel (perf forensics).

Runs the full-size benchmark config once per ablation knob (see
``qups_tpu.ops.das_pallas._ABLATE``) in ONE process so the one-time
remote kernel build is paid once; prints one JSON line per variant.

Usage:  python tools/profile_das.py [small|medium|full] [ablation ...]
        (default: full; baseline + nomask + nogather + noweights + noloop)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qups_tpu.ops import das_pallas  # noqa: E402
sys.path.insert(0, "/root/repo")
from bench import das_problem  # noqa: E402


def main():
    args = [a for a in sys.argv[1:]]
    size = "full"
    if args and args[0] in ("small", "medium", "full"):
        size = args.pop(0)
    variants = args or ["baseline", "nomask", "nogather", "noweights",
                        "noloop"]
    cfg = {
        "small": dict(T=1024, N=64, M=16, n=256),
        "medium": dict(T=2048, N=128, M=64, n=512),
        "full": dict(T=4096, N=256, M=256, n=1024),
    }[size]
    x, pi, pr, pv, nv, t0 = das_problem(**cfg)
    n = cfg["n"]
    sums = n * n * cfg["M"] * cfg["N"]
    xj = jnp.asarray(x)
    float(jnp.sum(xj[:1, :1, :1]))  # finish upload

    prec = "bf16pair" if jax.devices()[0].platform != "cpu" else "f32"
    for var in variants:
        das_pallas._ABLATE = frozenset(() if var == "baseline"
                                       else var.split("+"))
        jax.clear_caches()
        f = jax.jit(lambda xx: jnp.sum(jnp.abs(das_pallas.das_tiled(
            xx, pi, pr, pv, nv, t0, 1.0 / 1540.0, fs=31.25e6,
            tx_model="plane", method="linear", im_shape=(n, n, 1),
            precision=prec))))
        t0c = time.time()
        chk = float(f(xj))
        compile_s = time.time() - t0c
        times = []
        for _ in range(3):
            t1 = time.time()
            float(f(xj))
            times.append(time.time() - t1)
        dt = min(times)
        print(json.dumps({
            "variant": var, "latency_s": round(dt, 4),
            "sums_per_s": round(sums / dt / 1e9, 2),
            "compile_s": round(compile_s, 1), "check": chk,
            "precision": prec,
        }), flush=True)


if __name__ == "__main__":
    main()
