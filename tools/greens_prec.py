"""Solo-process greens_freq timing: python tools/greens_prec.py <S> <precision>.

Prints one JSON line {"S":..., "precision":..., "warm_s":..., "us_per_scat":...}.
128 rx x 128 tx elements, 4096-sample traces — the greens_dev_benchmark
geometry (ParTest.m:272-284 analog). Run solo: interleaved impls in one
process distort tunnel timings (NOTES.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    S = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10000
    precision = sys.argv[2] if len(sys.argv) > 2 else "highest"
    reps = int(os.environ.get("QUPS_BENCH_REPS", "3"))

    import jax.numpy as jnp
    from qups_tpu.ops.greens_freq import greens_freq

    rng = np.random.default_rng(0)
    N = M = 128
    T = 4096
    fs, c0 = 31.25e6, 1540.0
    fc = 6e6
    t = np.arange(64) / fs
    kern = (np.sin(2 * np.pi * fc * t) * np.hanning(64)).astype(np.float32)
    ps = np.stack([rng.uniform(-15e-3, 15e-3, S), np.zeros(S),
                   rng.uniform(10e-3, 40e-3, S)], -1).astype(np.float32)
    amp = rng.standard_normal(S).astype(np.float32)
    pn = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
                  -1).astype(np.float32)[:, None, :]
    pv = np.stack([np.linspace(-12e-3, 12e-3, M), np.zeros(M), np.zeros(M)],
                  -1).astype(np.float32)[:, None, :]
    kw = dict(T=T, s0=0.0, t0k=0.0, fs=fs, cinv=1 / c0, R0=1e-4,
              precision=precision)

    def run():
        return float(jnp.sum(jnp.abs(greens_freq(kern, ps, amp, pn, pv,
                                                 **kw))))

    t0 = time.time()
    chk = run()
    cold = time.time() - t0
    times = []
    for _ in range(reps):
        t1 = time.time()
        run()
        times.append(time.time() - t1)
    dt = min(times)
    print(json.dumps({
        "S": S, "precision": precision, "warm_s": dt, "cold_s": cold,
        "us_per_scat": dt / S * 1e6, "check": chk,
    }), flush=True)


if __name__ == "__main__":
    main()
