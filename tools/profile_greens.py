"""Greens end-to-end: both finish strategies + splat-only, one process,
downloads force completion (block_until_ready can lie on this backend)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import qups_tpu.ops.greens_pallas as gp


def build(S=10000):
    N = M = 128
    K, fs, c0 = 41, 31.25e6, 1540.0
    kern = (np.hanning(K) * np.sin(2 * np.pi * 5e6 * np.arange(K) / fs)
            ).astype(np.float32)
    rng = np.random.default_rng(0)
    pn = np.stack([np.linspace(-19e-3, 19e-3, N), np.zeros(N), np.zeros(N)],
                  -1)[:, None, :].astype(np.float32)
    pv = pn.copy()
    ps = np.stack([rng.uniform(-15e-3, 15e-3, S), np.zeros(S),
                   rng.uniform(15e-3, 45e-3, S)], -1).astype(np.float32)
    amp = np.ones(S, np.float32)
    s0 = 2 * 14e-3 / c0
    T = int(np.ceil((2 * 50e-3 / c0 - s0) * fs))
    kw = dict(T=T, s0=s0, t0k=-K / 2 / fs, fs=fs, cinv=1 / c0, R0=1e-3)
    return kern, ps, amp, pn, pv, kw


def main():
    kern, ps, amp, pn, pv, kw = build()

    def run():
        out = gp.greens_tiled(kern, ps, amp, pn, pv, method="linear", **kw)
        return float(jnp.sum(jnp.abs(out)))  # download forces completion

    for how in ("conv", "fft"):
        os.environ["QUPS_GREENS_FINISH"] = how
        jax.clear_caches()
        t0 = time.time()
        chk = run()
        cs = time.time() - t0
        ts = []
        for _ in range(3):
            t1 = time.time()
            run()
            ts.append(time.time() - t1)
        print(json.dumps({"finish": how, "s": round(min(ts), 4),
                          "compile_s": round(cs, 1), "check": chk}),
              flush=True)


if __name__ == "__main__":
    main()
