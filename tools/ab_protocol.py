"""Repeated-solo-median A/B protocol for kernel-default decisions.

The TPU tunnel shows a ±3% run-to-run band and interleaved processes
distort timings (NOTES.md "greens sweep NOTE"); two compiled-default
flips happened in rounds 3/4 on single-session A/Bs inside that band.
This harness is the required protocol before ANY future default change
(the reference keeps an analogous per-machine benchmark-log discipline,
``test/ParTest.m:243-318``):

* each ARM runs in its own SOLO subprocess (fresh process, nothing else
  on the chip), ``--reps`` timed reps after a warmup, reporting the
  rep MEDIAN;
* ``--sessions`` (default 3) such subprocess pairs run sequentially with
  the arm order alternating A,B / B,A / A,B ... to decorrelate slow
  tunnel drift;
* the parent decides from the per-arm MEDIAN-OF-MEDIANS: a flip is
  recommended only when the relative margin exceeds ``--band``
  (default 0.05 — comfortably above the observed ±3% band); otherwise
  the verdict is "no-decision: keep current default".

Experiments:
  streamrx — kept-axis accumulation: aliased (QUPS_DAS_STREAMRX=0,
             current compiled default) vs streaming (=1), on the full
             1024^2 x 256x256 keep_rx DAS config.
  acc16    — kept-axis accumulator dtype: f32 (QUPS_DAS_ACC16=0,
             default) vs bf16 (=1), same workload. The r4 number was
             contaminated by a concurrent dryrun (VERDICT r4 weak #3).

Usage:
  python tools/ab_protocol.py streamrx [--sessions 3] [--reps 3]
                                       [--band 0.05] [--size full|small]
  (child invocation, internal): --child ARMJSON
"""
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPERIMENTS = {
    "streamrx": {
        "arms": {"aliased": {"QUPS_DAS_STREAMRX": "0"},
                 "streaming": {"QUPS_DAS_STREAMRX": "1"}},
        "current_default": "aliased",
        "workload": "keeprx_das",
    },
    "acc16": {
        "arms": {"f32acc": {"QUPS_DAS_ACC16": "0"},
                 "bf16acc": {"QUPS_DAS_ACC16": "1"}},
        "current_default": "f32acc",
        "workload": "keeprx_das",
    },
}


def _child(arm_env: dict, workload: str, reps: int, size: str):
    """Run the workload solo in THIS process; print one JSON line."""
    os.environ.update(arm_env)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from qups_tpu.ops.das_pallas import das_tiled

    dev = jax.devices()[0]
    interp = dev.platform == "cpu"
    small = size == "small" or interp
    n = 256 if small else 1024
    T, N, M = (1024, 64, 64) if small else (4096, 256, 256)
    rng = np.random.default_rng(0)
    xs = np.linspace(-12e-3, 12e-3, n)
    zs = np.linspace(5e-3, 45e-3, n)
    Z, X = np.meshgrid(zs, xs, indexing="ij")
    pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()],
                  -1).astype(np.float32)
    pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N),
                   np.zeros(N)], -1).astype(np.float32)
    th = np.radians(np.linspace(-9, 9, M))
    nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)],
                  -1).astype(np.float32)
    pv = np.zeros((M, 3), np.float32)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    xj = jax.block_until_ready(jnp.asarray(x))

    def run():
        b = das_tiled(xj, pi, pr, pv, nv, np.zeros(M, np.float32),
                      np.float32(1 / 1540.0), fs=31.25e6,
                      tx_model="plane", method="linear",
                      im_shape=(n, n, 1), keep_rx=True, out="ri",
                      precision="f32" if interp else "bf16pair",
                      interpret=interp)
        return float(jnp.sum(jnp.asarray(b, jnp.float32)))

    t0 = time.time()
    chk = run()  # compile + warmup
    warm_s = time.time() - t0
    times = []
    for _ in range(reps):
        t1 = time.time()
        run()
        times.append(time.time() - t1)
    print(json.dumps({"median_s": statistics.median(times),
                      "times": times, "warm_s": warm_s, "check": chk}))


def main():
    if "--child" in sys.argv:
        spec = json.loads(sys.argv[sys.argv.index("--child") + 1])
        _child(spec["env"], spec["workload"], spec["reps"], spec["size"])
        return
    exp_name = sys.argv[1]
    exp = EXPERIMENTS[exp_name]

    def opt(flag, default, cast):
        return cast(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    sessions = opt("--sessions", 3, int)
    reps = opt("--reps", 3, int)
    band = opt("--band", 0.05, float)
    size = opt("--size", "full", str)

    arms = list(exp["arms"].items())
    medians = {name: [] for name, _ in arms}
    for s in range(sessions):
        order = arms if s % 2 == 0 else arms[::-1]  # A,B / B,A / ...
        for name, env in order:
            spec = json.dumps({"env": env, "workload": exp["workload"],
                               "reps": reps, "size": size})
            r = None
            for attempt in range(2):  # tunnel flakes: one retry per child
                try:
                    out = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--child", spec],
                        capture_output=True, text=True, cwd=REPO,
                        timeout=900)
                    lines = [ln for ln in out.stdout.splitlines()
                             if ln.startswith("{")]
                    if lines:
                        r = json.loads(lines[-1])
                        break
                except subprocess.TimeoutExpired:
                    pass
                print(json.dumps({"session": s, "arm": name,
                                  "attempt": attempt, "error": "no result"}),
                      flush=True)
            if r is None:
                continue
            medians[name].append(r["median_s"])
            print(json.dumps({"session": s, "arm": name, **r}),
                  flush=True)

    mom = {name: statistics.median(v) for name, v in medians.items() if v}
    if len(mom) < 2:
        print(json.dumps({"experiment": exp_name,
                          "median_of_medians": mom,
                          "verdict": "INCOMPLETE: an arm produced no "
                                     "successful sessions — no decision"}))
        return
    (a, ta), (b, tb) = sorted(mom.items(), key=lambda kv: kv[1])
    margin = (tb - ta) / ta
    cur = exp["current_default"]
    if margin <= band:
        verdict = f"no-decision (margin {margin:.1%} <= band): keep {cur}"
    elif a == cur:
        verdict = f"confirmed: keep {cur} ({margin:.1%} faster)"
    else:
        verdict = f"FLIP to {a} ({margin:.1%} faster than {cur})"
    print(json.dumps({"experiment": exp_name, "median_of_medians": mom,
                      "sessions": sessions, "reps": reps, "band": band,
                      "margin": margin, "verdict": verdict}))


if __name__ == "__main__":
    main()
