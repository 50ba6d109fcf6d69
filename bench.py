"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): beamformed pixel*tx*rx sums/s per chip, from the
1024^2-pixel DAS image at 256x256 tx/rx. The reference baseline is an RTX
3070 CUDA kernel at < 2 s for that config => 3.436e13 sums/s
(``README.md:29``); ``vs_baseline`` is our sums/s over that number.

Environment knobs:
  QUPS_BENCH_SIZE  = full | medium | small  (default: full)
  QUPS_BENCH_REPS  = repetitions (default 2)
  QUPS_BENCH_PRECISION = bf16pair | f32 (default: bf16pair on TPU — packed
      bf16 tap pairs, one 32-bit gather per two interp taps, the TPU
      analog of the reference's half2 trace mode (``bf.cu:170``); ~0.2%
      max rel err. f32 elsewhere.)
  QUPS_BENCH_MESH  = "rx2,tx2" — run the shard_map-composed Pallas kernel
      on an (rx, tx) device mesh instead of the single-chip kernel, and
      report aggregate + per-chip sums/s (the BASELINE scaling-efficiency
      metric; use with N real chips or a virtual CPU mesh via
      XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""
import json
import os
import time

import numpy as np

BASELINE_SUMS_PER_S = 1024**2 * 256**2 / 2.0  # RTX 3070, README.md:29


def das_problem(T, N, M, n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N, M)).astype(np.float32)
    xs = np.linspace(-12e-3, 12e-3, n)
    zs = np.linspace(5e-3, 45e-3, n)
    # rows iso-depth (z), lateral x on lanes — the das_tiled tile contract
    Z, X = np.meshgrid(zs, xs, indexing="ij")
    pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()], -1).astype(np.float32)
    pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
                  -1).astype(np.float32)
    th = np.radians(np.linspace(-9, 9, M))
    pv = np.zeros((M, 3), np.float32)
    nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
    t0 = np.full(M, 2 * 5e-3 / 1540.0, np.float32)
    return x, pi, pr, pv, nv, t0


def main():
    size = os.environ.get("QUPS_BENCH_SIZE", "full")
    reps = int(os.environ.get("QUPS_BENCH_REPS", "2"))
    cfg = {
        "small": dict(T=1024, N=64, M=16, n=256),
        "medium": dict(T=2048, N=128, M=64, n=512),
        "full": dict(T=4096, N=256, M=256, n=1024),
    }[size]

    import jax
    import jax.numpy as jnp
    from qups_tpu.ops.das_pallas import das_tiled as _das_fast  # Pallas kernel
    dev = jax.devices()[0]

    x, pi, pr, pv, nv, t0 = das_problem(**cfg)
    n = cfg["n"]
    sums = n * n * cfg["M"] * cfg["N"]

    mesh_spec = os.environ.get("QUPS_BENCH_MESH", "")
    if mesh_spec:
        from qups_tpu.parallel.mesh import make_mesh, das_sharded_pallas_plan
        shape = {}
        for part in mesh_spec.split(","):
            k = part.rstrip("0123456789")
            shape[k] = int(part[len(k):] or 1)
        ndev = int(np.prod(list(shape.values())))
        mesh = make_mesh(jax.devices()[:ndev], axes=tuple(shape),
                         shape=tuple(shape.values()))
        interp = dev.platform == "cpu"
        # the reusable jitted handle: planning + compile once, reps pay
        # only the sharded kernel + collectives (the honest sharding tax)
        apply = das_sharded_pallas_plan(
            mesh, pi, pr, pv, nv, t0, 1.0 / 1540.0, fs=31.25e6,
            T=cfg["T"], N=cfg["N"], M=cfg["M"], tx_model="plane",
            im_shape=(n, n, 1), interpret=interp,
            method=os.environ.get("QUPS_BENCH_METHOD", "linear"))

        def f(xx):
            return jnp.sum(jnp.abs(apply(xx)))

        xj = jnp.asarray(x)
        t0c = time.time()
        chk = float(f(xj))
        compile_s = time.time() - t0c
        times = []
        for _ in range(reps):
            t1 = time.time()
            float(f(xj))
            times.append(time.time() - t1)
        dt = min(times)
        sums_per_s = sums / dt
        print(json.dumps({
            "metric": "DAS sharded throughput (pixel*tx*rx sums/s aggregate)",
            "value": sums_per_s,
            "unit": "sums/s",
            "vs_baseline": sums_per_s / BASELINE_SUMS_PER_S,
            "detail": {
                "config": cfg, "size": size, "latency_s": dt,
                "compile_s": compile_s, "mesh": dict(mesh.shape),
                "n_devices": ndev, "per_chip_sums_per_s": sums_per_s / ndev,
                "device": str(dev), "check": chk,
            },
        }))
        return

    prec = os.environ.get(
        "QUPS_BENCH_PRECISION",
        "bf16pair" if dev.platform != "cpu" else "f32")
    # headline sampler: cubic Catmull-Rom — the REFERENCE DEFAULT
    # (UltrasoundSystem.m:3279 / interpd.cu:89), so the vs_baseline ratio
    # compares like for like against the RTX-3070 number. 'linear' is
    # additionally measured into detail (QUPS_BENCH_METHOD overrides).
    method = os.environ.get("QUPS_BENCH_METHOD", "cubic")

    def make(m):
        return jax.jit(lambda xx: jnp.sum(jnp.abs(_das_fast(
            xx, pi, pr, pv, nv, t0, 1.0 / 1540.0, fs=31.25e6,
            tx_model="plane", method=m, im_shape=(n, n, 1),
            precision=prec, interpret=dev.platform == "cpu"))))

    t0u = time.time()
    # uint16 bf16-bits wire format under bf16pair: the pair pack rounds
    # to bf16 on device anyway, so the half-width upload costs no
    # accuracy (see ops.das_pallas._upload_trace)
    from qups_tpu.ops.das_pallas import _upload_trace
    xj = _upload_trace(x, prec == "bf16pair")
    # force the host->device transfer to complete so it is not charged to
    # the compile measurement
    float(jnp.sum(xj[:1, :1, :1].astype(jnp.float32)))
    upload_s = time.time() - t0u

    def bench_one(m):
        f = make(m)
        t0c = time.time()
        chk = float(f(xj))
        comp = time.time() - t0c
        times = []
        for _ in range(reps):
            t1 = time.time()
            float(f(xj))
            times.append(time.time() - t1)
        return min(times), comp, chk

    dt, compile_s, chk = bench_one(method)
    sums_per_s = sums / dt
    up_gb = x.nbytes / 1e9
    detail = {
        "config": cfg, "size": size, "latency_s": dt, "method": method,
        "compile_s": compile_s, "upload_s": upload_s,
        "upload_GBps": up_gb / max(upload_s, 1e-9),
        "device": str(dev), "check": chk, "precision": prec,
    }
    if upload_s > 60:
        # the r3 run recorded upload_s=565 s (vs 23.5 s in r2) for the
        # same 1 GB trace set — a tunnel-transport mode, not a kernel
        # property (uploads ride the remote-device tunnel here; on a
        # directly-attached host this is a PCIe copy). When uploads
        # dominate wall-clock, the host-resident streaming path
        # (`UltrasoundSystem.DAS(bsize=...)`) overlaps per-block uploads
        # with compute and is the documented mitigation.
        detail["upload_anomaly"] = (
            f"upload {upload_s:.0f}s for {up_gb:.1f} GB — slow tunnel "
            "transport mode (r2: 23.5s, r3: 565s for the same bytes); "
            "see NOTES.md, use DAS(bsize=) streaming on real hosts")
    if method == "cubic" and not os.environ.get("QUPS_BENCH_METHOD"):
        dtl, compl, chkl = bench_one("linear")
        detail["linear"] = {"latency_s": dtl, "sums_per_s": sums / dtl,
                            "vs_baseline": sums / dtl / BASELINE_SUMS_PER_S,
                            "compile_s": compl, "check": chkl}
    if os.environ.get("QUPS_BENCH_I8X4") == "1" and method == "cubic":
        # opt-in: the int8x4 quad trace pack (cubic taps in ONE gather,
        # ~1.5% max rel err worst-case — see ops/das_pallas._pack_quads)
        prec_save = prec
        prec = "i8x4"
        try:
            dtq, compq, chkq = bench_one("cubic")
            detail["i8x4"] = {
                "latency_s": dtq, "sums_per_s": sums / dtq,
                "vs_baseline": sums / dtq / BASELINE_SUMS_PER_S,
                "compile_s": compq, "check": chkq}
        finally:
            prec = prec_save

    print(json.dumps({
        "metric": "DAS beamform throughput (pixel*tx*rx sums/s per chip,"
                  " cubic sampler = reference default)",
        "value": sums_per_s,
        "unit": "sums/s",
        "vs_baseline": sums_per_s / BASELINE_SUMS_PER_S,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
