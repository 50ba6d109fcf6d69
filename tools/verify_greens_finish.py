"""Verify: greens (Pallas splat + finish stage) -> DAS -> PSF peak.

Drives both finish strategies (QUPS_GREENS_FINISH=conv|fft) on the real
backend and checks the image peak lands within 1.1 mm of the scatterer.
One JSON line per arm.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import qups_tpu as q  # noqa: E402


def run(how):
    os.environ["QUPS_GREENS_FINISH"] = how
    xdc = q.TransducerArray.L11_5v()
    seq = q.Sequence(type="FSA", c0=1500.0, numpulse=xdc.numel)
    scan = q.ScanCartesian(x=np.arange(-5e-3, 5e-3, 0.1e-3), y=[0.0],
                           z=np.arange(15e-3, 25e-3, 0.1e-3))
    us = q.UltrasoundSystem(tx=xdc, rx=xdc, seq=seq, scan=scan,
                            fs=4 * xdc.fc)
    scat = q.Scatterers(pos=np.array([0.0, 0.0, 20e-3]).reshape(3, 1),
                        c0=1500.0)
    t0 = time.time()
    chd = us.greens(scat, impl="pallas")
    b = us.DAS(chd, method="linear")  # Pallas path; ri output on TPU
    b = np.asarray(b)
    if b.shape[-1] == 2:  # ri pair -> magnitude
        b = np.hypot(b[..., 0], b[..., 1])
    img = np.abs(b).squeeze()
    wall = time.time() - t0
    i, j = np.unravel_index(np.argmax(img), img.shape)
    P = us.scan.positions().reshape(3, *img.shape)
    err_mm = 1e3 * float(np.hypot(P[0, i, j] - 0.0, P[2, i, j] - 20e-3))
    ok = err_mm < 1.1
    print(json.dumps({"arm": how, "ok": bool(ok), "err_mm": round(err_mm, 3),
                      "wall_s": round(wall, 2)}), flush=True)
    return ok


if __name__ == "__main__":
    ok = all([run("conv"), run("fft")])
    print(json.dumps({"verify": "greens_finish", "ok": bool(ok)}), flush=True)
    sys.exit(0 if ok else 1)
