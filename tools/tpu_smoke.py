"""TPU capability smoke sweep: drive every UltrasoundSystem capability
end-to-end at tiny size on the real backend and DOWNLOAD the result
(the backend surfaces unsupported ops lazily at materialization, so a
"working" graph can still poison downloads).

IMPORTANT: one failed transfer poisons every subsequent download in the
same process on this backend, so the sweep STOPS at the first failure —
only the first failure of a run is trustworthy. Iterate fix-by-fix until
green (QUPS_SMOKE_KEEP_GOING=1 disables the stop for a quick overview).
One JSON line per capability."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import qups_tpu as q  # noqa: E402


def dl(x):
    """Download via the complex-safe path; assert finite."""
    a = q.utils.to_host(x)
    assert np.isfinite(a).all(), "non-finite result"
    return a


def main():
    xdc = q.TransducerArray(numel=16, pitch=0.3e-3, fc=3e6)
    seq = q.Sequence(type="FSA", numpulse=16, c0=1540.0)
    scan = q.ScanCartesian(x=np.linspace(-3e-3, 3e-3, 24),
                           z=np.linspace(18e-3, 24e-3, 24))
    us = q.UltrasoundSystem(tx=xdc, rx=xdc, seq=seq, scan=scan, fs=12e6)
    scat = q.Scatterers(pos=[[0.0], [0.0], [21e-3]], c0=1540.0)
    state = {}

    def sim_greens():
        state["chd"] = us.greens(scat)  # freq on TPU
        dl(state["chd"].data)

    def daslut():
        tau_rx, tau_tx = us.das_delay_tables()
        dl(us.bfDASLUT(state["chd"], tau_rx, tau_tx, method="linear"))

    def das_vol():
        # matrix probe + 3-D scan through the Pallas fast path
        mat = q.TransducerMatrix(numd=(4, 4), pitch2=(0.4e-3, 0.4e-3),
                                 fc=3e6)
        seq3 = q.Sequence(type="FSA", numpulse=16, c0=1540.0)
        scan3 = q.ScanCartesian(x=np.linspace(-2e-3, 2e-3, 8),
                                y=np.linspace(-2e-3, 2e-3, 8),
                                z=np.linspace(18e-3, 24e-3, 8))
        us3 = q.UltrasoundSystem(tx=mat, rx=mat, seq=seq3, scan=scan3,
                                 fs=12e6)
        chd3 = us3.greens(scat)
        dl(us3.DAS(chd3, method="linear"))

    def migration():
        seq_pw = q.SequenceRadial(type="PW", angles=[0.0], c0=1540.0)
        us_pw = q.UltrasoundSystem(tx=xdc, rx=xdc, seq=seq_pw, scan=scan,
                                   fs=12e6)
        chd_pw = us_pw.focusTx(state["chd"], seq_pw)
        img, _bscan = us_pw.bfMigration(chd_pw)
        dl(img)

    def focus_refocus():
        seq_pw = q.SequenceRadial(type="PW", angles=[-5.0, 0.0, 5.0],
                                  c0=1540.0)
        chd_pw = us.focusTx(state["chd"], seq_pw)
        dl(chd_pw.data)
        chd_back = us.refocus(chd_pw, seq_pw)
        dl(chd_back.data)

    def coherence():
        import jax
        import jax.numpy as jnp
        from qups_tpu.ops.coherence import cohfac, slsc
        brx = us.DAS(state["chd"], method="linear", keep_rx=True)

        @jax.jit
        def post(brx):
            bc = brx[..., 0] + 1j * brx[..., 1] if brx.shape[-1] == 2 \
                else brx
            ax = 3  # rx axis of (I1, I2, I3, N', M')
            return (jnp.abs(cohfac(bc, axis=ax)),
                    jnp.abs(slsc(bc, axis=ax, lags=4)))
        cf, sl = post(jnp.asarray(brx))
        dl(cf), dl(sl)

    def fdtd():
        med = q.Medium(c0=1540.0, rho0=1000.0)
        cgrd = q.ScanCartesian(x=np.arange(-4e-3, 4e-3, 0.25e-3), y=[0.0],
                               z=np.arange(-1e-3, 8e-3, 0.25e-3))
        chd_kw = us.kspaceFirstOrder(med, cgrd, tmax=4e-6)
        dl(chd_kw.data)

    steps = [
        ("greens(freq)", sim_greens),
        ("greens(pallas)", lambda: dl(us.greens(scat, impl="pallas").data)),
        ("simus", lambda: dl(us.simus(scat).data)),
        ("calc_hp", lambda: dl(us.calc_hp(scan))),
        ("DAS(linear/pallas)",
         lambda: dl(us.DAS(state["chd"], method="linear"))),
        ("DAS(keep_rx)",
         lambda: dl(us.DAS(state["chd"], method="linear", keep_rx=True))),
        ("DAS(bsize)",
         lambda: dl(us.DAS(state["chd"], method="linear", bsize=4))),
        ("DAS(cubic/xla)", lambda: dl(us.DAS(state["chd"], kernel="xla"))),
        ("DAS(cubic/pallas default)", lambda: dl(us.DAS(state["chd"]))),
        ("DAS(keep_both BF)",
         lambda: dl(us.DAS(state["chd"], method="linear", keep_rx=True,
                           keep_tx=True))),
        ("DAS(per-pixel c -> LUT fast path)",
         lambda: dl(us.DAS(state["chd"],
                           c0=np.full(us.scan.shape, 1540.0, np.float32)))),
        ("DAS(volumetric)", das_vol),
        ("bfDAS", lambda: dl(us.bfDAS(state["chd"]))),
        ("bfDASLUT", daslut),
        ("bfAdjoint", lambda: dl(us.bfAdjoint(state["chd"]))),
        ("bfMigration", migration),
        ("bfEikonal",
         lambda: dl(us.bfEikonal(state["chd"], q.Medium(c0=1540.0)))),
        ("focusTx+refocus", focus_refocus),
        ("coherence(cohfac+slsc)", coherence),
        ("kspaceFirstOrder", fdtd),
        ("hilbert+downmix",
         lambda: dl(state["chd"].hilbert().downmix(float(xdc.fc)).data)),
    ]

    keep_going = os.environ.get("QUPS_SMOKE_KEEP_GOING", "") == "1"
    results = {}
    for name, fn in steps:
        t0 = time.time()
        try:
            fn()
            results[name] = "ok"
            print(json.dumps({"step": name, "ok": True,
                              "s": round(time.time() - t0, 2)}), flush=True)
        except Exception as e:
            results[name] = f"FAIL: {e}"
            print(json.dumps({"step": name, "ok": False, "err": str(e)[:300],
                              "s": round(time.time() - t0, 2)}), flush=True)
            traceback.print_exc()
            if not keep_going:
                break  # later results would be poisoned by this failure

    nfail = sum(1 for v in results.values() if v != "ok")
    print(json.dumps({"smoke": "tpu", "steps": len(results),
                      "failures": nfail,
                      "failed": [k for k, v in results.items()
                                 if v != "ok"]}), flush=True)
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
