"""Pallas greens splat kernel parity (interpret mode) vs the dense oracle
(``greens.cu:8-86`` semantics; see ops/greens_pallas.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from qups_tpu.ops.greens import greens_dense
from qups_tpu.ops.greens_pallas import greens_tiled

RNG = np.random.default_rng(0)


def problem(S=10, N=6, M=3, T=128, K=15, fs=15e6, c0=1540.0):
    kern = (np.hanning(K) * np.sin(2 * np.pi * 4e6 * np.arange(K) / fs)
            ).astype(np.float32)
    ps = np.stack([RNG.uniform(-3e-3, 3e-3, S), np.zeros(S),
                   RNG.uniform(8e-3, 12e-3, S)], -1).astype(np.float32)
    amp = RNG.uniform(0.5, 2.0, S).astype(np.float32)
    pn = np.stack([np.linspace(-5e-3, 5e-3, N), np.zeros(N), np.zeros(N)],
                  -1)[:, None, :].astype(np.float32)
    pv = np.stack([np.linspace(-3e-3, 3e-3, M), np.zeros(M), np.zeros(M)],
                  -1)[:, None, :].astype(np.float32)
    s0 = 2 * 8e-3 / c0 - 1e-6
    t0k = -K / 2 / fs
    return kern, ps, amp, pn, pv, dict(T=T, s0=s0, t0k=t0k, fs=fs,
                                       cinv=1 / c0, R0=1e-3)


@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_parity_vs_dense(method):
    kern, ps, amp, pn, pv, kw = problem()
    want = np.asarray(greens_dense(jnp.asarray(kern), ps, amp, pn, pv,
                                   method=method, **kw))
    got = np.asarray(greens_tiled(kern, ps, amp, pn, pv, method=method,
                                  interpret=True, CS=32, **kw))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-3, err  # f32 positional rounding; see module docstring
    # peak sample indices must agree exactly on a few traces
    for n, m in [(0, 0), (3, 1), (5, 2)]:
        assert abs(int(np.argmax(np.abs(want[:, n, m])))
                   - int(np.argmax(np.abs(got[:, n, m])))) <= 1


def test_complex_kernel_ri():
    kern, ps, amp, pn, pv, kw = problem(S=6, T=96)
    ck = kern.astype(np.complex64) * np.exp(
        1j * np.linspace(0, np.pi, kern.size)).astype(np.complex64)
    want = np.asarray(greens_dense(jnp.asarray(ck), ps, amp, pn, pv,
                                   method="linear", **kw))
    got = np.asarray(greens_tiled(ck, ps, amp, pn, pv, method="linear",
                                  out="ri", interpret=True, CS=32, **kw))
    gc = got[..., 0] + 1j * got[..., 1]
    err = np.abs(gc - want).max() / np.abs(want).max()
    assert err < 5e-3, err


def test_subelements():
    kern, ps, amp, pn, pv, kw = problem(S=5, N=4, M=2, T=96)
    # 2 sub-elements per rx element, 1 per tx
    pn2 = np.concatenate([pn + np.array([0.2e-3, 0, 0]),
                          pn - np.array([0.2e-3, 0, 0])], axis=1)
    want = np.asarray(greens_dense(jnp.asarray(kern), ps, amp, pn2, pv,
                                   method="linear", **kw))
    got = np.asarray(greens_tiled(kern, ps, amp, pn2, pv, method="linear",
                                  interpret=True, CS=32, **kw))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-3, err


def test_greens_tiled_tpu_scale():
    """Size-scaled TPU case (skipped off-TPU): 2000 scatterers x 64x64
    elements complete quickly and match the splat oracle's energy."""
    import jax
    if jax.devices()[0].platform == "cpu":
        pytest.skip("TPU-only scale test")
    import time
    from qups_tpu.ops.greens import greens_splat
    rng = np.random.default_rng(1)
    S, N, M, K, fs, c0 = 2000, 64, 64, 31, 25e6, 1540.0
    kern = (np.hanning(K) * np.sin(2 * np.pi * 5e6 * np.arange(K) / fs)
            ).astype(np.float32)
    ps = np.stack([rng.uniform(-10e-3, 10e-3, S), np.zeros(S),
                   rng.uniform(10e-3, 30e-3, S)], -1).astype(np.float32)
    amp = np.ones(S, np.float32)
    pn = np.stack([np.linspace(-10e-3, 10e-3, N), np.zeros(N),
                   np.zeros(N)], -1)[:, None, :].astype(np.float32)
    pv = pn[:M].copy()
    s0 = 2 * 9e-3 / c0
    T = int(np.ceil((2 * 32e-3 / c0 - s0) * fs))
    kw = dict(T=T, s0=s0, t0k=-K / 2 / fs, fs=fs, cinv=1 / c0, R0=1e-3,
              method="linear")
    t0 = time.time()
    x = np.asarray(greens_tiled(kern, ps, amp, pn, pv, **kw))
    dt = time.time() - t0
    assert np.isfinite(x).all() and np.abs(x).max() > 0
    assert dt < 300, dt  # incl. cold compile on the tunnel
