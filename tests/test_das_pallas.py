"""Pallas DAS kernel parity tests (interpret mode on the CPU mesh) against
the XLA reference path, across tx models, t0 layouts, and complex data."""
import numpy as np
import pytest

from qups_tpu.ops.das import das
from qups_tpu.ops.das_pallas import das_tiled

RNG = np.random.default_rng(5)


def problem(T=256, N=16, M=4, I1=16, I2=128, cplx=False):
    x = RNG.standard_normal((T, N, M)).astype(np.float32)
    if cplx:
        x = (x + 1j * RNG.standard_normal((T, N, M))).astype(np.complex64)
    xs = np.linspace(-12e-3, 12e-3, I2)
    zs = np.linspace(5e-3, 45e-3, I1)
    Z, X = np.meshgrid(zs, xs, indexing="ij")
    pi = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()], -1).astype(np.float32)
    pr = np.stack([np.linspace(-12e-3, 12e-3, N), np.zeros(N), np.zeros(N)],
                  -1).astype(np.float32)
    th = np.radians(np.linspace(-9, 9, M))
    pv = np.zeros((M, 3), np.float32)
    nv = np.stack([np.sin(th), np.zeros(M), np.cos(th)], -1).astype(np.float32)
    t0 = np.full(M, 2 * 5e-3 / 1540.0, np.float32)
    return x, pi, pr, pv, nv, t0


def compare(x, pi, pr, pv, nv, t0, model, I1, I2, fs=4e6):
    ref = np.asarray(das(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=fs,
                         tx_model=model, method="linear")).squeeze()
    got = np.asarray(das_tiled(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=fs,
                               tx_model=model, im_shape=(I1, I2, 1),
                               interpret=True)).squeeze()
    scale = np.abs(ref).max()
    assert scale > 0
    assert np.abs(got - ref).max() / scale < 1e-4


@pytest.mark.parametrize("model", ["plane", "diverging", "virtual"])
def test_models(model):
    x, pi, pr, pv, nv, t0 = problem()
    if model != "plane":
        pv = np.stack([np.linspace(-3e-3, 3e-3, 4), np.zeros(4),
                       np.full(4, 20e-3)], -1).astype(np.float32)
        nv = np.tile([0, 0, 1.0], (4, 1)).astype(np.float32)
    compare(x, pi, pr, pv, nv, t0, model, 16, 128)


def test_per_tx_t0():
    x, pi, pr, pv, nv, _ = problem()
    t0 = (2 * 5e-3 / 1540.0 + np.linspace(0, 8e-6, 4)).astype(np.float32)
    compare(x, pi, pr, pv, nv, t0, "plane", 16, 128)


def test_complex_data():
    x, pi, pr, pv, nv, t0 = problem(cplx=True)
    compare(x, pi, pr, pv, nv, t0, "plane", 16, 128)


def test_unpadded_shapes():
    # I1/I2 not multiples of the tile sizes exercise edge padding
    x, pi, pr, pv, nv, t0 = problem(I1=13, I2=100)
    compare(x, pi, pr, pv, nv, t0, "plane", 13, 100)


def test_rx_not_multiple_of_8_raises_or_pads():
    # N=12 is not a multiple of 8: the wrapper must still be correct
    x, pi, pr, pv, nv, t0 = problem(N=12)
    try:
        compare(x, pi, pr, pv, nv, t0, "plane", 16, 128)
    except AssertionError:
        raise
    except Exception:
        pytest.skip("non-multiple-of-8 rx unsupported (documented)")


def test_iq_fmod():
    x, pi, pr, pv, nv, t0 = problem(cplx=True)
    fmod = 3e5
    ref = np.asarray(das(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=4e6,
                         tx_model="plane", method="linear",
                         fmod=fmod)).squeeze()
    got = np.asarray(das_tiled(x, pi, pr, pv, nv, t0, 1 / 1540.0, fs=4e6,
                               tx_model="plane", fmod=fmod,
                               im_shape=(16, 128, 1),
                               interpret=True)).squeeze()
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4
