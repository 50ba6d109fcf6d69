"""Fused phasor+GEMM Pallas engine vs the XLA engine (interpret mode on
the CPU test mesh)."""
import numpy as np
import pytest

from qups_tpu.ops.greens_freq import greens_freq

from test_greens_freq import problem  # noqa: E402 (shared fixture)


def _pair(S=37, **kw_over):
    kern, ps, amp, pn, pv, kw = problem(S=S)
    kw.update(kw_over)
    want = np.asarray(greens_freq(kern, ps, amp, pn, pv, engine="xla", **kw))
    got = np.asarray(greens_freq(kern, ps, amp, pn, pv, engine="pallas",
                                 **kw))
    return want, got


def test_matches_xla_engine():
    want, got = _pair()
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel


@pytest.mark.full
def test_matches_xla_engine_bf16():
    want, got = _pair(precision="bf16")
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-3, rel


@pytest.mark.full
def test_odd_sizes_pad():
    # S/N/M far from tile multiples exercises the zero-weight padding
    want, got = _pair(S=13)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel


@pytest.mark.full
def test_attenuation_matches_xla_engine():
    """alpha0 decay through the fused engine's phasor recurrence (the
    exp(-att_q q) magnitude fold) vs the XLA engine's weighted phasors."""
    want, got = _pair(alpha0=0.5)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel
    # and attenuation actually attenuates
    want0, _ = _pair(alpha0=0.0)
    assert np.abs(want).max() < 0.9 * np.abs(want0).max()


def test_subelements_rejected():
    kern, ps, amp, pn, pv, kw = problem(S=7)
    pn3 = np.repeat(pn, 2, axis=1)  # En = 2
    with pytest.raises(ValueError, match="single sub-element"):
        greens_freq(kern, ps, amp, pn3, pv, engine="pallas", **kw)


def test_auto_prefers_xla_on_cpu():
    # on the CPU test mesh 'auto' must stay on the XLA engine (the Pallas
    # interpreter is for parity tests, not production CPU use)
    kern, ps, amp, pn, pv, kw = problem(S=7)
    a = np.asarray(greens_freq(kern, ps, amp, pn, pv, engine="auto", **kw))
    b = np.asarray(greens_freq(kern, ps, amp, pn, pv, engine="xla", **kw))
    assert np.array_equal(a, b)
