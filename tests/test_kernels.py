"""Unit tests for the SPH smoothing kernels against closed-form values
computed directly from the reference formulas (FluidGPU.cu:11-43)."""

import numpy as np
import pytest

from tpufluids.config import PI_REF, BASE_CONFIG
from tpufluids.kernels import grad_w_spiky, w_cubic, w_cubic_deriv, w0

H = BASE_CONFIG.cutoff  # 0.06


def ref_w(r, h=H):
    if 0 <= r <= h:
        return 1.0 / PI_REF / h**3 * (1 - 1.5 * (r / h) ** 2
                                      + 0.75 * (r / h) ** 3)
    if h < r < 2 * h:
        return 1.0 / PI_REF / h**3 * 0.25 * (2 - r / h) ** 3
    return 0.0


def ref_dw(r, h=H):
    return -45.0 / PI_REF / h**6 * (h - r) ** 2 if r < h else 0.0


def ref_wt(r, h=H):
    if 0 <= r <= h:
        return 1.0 / PI_REF / h**4 * (1 - 3 * (r / h) + 2.25 * (r / h) ** 2)
    if h < r < 2 * h:
        return -1.0 / PI_REF / h**4 * 0.5 * (2 - r / h) ** 2
    return 0.0


RS = [0.0, 0.01, 0.03, 0.059999, 0.06, 0.0601, 0.09, 0.1199, 0.12, 0.2]


@pytest.mark.parametrize("r", RS)
def test_w_cubic_matches_reference_formula(r):
    got = float(w_cubic(np.float32(r), H))
    np.testing.assert_allclose(got, ref_w(r), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("r", RS)
def test_grad_w_spiky_matches_reference_formula(r):
    got = float(grad_w_spiky(np.float32(r), H))
    np.testing.assert_allclose(got, ref_dw(r), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("r", RS)
def test_w_cubic_deriv_matches_reference_formula(r):
    got = float(w_cubic_deriv(np.float32(r), H))
    np.testing.assert_allclose(got, ref_wt(r), rtol=1e-5, atol=1e-4)


def test_w0_is_kernel_at_zero():
    np.testing.assert_allclose(w0(H), ref_w(0.0), rtol=1e-6)


def test_kernel_support_properties():
    rs = np.linspace(0, 3 * H, 500, dtype=np.float32)
    w = np.asarray(w_cubic(rs, H))
    assert np.all(w >= 0)
    assert np.all(w[rs >= 2 * H] == 0)
    # monotone decreasing over the support
    assert np.all(np.diff(w[rs < 2 * H]) <= 1e-7)
    # spiky gradient is non-positive and vanishes beyond h (parity quirk)
    dw = np.asarray(grad_w_spiky(rs, H))
    assert np.all(dw <= 0)
    assert np.all(dw[rs >= H] == 0)


def test_kernel_normalization():
    """The cubic spline with the reference's 1/(pi h^3) prefactor is the
    standard M4 spline: integral of W over its 2h support is ~1 (up to
    the 3.14159-vs-pi literal)."""
    rs = np.linspace(0, 2 * H, 20001)
    w = np.array([ref_w(float(r)) for r in rs])
    integral = np.trapezoid(4 * np.pi * rs**2 * w, rs)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-3)
