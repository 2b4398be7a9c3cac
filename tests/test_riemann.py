"""Exact Riemann solver tests against published Toro (1999) table values."""

import numpy as np
import pytest

from gandalf_tpu.analysis import riemann


def test_sod_star_state():
    # Toro test 1 (Sod): p* = 0.30313, u* = 0.92745
    p, u = riemann.star_region(1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4)
    assert p == pytest.approx(0.30313, abs=2e-5)
    assert u == pytest.approx(0.92745, abs=2e-5)


def test_123_problem_star_state():
    # Toro test 2 (double rarefaction): p* = 0.00189, u* = 0
    p, u = riemann.star_region(1.0, -2.0, 0.4, 1.0, 2.0, 0.4, 1.4)
    assert p == pytest.approx(0.00189, abs=5e-5)
    assert u == pytest.approx(0.0, abs=1e-10)


def test_strong_shock_star_state():
    # Toro test 3: p* = 460.894, u* = 19.5975
    p, u = riemann.star_region(1.0, 0.0, 1000.0, 1.0, 0.0, 0.01, 1.4)
    assert p == pytest.approx(460.894, rel=1e-4)
    assert u == pytest.approx(19.5975, rel=1e-4)


def test_sod_profile_structure():
    sol = riemann.shocktube_solution(1.0, 0.0, 1.0, 0.125, 0.0, 0.1,
                                     1.4, -0.5, 0.0, 0.5, 0.2, n=2000)
    x, rho, vx = sol["x"], sol["rho"], sol["vx"]
    # far field untouched
    assert np.allclose(rho[x < -0.3], 1.0)
    assert np.allclose(rho[x > 0.4], 0.125)
    # contact/star region plateau near u* between the waves
    star = (x > 0.05) & (x < 0.15)
    assert np.allclose(vx[star], 0.92745, atol=1e-3)
    # mass flux consistency: density positive and bounded
    assert (rho > 0).all() and (rho <= 1.0 + 1e-12).all()


def test_t_zero_gives_ic():
    sol = riemann.shocktube_solution(1.0, 0.0, 1.0, 0.25, 0.0, 0.1795,
                                     1.4, -1.0, 0.0, 1.0, 0.0, n=100)
    left = sol["x"] <= 0.0
    assert np.allclose(sol["rho"][left], 1.0)
    assert np.allclose(sol["rho"][~left], 0.25)
