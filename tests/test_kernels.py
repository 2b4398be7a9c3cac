"""Smoothing-kernel unit tests: normalisation, derivative consistency,
continuity and the grad-h womega identity."""

import jax.numpy as jnp
import numpy as np
import pytest

from gandalf_tpu.kernels import kernel_factory


def volume_element(ndim, s):
    if ndim == 1:
        return 2.0 * np.ones_like(s)       # two sides
    if ndim == 2:
        return 2.0 * np.pi * s
    return 4.0 * np.pi * s * s


NS = 50001  # one shared grid size so eager-mode compiles are reused


@pytest.mark.parametrize("name", ["m4", "quintic", "gaussian"])
@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_normalisation(name, ndim):
    """integral of W over the kernel volume must be 1."""
    kern = kernel_factory(name, ndim)
    s = np.linspace(0.0, kern.kernrange, NS)
    w = np.asarray(kern.w0(jnp.asarray(s)))
    integral = np.trapezoid(w * volume_element(ndim, s), s)
    tol = 5e-4 if name == "gaussian" else 1e-5   # gaussian is truncated at 3
    assert abs(integral - 1.0) < tol


@pytest.mark.parametrize("name", ["m4", "quintic", "gaussian"])
@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_w1_is_derivative_of_w0(name, ndim):
    kern = kernel_factory(name, ndim)
    s = np.linspace(1e-3, kern.kernrange - 1e-3, NS)
    eps = 1e-6
    w1 = np.asarray(kern.w1(jnp.asarray(s)))
    dw0 = (np.asarray(kern.w0(jnp.asarray(s + eps)))
           - np.asarray(kern.w0(jnp.asarray(s - eps)))) / (2 * eps)
    np.testing.assert_allclose(w1, dw0, atol=5e-5)


@pytest.mark.parametrize("name", ["m4", "quintic", "gaussian"])
@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_womega_identity(name, ndim):
    """womega = -(ndim*w0 + s*w1) (h-derivative of W, grad-h Omega term)."""
    kern = kernel_factory(name, ndim)
    s = np.linspace(0.0, kern.kernrange - 1e-6, NS)
    womega = np.asarray(kern.womega(jnp.asarray(s)))
    expect = -(ndim * np.asarray(kern.w0(jnp.asarray(s)))
               + s * np.asarray(kern.w1(jnp.asarray(s))))
    np.testing.assert_allclose(womega, expect, atol=1e-10)


def test_m4_reference_values():
    """Spot values of the M4 kernel against hand-evaluated constants
    (reference src/Headers/SmoothingKernel.h:127-180)."""
    kern = kernel_factory("m4", 3)
    norm = 1.0 / np.pi
    assert np.isclose(float(kern.w0(jnp.asarray(0.0))), norm)
    assert np.isclose(float(kern.w0(jnp.asarray(1.0))), 0.25 * norm)
    assert float(kern.w0(jnp.asarray(2.0))) == 0.0
    assert float(kern.w0(jnp.asarray(2.5))) == 0.0
    # gravity kernels -> Newtonian beyond support
    assert np.isclose(float(kern.wgrav(jnp.asarray(3.0))), 1.0 / 9.0)
    assert np.isclose(float(kern.wpot(jnp.asarray(4.0))), 0.25)


def test_wgrav_matches_newton_at_boundary():
    for name in ("m4", "quintic"):
        kern = kernel_factory(name, 3)
        R = kern.kernrange
        g_in = float(kern.wgrav(jnp.asarray(R - 1e-9)))
        g_out = 1.0 / R**2
        # quintic coefficients in the reference are rounded to ~4 digits
        assert abs(g_in - g_out) < 1e-3
