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


# ---------------------------------------------------------------------------
# TabulatedKernel (reference SmoothingKernel.h:548-720 semantics): argument
# quantisation reproduces table[int(s*res/kernrange)] with
# table[i] = f(i*kernrange/res) exactly, without a gather.
# ---------------------------------------------------------------------------

class TestTabulatedKernel:
    def test_factory_flag(self):
        from gandalf_tpu.kernels.smoothing import TabulatedKernel
        kern = kernel_factory("m4", 3, tabulated_kernel=1)
        assert isinstance(kern, TabulatedKernel)
        assert not isinstance(kernel_factory("m4", 3), TabulatedKernel)

    @pytest.mark.parametrize("name", ["m4", "quintic"])
    def test_matches_reference_table(self, name):
        """tab.w0(s) equals the table value f(step*floor(s/step)) for
        arbitrary s (tableLookup, SmoothingKernel.h:619-624)."""
        base = kernel_factory(name, 3)
        tab = kernel_factory(name, 3, tabulated_kernel=1)
        res = tab.res
        step = base.kernrange / res
        rng = np.random.default_rng(7)
        s = rng.uniform(0.0, base.kernrange * 1.2, 4096)
        idx = np.floor(s / step)
        s_q = jnp.asarray(idx * step)
        inside = s < base.kernrange
        for fn in ("w0", "w1", "womega", "wzeta"):
            got = np.asarray(getattr(tab, fn)(jnp.asarray(s)))
            want = np.where(inside, np.asarray(getattr(base, fn)(s_q)), 0.0)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_grav_far_field_exact(self):
        """GravTableLookup returns exact 1/s^2 (and 1/s for the potential)
        beyond kernrange (SmoothingKernel.h:645-662)."""
        tab = kernel_factory("m4", 3, tabulated_kernel=1)
        s = jnp.asarray(np.linspace(2.0, 6.0, 100))
        np.testing.assert_allclose(np.asarray(tab.wgrav(s)),
                                   1.0 / np.asarray(s) ** 2, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(tab.wpot(s)),
                                   1.0 / np.asarray(s), rtol=1e-6)

    def test_sqd_variants_use_sqd_grid(self):
        """w0_s2 quantises on the s^2 grid (tableLookupSqd) — equal to the
        base kernel at sqrt of the quantised squared argument."""
        base = kernel_factory("m4", 3)
        tab = kernel_factory("m4", 3, tabulated_kernel=1)
        step2 = base.kernrangesqd / tab.res
        rng = np.random.default_rng(11)
        s2 = rng.uniform(0.0, base.kernrangesqd * 1.2, 4096)
        s_q = jnp.asarray(np.sqrt(np.floor(s2 / step2) * step2))
        inside = s2 < base.kernrangesqd
        got = np.asarray(tab.w0_s2(jnp.asarray(s2)))
        want = np.where(inside, np.asarray(base.w0(s_q)), 0.0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_quantisation_error_bound(self):
        """The tabulated kernel differs from direct evaluation by at most
        max|f'| * step — the table is a faithful approximation."""
        base = kernel_factory("m4", 3)
        tab = kernel_factory("m4", 3, tabulated_kernel=1)
        s = jnp.asarray(np.linspace(0.0, 2.0, 20000, endpoint=False))
        err = np.max(np.abs(np.asarray(tab.w0(s)) - np.asarray(base.w0(s))))
        # max |w1| for m4-3d is ~0.56; step = 2/1000
        assert err < 0.6 * (2.0 / tab.res)

    def test_simulation_runs_tabulated(self):
        """A grad-h SPH sim with tabulated_kernel = 1 (the reference's
        default) bootstraps and steps without tripping overflow."""
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.simulation import GradhSphSimulation

        p = Parameters()
        for k, v in {"sim": "gradhsph", "ic": "box", "ndim": 1,
                     "dimensionless": 1, "gas_eos": "isothermal",
                     "temp0": 1.0, "mu_bar": 1.0, "rhofluid1": 1.0,
                     "run_id": "", "Nlattice1[0]": 64,
                     "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                     "boundary_lhs[0]": "periodic",
                     "boundary_rhs[0]": "periodic",
                     "tabulated_kernel": 1, "tend": 0.02,
                     "tsnapfirst": 1e30, "Nstepsmax": 5}.items():
            p.set(k, v)
        sim = GradhSphSimulation(p)
        sim.Run()
        assert not bool(sim.state.neib_overflow)
        assert np.all(np.isfinite(np.asarray(sim.state.rho)))
