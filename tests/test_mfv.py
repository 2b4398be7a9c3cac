"""Meshless-FV regression gates (reference tests/hydro_tests/test_adsod.py
AdSodMeshlessTest: L1(vx) < 7e-3 with HLLC)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.analysis import facade
from gandalf_tpu.analysis.compute import L1errornorm
from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def make_mfv_adsod_params() -> Parameters:
    p = Parameters()
    updates = {
        "run_id": "ADSOD_MFV", "sim": "mfvmuscl", "ic": "shocktube",
        "ndim": 1, "press1": 1.0, "press2": 0.1975,
        "rhofluid1": 1.0, "rhofluid2": 0.25,
        "Nlattice1[0]": 512, "Nlattice2[0]": 128, "dimensionless": 1,
        "boxmin[0]": -2.0, "boxmax[0]": 2.0,
        "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
        "tend": 0.5, "dt_snap": 0.25, "tsnapfirst": 0.0,
        "gas_eos": "energy_eqn", "gamma_eos": 1.4, "kernel": "m4",
        "h_converge": 0.01, "riemann_solver": "hllc",
        "slope_limiter": "gizmo", "zero_mass_flux": 1,
        "courant_mult": 0.2, "accel_mult": 0.4, "Nlevels": 1,
    }
    for k, v in updates.items():
        p.set(k, v)
    return p


@pytest.fixture(scope="module")
def mfv_sim():
    facade.SimBuffer.reset()
    sim = SimulationBase.factory(make_mfv_adsod_params())
    facade.SimBuffer.add_sim(sim)
    facade.run()
    return sim


def test_mfv_adsod_l1(mfv_sim):
    facade.snap(-1)
    err = L1errornorm("shocktube", "x", "vx", -1.0, 1.0)
    # Reference gate (tests/hydro_tests/test_adsod.py:26); the reference
    # binary measures 6.6e-3 and we land at 6.7e-3 on this config.
    assert err < 7e-3, f"MFV L1(vx) = {err}"


def test_mfv_reaches_tend(mfv_sim):
    assert mfv_sim.t >= 0.5


def test_mfv_mass_conserved(mfv_sim):
    """zero_mass_flux: particle masses must not change at all."""
    m0 = mfv_sim.snapshots[0].data["m"]
    m1 = mfv_sim.snapshots[-1].data["m"]
    np.testing.assert_allclose(m1, m0, rtol=1e-12)


def test_mfv_total_energy_conserved(mfv_sim):
    def etot(s):
        m, v, u = s.data["m"], s.data["v"], s.data["u"]
        return (m * (u + 0.5 * (v ** 2).sum(-1))).sum()

    e0 = etot(mfv_sim.snapshots[0])
    e1 = etot(mfv_sim.snapshots[-1])
    assert abs(e1 - e0) / abs(e0) < 1e-10  # fluxes are exactly conservative


class TestExactRiemannSolver:
    """riemann_solver = exact (ExactRiemannSolver::ComputeFluxes,
    src/Hydrodynamics/RiemannSolver.cpp:135-552)."""

    def test_star_region_matches_oracle(self):
        import jax.numpy as jnp
        import numpy as np
        from gandalf_tpu.analysis.riemann import sample, star_region
        from gandalf_tpu.ops.mfv import _sample_zero, exact_star_region

        g = 1.4
        cases = [(1.0, 0.0, 1.0, 0.125, 0.0, 0.1),          # Sod
                 (1.0, -2.0, 0.4, 1.0, 2.0, 0.4),           # 123 problem
                 (1.0, 0.0, 1000.0, 1.0, 0.0, 0.01),        # blast (Toro 3)
                 (5.99924, 19.5975, 460.894,
                  5.99242, -6.19633, 46.095)]               # Toro 4
        rng = np.random.default_rng(3)
        for _ in range(20):                                 # random states
            dl, dr = rng.uniform(0.05, 5.0, 2)
            pl, pr = rng.uniform(0.05, 5.0, 2)
            ul, ur = rng.uniform(-1.5, 1.5, 2)
            cases.append((dl, ul, pl, dr, ur, pr))
        for dl, ul, pl, dr, ur, pr in cases:
            ps_np, us_np = star_region(dl, ul, pl, dr, ur, pr, g)
            if ps_np <= 0.0:
                continue
            cl, cr = np.sqrt(g * pl / dl), np.sqrt(g * pr / dr)
            a = map(jnp.atleast_1d, (dl, ul, pl, cl, dr, ur, pr, cr))
            ps, us = exact_star_region(*a, g)
            assert abs(float(ps[0]) - ps_np) <= 1e-10 * ps_np + 1e-12
            assert abs(float(us[0]) - us_np) <= 1e-10 * abs(us_np) + 1e-10
            d0, u0, p0 = _sample_zero(
                ps, us, *map(jnp.atleast_1d,
                             (dl, ul, pl, cl, dr, ur, pr, cr)), g)
            ref = sample(np.array([0.0]), dl, ul, pl, dr, ur, pr, g)
            assert abs(float(d0[0]) - ref["rho"][0]) < 1e-8
            assert abs(float(p0[0]) - ref["pressure"][0]) < 1e-8

    def test_exact_solver_shocktube(self):
        """Low-res MFV Sod with the exact solver stays finite and
        develops the correct shock plateau."""
        import numpy as np

        p = make_mfv_adsod_params()
        p.set("riemann_solver", "exact")
        p.set("Nlattice1[0]", 128)
        p.set("Nlattice2[0]", 32)
        p.set("tend", 0.2)
        p.set("run_id", "")
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        n = 0
        while sim.t < 0.2 and n < 800:
            sim.main_loop_step()
            n += 1
        s = sim.state
        assert np.isfinite(np.asarray(s.v)).all()
        x = np.asarray(s.r)[:, 0]
        vx = np.asarray(s.v)[:, 0]
        from gandalf_tpu.analysis.riemann import shocktube_solution

        sol = shocktube_solution(1.0, 0.0, 1.0, 0.25, 0.0, 0.1975, 1.4,
                                 -1.0, 0.0, 1.0, sim.t)
        sel = (x > -1.0) & (x < 1.0)
        l1 = float(np.mean(np.abs(vx[sel] - np.interp(x[sel], sol["x"],
                                                      sol["vx"]))))
        # ~4x the 512/128 result (0.0086) at quarter resolution
        assert l1 < 0.04, f"exact-solver L1(vx) = {l1}"


@pytest.mark.parametrize("lim", ["scalar", "null", "zeroslope",
                                 "tvdscalar", "springel2009",
                                 "tess2011", "balsara2004"])
def test_slope_limiter_options(lim):
    """slope_limiter = scalar/null/zeroslope/tvdscalar/springel2009 (and
    the tess2011/balsara2004 aliases) stay finite on the Sod tube
    (reference SlopeLimiter template dispatch,
    MeshlessFVSimulation.cpp:87-110)."""
    import numpy as np

    p = make_mfv_adsod_params()
    p.set("run_id", "")
    p.set("slope_limiter", lim)
    p.set("Nlattice1[0]", 128)
    p.set("Nlattice2[0]", 32)
    p.set("tend", 0.1)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    n = 0
    while sim.t < 0.1 and n < 600:
        sim.main_loop_step()
        n += 1
    vx = np.asarray(sim.state.v)[:, 0]
    assert np.isfinite(vx).all()
    # the shock plateau is developing in the right direction
    assert vx.max() > 0.3


def test_mfv_rk2_adsod_l1():
    """MfvRungeKutta (Heun) variant passes the same Sod gate
    (reference MfvRungeKuttaSimulation)."""
    facade.SimBuffer.reset()
    p = make_mfv_adsod_params()
    p.set("sim", "mfvrk")
    p.set("run_id", "ADSOD_MFVRK")
    sim = SimulationBase.factory(p)
    facade.SimBuffer.add_sim(sim)
    facade.run()
    facade.snap(-1)
    err = L1errornorm("shocktube", "x", "vx", -1.0, 1.0)
    assert err < 7e-3, f"MFV-RK2 L1(vx) = {err}"
    assert sim.t >= 0.5


def test_mfv_mirror_wall():
    """MFV mirror boundaries (reference MeshlessFV reflect() images): a
    gas slab slamming into a reflecting wall stays inside the box, piles
    up against the wall and stagnates there; mass exactly conserved."""
    p = Parameters()
    for k, v in {
            "run_id": "", "sim": "mfvmuscl", "ic": "shocktube", "ndim": 1,
            "press1": 1.0, "press2": 1.0,
            "rhofluid1": 1.0, "rhofluid2": 1.0,
            "vfluid1[0]": 1.0, "vfluid2[0]": 1.0,
            "Nlattice1[0]": 64, "Nlattice2[0]": 64,
            "dimensionless": 1,
            "boxmin[0]": -1.0, "boxmax[0]": 1.0,
            "boundary_lhs[0]": "mirror", "boundary_rhs[0]": "mirror",
            "tend": 0.4, "dt_snap": 0.4,
            "gas_eos": "energy_eqn", "gamma_eos": 1.4,
            "riemann_solver": "hllc", "slope_limiter": "gizmo",
            "zero_mass_flux": 1, "courant_mult": 0.2,
            "Nlevels": 1}.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    assert not sim.use_celllist     # mirror walls use the image path
    m0 = float(np.asarray(sim.state.m).sum())
    n = 0
    while sim.t < 0.4 and n < 3000:
        sim.main_loop_step()
        n += 1
    s = sim.state
    x = np.asarray(s.r)[:, 0]
    v = np.asarray(s.v)[:, 0]
    rho = np.asarray(s.rho)
    assert (x > -1.0 - 1e-9).all() and (x < 1.0 + 1e-9).all(), \
        "particles escaped through the wall"
    assert float(np.asarray(s.m).sum()) == pytest.approx(m0, rel=1e-12)
    # compression against the right wall; stagnation at the wall
    near = x > 0.8
    far = x < -0.5
    assert near.sum() > 3
    assert rho[near].mean() > 1.5 * rho[far].mean()
    assert abs(v[near].mean()) < 0.5    # decelerated from v = 1
    assert np.isfinite(v).all()


class TestPerNeighbourLimiters:
    """Unit gates for the TVD-scalar and Springel (2009) cell limiters
    (SlopeLimiter.h:127-171, 261-316): exactness on linear fields, and
    monotonicity (alpha in [0, 1], limited at discontinuities)."""

    def _fields(self, W_fn):
        import jax.numpy as jnp

        from gandalf_tpu.kernels.smoothing import kernel_factory

        kern = kernel_factory("m4", 1)
        N = 12
        x = np.arange(N, dtype=np.float64)
        W = np.stack([W_fn(x), np.ones(N), np.ones(N)], -1)  # vx, rho, p
        h = np.full(N, 1.5)
        dr = (x[None, :] - x[:, None])[..., None]            # (N, N, 1)
        W_j = np.broadcast_to(W[None], (N, N, 3))
        # exact least-squares gradient on the kernel-range set
        grad = np.zeros((N, 3, 1))
        for i in range(N):
            near = (np.abs(x - x[i]) <= kern.kernrange * h[i]) \
                & (x != x[i])
            A = np.sum((x[near] - x[i]) ** 2)
            for v in range(3):
                grad[i, v, 0] = np.sum(
                    (x[near] - x[i]) * (W[near, v] - W[i, v])) / A
        return kern, jnp.asarray(h), jnp.asarray(W), jnp.asarray(grad), \
            jnp.asarray(dr), jnp.asarray(W_j)

    @pytest.mark.parametrize("lim", ["tvdscalar", "springel2009"])
    def test_linear_field_unlimited(self, lim):
        """A linear field reconstructs exactly: alpha must stay 1."""
        import jax.numpy as jnp

        from gandalf_tpu.ops.mfv import limiter_alpha_accumulate

        kern, h, W, grad, dr, W_j = self._fields(lambda x: 0.25 * x)
        dWmax = jnp.max(W_j, 1) - W
        dWmin = jnp.min(W_j, 1) - W
        alpha = limiter_alpha_accumulate(
            lim, kern, 1, jnp.ones((W.shape[0], 3)), h, W, grad,
            dWmax, dWmin, dr, W_j, None)
        # interior particles (full stencils) must be unlimited
        np.testing.assert_allclose(np.asarray(alpha)[3:-3], 1.0,
                                   atol=1e-12)

    @pytest.mark.parametrize("lim", ["tvdscalar", "springel2009"])
    def test_step_is_limited(self, lim):
        """A step function must be limited near the jump, alpha in
        [0, 1] everywhere."""
        import jax.numpy as jnp

        from gandalf_tpu.ops.mfv import limiter_alpha_accumulate

        kern, h, W, grad, dr, W_j = self._fields(
            lambda x: np.where(x < 6, 0.0, 1.0))
        dWmax = jnp.max(W_j, 1) - W
        dWmin = jnp.min(W_j, 1) - W
        alpha = np.asarray(limiter_alpha_accumulate(
            lim, kern, 1, jnp.ones((W.shape[0], 3)), h, W, grad,
            dWmax, dWmin, dr, W_j, None))
        assert (alpha >= 0.0).all() and (alpha <= 1.0 + 1e-12).all()
        # the vx channel is limited for the particles flanking the jump
        assert alpha[4:8, 0].min() < 0.999
        # the constant channels stay unlimited
        np.testing.assert_allclose(alpha[:, 1:], 1.0, atol=1e-12)

    def test_alias_normalisation(self):
        """tess2011 -> tvdscalar, balsara2004 -> scalar
        (MeshlessFVSimulation.cpp:95-101)."""
        p = make_mfv_adsod_params()
        p.set("run_id", "")
        p.set("slope_limiter", "tess2011")
        sim = SimulationBase.factory(p)
        sim.process_parameters()
        assert sim.mfv_cfg.slope_limiter == "tvdscalar"
        p2 = make_mfv_adsod_params()
        p2.set("run_id", "")
        p2.set("slope_limiter", "balsara2004")
        sim2 = SimulationBase.factory(p2)
        sim2.process_parameters()
        assert sim2.mfv_cfg.slope_limiter == "scalar"
