"""2D IC + physics smoke/conservation gates: KHI, Gresho, Sedov, Noh
(reference tests/hydro_tests/{khi,gresho,sedov,noh}.dat configurations,
shortened for CI; the structured-grid neighbour path is exercised in 2D)."""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def base_params(**overrides):
    p = Parameters()
    base = {
        "run_id": "IC2D", "sim": "gradhsph", "ndim": 2, "dimensionless": 1,
        "gas_eos": "energy_eqn", "gamma_eos": 1.66666666666666,
        "tsnapfirst": 0.0, "dt_snap": 1.0, "kernel": "m4",
        "courant_mult": 0.2, "accel_mult": 0.3, "Nlevels": 1,
        "neib_search": "kdtree",
    }
    base.update(overrides)
    for k, v in base.items():
        p.set(k, v)
    return p


def totals(sim):
    s = sim.state
    m = np.asarray(s.m)
    v = np.asarray(s.v)
    u = np.asarray(s.u)
    mom = (m[:, None] * v).sum(0)
    etot = (m * (u + 0.5 * (v ** 2).sum(-1))).sum()
    return mom, etot


class TestKhi:
    @pytest.fixture(scope="class")
    def sim(self):
        p = base_params(
            ic="khi", gamma_eos=1.4, rhofluid1=1.0, rhofluid2=2.0,
            press1=2.5, press2=2.5, amp=0.1, **{"lambda": 0.5})
        for k, v in {"Nlattice1[0]": 32, "Nlattice1[1]": 16,
                     "Nlattice2[0]": 48, "Nlattice2[1]": 24,
                     "vfluid1[0]": 0.5, "vfluid2[0]": -0.5,
                     "boxmin[0]": -0.5, "boxmax[0]": 0.5,
                     "boxmin[1]": -0.5, "boxmax[1]": 0.5,
                     "boundary_lhs[0]": "periodic",
                     "boundary_rhs[0]": "periodic",
                     "boundary_lhs[1]": "periodic",
                     "boundary_rhs[1]": "periodic",
                     "tend": 0.2}.items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        self_mom0, self_e0 = totals(sim)
        sim.Run()
        return sim, self_mom0, self_e0

    def test_runs_and_finite(self, sim):
        s, _, _ = sim
        assert s.t >= 0.2
        assert np.isfinite(np.asarray(s.state.rho)).all()

    def test_momentum_energy(self, sim):
        s, mom0, e0 = sim
        mom1, e1 = totals(s)
        assert np.abs(mom1 - mom0).max() < 1e-8
        assert abs(e1 - e0) / abs(e0) < 5e-3

    def test_density_contrast_persists(self, sim):
        s, _, _ = sim
        rho = np.asarray(s.state.rho)
        assert rho.min() < 1.3 and rho.max() > 1.6


class TestGresho:
    @pytest.fixture(scope="class")
    def sim(self):
        p = base_params(ic="gresho", gamma_eos=1.4, sim="mfvmuscl",
                        riemann_solver="hllc", courant_mult=0.2)
        for k, v in {"Nlattice1[0]": 32, "Nlattice1[1]": 32,
                     "boxmin[0]": -0.5, "boxmax[0]": 0.5,
                     "boxmin[1]": -0.5, "boxmax[1]": 0.5,
                     "boundary_lhs[0]": "periodic",
                     "boundary_rhs[0]": "periodic",
                     "boundary_lhs[1]": "periodic",
                     "boundary_rhs[1]": "periodic",
                     "tend": 0.3}.items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.Run()
        return sim

    def test_vortex_survives(self, sim):
        """Azimuthal velocity profile stays close to the steady state."""
        s = sim.state
        r = np.asarray(s.r)
        v = np.asarray(s.v)
        rad = np.sqrt((r ** 2).sum(-1)) + 1e-30
        vphi = (-v[:, 0] * r[:, 1] + v[:, 1] * r[:, 0]) / rad
        exact = np.where(rad < 0.2, 5.0 * rad,
                         np.where(rad < 0.4, 2.0 - 5.0 * rad, 0.0))
        mask = rad < 0.45
        l1 = np.abs(vphi[mask] - exact[mask]).mean()
        assert l1 < 0.12, f"gresho L1(vphi) = {l1}"


class TestSedov:
    @pytest.fixture(scope="class")
    def sim(self):
        p = base_params(ic="sedov", gamma_eos=1.4, kefrac=0.0, smooth_ic=1)
        for k, v in {"Nlattice1[0]": 32, "Nlattice1[1]": 32,
                     "boxmin[0]": -1.0, "boxmax[0]": 1.0,
                     "boxmin[1]": -1.0, "boxmax[1]": 1.0,
                     "boundary_lhs[0]": "periodic",
                     "boundary_rhs[0]": "periodic",
                     "boundary_lhs[1]": "periodic",
                     "boundary_rhs[1]": "periodic",
                     "rhofluid1": 1.0, "tend": 0.03,
                     "courant_mult": 0.1}.items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        e0 = totals(sim)[1]
        sim.Run()
        return sim, e0

    def test_blast_expands_symmetrically(self, sim):
        s, _ = sim
        r = np.asarray(s.state.r)
        v = np.asarray(s.state.v)
        rad = np.sqrt((r ** 2).sum(-1))
        vr = (v * r).sum(-1) / (rad + 1e-30)
        # outflow in the blast region, ~zero far away
        assert vr[rad < 0.2].mean() > 0.1
        assert np.abs(vr[rad > 0.8]).max() < 1e-2
        # isotropy: net momentum stays ~0
        mom = (np.asarray(s.state.m)[:, None] * v).sum(0)
        assert np.abs(mom).max() < 1e-8

    def test_energy_conserved(self, sim):
        s, e0 = sim
        e1 = totals(s)[1]
        assert abs(e1 - e0) / abs(e0) < 5e-3


class TestNoh:
    def test_inflow_shock_forms(self):
        p = base_params(ic="noh", gamma_eos=1.66666666666666,
                        courant_mult=0.15)
        for k, v in {"Nlattice1[0]": 32, "Nlattice1[1]": 32,
                     "boxmin[0]": -0.5, "boxmax[0]": 0.5,
                     "boxmin[1]": -0.5, "boxmax[1]": 0.5,
                     "boundary_lhs[0]": "periodic",
                     "boundary_rhs[0]": "periodic",
                     "boundary_lhs[1]": "periodic",
                     "boundary_rhs[1]": "periodic",
                     "rhofluid1": 1.0, "press1": 1.0e-6,
                     "tend": 0.05}.items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.Run()
        rho = np.asarray(sim.state.rho)
        r = np.asarray(sim.state.r)
        rad = np.sqrt((r ** 2).sum(-1))
        # central density builds towards the (gamma+1)/(gamma-1))^2 = 16 wall
        assert rho[rad < 0.1].mean() > 2.0
        assert np.isfinite(rho).all()


class TestNewIcs:
    """evrard / isothermsphere / turbcore / blob / cdiscontinuity
    (src/Ic/EvrardCollapseIc.cpp, IsothermalSphereIc.cpp,
    TurbulentCoreIc.cpp, BlobIc.cpp, ContactDiscontinuityIc.cpp)."""

    def test_evrard_profile(self):
        import numpy as np
        from gandalf_tpu.ops.eos import eos_factory
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.ic import generate_ic

        p = Parameters()
        for k, v in dict(ndim=3, Nhydro=600, ic="evrard", mcloud=1.0,
                         radius=1.0, thermal_energy=0.05,
                         gas_eos="energy_eqn", dimensionless=1).items():
            p.set(k, v)
        ic = generate_ic(p, eos_factory(p))
        rad = np.sqrt((ic["r"] ** 2).sum(-1))
        assert rad.max() <= 1.0 + 1e-9
        assert np.allclose(ic["u"], 0.05)
        assert ic["m"].sum() == pytest.approx(1.0)
        # rho ~ 1/r: cumulative mass M(<r) ~ r^2
        for rr in (0.3, 0.6, 0.9):
            frac = (rad < rr).mean()
            assert abs(frac - rr ** 2) < 0.08

    def test_isothermsphere_profile(self):
        import numpy as np
        from gandalf_tpu.ops.eos import eos_factory
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.ic import generate_ic

        p = Parameters()
        for k, v in dict(ndim=3, Nhydro=2000, ic="isothermsphere",
                         mcloud=1.0, radius=1.0, gas_eos="isothermal",
                         temp0=0.1, mu_bar=1.0, dimensionless=1).items():
            p.set(k, v)
        ic = generate_ic(p, eos_factory(p))
        rad = np.sqrt((ic["r"] ** 2).sum(-1))
        # n(r) ~ r^-2 => M(<r) ~ r
        for rr in (0.25, 0.5, 0.75):
            assert abs((rad < rr).mean() - rr) < 0.05

    def test_turbcore_virial_scaling(self):
        import numpy as np
        from gandalf_tpu.ops.eos import eos_factory
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.ic import generate_ic

        p = Parameters()
        for k, v in dict(ndim=3, Nhydro=400, ic="turbcore", mcloud=2.0,
                         radius=0.5, alpha_turb=0.4, power_turb=-4.0,
                         gridsize=16, gas_eos="isothermal", temp0=0.01,
                         mu_bar=1.0, dimensionless=1).items():
            p.set(k, v)
        ic = generate_ic(p, eos_factory(p))
        ke = 0.5 * (ic["m"][:, None] * ic["v"] ** 2).sum()
        gpe = 0.6 * 2.0 ** 2 / 0.5
        assert ke == pytest.approx(0.4 * gpe, rel=1e-10)
        # solenoidal field: bulk momentum ~ 0 relative to rms
        mom = (ic["m"][:, None] * ic["v"]).sum(0)
        vrms = np.sqrt((ic["v"] ** 2).mean())
        assert np.abs(mom).max() < 0.5 * vrms * ic["m"].sum()

    def test_blob_pressure_equilibrium(self):
        import numpy as np
        from gandalf_tpu.ops.eos import eos_factory
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.ic import generate_ic

        p = Parameters()
        for k, v in dict(ndim=2, ic="blob", rhofluid1=1.0, rhofluid2=10.0,
                         press1=1.0, mach=2.7, radius=0.1,
                         gamma_eos=1.6666666666666667,
                         gas_eos="energy_eqn", dimensionless=1).items():
            p.set(k, v)
        for k in range(2):
            p.set(f"Nlattice1[{k}]", 32)
            p.set(f"boxmin[{k}]", -0.5)
            p.set(f"boxmax[{k}]", 0.5)
        ic = generate_ic(p, eos_factory(p))
        rad = np.sqrt((ic["r"] ** 2).sum(-1))
        inside = rad < 0.1
        gm1 = 1.6666666666666667 - 1.0
        # pressure equilibrium: rho*u*(gamma-1) == press1 everywhere
        rho = np.where(inside, 10.0, 1.0)
        assert np.allclose(rho * ic["u"] * gm1, 1.0)
        # wind only outside the cloud
        assert np.all(ic["v"][inside, 0] == 0.0)
        assert ic["v"][~inside, 0].min() > 3.0

    def test_disc_ic(self):
        import numpy as np
        from gandalf_tpu.ops.eos import eos_factory
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.ic import generate_ic

        p = Parameters()
        for k, v in dict(ndim=3, ic="disc", Nhydro=2000, dimensionless=1,
                         gas_eos="disc_locally_isothermal",
                         gamma_eos=1.6666667, DiscIcPlanet=1).items():
            p.set(k, v)
        ic = generate_ic(p, eos_factory(p))
        rs = np.sqrt((ic["r"][:, :2] ** 2).sum(-1))
        assert rs.min() > 0.39 and rs.max() < 2.51
        # Sigma ~ 1/r (p=1): M(<r) linear in r
        frac = (rs < 1.0).mean()
        assert abs(frac - (1.0 - 0.4) / (2.5 - 0.4)) < 0.03
        # sub-Keplerian prograde rotation
        j = ic["r"][:, 0] * ic["v"][:, 1] - ic["r"][:, 1] * ic["v"][:, 0]
        vk = np.sqrt(1.0 / rs)
        ratio = j / rs / vk
        assert 0.98 < ratio.mean() < 1.0
        # central star + planet
        assert len(ic["star"]["m"]) == 2
        assert ic["star"]["m"][0] == pytest.approx(1.0)

    def test_gaussianring_ic(self):
        import numpy as np
        from gandalf_tpu.ops.eos import eos_factory
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.ic import generate_ic

        p = Parameters()
        for k, v in dict(ndim=2, ic="gaussianring", Nhydro=4200,
                         dimensionless=1, temp0=0.001, mu_bar=1.0,
                         gas_eos="isothermal",
                         gamma_eos=1.6666667).items():
            p.set(k, v)
        ic = generate_ic(p, eos_factory(p))
        rr = np.sqrt((ic["r"] ** 2).sum(-1))
        assert 0.79 < rr.min() and rr.max() < 0.91
        # Gaussian mass profile peaks at the ring centre
        assert abs(rr[ic["m"].argmax()] - 0.85) < 0.01
        assert ic["star"]["m"][0] == 1.0
