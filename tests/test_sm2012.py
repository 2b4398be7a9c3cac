"""Saitoh-Makino (2012) density-independent SPH
(reference src/SM2013/SM2012Sph.cpp, sim = sm2012sph)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase, SM2012SphSimulation


def _adsod(simtype, n1=256, n2=64, tend=0.25):
    p = Parameters()
    for k, v in {
            "ndim": 1, "sim": simtype, "ic": "shocktube",
            "dimensionless": 1, "run_id": "",
            "vfluid1[0]": 0.0, "vfluid2[0]": 0.0,
            "press1": 1.0, "press2": 0.1975,
            "rhofluid1": 1.0, "rhofluid2": 0.25,
            "Nlattice1[0]": n1, "Nlattice2[0]": n2,
            "boxmin[0]": -2.0, "boxmax[0]": 2.0,
            "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
            "gas_eos": "energy_eqn", "gamma_eos": 1.4,
            "hydro_forces": 1, "neib_search": "bruteforce",
            "avisc": "mon97", "alpha_visc": 1.0, "beta_visc": 2.0,
            "courant_mult": 0.2, "accel_mult": 0.4, "energy_mult": 0.5,
            "tend": tend}.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    n = 0
    while sim.t < tend and n < 5000:
        sim.main_loop_step()
        n += 1
    return sim


def test_factory_dispatch():
    p = Parameters()
    p.set("sim", "sm2012sph")
    assert isinstance(SimulationBase.factory(p), SM2012SphSimulation)


def test_sm2012_sod_shock():
    """Sod tube within a slightly looser L1 gate than grad-h (SM2012 is
    more diffusive at shocks; its win is at contacts) + exact energy
    conservation."""
    from gandalf_tpu.analysis.riemann import shocktube_solution

    sim = _adsod("sm2012sph")
    s = sim.state
    x = np.asarray(s.r)[:, 0]
    vx = np.asarray(s.v)[:, 0]
    sol = shocktube_solution(1.0, 0.0, 1.0, 0.25, 0.0, 0.1975, 1.4,
                             -1.0, 0.0, 1.0, sim.t)
    sel = (x > -1.0) & (x < 1.0)
    l1 = float(np.mean(np.abs(vx[sel] - np.interp(x[sel], sol["x"],
                                                  sol["vx"]))))
    assert l1 < 0.03, f"sm2012 L1(vx) = {l1}"
    m = np.asarray(s.m)
    E = 0.5 * (m * vx ** 2).sum() + (m * np.asarray(s.u)).sum()
    E0 = 1.0 / 0.4 * 2.0 + 0.1975 / 0.4 * 2.0
    assert E == pytest.approx(E0, rel=1e-4)


def test_sm2012_contact_discontinuity_sharper_than_gradh():
    """The scheme's defining property: a static contact discontinuity
    generates less spurious velocity than grad-h SPH
    (Saitoh & Makino 2013 fig. 2 behaviour)."""
    def contact(simtype):
        p = Parameters()
        for k, v in {
                "ndim": 1, "sim": simtype, "ic": "cdiscontinuity",
                "dimensionless": 1, "run_id": "",
                "rhofluid1": 1.0, "rhofluid2": 4.0, "press1": 1.0,
                "Nlattice1[0]": 32, "Nlattice2[0]": 128,
                "boxmin[0]": -1.0, "boxmax[0]": 1.0,
                "boundary_lhs[0]": "periodic",
                "boundary_rhs[0]": "periodic",
                "gas_eos": "energy_eqn", "gamma_eos": 1.4,
                "hydro_forces": 1, "neib_search": "bruteforce",
                "avisc": "mon97", "alpha_visc": 1.0, "beta_visc": 2.0,
                "tend": 0.5}.items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        n = 0
        while sim.t < 0.5 and n < 2000:
            sim.main_loop_step()
            n += 1
        return float(np.abs(np.asarray(sim.state.v)[:, 0]).max())

    v_gradh = contact("gradhsph")
    v_sm = contact("sm2012sph")
    assert v_sm < 0.8 * v_gradh, (v_sm, v_gradh)
    assert v_sm < 0.05


def test_sm2012_grid_matches_bruteforce():
    """Grid27 q-pass vs the all-pairs oracle: one bootstrap from identical
    ICs must agree to roundoff (shared physics, different neighbour
    partition); SM2012 left the O(N^2) fallback in round 3."""
    import numpy as np

    sims = {}
    for neib in ("bruteforce", "kdtree"):
        p = Parameters()
        for k, v in {
                "ndim": 1, "sim": "sm2012sph", "ic": "shocktube",
                "dimensionless": 1, "run_id": "",
                "press1": 1.0, "press2": 0.1975,
                "rhofluid1": 1.0, "rhofluid2": 0.25,
                "Nlattice1[0]": 256, "Nlattice2[0]": 64,
                "boxmin[0]": -2.0, "boxmax[0]": 2.0,
                "boundary_lhs[0]": "periodic",
                "boundary_rhs[0]": "periodic",
                "gas_eos": "energy_eqn", "gamma_eos": 1.4,
                "hydro_forces": 1, "neib_search": neib,
                "tend": 0.25}.items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        sims[neib] = sim
    a = sims["bruteforce"].state
    b = sims["kdtree"].state
    assert sims["kdtree"].use_celllist
    # same h-iteration -> same fixed point at this config; fields match
    for f in ("rho", "pressure", "a", "dudt"):
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        np.testing.assert_allclose(y, x, rtol=2e-5, atol=1e-8,
                                   err_msg=f)
