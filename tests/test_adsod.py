"""Adiabatic Sod shocktube regression gate.

Same physics configuration and L1 threshold as the reference's
tests/hydro_tests/test_adsod.py (SPH L1(vx) < 9e-3 against the exact
Riemann solution over x in [-1, 1] at t = 0.5); parameters are set
programmatically for hermeticity.
"""

import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.analysis import facade
from gandalf_tpu.analysis.compute import L1errornorm
from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def make_adsod_params() -> Parameters:
    p = Parameters()
    updates = {
        "run_id": "ADSOD1",
        "sim": "gradhsph",
        "ic": "shocktube",
        "ndim": 1,
        "vfluid1[0]": 0.0,
        "vfluid2[0]": 0.0,
        "press1": 1.0,
        "press2": 0.1975,
        "rhofluid1": 1.0,
        "rhofluid2": 0.25,
        "Nlattice1[0]": 512,
        "Nlattice2[0]": 128,
        "dimensionless": 1,
        "boxmin[0]": -2.0,
        "boxmax[0]": 2.0,
        "boundary_lhs[0]": "periodic",
        "boundary_rhs[0]": "periodic",
        "tend": 0.5,
        "dt_snap": 0.25,
        "tsnapfirst": 0.0,
        "out_file_form": "column",
        "hydro_forces": 1,
        "gas_eos": "energy_eqn",
        "gamma_eos": 1.4,
        "kernel": "m4",
        "h_converge": 0.01,
        "avisc": "mon97",
        "acond": "none",
        "alpha_visc": 1.0,
        "beta_visc": 2.0,
        "sph_integration": "lfkdk",
        "courant_mult": 0.2,
        "accel_mult": 0.4,
        "energy_mult": 0.5,
        "Nlevels": 1,
        "neib_search": "bruteforce",
    }
    for k, v in updates.items():
        p.set(k, v)
    return p


@pytest.fixture(scope="module")
def adsod_sim():
    facade.SimBuffer.reset()
    params = make_adsod_params()
    sim = SimulationBase.factory(params)
    facade.SimBuffer.add_sim(sim)
    facade.run()
    return sim


def test_adsod_l1_error(adsod_sim):
    facade.snap(-1)
    err = L1errornorm("shocktube", "x", "vx", -1.0, 1.0)
    assert err < 9e-3, f"L1(vx) = {err}"


def test_adsod_density_l1(adsod_sim):
    facade.snap(-1)
    err = L1errornorm("shocktube", "x", "rho", -1.0, 1.0)
    assert err < 1.2e-2, f"L1(rho) = {err}"


def test_adsod_reaches_tend(adsod_sim):
    assert adsod_sim.t >= 0.5


def test_adsod_conservation(adsod_sim):
    """Total momentum and energy conservation over the run."""
    import numpy as np

    first = adsod_sim.snapshots[0]
    last = adsod_sim.snapshots[-1]

    def totals(s):
        m = s.data["m"]
        v = s.data["v"]
        u = s.data["u"]
        mom = (m[:, None] * v).sum(axis=0)
        etot = (0.5 * m * (v**2).sum(-1) + m * u).sum()
        return mom, etot

    mom0, e0 = totals(first)
    mom1, e1 = totals(last)
    assert np.abs(mom1 - mom0).max() < 1e-6
    assert abs(e1 - e0) / abs(e0) < 2e-3


def test_time_dependent_viscosity_mm97():
    """avisc=mon97 + time_dependent_avisc=mm97 (GradhSph.cpp:453-456):
    alpha starts at alpha_visc_min, rises only near the shock, and the
    solution stays within the L1 gate."""
    import numpy as np

    from gandalf_tpu.analysis.riemann import shocktube_solution
    from gandalf_tpu.sim.simulation import GradhSphSimulation

    p = make_adsod_params()
    p.set("run_id", "")
    p.set("time_dependent_avisc", "mm97")
    p.set("Nlattice1[0]", 256)
    p.set("Nlattice2[0]", 64)
    p.set("tend", 0.25)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    a0 = np.asarray(sim.state.alpha)
    assert np.allclose(a0, 0.1)           # alpha_visc_min
    n = 0
    while sim.t < 0.25 and n < 5000:
        sim.main_loop_step()
        n += 1
    s = sim.state
    alpha = np.asarray(s.alpha)
    assert alpha.max() > 0.2              # switched on at the shock
    assert np.median(alpha) < 0.15        # quiet flow stays near the floor
    x = np.asarray(s.r)[:, 0]
    vx = np.asarray(s.v)[:, 0]
    sol = shocktube_solution(1.0, 0.0, 1.0, 0.25, 0.0, 0.1975, 1.4,
                             -1.0, 0.0, 1.0, sim.t)
    sel = (x > -1.0) & (x < 1.0)
    l1 = float(np.mean(np.abs(vx[sel] - np.interp(x[sel], sol["x"],
                                                  sol["vx"]))))
    assert l1 < 0.02


def test_time_dependent_viscosity_cd2010():
    """avisc=mon97 + time_dependent_avisc=cd2010 (Cullen & Dehnen switch,
    src/Headers/Sph.h:360-456): alpha triggered only at the shock."""
    import numpy as np

    from gandalf_tpu.analysis.riemann import shocktube_solution
    from gandalf_tpu.sim.simulation import GradhSphSimulation

    p = make_adsod_params()
    p.set("run_id", "")
    p.set("time_dependent_avisc", "cd2010")
    p.set("Nlattice1[0]", 256)
    p.set("Nlattice2[0]", 64)
    p.set("tend", 0.25)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    n = 0
    while sim.t < 0.25 and n < 3000:
        sim.main_loop_step()
        n += 1
    s = sim.state
    alpha = np.asarray(s.alpha)
    assert alpha.max() > 0.25                 # switch fired at the shock
    assert np.median(alpha) < 0.15            # quiet flow at the floor
    x = np.asarray(s.r)[:, 0]
    vx = np.asarray(s.v)[:, 0]
    sol = shocktube_solution(1.0, 0.0, 1.0, 0.25, 0.0, 0.1975, 1.4,
                             -1.0, 0.0, 1.0, sim.t)
    sel = (x > -1.0) & (x < 1.0)
    l1 = float(np.mean(np.abs(vx[sel] - np.interp(x[sel], sol["x"],
                                                  sol["vx"]))))
    assert l1 < 0.02
