"""External-potential wiring tests.

Reference: ExternalPotential.h:45-173 (VerticalPotential, PlummerPotential),
factory at Simulation.cpp:1163-1181, applied per active particle in the SPH
force loop (SphSimulation.cpp:478,717) and to N-body stars with the jerk
term (SphSimulation.cpp:511,806).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation, SimulationBase


def test_vertical_potential_sph():
    """Uniform periodic gas box + vertical field: every particle feels
    exactly avert along kgrav (hydro forces cancel by symmetry)."""
    p = Parameters()
    updates = {
        "run_id": "", "sim": "gradhsph", "ic": "box", "ndim": 3,
        "dimensionless": 1, "gas_eos": "energy_eqn", "gamma_eos": 1.4,
        "rhofluid1": 1.0, "press1": 1.0, "tend": 1e30, "tsnapfirst": 1e30,
        "external_potential": "vertical", "kgrav": 2, "avert": -0.5,
        "neib_search": "bruteforce",
    }
    for k in range(3):
        updates[f"boxmin[{k}]"] = 0.0
        updates[f"boxmax[{k}]"] = 1.0
        updates[f"boundary_lhs[{k}]"] = "periodic"
        updates[f"boundary_rhs[{k}]"] = "periodic"
        updates[f"Nlattice1[{k}]"] = 6
    for k, v in updates.items():
        p.set(k, v)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    a = np.asarray(sim.state.a)
    assert np.allclose(a[:, 2], -0.5, atol=1e-10)
    assert np.allclose(a[:, :2], 0.0, atol=1e-10)


def test_plummer_potential_orbit():
    """Two light test stars on circular orbits in a background Plummer
    potential: radius and energy stay constant over several orbits."""
    p = Parameters()
    base = {
        "run_id": "", "sim": "nbody", "ndim": 3, "dimensionless": 1,
        "nbody": "hermite4", "nbody_softening": 0, "nbody_mult": 0.1,
        "external_potential": "plummer", "mplummer": 1.0, "rplummer": 0.5,
        "ic": "binary", "abin": 10.0, "m1": 1e-8, "m2": 1e-8,
        "tsnapfirst": 1e30, "tend": 1e30,
    }
    for k, v in base.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    # overwrite the binary with two circular-orbit test particles
    r0 = 1.0
    denom = r0 * r0 + 0.5 * 0.5
    vc = np.sqrt(1.0 * r0 * r0 / denom ** 1.5)
    r = np.array([[r0, 0.0, 0.0], [-r0, 0.0, 0.0]])
    v = np.array([[0.0, vc, 0.0], [0.0, -vc, 0.0]])
    s = sim.state
    sim.state = s.replace(
        r=s.r * 0 + r, v=s.v * 0 + v,
        m=s.m * 0 + 1e-8, h=s.h * 0 + 0.1)
    sim.state = sim._bootstrap_fn(sim.state)
    t_orbit = 2 * np.pi * r0 / vc
    n = 0
    while float(sim.state.t) < 3 * t_orbit and n < 40000:
        sim.main_loop_step()
        n += 1
    rf = np.asarray(sim.state.r)
    rad = np.linalg.norm(rf, axis=1)
    assert rad == pytest.approx(r0, rel=2e-3), f"orbit radius drifted: {rad}"
