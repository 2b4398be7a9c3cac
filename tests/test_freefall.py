"""Free-fall collapse regression gate (reference
tests/grav_tests/test_freefall.py): pressureless uniform sphere with
self-gravity; the half-mass Lagrangian radius must follow the analytic
cycloid solution with L1 < 9e-3."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.analysis.compute import lagrangian_radii
from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def freefall_analytical_radius(tfrac: float) -> float:
    """r(t)/r0 for homologous collapse: t/tff = (2/pi)(beta + sin(2beta)/2),
    r/r0 = cos^2(beta)."""
    beta = np.linspace(0.0, np.pi / 2.0, 100001)
    tf = (beta + 0.5 * np.sin(2.0 * beta)) * 2.0 / np.pi
    rf = np.cos(beta) ** 2
    return float(np.interp(tfrac, tf, rf))


@pytest.fixture(scope="module")
def freefall_sim():
    p = Parameters()
    updates = {
        "run_id": "FREEFALL1", "sim": "gradhsph", "ic": "sphere", "ndim": 3,
        "Nhydro": 1000, "particle_distribution": "cubic_lattice",
        "mcloud": 1.0, "radius": 1.0, "dimensionless": 1,
        "tend": 1.0, "tsnapfirst": 0.0, "dt_snap": 0.05,
        "hydro_forces": 0, "gas_eos": "energy_eqn",
        "gamma_eos": 1.66666666666666666, "self_gravity": 1,
        "kernel": "m4", "h_converge": 0.01, "sph_integration": "lfkdk",
        "courant_mult": 0.1, "accel_mult": 0.2, "energy_mult": 0.5,
        "Nlevels": 1, "neib_search": "bruteforce",
    }
    for k, v in updates.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.Run()
    return sim


def test_freefall_l1(freefall_sim):
    """Half-mass radius vs analytic homologous collapse."""
    sim = freefall_sim
    # free-fall time for G=1, M=1, R=1: tff = pi/2 * sqrt(R^3/(2GM))
    tff = 0.5 * np.pi / np.sqrt(2.0)
    r0 = lagrangian_radii(sim.snapshots[0], 0.5)
    errs = []
    for snap in sim.snapshots:
        tfrac = snap.t / tff
        if tfrac > 0.95:           # late collapse: discreteness dominates
            break
        lr = lagrangian_radii(snap, 0.5)
        errs.append(abs(lr - freefall_analytical_radius(tfrac) * r0))
    assert len(errs) > 10
    l1 = float(np.mean(errs))
    assert l1 < 9e-3, f"freefall L1 = {l1}"


def test_freefall_homologous(freefall_sim):
    """Uniform-sphere collapse is homologous: 25% and 75% Lagrangian radii
    shrink by the same factor."""
    sim = freefall_sim
    first, mid = sim.snapshots[0], sim.snapshots[len(sim.snapshots) // 2]
    f25 = lagrangian_radii(mid, 0.25) / lagrangian_radii(first, 0.25)
    f75 = lagrangian_radii(mid, 0.75) / lagrangian_radii(first, 0.75)
    assert abs(f25 - f75) < 0.04


def test_gpot_positive(freefall_sim):
    gpot = np.asarray(freefall_sim.state.gpot)
    assert (gpot > 0).all()


def test_freefall_tree_gravity():
    """Same collapse with the tree-gravity path (neib_search=kdtree ->
    Barnes-Hut multipoles): must match the analytic cycloid like the
    direct-sum run."""
    p = Parameters()
    updates = {
        "run_id": "FREEFALL_TREE", "sim": "gradhsph", "ic": "sphere",
        "ndim": 3, "Nhydro": 1000, "particle_distribution": "cubic_lattice",
        "mcloud": 1.0, "radius": 1.0, "dimensionless": 1,
        "tend": 0.8, "tsnapfirst": 0.0, "dt_snap": 0.1,
        "hydro_forces": 0, "gas_eos": "energy_eqn", "self_gravity": 1,
        "kernel": "m4", "courant_mult": 0.1, "accel_mult": 0.2,
        "neib_search": "kdtree", "thetamaxsqd": 0.1,
        "multipole": "quadrupole",
    }
    for k, v in updates.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.Run()
    tff = 0.5 * np.pi / np.sqrt(2.0)
    r0 = lagrangian_radii(sim.snapshots[0], 0.5)
    errs = []
    for snap in sim.snapshots:
        tfrac = snap.t / tff
        if tfrac > 0.9:
            break
        lr = lagrangian_radii(snap, 0.5)
        errs.append(abs(lr - freefall_analytical_radius(tfrac) * r0))
    assert len(errs) > 5
    assert float(np.mean(errs)) < 9e-3


@pytest.mark.parametrize("neib", ["bruteforce", "kdtree"])
def test_freefall_mfv_gravity(neib):
    """MFV self-gravity (MfvCommon::ComputeSmoothedGravForces + the
    gravity source terms of MfvIntegration): uniform-sphere collapse must
    follow the analytic cycloid.  bruteforce = all-pairs oracle (momentum
    antisymmetric to roundoff); kdtree = grid27 + Barnes-Hut production
    path (momentum error bounded by the theta^2=0.1 multipole error)."""
    import numpy as np

    p = Parameters()
    for k, v in {
            "ndim": 3, "sim": "meshlessfv", "ic": "sphere", "Nhydro": 600,
            "particle_distribution": "cubic_lattice",
            "mcloud": 1.0, "radius": 1.0, "dimensionless": 1,
            "press1": 1e-6, "gamma_eos": 1.6666666666666667,
            "gas_eos": "energy_eqn", "hydro_forces": 1, "self_gravity": 1,
            "riemann_solver": "hllc", "zero_mass_flux": 1,
            "h_fac": 1.2, "run_id": "", "courant_mult": 0.2,
            "accel_mult": 0.05, "tend": 0.9, "neib_search": neib}.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    if neib == "kdtree":
        assert sim.treespec is not None    # tree gravity engaged

    def hmr(s):
        r = np.asarray(s.r)
        rad = np.sort(np.sqrt((r ** 2).sum(-1)))
        return rad[len(rad) // 2]

    r0 = hmr(sim.state)
    tff = np.sqrt(3.0 * np.pi / 32.0 / (3.0 / (4.0 * np.pi)))
    errs = []
    moms = []
    m = np.asarray(sim.state.m)
    # gate over the clean homologous phase; the near-singular bounce at
    # t -> tff is not resolvable at this particle count / global dt
    while sim.t < 0.75 * tff and sim.Nsteps < 1000:
        sim.main_loop_step()
        s = sim.state
        errs.append(abs(hmr(s)
                        - freefall_analytical_radius(sim.t / tff) * r0))
        moms.append(np.abs((np.asarray(s.m)[:, None]
                            * np.asarray(s.v)).sum(0)).max())
    assert np.mean(errs) < 0.03, f"MFV freefall L1 = {np.mean(errs)}"
    # momentum: exact antisymmetry on the all-pairs path; the BH walk's
    # i->cell and cell->i approximations differ, so the tree path is
    # bounded by the multipole force error instead
    assert max(moms) < (1e-8 if neib == "bruteforce" else 1e-5)
    assert np.isfinite(np.asarray(sim.state.v)).all()
