"""N-body regression tests: binary orbit accuracy + Plummer stability
(reference tests/nbody_tests/{binarytest,plummertest}.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def nbody_params(**overrides) -> Parameters:
    p = Parameters()
    base = {
        "run_id": "NBODY_TEST", "sim": "nbody", "ndim": 3,
        "dimensionless": 1, "nbody": "hermite4", "nbody_softening": 0,
        "tsnapfirst": 0.0, "dt_snap": 0.5, "nbody_mult": 0.1,
        "Nstepsmax": 200000,
    }
    base.update(overrides)
    for k, v in base.items():
        p.set(k, v)
    return p


def energies(s):
    """KE and PE (direct sum) from an NbodyState."""
    v = np.asarray(s.v)
    m = np.asarray(s.m)
    r = np.asarray(s.r)
    ke = 0.5 * (m * (v ** 2).sum(-1)).sum()
    dr = r[None] - r[:, None]
    d = np.sqrt((dr ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    pe = -0.5 * (m[:, None] * m[None, :] / d).sum()
    return ke, pe


class TestBinary:
    @pytest.fixture(scope="class")
    def sim(self):
        # circular equal-mass binary, a=1, P = 2*pi*sqrt(a^3/M) = 2*pi
        p = nbody_params(ic="binary", ndim=2, abin=1.0, ebin=0.0,
                         m1=0.5, m2=0.5, tend=float(2 * np.pi),
                         nbody_mult=0.02)
        s = SimulationBase.factory(p)
        s.SetupSimulation()
        e0 = energies(s.state)
        s.Run()
        return s, e0

    def test_energy_conservation(self, sim):
        s, (ke0, pe0) = sim
        ke1, pe1 = energies(s.state)
        e0, e1 = ke0 + pe0, ke1 + pe1
        assert abs(e1 - e0) / abs(e0) < 1e-6

    def test_period_return(self, sim):
        """After one orbital period the stars return to their start."""
        s, _ = sim
        r0 = s.snapshots[0].data["r"]
        r1 = np.asarray(s.state.r)
        # interpolation error from overshooting tend by < dt
        assert np.abs(r1 - r0).max() < 5e-2

    def test_separation_constant(self, sim):
        """e=0: separation stays at the semi-major axis."""
        s, _ = sim
        r = np.asarray(s.state.r)
        sep = np.linalg.norm(r[0] - r[1])
        assert sep == pytest.approx(1.0, abs=1e-4)


class TestPlummer:
    @pytest.fixture(scope="class")
    def sim(self):
        p = nbody_params(ic="plummer", Nstar=100, mplummer=1.0,
                         rplummer=1.0, radius=10.0, rstar=0.01,
                         nbody_softening=0, tend=0.5, randseed=7)
        s = SimulationBase.factory(p)
        s.SetupSimulation()
        e0 = energies(s.state)
        s.Run()
        return s, e0

    def test_virial_ic(self, sim):
        """Plummer ICs should be near virial equilibrium: Q = -KE/PE ~ 0.5."""
        s, (ke0, pe0) = sim
        q = -ke0 / pe0
        assert 0.3 < q < 0.7

    def test_energy_conservation(self, sim):
        s, (ke0, pe0) = sim
        ke1, pe1 = energies(s.state)
        assert abs((ke1 + pe1) - (ke0 + pe0)) / abs(ke0 + pe0) < 5e-3

    def test_bound(self, sim):
        """Cluster should stay bound over the run."""
        s, _ = sim
        r = np.asarray(s.state.r)
        assert np.linalg.norm(r, axis=-1).max() < 50.0


class TestIntegratorFamily:
    """Eccentric binary driven with each integrator scheme: energy error
    must stay within scheme-appropriate bounds, and the time-symmetric
    variants must beat plain Hermite4 over many orbits
    (reference NbodyHermite4TS/6TS, src/Headers/Nbody.h:170-344)."""

    def run_binary(self, scheme, n_orbits=5, nbody_mult=0.05, npec=1):
        p = nbody_params(ic="binary", ndim=2, abin=1.0, ebin=0.5,
                         m1=0.5, m2=0.5, nbody=scheme, Npec=npec,
                         tend=float(2 * np.pi * n_orbits),
                         nbody_mult=nbody_mult)
        s = SimulationBase.factory(p)
        s.SetupSimulation()
        e0 = sum(energies(s.state))
        s.Run()
        e1 = sum(energies(s.state))
        return abs(e1 - e0) / abs(e0)

    def test_hermite4ts(self):
        assert self.run_binary("hermite4ts") < 1e-6

    def test_hermite6ts(self):
        assert self.run_binary("hermite6ts") < 1e-7

    def test_leapfrog(self):
        # 2nd order: much looser bound
        assert self.run_binary("lfkdk", n_orbits=2, nbody_mult=0.02) < 1e-2

    def test_ts_beats_plain(self):
        err_plain = self.run_binary("hermite4", n_orbits=10)
        err_ts = self.run_binary("hermite4ts", n_orbits=10)
        assert err_ts <= err_plain * 1.5


class TestHierarchicalICs:
    def test_triple_runs(self):
        p = nbody_params(ic="triple", ndim=3, abin=4.0, ebin=0.2,
                         abin2=0.5, ebin2=0.0, m1=0.5, m2=0.5, m3=1.0,
                         rstar=0.01, nbody="hermite4ts", tend=2.0,
                         nbody_mult=0.05)
        s = SimulationBase.factory(p)
        s.SetupSimulation()
        e0 = sum(energies(s.state))
        s.Run()
        e1 = sum(energies(s.state))
        assert abs(e1 - e0) / abs(e0) < 1e-4

    def test_quadruple_runs(self):
        p = nbody_params(ic="quadruple", ndim=3, abin=6.0, ebin=0.1,
                         abin2=0.5, ebin2=0.0, m1=0.5, m2=0.5, m3=0.5,
                         m4=0.5, rstar=0.01, nbody="hermite4ts", tend=2.0,
                         nbody_mult=0.05)
        s = SimulationBase.factory(p)
        s.SetupSimulation()
        e0 = sum(energies(s.state))
        s.Run()
        e1 = sum(energies(s.state))
        assert abs(e1 - e0) / abs(e0) < 1e-4


class TestNmpiNbody:
    def test_nmpi_runs_replicated(self):
        """Nmpi > 1 pure N-body: the reference replicates the star set on
        every MPI rank and integrates identically (NbodySimulation.cpp has
        no decomposition; star broadcasts in src/Nbody/Sinks.cpp:228-233),
        so the factory returns the direct-sum controller and the result is
        bit-identical to Nmpi = 1."""
        runs = {}
        for nmpi in (1, 2):
            p = nbody_params(ic="binary", ndim=2, abin=1.0, ebin=0.0,
                             m1=0.5, m2=0.5, tend=1.0, nbody_mult=0.05,
                             Nmpi=nmpi)
            s = SimulationBase.factory(p)
            s.SetupSimulation()
            s.Run()
            runs[nmpi] = np.asarray(s.state.r).copy()
        np.testing.assert_array_equal(runs[2], runs[1])
