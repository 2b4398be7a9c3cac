"""Snapshot I/O, restart, diagnostics and rendering tests."""

import os
import shutil

import numpy as np
import pytest

from gandalf_tpu.sim import io as sim_io

REF_SU = "/tmp/refbuild/ADSOD1.su.00002"   # written by the reference binary


def make_hydro(N=100, ndim=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "r": rng.random((N, ndim)),
        "v": rng.standard_normal((N, ndim)),
        "m": rng.random(N) + 0.5,
        "h": rng.random(N) * 0.1 + 0.01,
        "rho": rng.random(N) + 0.5,
        "u": rng.random(N) + 0.1,
        "iorig": np.arange(N),
    }


def test_seren_roundtrip(tmp_path):
    hydro = make_hydro()
    fn = str(tmp_path / "test.su.00000")
    sim_io.write_seren_unform(fn, 1.25, hydro, h_fac=1.2, nsteps=42)
    t, data = sim_io.read_seren_unform(fn)
    assert t == 1.25
    for k in ("r", "v", "m", "h", "rho", "u"):
        np.testing.assert_allclose(data[k], hydro[k], rtol=1e-15)
    np.testing.assert_array_equal(data["iorig"], hydro["iorig"])


def test_seren_roundtrip_with_stars(tmp_path):
    hydro = make_hydro(50)
    star = {"r": np.random.default_rng(1).random((3, 3)),
            "v": np.zeros((3, 3)), "m": np.ones(3), "h": np.full(3, 0.1)}
    fn = str(tmp_path / "star.su.00000")
    sim_io.write_seren_unform(fn, 0.5, hydro, star=star)
    t, data = sim_io.read_seren_unform(fn)
    assert data["nstar"] == 3
    np.testing.assert_allclose(data["star"]["r"], star["r"], rtol=1e-6)
    np.testing.assert_allclose(data["star"]["m"], star["m"], rtol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_SU),
                    reason="reference snapshot not available")
def test_read_reference_seren_snapshot():
    """Interchange: read a snapshot written by the REFERENCE C++ binary."""
    t, data = sim_io.read_seren_unform(REF_SU)
    assert 0.0 < t <= 0.51
    assert data["r"].shape == (640, 1)
    assert np.isfinite(data["rho"]).all()
    # shocktube density bounds
    assert 0.2 < data["rho"].min() < 0.3
    assert 0.9 < data["rho"].max() < 1.1


def test_restart_continues(tmp_path, monkeypatch):
    """Run -> write su snapshot + restart file -> reload -> continue."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("GANDALF_WRITE_SNAPSHOTS", "1")
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import SimulationBase

    def params():
        p = Parameters()
        for k, v in {
                "run_id": "RST", "sim": "gradhsph", "ic": "shocktube",
                "ndim": 1, "press1": 1.0, "press2": 0.1975,
                "rhofluid1": 1.0, "rhofluid2": 0.25,
                "Nlattice1[0]": 128, "Nlattice2[0]": 32,
                "dimensionless": 1, "boxmin[0]": -2.0, "boxmax[0]": 2.0,
                "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
                "tend": 0.1, "dt_snap": 0.05, "tsnapfirst": 0.0,
                "out_file_form": "su", "gas_eos": "energy_eqn",
                "gamma_eos": 1.4, "courant_mult": 0.2,
                "neib_search": "bruteforce", "ndiagstep": 8}.items():
            p.set(k, v)
        return p

    sim1 = SimulationBase.factory(params())
    sim1.Run()
    assert os.path.exists("RST.restart")
    assert os.path.exists("RST.diag")
    t_stop = sim1.t

    p2 = params()
    p2.set("tend", 0.15)
    sim2 = SimulationBase.factory(p2)
    t0 = sim2.load_restart_snapshot()
    assert t0 == pytest.approx(t_stop, rel=1e-10)
    sim2.Run()
    assert sim2.t >= 0.15
    assert np.isfinite(np.asarray(sim2.state.rho)).all()


def test_import_array_python_ic():
    """ic = python via ImportArray (reference PreSetupForPython path)."""
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import SimulationBase

    p = Parameters()
    for k, v in {"run_id": "IMP", "sim": "gradhsph", "ic": "python",
                 "ndim": 1, "dimensionless": 1, "tend": 1.0,
                 "boundary_lhs[0]": "periodic",
                 "boundary_rhs[0]": "periodic",
                 "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                 "neib_search": "bruteforce", "tsnapfirst": 0.0}.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    N = 64
    x = (np.arange(N) + 0.5) / N
    sim.ImportArray(x, "x")
    sim.ImportArray(np.zeros(N), "vx")
    sim.ImportArray(np.full(N, 1.0 / N), "m")
    sim.ImportArray(np.full(N, 1.5), "u")
    sim.SetupSimulation()
    rho = np.asarray(sim.state.rho)
    assert rho == pytest.approx(np.ones(N), rel=5e-3)


def test_diagnostics_energy_error():
    from gandalf_tpu.utils.diagnostics import Diagnostics

    rng = np.random.default_rng(3)
    r = rng.random((50, 3))
    v = rng.standard_normal((50, 3))
    m = np.ones(50)
    u = np.ones(50)
    d0 = Diagnostics.compute(r, v, m, u)
    d1 = Diagnostics.compute(r, v * 1.01, m, u)
    assert d0.energy_error(d0) == 0.0
    assert d1.energy_error(d0) > 0.0
    assert d0.mtot == pytest.approx(50.0)


def test_render_grid_uniform_box():
    """Rendering a uniform box must give a ~flat density map."""
    from gandalf_tpu.analysis import facade
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import SimulationBase

    facade.SimBuffer.reset()
    p = Parameters()
    for k, v in {"run_id": "REND", "sim": "gradhsph", "ic": "box",
                 "ndim": 2, "dimensionless": 1, "tend": 1e30,
                 "rhofluid1": 2.0, "press1": 1.0, "tsnapfirst": 0.0,
                 "Nlattice1[0]": 32, "Nlattice1[1]": 32,
                 "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                 "boxmin[1]": 0.0, "boxmax[1]": 1.0,
                 "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
                 "boundary_lhs[1]": "periodic", "boundary_rhs[1]": "periodic",
                 "neib_search": "kdtree"}.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    facade.SimBuffer.add_sim(sim)
    facade.snap(-1)
    grid = facade.get_render_data("x", "y", "rho", res=32,
                                  xmin=0.2, xmax=0.8, ymin=0.2, ymax=0.8)
    assert grid.shape == (32, 32)
    assert grid.mean() == pytest.approx(2.0, rel=0.05)
    assert grid.std() / grid.mean() < 0.05


def test_seren_form_roundtrip(tmp_path):
    """sf (SEREN ASCII) write/read round-trip incl. sink records
    (Simulation::WriteSerenFormSnapshotFile)."""
    import numpy as np

    from gandalf_tpu.sim.io import read_seren_form, write_seren_form

    rng = np.random.default_rng(9)
    N = 12
    hydro = {"r": rng.normal(size=(N, 3)), "v": rng.normal(size=(N, 3)),
             "m": rng.uniform(1, 2, N), "h": rng.uniform(0.1, 0.2, N),
             "rho": rng.uniform(0.5, 1.5, N), "u": rng.uniform(1, 3, N)}
    star = {"r": rng.normal(size=(2, 3)), "v": rng.normal(size=(2, 3)),
            "m": np.array([1.0, 2.0]), "h": np.array([0.1, 0.2])}
    fn = str(tmp_path / "T.sf.00000")
    write_seren_form(fn, 1.25, hydro, star=star)
    t, data = read_seren_form(fn)
    assert t == 1.25
    for k in ("r", "v", "m", "h", "rho", "u"):
        np.testing.assert_allclose(data[k], hydro[k], rtol=1e-9)
    assert data["nstar"] == 2
    np.testing.assert_allclose(data["star"]["m"], star["m"], rtol=1e-9)
    np.testing.assert_allclose(data["star"]["r"], star["r"], rtol=1e-9)


def test_seren_lite_writes(tmp_path):
    import numpy as np

    from gandalf_tpu.sim.io import write_seren_lite

    N = 8
    hydro = {"r": np.zeros((N, 3)), "m": np.ones(N), "h": np.ones(N),
             "rho": np.ones(N), "u": np.ones(N)}
    fn = str(tmp_path / "T.sl.00000")
    write_seren_lite(fn, 0.5, hydro)
    import os

    # float32 header + 5 arrays
    assert os.path.getsize(fn) > 0
