"""User-facing facade (analogue of reference analysis/facade.py:185-1140).

Provides the same core surface the reference regression tests rely on:
``newsim / setupsim / run / run_async / snap / next / previous / get_data``
plus the SimBuffer snapshot cache.  Plotting commands are stubs until the
rendering milestone.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..params import Parameters
from ..sim.simulation import SimulationBase, Snapshot


class _SimBuffer:
    """Singleton snapshot/sim cache (reference analysis/SimBuffer.py:30)."""

    def __init__(self) -> None:
        self.sims: List[SimulationBase] = []
        self.current_sim: Optional[SimulationBase] = None
        self.current_snap_index: int = -1

    def add_sim(self, sim: SimulationBase) -> None:
        self.sims.append(sim)
        self.current_sim = sim
        self.current_snap_index = -1

    def get_sim(self, which="current") -> SimulationBase:
        if which == "current" or which is None:
            if self.current_sim is None:
                raise RuntimeError("No simulation in buffer")
            return self.current_sim
        return self.sims[int(which)]

    def get_snapshot_and_sim(self, snap="current", sim="current"):
        s = self.get_sim(sim)
        if not s.snapshots:
            raise RuntimeError("Simulation has no snapshots")
        if snap == "current" or snap is None:
            idx = self.current_snap_index
        elif snap == "live":
            idx = len(s.snapshots) - 1
        else:
            idx = int(snap)
        return s.snapshots[idx], s

    def reset(self) -> None:
        self.sims = []
        self.current_sim = None
        self.current_snap_index = -1


SimBuffer = _SimBuffer()


# -- facade functions ---------------------------------------------------------

def newsim(paramfile: Optional[str] = None, ndim: Optional[int] = None,
           sim: Optional[str] = None) -> SimulationBase:
    """Create a simulation from a parameter file and/or explicit options
    (reference facade.py:659)."""
    params = Parameters()
    if paramfile is not None:
        params.read_file(paramfile)
    if ndim is not None:
        params.set("ndim", ndim)
    if sim is not None:
        params.set("sim", sim)
    simulation = SimulationBase.factory(params)
    SimBuffer.add_sim(simulation)
    return simulation


def setupsim() -> SimulationBase:
    """Set up the current simulation (reference facade.py:669)."""
    s = SimBuffer.get_sim()
    s.SetupSimulation()
    return s


def run(time: Optional[float] = None) -> None:
    """Run the current simulation to `tend` (reference facade.py:679)."""
    s = SimBuffer.get_sim()
    if time is not None:
        if not s.setup_complete:
            s.SetParam("tend", time)
        else:
            s.params.floatparams["tend"] = float(time)
    s.Run()
    SimBuffer.current_snap_index = len(s.snapshots) - 1


class _SyncProcess:
    """Stand-in for facade.run_async's process handle: the TPU build runs
    in-process (single-controller JAX), so wait() just runs to completion."""

    def __init__(self, sim: SimulationBase):
        self.sim = sim

    def wait(self) -> None:
        run()


def run_async(time: Optional[float] = None) -> _SyncProcess:
    s = SimBuffer.get_sim()
    if time is not None and not s.setup_complete:
        s.SetParam("tend", time)
    return _SyncProcess(s)


def loadsim(run_id: str, fileformat: str = "column") -> SimulationBase:
    """Load snapshots from disk into a read-only sim (facade.py:185)."""
    import glob

    from ..sim import io as sim_io

    params = Parameters()
    params.stringparams["run_id"] = run_id
    sim = SimulationBase.__new__(SimulationBase)
    SimulationBase.__init__(sim, params)
    files = sorted(glob.glob(f"{run_id}.{fileformat}.*"))
    for fn in files:
        t, data = sim_io.read_column_snapshot(fn)
        ndim = data["r"].shape[1]
        sim.snapshots.append(Snapshot(t, data, ndim))
    sim.ndim = sim.snapshots[0].ndim if sim.snapshots else 1
    SimBuffer.add_sim(sim)
    SimBuffer.current_snap_index = len(sim.snapshots) - 1
    return sim


def snap(no: int):
    """Jump to snapshot `no` (negative = from end; reference facade.py)."""
    s = SimBuffer.get_sim()
    n = len(s.snapshots)
    idx = no if no >= 0 else n + no
    if not 0 <= idx < n:
        raise IndexError(f"snapshot {no} out of range ({n} snapshots)")
    SimBuffer.current_snap_index = idx
    return s.snapshots[idx]


def next():  # noqa: A001  (reference facade uses this name)
    return snap(SimBuffer.current_snap_index + 1)


def previous():
    return snap(SimBuffer.current_snap_index - 1)


def get_data(quantity: str, snap_no="current", sim="current") -> np.ndarray:
    snapshot, _ = SimBuffer.get_snapshot_and_sim(snap_no, sim)
    return snapshot.extract_array(quantity)


def get_time(snap_no="current", sim="current") -> float:
    snapshot, _ = SimBuffer.get_snapshot_and_sim(snap_no, sim)
    return snapshot.t


# Plotting stubs (real rendering arrives with the Render milestone).
def plot(*args, **kw):
    raise NotImplementedError("plotting arrives with the rendering milestone")


addplot = plot
render = plot
make_movie = plot
