"""Fused cadence stepping (SimulationBase.main_loop_steps): several
global-dt steps run inside ONE device program (lax.while_loop) must be
bit-identical to the same number of per-step main_loop_step calls, stop at
the snapshot/tend time bounds, and respect the tree-rebuild cadence.

The fused path exists for throughput (one dispatch + one scalar read per
rebuild cadence instead of per-step host round-trips — each sync is a full
RTT on the remote-TPU tunnel), so its contract is exact equivalence with
the per-step loop it replaces.
"""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation


def _box_sim(n_side=6, self_gravity=1, tend=1.0e30, tsnapfirst=1.0e30):
    p = Parameters()
    updates = {
        "run_id": "", "sim": "gradhsph", "ic": "box", "ndim": 3,
        "dimensionless": 1, "gas_eos": "energy_eqn", "gamma_eos": 1.4,
        "rhofluid1": 1.0, "press1": 1.0, "tend": tend,
        "tsnapfirst": tsnapfirst, "self_gravity": self_gravity,
        "ewald": 0, "ntreebuildstep": 8,
    }
    for k in range(3):
        updates[f"boxmin[{k}]"] = 0.0
        updates[f"boxmax[{k}]"] = 1.0
        updates[f"boundary_lhs[{k}]"] = "periodic"
        updates[f"boundary_rhs[{k}]"] = "periodic"
        updates[f"Nlattice1[{k}]"] = n_side
    for k, v in updates.items():
        p.set(k, v)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    # jitter the velocities so steps do non-trivial work
    rng = np.random.default_rng(7)
    import jax.numpy as jnp

    v = 0.05 * rng.standard_normal(np.asarray(sim.state.v).shape)
    sim.state = sim.state.replace(v=jnp.asarray(v, sim.state.v.dtype),
                                  v0=jnp.asarray(v, sim.state.v.dtype))
    # pin the adaptive window cap so the tests exercise full windows
    # deterministically (production starts at 4 and self-tunes)
    sim._fuse_chunk = 64
    return sim


def test_fused_matches_per_step():
    simA = _box_sim()
    simB = _box_sim()
    assert simB._multi_fn is not None, "flagship config must build _multi_fn"
    NS = 12  # crosses one ntreebuildstep=8 rebuild boundary
    for _ in range(NS):
        simA.main_loop_step()
    done = 0
    windows = []
    while done < NS:
        k = simB.main_loop_steps(NS - done)
        windows.append(k)
        done += k
    assert done == NS
    # the path must actually FUSE (a silent per-step fallback passes the
    # parity assertions trivially — that bug shipped once)
    assert max(windows) > 1, f"no window fused: {windows}"
    assert simB.Nsteps == simA.Nsteps
    assert simB.t == simA.t
    for f in ("r", "v", "rho", "u", "h", "a", "dt"):
        a = np.asarray(getattr(simA.state, f))
        b = np.asarray(getattr(simB.state, f))
        assert np.array_equal(a, b), f"{f} diverged (max |d|="
    # the fused window is clipped at the rebuild cadence, so a single call
    # must never run past the next boundary — and must fuse right up to it
    simC = _box_sim()
    n = simC.main_loop_steps(100)
    assert n == 8


def test_fused_stops_at_tsnapnext():
    """The device-side bound stops the window as soon as t crosses
    tsnapnext — same semantics as the per-step loop, which snapshots at
    the first step past the mark."""
    sim = _box_sim()
    sim.main_loop_step()
    dt = float(sim.state.dt)
    t0 = sim.t
    sim.tsnapnext = t0 + 2.5 * dt
    n = sim.main_loop_steps(6)
    # dt is constant-ish in a quiet box: the window must FUSE up to the
    # mark (not fall back per-step) and stop within one step of crossing
    # it, never running the full 6-step window
    assert 1 < n < 6
    assert sim.t >= sim.tsnapnext


def test_fused_respects_tend():
    """tend is never overshot: the fused cond stops while t + dt <= tend,
    and the per-step fallback lands the dt-clamped final step exactly."""
    sim = _box_sim()
    sim.main_loop_step()
    dt = float(sim.state.dt)
    tend = sim.t + 3.4 * dt
    sim.params.set("tend", tend)
    for _ in range(12):
        if sim.t >= tend:
            break
        sim.main_loop_steps(6)
    assert sim.t == pytest.approx(tend, rel=1e-12)
