"""Benchmark: grad-h SPH particle-steps/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship benchmark: 3D periodic uniform box, grad-h SPH density +
hydro forces + leapfrog KDK, global timestep, float32 on TPU.  The baseline
denominator is the measured reference (GANDALF C++/OpenMP) throughput on
this host's CPU for the same configuration, stored in BASELINE_MEASURED.json
when available (reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_sim(n_side: int):
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import GradhSphSimulation

    p = Parameters()
    updates = {
        "run_id": "BENCH", "sim": "gradhsph", "ic": "box", "ndim": 3,
        "dimensionless": 1, "gas_eos": "energy_eqn", "gamma_eos": 1.4,
        "rhofluid1": 1.0, "press1": 1.0, "tend": 1.0e30,
        "tsnapfirst": 1.0e30,
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
    sim.process_parameters()
    return sim


def main() -> None:
    import jax

    from gandalf_tpu.sim.ic import generate_ic
    from gandalf_tpu.state import make_sph_state

    n_side = int(os.environ.get("BENCH_NSIDE", "32"))
    n_steps = int(os.environ.get("BENCH_NSTEPS", "20"))
    sim = build_sim(n_side)
    ic = generate_ic(sim.params, sim.eos)
    # Jitter positions and velocities so the h-rho iteration and the
    # neighbour structure do realistic work (a perfect static lattice
    # converges in one iteration and flatters the result).
    rng = np.random.default_rng(42)
    spacing = 1.0 / n_side
    ic["r"] = np.mod(ic["r"] + 0.2 * spacing
                     * rng.standard_normal(ic["r"].shape), 1.0)
    ic["v"] = 0.05 * rng.standard_normal(ic["v"].shape)
    state = make_sph_state(ic["r"], ic["v"], ic["m"], ic["h"], ic["u"])
    N = state.N
    if sim.use_celllist:
        sim._plan_grid(ic["r"], ic["h"], growth=1.15)

    bootstrap = jax.jit(sim._build_bootstrap())
    step = jax.jit(sim._build_step())
    state = bootstrap(state)
    state = step(state)          # compile + warm
    # On the axon TPU tunnel, block_until_ready does NOT surface device
    # faults; only a host value read does.  Sync through a scalar read and
    # validate the physics so a crashed/garbage run can never report a
    # number.
    assert np.isfinite(float(state.rho.min())), "non-finite density"

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    t_end = float(state.t)                      # forces full completion
    elapsed = time.perf_counter() - t0
    assert t_end > 0.0 and np.isfinite(t_end)
    rho_min = float(state.rho.min())
    rho_max = float(state.rho.max())
    assert np.isfinite(rho_min) and np.isfinite(rho_max) and rho_min > 0.0, \
        f"invalid density after bench: [{rho_min}, {rho_max}]"
    if bool(state.neib_overflow):
        raise RuntimeError("neighbour overflow during bench — grid too small")
    steps_per_sec = n_steps / elapsed
    particle_steps_per_sec = N * steps_per_sec

    vs_baseline = 0.0
    baseline_file = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f)
        ref = baseline.get("sph3d_particle_steps_per_sec", {}).get(str(N))
        if ref is None:
            ref = baseline.get("sph3d_particle_steps_per_sec_any")
        if ref:
            vs_baseline = particle_steps_per_sec / float(ref)

    print(json.dumps({
        "metric": f"sph3d_particle_steps_per_sec_N{N}",
        "value": round(particle_steps_per_sec, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
