"""Benchmark: SELF-GRAVITATING grad-h SPH particle-steps/sec on one TPU
chip (the BASELINE.json north-star workload: density + hydro forces +
BH-tree gravity per step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Flagship configuration: 3D periodic jittered box, grad-h SPH density +
hydro forces + KD-bucket Barnes-Hut tree gravity (quadrupole,
theta^2 = 0.1, isolated-box model: ewald = 0) + leapfrog KDK, global
timestep, structured-grid (27-shift) neighbour path, float32.

The baseline denominator is the measured reference (GANDALF C++,
single-core -O2, this host) running the SAME self-gravitating step on an
open-boundary box (its periodic+gravity mode forces Ewald corrections,
which ours deliberately omits for this comparison; the tree/force work is
identical) — see BASELINE_MEASURED.json `sphgrav3d_particle_steps_per_sec`.

Robustness: the axon TPU tunnel on this host can kill the worker on large
fused programs (and a crashed worker wedges subsequent attempts), so each
size is measured in its OWN subprocess, smallest size first, and the
largest successful measurement is reported.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _cache_dir() -> str:
    """Persistent XLA compile cache, inside the repo so a warm cache laid
    down by the builder session survives /tmp cleanup and is hit by the
    driver's fresh `python bench.py` run (same jit signatures + flags)."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_bench_cache")


def _probe() -> int:
    """Backend-liveness probe child: compile + run a tiny program and
    read a value back through the host.  Distinguishes 'TPU down' (the
    round-3 failure mode: axon init hangs ~10 min then raises
    UNAVAILABLE) from 'slow compile'."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _require_tpu(jax)
    x = jnp.ones((256, 256), jnp.float32)
    y = jax.jit(lambda a: (a @ a).sum())(x)
    assert np.isfinite(float(y))
    print("BENCH_PROBE_OK", jax.devices()[0].platform)
    return 0


def _require_tpu(jax) -> None:
    """Fail LOUDLY if the backend silently fell back to CPU.

    When the TPU tunnel is down, jax falls back to the host CPU with only
    a warning — the bench then 'succeeds' with numbers that are really
    1-core-CPU throughput (the round-4 driver capture: 11.5k at N=4096 vs
    623k measured on the chip).  A wrong number is worse than no number.
    BENCH_ALLOW_CPU=1 opts out (used by the CPU-only unit tests)."""
    platform = jax.devices()[0].platform
    if platform != "tpu" and os.environ.get("BENCH_ALLOW_CPU") != "1":
        raise RuntimeError(
            f"bench: backend is {platform!r}, not TPU — refusing to "
            "report CPU-fallback numbers (set BENCH_ALLOW_CPU=1 to "
            "override for testing)")


def build_sim(n_side: int, self_gravity: int = 1):
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import GradhSphSimulation

    p = Parameters()
    updates = {
        "run_id": "BENCH", "sim": "gradhsph", "ic": "box", "ndim": 3,
        "dimensionless": 1, "gas_eos": "energy_eqn", "gamma_eos": 1.4,
        "rhofluid1": 1.0, "press1": 1.0, "tend": 1.0e30,
        "tsnapfirst": 1.0e30, "self_gravity": self_gravity, "ewald": 0,
        # rebuild cadence: the KD-bucket replan (and, opt-in, the listed
        # walk's interaction-list planning) amortises over ntreebuildstep
        # steps; overflow forces an early replan, so this knob tunes
        # speed, never correctness
        "ntreebuildstep": int(os.environ.get("BENCH_NTB", "32")),
    }
    if os.environ.get("BENCH_MULTIPOLE"):
        updates["multipole"] = os.environ["BENCH_MULTIPOLE"]
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


def measure(n_side: int, n_steps: int, neib: str = "kdtree",
            self_gravity: int = 1) -> dict:
    """Measure one configuration; raises on any failure.

    Drives the PRODUCTION host loop (sim.main_loop_step) — not the raw
    jitted step — so the measurement includes everything a real run pays:
    the tree-rebuild cadence (host-side interaction-list planning for the
    drift-skin listed gravity walk) and any overflow-driven replans.  The
    timed window is one full rebuild cadence (n_steps = ntreebuildstep by
    default) so exactly one host replan is amortised into the number, the
    same way the reference's 20-MainLoop-step measurement includes its
    KD-tree builds (BASELINE_MEASURED.json methodology)."""
    import jax

    # persistent compile cache: repeated bench runs skip the slow
    # remote compile on this host.  Lives INSIDE the repo so it survives
    # /tmp cleanup between the builder session and the driver run.
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _require_tpu(jax)

    from gandalf_tpu.sim.ic import generate_ic
    from gandalf_tpu.state import make_sph_state

    sim = build_sim(n_side, self_gravity)
    if neib == "bruteforce":
        sim.use_celllist = False
    ic = generate_ic(sim.params, sim.eos)
    # jitter so the h iteration and binning do realistic work
    rng = np.random.default_rng(42)
    spacing = 1.0 / n_side
    ic["r"] = np.mod(ic["r"] + 0.2 * spacing
                     * rng.standard_normal(ic["r"].shape), 1.0)
    ic["v"] = 0.05 * rng.standard_normal(ic["v"].shape)
    state = make_sph_state(ic["r"], ic["v"], ic["m"], ic["h"], ic["u"])
    N = state.N
    sim.state = state
    if sim.use_celllist:
        # growth 1.3: the converged-h tail sits ~10% above the lattice
        # estimate; a tighter margin trips the overflow-replan path
        sim._plan_grid(ic["r"], ic["h"], growth=1.3)
        if sim.self_gravity:
            sim._plan_tree_buckets(np.asarray(ic["r"]))
        print(f"bench: N={N} ncells={sim.gridspec.ncells} "
              f"K={sim.gridspec.k_cell} tree={sim.treespec}",
              file=sys.stderr)

    sim._compile()
    bootstrap = jax.jit(sim._build_bootstrap())
    sim.state = bootstrap(sim.state)    # includes the planned bucket_map
    ntb = max(sim.params.intparams["ntreebuildstep"], 1)
    if n_steps % ntb != 0:
        # the methodology amortises exactly (n_steps / ntb) host replans
        # into the number; a misaligned window would time zero (or a
        # fractional share of) cadence rebuilds and silently flatter the
        # result (ADVICE r4)
        print(f"bench: WARNING n_steps={n_steps} not a multiple of "
              f"ntreebuildstep={ntb}; the timed window does not amortise "
              "a whole number of cadence rebuilds", file=sys.stderr)
    # warmup: compile + first production steps — BOTH the fused-cadence
    # program (main_loop_steps) and the single-step fallback compile here,
    # off the clock (any drift-skin replan the bootstrap-to-step
    # transition needs also lands here)
    sim.main_loop_steps(2)
    if sim.use_celllist and sim.treespec is not None:
        # replan with the LIVE timestep: the pre-bootstrap plan had dt = 0,
        # so its drift skin only covers ~0.25 h_med of motion; the post-
        # warmup replan sizes the skin for a full rebuild cadence, putting
        # the timed window on the production steady state (one cadence
        # rebuild, no spurious overflow replans)
        if sim._plan_tree_buckets(np.asarray(sim.state.r)):
            sim._compile()
        sim.main_loop_steps(2)          # re-warm (recompiles if caps moved)
    # On the axon tunnel, block_until_ready does NOT surface device faults;
    # only host value reads do — sync through scalars and validate.
    assert np.isfinite(float(sim.state.rho.min())), "non-finite density"

    steps0, ovf0 = sim.Nsteps, getattr(sim, "_n_grid_overflows", 0)
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        done += sim.main_loop_steps(n_steps - done)
    t_end = float(sim.state.t)          # forces full completion
    elapsed = time.perf_counter() - t0
    # cadence rebuilds amortised into the window (boundary crossings of
    # the ntreebuildstep grid) + any overflow-driven replans
    n_rebuilds = (sim.Nsteps // ntb) - (steps0 // ntb) if sim.use_celllist \
        and sim.treespec is not None else 0
    n_ovf = getattr(sim, "_n_grid_overflows", 0) - ovf0
    state = sim.state
    rho_min = float(state.rho.min())
    rho_max = float(state.rho.max())
    assert t_end > 0.0 and np.isfinite(t_end)
    assert np.isfinite(rho_min) and np.isfinite(rho_max) and rho_min > 0.0, \
        f"invalid density after bench: [{rho_min}, {rho_max}]"
    if bool(state.neib_overflow):
        raise RuntimeError("neighbour overflow unresolved after bench")
    return {"N": N, "particle_steps_per_sec": N * n_steps / elapsed,
            "n_steps": n_steps, "rebuilds_in_window": n_rebuilds,
            "overflow_replans_in_window": n_ovf}


def _child() -> int:
    n_side = int(os.environ["BENCH_NSIDE"])
    # default window = one full rebuild cadence, so the host replan is
    # amortised into the measurement exactly once
    n_steps = int(os.environ.get("BENCH_NSTEPS", "0")) \
        or int(os.environ.get("BENCH_NTB", "32"))
    neib = os.environ.get("BENCH_NEIB", "kdtree")
    grav = int(os.environ.get("BENCH_GRAVITY", "1"))
    out = measure(n_side, n_steps, neib, grav)
    print("BENCH_RESULT " + json.dumps(out))
    return 0


def _load_baseline(N: int, gravity: bool = True):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        baseline = json.load(f)
    key = "sphgrav3d_particle_steps_per_sec" if gravity \
        else "sph3d_particle_steps_per_sec"
    table = baseline.get(key, {})
    ref = table.get(str(N))
    if ref is None and table:
        # nearest measured size (reference cost/particle is ~flat in N)
        sizes = sorted(int(k) for k in table)
        nearest = min(sizes, key=lambda s: abs(np.log(s / N)))
        ref = table[str(nearest)]
    if ref is None:
        ref = baseline.get(key + "_any")
    return float(ref) if ref else None


def _emit(best, gravity: bool) -> None:
    """Print the best-so-far result as a full JSON line (and persist it).

    Called after EVERY size so that a driver-side timeout of the whole
    bench still leaves the largest completed measurement as the last
    parseable line on stdout (round-2 recorded rc=124 with an empty tail
    because nothing was printed until all sizes finished)."""
    name = "sphgrav3d" if gravity else "sph3d"
    if best is None:
        line = json.dumps({"metric": f"{name}_particle_steps_per_sec",
                           "value": 0.0, "unit": "particle-steps/s/chip",
                           "vs_baseline": 0.0})
    else:
        N = best["N"]
        val = best["particle_steps_per_sec"]
        ref = _load_baseline(N, gravity=gravity)
        line = json.dumps({
            "metric": f"{name}_particle_steps_per_sec_N{N}",
            "value": round(val, 1),
            "unit": "particle-steps/s/chip",
            "vs_baseline": round(val / ref, 3) if ref else 0.0,
        })
    print(line, flush=True)
    try:
        with open("/tmp/bench_best.json", "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


# Per-size child timeouts (seconds), smallest first.  Sized for a COLD
# compile cache (each size's first compile is 2-6 min on this host's
# remote-compile tunnel, and the fused-cadence program roughly doubles
# the per-size compile load); with a warm .jax_bench_cache a full rerun
# takes ~3 min.  The total is still clipped by BENCH_BUDGET.
CHILD_TIMEOUTS = {16: 480, 32: 480, 64: 660, 100: 1080}


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1":
        sys.exit(_child())
    if os.environ.get("BENCH_PROBE") == "1":
        sys.exit(_probe())

    sizes = [int(s) for s in os.environ.get(
        "BENCH_SIZES", "16,64,100").split(",")]
    n_steps = os.environ.get("BENCH_NSTEPS", "0")
    gravity = bool(int(os.environ.get("BENCH_GRAVITY", "1")))
    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET", "2100"))
    best = None
    _emit(best, gravity)

    # Backend liveness gate: the round-3 failure mode was an axon backend
    # whose init hangs ~10 min then raises UNAVAILABLE — every size then
    # eats its full timeout and the bench reports 0.0 with no diagnosis.
    # A tiny-compile child distinguishes "down" from "slow" up front.
    # Cold-tunnel init on this host is ~6-7 min for the FIRST process
    # (measured 2026-08-18: probe alone took 420s, after which children
    # init in seconds) — the probe both detects a dead backend and warms
    # the tunnel, so give it the full window and one retry.
    probe_t = float(os.environ.get("BENCH_PROBE_TIMEOUT", "600"))
    alive = False
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, BENCH_PROBE="1"),
                capture_output=True, text=True, timeout=probe_t)
            alive = proc.returncode == 0 and "BENCH_PROBE_OK" in proc.stdout
            if alive:
                break
            print(f"bench: probe attempt {attempt} failed\n"
                  + proc.stderr[-2000:], file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: probe attempt {attempt} timed out after "
                  f"{probe_t}s", file=sys.stderr)
    if not alive:
        name = "sphgrav3d" if gravity else "sph3d"
        print(json.dumps({
            "metric": f"{name}_particle_steps_per_sec", "value": 0.0,
            "unit": "particle-steps/s/chip", "vs_baseline": 0.0,
            "error": "tpu-unavailable"}), flush=True)
        return
    for n_side in sizes:
        remaining = budget - (time.perf_counter() - t_start)
        child_t = min(CHILD_TIMEOUTS.get(n_side, 480), max(remaining, 0))
        if child_t < 30:
            print(f"bench: budget exhausted before n_side={n_side}",
                  file=sys.stderr)
            break
        env = dict(os.environ, BENCH_CHILD="1", BENCH_NSIDE=str(n_side),
                   BENCH_NSTEPS=n_steps)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=child_t)
        except subprocess.TimeoutExpired:
            # a timeout at a small size is usually a cold compile, which
            # does not predict failure at the next size — keep going (the
            # remaining budget still bounds total wall time)
            print(f"bench: n_side={n_side} timed out; keeping last good",
                  file=sys.stderr)
            continue
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("BENCH_RESULT ")]
        if proc.returncode == 0 and line:
            best = json.loads(line[-1][len("BENCH_RESULT "):])
            _emit(best, gravity)
        else:
            print(f"bench: n_side={n_side} failed "
                  f"(rc={proc.returncode}); keeping last good\n"
                  + proc.stderr[-2000:],
                  file=sys.stderr)
            break
    _emit(best, gravity)


if __name__ == "__main__":
    main()
