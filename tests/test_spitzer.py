"""Spitzer HII-region expansion (reference SpitzerExpansionIc +
MultipleSourceIonisation): after the Stromgren sphere forms, the
overpressured ionised gas drives a D-type front

    R(t) = Rs (1 + 7/4 c_i t / Rs)^(4/7)        (Spitzer 1978)

with c_i the ionised isothermal sound speed.  Gates the coupled
radiation-hydro loop (radiation update every nradstep + SPH response)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def _spitzer_sim(ndot, temp_ion):
    p = Parameters()
    base = dict(ndim=3, sim="sph", ic="spitzer", Nhydro=1000,
                mcloud=1.0, radius=1.0, dimensionless=1, run_id="",
                gas_eos="isothermal", gamma_eos=5.0 / 3.0,
                hydro_forces=1, self_gravity=0,
                neib_search="kdtree", radiation="ionisation",
                nradstep=1, sink_particles=1, create_sinks=0,
                temp_ion=temp_ion, mu_ion=1.0, mu_bar=1.0,
                arecomb=1.0, Ndotmin=0.0, temp0=1e-6,
                courant_mult=0.1, accel_mult=0.3, Nlevels=1)
    for k, v in base.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)

    # inject the central source through the IC path (the reference drives
    # the Spitzer test with a single sink source)
    import gandalf_tpu.sim.ic as ic_mod
    import gandalf_tpu.sim.simulation as sim_mod
    from gandalf_tpu.sim.ic import generate_ic

    orig = ic_mod.generate_ic

    def with_star(params, eos):
        ic = orig(params, eos)
        ic["star"] = {"r": np.zeros((1, 3)), "v": np.zeros((1, 3)),
                      "m": np.asarray([1e-6]), "h": np.asarray([1e-3])}
        return ic

    ic_mod.generate_ic = with_star
    sim_mod.generate_ic = with_star
    try:
        sim.SetupSimulation()
    finally:
        ic_mod.generate_ic = orig
        sim_mod.generate_ic = orig
    # flat stellar table: any sink mass -> the chosen ionising rate
    # (set AFTER SetupSimulation — process_parameters reloads the default)
    from gandalf_tpu.ops.stellar import StellarTable

    logn = np.log10(ndot)
    sim.stellar_table = StellarTable(
        mass=np.asarray([0.0, 1e3]),
        log_lum=np.asarray([0.0, 0.0]),
        log_nlyc=np.asarray([logn, logn]),
        teff=np.asarray([4e4, 4e4]), mdot=np.asarray([0.0, 0.0]),
        vwind=np.asarray([0.0, 0.0]))
    return sim


def _front_radius(sim):
    s = sim.state
    ion = np.asarray(s.ionfrac) > 0.5
    if not ion.any():
        return 0.0
    d = np.sqrt((np.asarray(s.r) ** 2).sum(-1))
    return float(np.percentile(d[ion], 97.0))


def test_spitzer_expansion():
    rho0 = 3.0 / (4.0 * np.pi)          # mcloud=1, radius=1
    Rs = 0.35
    ndot = 4.0 * np.pi / 3.0 * rho0 ** 2 * Rs ** 3   # alphaB=1, mu_bar=1
    temp_ion = 0.05
    gammam1 = 2.0 / 3.0
    u_ion = temp_ion / (gammam1 * 1.0)
    c_i = np.sqrt(gammam1 * u_ion)       # isothermal ionised sound speed

    sim = _spitzer_sim(ndot, temp_ion)
    assert sim.has_sinks

    # the initial radiation pass carves the Stromgren sphere
    sim.main_loop_step()
    R0 = _front_radius(sim)
    assert abs(R0 - Rs) < 0.08, f"initial Stromgren radius {R0} vs {Rs}"

    samples = []
    t_end = 0.5
    while sim.t < t_end and sim.Nsteps < 700:
        sim.main_loop_step()
        samples.append((sim.t, _front_radius(sim)))
    assert len(samples) >= 5

    def spitzer(t):
        return Rs * (1.0 + 7.0 / 4.0 * c_i * t / Rs) ** (4.0 / 7.0)

    # gate the late-time samples (the early relaxation from the lattice IC
    # and the sharp initial front are not part of the similarity solution)
    errs = [abs(R / spitzer(t) - 1.0) for t, R in samples if t > 0.15]
    assert len(errs) >= 3
    assert float(np.mean(errs)) < 0.15, \
        f"Spitzer front error {np.mean(errs):.3f}; samples={samples}"
    # the front must actually expand well beyond the Stromgren radius
    assert samples[-1][1] > 1.05 * Rs
