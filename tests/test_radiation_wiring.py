"""Controller-level photoionisation wiring tests (reference
SphSimulation.cpp:671-679 radiation->UpdateRadiationField cadence,
Hydrodynamics.cpp:81-90 ionising EOS selection, Nbody.cpp:186-224 stellar
N_LyC lookup)."""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation


def _hybrid(**over):
    p = Parameters()
    base = dict(ndim=3, sim="sph", neib_search="bruteforce",
                gas_eos="isothermal", temp0=1.0e-2, mu_bar=1.0,
                dimensionless=1, run_id="", Nhydro=64, Nstar=1,
                ic="plummer", self_gravity=1, hydro_forces=1,
                gasfrac=0.5, starfrac=0.5, randseed=3)
    base.update(over)
    for k, v in base.items():
        p.set(k, v)
    return p


def test_ionisation_heats_gas():
    """radiation=ionisation + a bright source: all gas inside the photon
    budget is flagged ionised and heated to the ionised temperature."""
    p = _hybrid(radiation="ionisation", temp_ion=1.0, mu_ion=1.0,
                arecomb=1e-20, Ndotmin=0)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    for _ in range(3):
        sim.main_loop_step()
    ion = np.asarray(sim.state.ionfrac)
    u = np.asarray(sim.state.u)
    gammam1 = sim.eos.gammam1
    u_ion = 1.0 / gammam1 / 1.0
    assert ion.max() == 1.0, "nothing ionised"
    # ionised gas keeps the hot u through the isothermal base EOS
    # (IonisingRadiationEOS max rule)
    assert u[ion > 0.5].min() >= 0.99 * u_ion
    assert np.isfinite(u).all()


def test_no_radiation_field_untouched():
    sim = GradhSphSimulation(_hybrid())
    sim.SetupSimulation()
    sim.main_loop_step()
    assert np.asarray(sim.state.ionfrac).max() == 0.0


def test_mc_radiation_blend():
    """monoionisation: u is the ionfrac blend of ionised and base u."""
    from gandalf_tpu.ops.eos import MCRadiationEOS, eos_factory

    p = _hybrid(radiation="monoionisation", temp_ion=2.0, mu_ion=0.5)
    eos = eos_factory(p)
    assert isinstance(eos, MCRadiationEOS)
    import jax.numpy as jnp

    rho = jnp.ones(4)
    u = jnp.full(4, 0.1)
    f = jnp.array([0.0, 0.5, 1.0, 1.0])
    u_new, P, c = eos.thermal_update(rho, u, ionfrac=f)
    gammam1 = eos.gammam1
    u_base = 1.0e-2 / gammam1 / 1.0      # isothermal base
    u_ion = 2.0 / gammam1 / 0.5
    np.testing.assert_allclose(np.asarray(u_new),
                               np.asarray(f) * u_ion
                               + (1 - np.asarray(f)) * u_base, rtol=1e-12)


def test_stellar_table_lookup():
    from gandalf_tpu.ops.stellar import (default_stellar_table,
                                         stellar_luminosity, stellar_nlyc)

    t = default_stellar_table()
    # low-mass star: no ionising photons (log N = 0 -> 1/s, negligible)
    assert float(stellar_nlyc(t, np.array([1.0]))[0]) == pytest.approx(1.0)
    # interpolation is monotone in mass
    m = np.linspace(6.0, 100.0, 50)
    n = np.asarray(stellar_nlyc(t, m))
    assert (np.diff(n) >= 0).all()
    lum = np.asarray(stellar_luminosity(t, np.array([1.0])))
    assert lum[0] == pytest.approx(10.0)


def test_mcradiation_eos_blend():
    """MCRadiationEOS (reference src/Thermal/MCRadiationEOS.cpp): u
    blended linearly in the ionisation fraction between the base-EOS
    value and temp_ion/(gamma-1)/mu_ion (radiation = monoionisation)."""
    import jax.numpy as jnp
    import numpy as np

    from gandalf_tpu.ops.eos import MCRadiationEOS, eos_factory
    from gandalf_tpu.params import Parameters

    p = Parameters()
    for k, v in dict(gas_eos="isothermal", radiation="monoionisation",
                     gamma_eos=5.0 / 3.0, mu_bar=1.0, temp0=1e-3,
                     temp_ion=0.05, mu_ion=1.0, dimensionless=1).items():
        p.set(k, v)
    eos = eos_factory(p)
    assert isinstance(eos, MCRadiationEOS) and eos.needs_ionfrac

    rho = jnp.ones(4)
    u = jnp.full(4, 1e-5)
    f = jnp.asarray([0.0, 0.25, 0.5, 1.0])
    u_n, p_n, c_n = eos.thermal_update(rho, u, ionfrac=f)
    gammam1 = 2.0 / 3.0
    u_base = 1e-3 / gammam1 / 1.0
    u_ion = 0.05 / gammam1 / 1.0
    expect = np.asarray(f) * u_ion + (1 - np.asarray(f)) * u_base
    np.testing.assert_allclose(np.asarray(u_n), expect, rtol=1e-12)
    assert (np.diff(np.asarray(p_n)) > 0).all()


def test_monoionisation_mc_transport_runs():
    """radiation=monoionisation drives the Monte-Carlo packet transport
    (ops/mcrt, the MonochromaticIonisationMonteCarlo + KDRadiationTree
    analogue): the run stays finite and produces a fractional per-cell
    ionisation field mapped onto the particles."""
    p = _hybrid(radiation="monoionisation", temp_ion=1.0, mu_ion=1.0,
                arecomb=1e-6, Ndotmin=0, Nhydro=128)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    # dimensionless cross-section so the cloud is moderately optically
    # thick (the cgs default is transparent in code units, exactly as
    # the reference's fixed 7.9e-18 cm^2 would be)
    sim.mc_across = 1.0
    for _ in range(2):
        sim.main_loop_step()
    ion = np.asarray(sim.state.ionfrac)
    u = np.asarray(sim.state.u)
    assert np.isfinite(u).all()
    assert ion.min() >= 0.0 and ion.max() <= 1.0
    # absorbed MC flux ionises the gas around the source
    assert ion.max() == 1.0
