"""RadWS radiative cooling (reference EnergyRadws + OpacityTable,
src/Hydrodynamics/EnergyRadws.cpp, src/Common/OpacityTable.cpp)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from gandalf_tpu.ops.radws import (energy_find_equi, make_ideal_table,
                                   radws_energy_integration,
                                   read_opacity_table, temp_from_u)
from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation


def _radws_box(press, **over):
    p = Parameters()
    base = {"ndim": 3, "sim": "sph", "ic": "box", "dimensionless": 1,
            "run_id": "",
            "Nlattice1[0]": 4, "Nlattice1[1]": 4, "Nlattice1[2]": 4,
            "boxmin[0]": 0.0, "boxmax[0]": 1.0,
            "boxmin[1]": 0.0, "boxmax[1]": 1.0,
            "boxmin[2]": 0.0, "boxmax[2]": 1.0,
            "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
            "boundary_lhs[1]": "periodic", "boundary_rhs[1]": "periodic",
            "boundary_lhs[2]": "periodic", "boundary_rhs[2]": "periodic",
            "rhofluid1": 1.0, "press1": press,
            "gas_eos": "radws", "energy_integration": "radws",
            "gamma_eos": 1.6666666666666667, "mu_bar": 1.0,
            "temp_ambient": 10.0, "radws_table": "/nonexistent",
            "hydro_forces": 1, "self_gravity": 0,
            "neib_search": "bruteforce"}
    base.update(over)
    for k, v in base.items():
        p.set(k, v)
    return p


class TestOpacityTable:
    def test_temp_energy_inversion(self):
        tab = make_ideal_table()
        rho = jnp.asarray([1e-3, 1.0])
        T = jnp.asarray([25.0, 3000.0])
        u = T / ((5.0 / 3.0 - 1.0) * 1.0)
        T_back = temp_from_u(tab, rho, u)
        assert np.allclose(np.asarray(T_back), np.asarray(T), rtol=0.06)

    def test_read_reference_format(self, tmp_path):
        """Round-trip the reference 9-column text format
        (OpacityTable.cpp:48-130)."""
        nd, nt = 3, 5
        dens = np.logspace(-5, -3, nd)
        temp = np.logspace(1, 3, nt)
        path = tmp_path / "eos.test.dat"
        with open(path, "w") as f:
            f.write("# test table\n")
            f.write(f"{nd} {nt} 0.5\n")
            for d in dens:
                for T in temp:
                    u = 1.5 * T
                    f.write(f"{d} {T} {u} 2.35 {0.1*T} {0.1*T} {0.2*T} "
                            f"1.6667 1.4\n")
        tab = read_opacity_table(str(path))
        assert tab.energy.shape == (nd, nt)
        assert np.allclose(np.asarray(10.0 ** tab.log_dens), dens)
        assert np.allclose(np.asarray(tab.energy[0]), 1.5 * temp)
        assert np.allclose(np.asarray(tab.kappap[1]), 0.2 * temp)
        assert float(tab.fcol2) == pytest.approx(0.25 * 4 * np.pi)

    def test_equilibrium_finder(self):
        """With no compressive heating the equilibrium is T_ambient
        (optically thin, col2 = 0)."""
        tab = make_ideal_table(temp_ambient=10.0)
        rho = jnp.full(4, 1e-2)
        u = jnp.asarray([150.0, 15.0, 3.0, 15.0])      # hot/equil/cold
        ueq, dt_th = energy_find_equi(tab, rho, u, jnp.zeros(4),
                                      jnp.zeros(4))
        # u_eq = T_amb / (gamma-1) = 15 within table resolution
        assert np.allclose(np.asarray(ueq), 15.0, rtol=0.1)
        assert np.all(np.asarray(dt_th) >= 0.0)

    def test_relaxation_update(self):
        u0 = jnp.asarray([100.0, 100.0, 100.0])
        ueq = jnp.asarray([15.0, 15.0, 15.0])
        dt_th = jnp.asarray([1.0, 1e-35, 1e30])
        u = radws_energy_integration(u0, ueq, dt_th, jnp.asarray(1.0))
        expect = 100.0 * np.exp(-1.0) + 15.0 * (1 - np.exp(-1.0))
        assert float(u[0]) == pytest.approx(expect)
        assert float(u[1]) == pytest.approx(100.0)   # dt_therm ~ 0 guard
        assert float(u[2]) == pytest.approx(100.0, rel=1e-6)  # frozen


class TestRadwsSimulation:
    def test_hot_box_cools_to_ambient(self):
        sim = GradhSphSimulation(_radws_box(press=66.67))   # T0 ~ 66.7
        sim.SetupSimulation()
        T0 = float(np.asarray(sim.state.u)[0]) * (2.0 / 3.0)
        assert T0 > 60.0
        for _ in range(20):
            sim.main_loop_step()
        T = np.asarray(sim.state.u) * (2.0 / 3.0)
        assert np.allclose(T, 10.0, rtol=0.1)   # table-resolution limited

    def test_block_timesteps_hot_box_cools(self):
        """radws energy integration under hierarchical block timesteps
        (Nlevels=3): the hot box relaxes to ambient exactly as the
        global-dt run does (the reference runs EnergyRadws under
        ComputeBlockTimesteps as a matter of course,
        Simulation.cpp:1763-2197)."""
        ref = GradhSphSimulation(_radws_box(press=66.67))
        ref.SetupSimulation()
        for _ in range(20):
            ref.main_loop_step()
        t_target = ref.t

        sim = GradhSphSimulation(_radws_box(press=66.67, Nlevels=3,
                                            level_diff_max=1))
        sim.SetupSimulation()
        assert sim.use_block          # must NOT fall back to global dt
        n = 0
        while sim.t < t_target and n < 4000:
            sim.main_loop_step()
            n += 1
        assert sim.t >= t_target
        T = np.asarray(sim.state.u) * (2.0 / 3.0)
        T_ref = np.asarray(ref.state.u) * (2.0 / 3.0)
        assert np.allclose(T_ref, 10.0, rtol=0.1)
        assert np.allclose(T, 10.0, rtol=0.1)

    def test_cold_box_heats_to_ambient(self):
        sim = GradhSphSimulation(_radws_box(press=1.0))     # T0 = 1.5
        sim.SetupSimulation()
        for _ in range(20):
            sim.main_loop_step()
        T = np.asarray(sim.state.u) * (2.0 / 3.0)
        assert np.allclose(T, 10.0, rtol=0.1)

    def test_variable_gamma_eos(self):
        """The radws EOS reads gamma from the table (RadwsEOS.cpp:54-90)."""
        sim = GradhSphSimulation(_radws_box(press=10.0))
        sim.SetupSimulation()
        s = sim.state
        P = np.asarray(s.pressure)
        rho = np.asarray(s.rho)
        u = np.asarray(s.u)
        assert np.allclose(P, (5.0 / 3.0 - 1.0) * rho * u, rtol=1e-6)


class TestRadiativeFeedback:
    def test_sink_heating_field(self):
        """SinkHeating ambient field: T^4 falls as 1/d^2, floors at
        temp_inf far away (RadiativeFB.cpp:258-300)."""
        import jax.numpy as jnp

        from gandalf_tpu.ops.radiative_fb import (SinkHeatingConfig,
                                                  ambient_temperature,
                                                  sink_luminosity)

        cfg = SinkHeatingConfig(rad_const=1.0, temp_inf=5.0, f_acc=0.75,
                                msun=1.0, r_star=0.01)
        # one accreting stellar-mass sink at the origin
        m = jnp.asarray([1.0])
        mdot = jnp.asarray([0.1])
        rads = jnp.asarray([0.05])
        L, rsrc = sink_luminosity(cfg, m, mdot, rads)
        # stellar class: intrinsic + accretion luminosity
        L_exp = 1.0 + 0.75 * (1.0 * 0.1 / 0.01) * (1 - 0.01 / 0.1)
        assert float(L[0]) == pytest.approx(L_exp)
        assert float(rsrc[0]) == 0.01

        r = jnp.asarray([[0.1, 0.0, 0.0], [1.0, 0.0, 0.0],
                         [100.0, 0.0, 0.0]])
        T = ambient_temperature(cfg, r, jnp.zeros((1, 3)), m, mdot, rads,
                                jnp.asarray([True]))
        T = np.asarray(T)
        # near field dominated by the sink, far field -> temp_inf
        assert T[0] > T[1] > T[2]
        assert T[2] == pytest.approx(5.0, rel=1e-3)
        # T^4 - Tinf^4 scales as 1/d^2
        ratio = (T[0] ** 4 - 5.0 ** 4) / (T[1] ** 4 - 5.0 ** 4)
        assert ratio == pytest.approx(100.0, rel=1e-6)

    def test_equilibrium_with_ambient_field(self):
        """energy_find_equi accepts a per-particle ambient temperature:
        hotter ambient -> hotter equilibrium."""
        import jax.numpy as jnp

        tab = make_ideal_table(temp_ambient=10.0)
        rho = jnp.full(2, 1e-2)
        u = jnp.full(2, 50.0)
        tamb = jnp.asarray([10.0, 100.0])
        ueq, _ = energy_find_equi(tab, rho, u, jnp.zeros(2), jnp.zeros(2),
                                  temp_amb=tamb)
        # ideal table: ueq = T_amb / (gamma-1)
        assert float(ueq[0]) == pytest.approx(15.0, rel=0.1)
        assert float(ueq[1]) == pytest.approx(150.0, rel=0.1)


def test_disc_heating_profile():
    """DiscHeating ambient T^4 = temp_au^4 (d_mid^2 + rsmooth^2)^(-2q)
    around the central sink(s) (RadiativeFB.cpp:108-148), excluded from
    sink heating in the combined field."""
    import jax.numpy as jnp

    from gandalf_tpu.ops.radiative_fb import (DiscHeatingConfig,
                                              SinkHeatingConfig,
                                              combined_ambient_temperature,
                                              disc_ambient_t4)

    disc = DiscHeatingConfig(temp_au=100.0, temp_q=0.75, rsmooth=0.1,
                             n_central=1)
    r = jnp.array([[0.5, 0.0, 0.0], [1.0, 0.0, 0.5], [2.0, 0.0, 0.0]])
    r_sink = jnp.zeros((1, 3))
    act = jnp.ones(1, bool)
    t4 = np.asarray(disc_ambient_t4(disc, r, r_sink, act))
    # midplane distance only: particle 1 at (1, 0, z) has d_mid = 1
    expect1 = 100.0 ** 4 * (1.0 + 0.01) ** -1.5
    assert t4[1] == pytest.approx(expect1, rel=1e-6)
    assert t4[0] > t4[1] > t4[2]

    sink = SinkHeatingConfig(temp_inf=5.0)
    T = np.asarray(combined_ambient_temperature(
        sink, disc, r, r_sink, jnp.array([1.0]), jnp.array([0.0]),
        jnp.array([0.01]), act))
    assert (T ** 4 >= 5.0 ** 4).all()
    assert T[0] > T[2]


class TestRadwsSinks:
    """radws energy integration coupled to sinks/stars (the reference's
    disc-fragmentation configuration: EnergyRadws + Sinks +
    RadiativeFB, GradhSphSimulation.cpp:190-201)."""

    def _hybrid(self, **over):
        p = Parameters()
        base = dict(ndim=3, sim="sph", neib_search="bruteforce",
                    gas_eos="radws", energy_integration="radws",
                    dimensionless=1, run_id="", ic="plummer",
                    Nhydro=64, Nstar=1, gasfrac=0.5, starfrac=0.5,
                    self_gravity=1, hydro_forces=1,
                    sink_particles=1, create_sinks=0,
                    gamma_eos=1.6666666666666667, mu_bar=1.0,
                    temp_ambient=10.0, radws_table="/nonexistent")
        base.update(over)
        for k, v in base.items():
            p.set(k, v)
        return p

    def test_radws_with_sinks_runs(self):
        """Hybrid plummer (gas + 1 star-sink) with radws cooling: steps
        run, (ueq, dt_therm) populate, fields stay finite."""
        sim = GradhSphSimulation(self._hybrid())
        sim.SetupSimulation()
        assert sim.has_sinks and sim.use_radws_energy
        for _ in range(5):
            sim.main_loop_step()
        s = sim.state
        alive = np.asarray(s.alive)
        assert np.isfinite(np.asarray(s.u)[alive]).all()
        assert np.isfinite(np.asarray(s.ueq)[alive]).all()
        # dt_therm >= 0 (exactly 0 once u sits on the table equilibrium)
        assert (np.asarray(s.dt_therm)[alive] >= 0.0).all()
        assert (np.asarray(s.ueq)[alive] > 0.0).all()

    def test_radws_sinks_block_runs(self):
        """Same configuration under hierarchical block timesteps."""
        sim = GradhSphSimulation(self._hybrid(Nlevels=3,
                                              level_diff_max=1))
        sim.SetupSimulation()
        assert sim.use_block
        for _ in range(6):
            sim.main_loop_step()
        s = sim.state
        alive = np.asarray(s.alive)
        assert np.isfinite(np.asarray(s.u)[alive]).all()
        assert np.isfinite(np.asarray(s.ueq)[alive]).all()

    def test_rad_fb_sink_heating_field(self):
        """rad_fb + sink_heating: an accreting sink raises the ambient
        temperature (and hence ueq) of nearby gas above distant gas
        (RadiativeFB::AmbientTemp, src/Thermal/RadiativeFB.cpp:88-106)."""
        import jax.numpy as jnp

        # r_star is in SOLAR RADII in physical units; in a dimensionless
        # run pick a source radius small against the domain
        sim = GradhSphSimulation(self._hybrid(
            rad_fb=1, sink_heating=1, ambient_heating=1,
            temp_ambient=1.0, r_star=0.01, r_bdwarf=0.01,
            r_planet=0.01))
        sim.SetupSimulation()
        assert sim.rad_fb and sim.radfb_sink_on
        sinks = sim.sinks._replace(
            mdot=jnp.where(sim.sinks.active, 10.0, 0.0))
        s = sim._radws_equilibrium(sim.state, sinks)
        r_sink = np.asarray(sinks.r)[0]
        d = np.linalg.norm(np.asarray(s.r) - r_sink[None], axis=-1)
        ueq = np.asarray(s.ueq)
        near = ueq[d < np.quantile(d, 0.2)].mean()
        far = ueq[d > np.quantile(d, 0.8)].mean()
        assert near > 1.5 * far

    def test_rad_fb_off_matches_plain_ambient(self):
        """rad_fb=0: the sink-coupled radws run must keep using the table
        ambient temperature (no accidental coupling)."""
        sim = GradhSphSimulation(self._hybrid())
        sim.SetupSimulation()
        s1 = sim._radws_equilibrium(sim.state, sim.sinks)
        s2 = sim._radws_equilibrium(sim.state, None)
        np.testing.assert_array_equal(np.asarray(s1.ueq),
                                      np.asarray(s2.ueq))


class TestMfvRadws:
    """radws cooling on the MeshlessFV scheme (the reference's
    EnergyRadws<MeshlessFVParticle>: implicit heating folded into the
    total-energy conserved variable, EnergyRadws.cpp:215-260)."""

    def test_hot_mfv_box_cools_to_ambient(self):
        from gandalf_tpu.sim.mfv_sim import MfvMusclSimulation

        p = _radws_box(press=66.67, sim="mfvmuscl")
        sim = MfvMusclSimulation(p)
        sim.SetupSimulation()
        assert sim.use_radws_energy
        T0 = float(np.asarray(sim.state.u)[0]) * (2.0 / 3.0)
        assert T0 > 60.0
        for _ in range(25):
            sim.main_loop_step()
        T = np.asarray(sim.state.u) * (2.0 / 3.0)
        assert np.allclose(T, 10.0, rtol=0.12)
        # mass and momentum untouched by the energy update
        m = np.asarray(sim.state.m)
        assert m.sum() == pytest.approx(1.0, rel=1e-10)

    def test_block_mfv_box_cools_to_ambient(self):
        """radws cooling under hierarchical block timesteps: the cooling
        commit rides EndTimestep with the particle's OWN step length
        (MfvIntegration.cpp:88-89 part.cooling applied at commit)."""
        from gandalf_tpu.sim.mfv_sim import MfvMusclSimulation

        p = _radws_box(press=66.67, sim="mfvmuscl", Nlevels=3,
                       time_step_limiter="simple")
        sim = MfvMusclSimulation(p)
        sim.SetupSimulation()
        assert sim.use_radws_energy and sim.use_block
        for _ in range(60):
            sim.main_loop_step()
        T = np.asarray(sim.state.u) * (2.0 / 3.0)
        assert np.allclose(T, 10.0, rtol=0.12)
        m = np.asarray(sim.state.m)
        assert m.sum() == pytest.approx(1.0, rel=1e-10)

    def test_implicit_heating_equilibrium(self):
        """The implicit solve lands on the energy balance root: a particle
        AT the ambient temperature has ~zero heating; a hot one cools; a
        cold one heats."""
        from gandalf_tpu.ops.radws import (make_ideal_table,
                                           radws_implicit_heating)

        tab = make_ideal_table(temp_ambient=10.0)
        rho = jnp.full(3, 1e-2)
        u = jnp.asarray([15.0, 1500.0, 1.5])   # T = 10, 1000, 1
        heat = radws_implicit_heating(tab, rho, u, jnp.zeros(3),
                                      jnp.zeros(3), jnp.asarray(1e-6))
        h = np.asarray(heat)
        assert abs(h[0]) < 1e3        # near equilibrium
        assert h[1] < -1e5            # hot -> strong cooling
        assert h[2] > 1e2             # cold -> heating
