"""Parameter system tests: grammar, typing, defaults."""

import pytest

from gandalf_tpu.params import Parameters


def test_defaults_present():
    p = Parameters()
    assert p.intparams["ndim"] == 3
    assert p.stringparams["sim"] == "sph"
    assert p.floatparams["h_fac"] == 1.2
    assert p.floatparams["gamma_eos"] == pytest.approx(5.0 / 3.0, rel=1e-5)
    assert p.stringparams["boundary_lhs[0]"] == "open"
    # total default count mirrors the reference's ~300 parameters
    total = len(p.intparams) + len(p.floatparams) + len(p.stringparams)
    assert total >= 290


def test_parse_line_grammar():
    p = Parameters()
    p.parse_line("Number of dims                  : ndim = 1")
    assert p.intparams["ndim"] == 1
    p.parse_line("# comment line : ndim = 3")
    assert p.intparams["ndim"] == 1
    p.parse_line("ndim = 2")          # colon optional
    assert p.intparams["ndim"] == 2
    p.parse_line("just some text")     # no '=' -> ignored
    p.parse_line("Pressure of LHS fluid : press1 = 0.25")
    assert p.floatparams["press1"] == 0.25
    p.parse_line("Select SPH simulation : sim = gradhsph")
    assert p.stringparams["sim"] == "gradhsph"


def test_read_file(tmp_path):
    f = tmp_path / "test.dat"
    f.write_text(
        "#--------------------------\n"
        "# my test parameter file\n"
        "#--------------------------\n"
        "Simulation run id string   : run_id = TEST1\n"
        "1D test                    : ndim = 1\n"
        "Boundary                   : boundary_lhs[0] = periodic\n"
        "\n"
        "End time                   : tend = 0.25\n"
    )
    p = Parameters()
    p.read_file(str(f))
    assert p.stringparams["run_id"] == "TEST1"
    assert p.intparams["ndim"] == 1
    assert p.floatparams["tend"] == 0.25
    assert p.stringparams["boundary_lhs[0]"] == "periodic"


def test_missing_run_id_raises(tmp_path):
    f = tmp_path / "norunid.dat"
    f.write_text("ndim = 1\n")
    with pytest.raises(ValueError):
        Parameters().read_file(str(f))


def test_sm2012_disabled():
    p = Parameters()
    p.set("sim", "sm2012sph")
    with pytest.raises(ValueError):
        p.check_invalid_parameters()


def test_locally_isothermal_eos():
    """LocallyIsothermal / DiscLocallyIsothermal temperature profiles
    (src/Thermal/LocallyIsothermal.cpp, DiscLocallyIsothermal.cpp)."""
    import jax.numpy as jnp
    import numpy as np

    from gandalf_tpu.ops.eos import eos_factory
    from gandalf_tpu.params import Parameters

    p = Parameters()
    p.set("gas_eos", "locally_isothermal")
    p.set("temp0", 2.0)
    p.set("templaw", 0.5)
    p.set("tempmin", 0.01)
    p.set("gamma_eos", 1.4)
    p.set("mu_bar", 1.0)
    eos = eos_factory(p)
    r = jnp.asarray([[4.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    u, press, cs = eos.thermal_update(jnp.ones(2), jnp.zeros(2), r=r)
    # T = 2 * 4^-0.5 = 1.0 at d=4 -> u = T/(gamma-1)
    assert float(u[0]) == pytest.approx(1.0 / 0.4)
    assert float(u[1]) == pytest.approx(0.2 / 0.4)

    p.set("gas_eos", "disc_locally_isothermal")
    p.set("DiscIcQ", 0.5)
    p.set("DiscIcHr", 0.05)
    p.set("DiscIcRin", 0.4)
    eos = eos_factory(p)
    u, press, cs = eos.thermal_update(jnp.ones(2), jnp.zeros(2), r=r)
    norm = 0.05 * np.sqrt(1.0 / 0.4)
    cs_expect = norm * (4.0 / 0.4) ** -0.5
    assert float(cs[0]) == pytest.approx(cs_expect)


def test_interpreter_repl():
    """cmd-based REPL wraps the facade (analysis/gandalf_interpreter.py
    analogue)."""
    from gandalf_tpu.analysis.interpreter import GandalfInterpreter

    g = GandalfInterpreter()
    assert "newsim" in g._fns and "run" in g._fns and "plot" in g._fns
    assert g.default("unknowncmd 1 2") is False
    assert g.default("quit") is True


def test_physical_units_inscaling():
    """dimensionless=0: unit-carrying parameters are converted to internal
    G=1 units once (reference divides each by simunits.X.outscale)."""
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.units import SimUnits, inscale_parameters

    p = Parameters()
    p.set("dimensionless", 0)
    p.set("routunit", "pc")
    p.set("moutunit", "m_sun")
    p.set("toutunit", "myr")
    p.set("mcloud", 2.0)
    p.set("radius", 0.5)
    p.set("tend", 14.9085)      # ~one time unit for pc/Msun
    units = SimUnits()
    units.setup_units(p)
    inscale_parameters(p, units)
    assert p.floatparams["mcloud"] == pytest.approx(2.0)     # base unit
    assert p.floatparams["radius"] == pytest.approx(0.5)
    assert p.floatparams["tend"] == pytest.approx(1.0, rel=1e-3)
    # idempotent
    inscale_parameters(p, units)
    assert p.floatparams["tend"] == pytest.approx(1.0, rel=1e-3)


def test_xorshift_matches_reference_sequence():
    """XorshiftRand is bit-exact vs the reference generator
    (RandomNumber.h:64-131; expected values from a compiled run of the
    reference header with seed 100)."""
    from gandalf_tpu.utils.rng import XorshiftRand, rng_from_params

    rng = XorshiftRand(100)
    expected_ints = [330096570228725262, 8731886480734488133,
                     8689522236355761732, 15424792333630924142,
                     11674126840730268255, 3540978481153957434]
    got = [rng.intrand() for _ in range(6)]
    assert got == expected_ints

    rng2 = XorshiftRand(100)
    expected_floats = [0.017894570928599939, 0.47335651461545825,
                       0.47105994432590215, 0.83617966791302245,
                       0.63285568412955651, 0.19195682809957765]
    import numpy as np
    np.testing.assert_allclose([rng2.floatrand() for _ in range(6)],
                               expected_floats, rtol=1e-15)

    from gandalf_tpu.params import Parameters
    p = Parameters()
    p.set("rand_algorithm", "xorshift")
    p.set("randseed", 100)
    r = rng_from_params(p)
    assert isinstance(r, XorshiftRand)
    assert abs(r.random() - expected_floats[0]) < 1e-15
    u = r.uniform(2.0, 4.0)
    assert 2.0 <= u <= 4.0
    g = XorshiftRand(7).standard_normal((64,))
    assert abs(g.mean()) < 0.5 and 0.5 < g.std() < 1.6


def test_xorshift_fill_matches_scalar_stream():
    """fill(n) (native C loop) produces the same values and ends at the
    same stream position as n scalar floatrand() calls."""
    import numpy as np

    from gandalf_tpu.utils.rng import XorshiftRand

    a, b = XorshiftRand(42), XorshiftRand(42)
    got = a.fill(1000)
    ref = np.asarray([b.floatrand() for _ in range(1000)])
    np.testing.assert_array_equal(got, ref)
    assert a.x == b.x
    assert a.floatrand() == b.floatrand()


def test_random_sphere_matches_reference_loop():
    """random_sphere reproduces the reference AddRandomSphere loop
    (Ic.cpp:481-492) draw-for-draw: positions identical AND the stream
    position afterwards identical, so later draws stay in sync."""
    import numpy as np

    from gandalf_tpu.utils.rng import XorshiftRand

    n, ndim = 257, 3
    fast = XorshiftRand(1234)
    got = fast.random_sphere(n, ndim)

    ref = XorshiftRand(1234)
    out = np.empty((n, ndim))
    for i in range(n):
        while True:
            rpos = np.array([1.0 - 2.0 * ref.floatrand()
                             for _ in range(ndim)])
            if (rpos ** 2).sum() <= 1.0:
                break
        out[i] = rpos
    np.testing.assert_array_equal(got, out)
    assert fast.x == ref.x


def test_montecarlo_field_matches_reference_loop():
    """montecarlo_field reproduces AddMonteCarloDensityField
    (Ic.cpp:500-528) draw-for-draw."""
    import numpy as np

    from gandalf_tpu.utils.rng import XorshiftRand

    lo, hi = np.zeros(3), np.ones(3)
    dens = lambda rr: 1.0 + 0.8 * np.sin(2 * np.pi
                                         * np.atleast_2d(rr)[:, 0])
    n = 101
    fast = XorshiftRand(99)
    got = fast.montecarlo_field(n, 3, lo, hi, dens, 1.8)

    ref = XorshiftRand(99)
    out = np.empty((n, 3))
    for i in range(n):
        while True:
            rr = np.array([ref.floatrand() for _ in range(3)])
            rho = 1.8 * ref.floatrand()
            if dens(rr[None, :])[0] >= rho:
                break
        out[i] = rr
    np.testing.assert_array_equal(got, out)
    assert fast.x == ref.x
