"""Dense 27-shift kernel parity: the shard_map-compatible dense passes
(fields travelling as ghosted cell tensors) must reproduce their
gather/all-pairs twins to roundoff.  These kernels back the distributed
SM2012 / dust / cd2010 modes (reference MPI mode covers every SPH
flavour via ghost exchange, src/Mpi/MpiControl.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gandalf_tpu.kernels.smoothing import kernel_factory
from gandalf_tpu.ops import sph_grid27 as g
from gandalf_tpu.state import (DUST_TYPE, GAS_TYPE, _BOUNDARY_CODES,
                               DomainBox, make_sph_state)

P = _BOUNDARY_CODES["periodic"]


def _box3():
    return DomainBox(3, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                     (P, P, P), (P, P, P))


def _random_state(N=400, seed=3, dust=False, h_range=(0.06, 0.10)):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0, 1, (N, 3))
    s = make_sph_state(jnp.asarray(r),
                       jnp.asarray(rng.normal(0, 0.1, (N, 3))),
                       jnp.full(N, 1.0 / N), jnp.full(N, 0.08),
                       jnp.full(N, 1.0))
    kw = dict(
        rho=jnp.asarray(rng.uniform(0.5, 1.5, N)),
        sound=jnp.asarray(rng.uniform(0.8, 1.2, N)),
        a=jnp.asarray(rng.normal(0, 0.05, (N, 3))),
        a0=jnp.asarray(rng.normal(0, 0.05, (N, 3))),
        h=jnp.asarray(rng.uniform(*h_range, N)),
        alpha=jnp.asarray(rng.uniform(0.1, 1.0, N)))
    if dust:
        kw["ptype"] = jnp.asarray(
            np.where(np.arange(N) % 2 == 0, GAS_TYPE, DUST_TYPE))
    return s.replace(**kw), r


class TestDragDense:
    @pytest.mark.parametrize("law_name,coeff,energy",
                             [("fixed", 2.0, True),
                              ("epstein", 1.5, True),
                              ("lp12", 3.0, False)])
    @pytest.mark.parametrize("tp", [False, True])
    def test_matches_grid(self, law_name, coeff, energy, tp):
        from gandalf_tpu.ops.dust import (DragLaw, drag_pass_dense,
                                          drag_pass_grid)

        s, r = _random_state(dust=True)
        kern = kernel_factory("m4", 3)
        box = _box3()
        spec = g.plan_grid27(box, r, float(np.asarray(s.h).max()) * 1.1,
                             kern.kernrange)
        law = DragLaw(law_name, coeff, energy)
        dt = jnp.asarray(0.01)
        dg = drag_pass_grid(kern, law, spec, dt, s, s.alive, tp)
        b = g.bin_particles(spec, s.r, discard=~s.alive)
        dd = drag_pass_dense(kern, law, spec, dt, b, s, s.alive, tp)
        for f in ("a_drag", "dudt", "sound", "div_v"):
            x = np.asarray(getattr(dg, f))
            y = np.asarray(getattr(dd, f))
            sc = max(np.max(np.abs(x)), 1e-30)
            assert np.max(np.abs(x - y)) / sc < 1e-10, f


class TestCD2010Dense:
    def test_matches_all_pairs(self):
        from gandalf_tpu.ops.forces import (ArtificialViscosity,
                                            cullen_dehnen_alpha,
                                            cullen_dehnen_dense)

        # well-populated neighbourhoods: with only ~3 neighbours the
        # least-squares rr matrix is near-singular and the condition
        # check flips on summation-order roundoff (both answers valid)
        s, r = _random_state(seed=7, h_range=(0.09, 0.11))
        kern = kernel_factory("m4", 3)
        box = _box3()
        visc = ArtificialViscosity(alpha_visc=2.0, alpha_visc_min=0.1)
        hfactor = (1.0 / s.h) ** 4
        args = (s.r, s.v, s.a, s.m, s.h, s.rho, s.sound, hfactor,
                s.alpha)
        al1, dal1 = cullen_dehnen_alpha(kern, visc, box, *args,
                                        s.r, s.v, s.a, s.m)
        spec = g.plan_grid27(box, r, float(np.asarray(s.h).max()) * 1.05,
                             kern.kernrange)
        b = g.bin_particles(spec, s.r, discard=~s.alive)
        al2, dal2 = cullen_dehnen_dense(kern, visc, spec, b, *args,
                                        s.alive)
        for nm, (x, y) in {"alpha": (al1, al2),
                           "dalphadt": (dal1, dal2)}.items():
            x, y = np.asarray(x), np.asarray(y)
            sc = max(np.max(np.abs(x)), 1e-30)
            assert np.max(np.abs(x - y)) / sc < 1e-10, nm


class TestSM2012Dense:
    def test_matches_gather(self):
        from gandalf_tpu.ops.forces import ArtificialViscosity
        from gandalf_tpu.ops.sm2012 import (sm2012_hydro_pass_grid,
                                            sm2012_pass_dense)

        s, r = _random_state(seed=5)
        s = s.replace(u=jnp.asarray(
            np.random.default_rng(5).uniform(0.5, 1.5, s.N)))
        kern = kernel_factory("m4", 3)
        box = _box3()
        visc = ArtificialViscosity()
        gamma = 1.4
        # plan with headroom ABOVE the converged h (~1.2*(m/rho)^(1/3)
        # ~= 0.16-0.19 here): if converged h exceeds the grid's hmax the
        # two paths clamp differently and parity is meaningless (both
        # would also raise neib_overflow in a real run)
        spec = g.plan_grid27(box, r, 0.25, kern.kernrange)
        sg, _ = sm2012_hydro_pass_grid(kern, visc, gamma, spec, 1.2, 0.01,
                                       s, s.alive, True)
        b = g.bin_particles(spec, s.r, discard=~s.alive)
        sd = sm2012_pass_dense(kern, visc, gamma, spec, 1.2, 0.01, b, s,
                               s.alive, True)
        assert not bool(sg.neib_overflow) and not bool(sd.neib_overflow)
        for f in ("h", "rho", "a", "dudt", "div_v"):
            x = np.asarray(getattr(sg, f))
            y = np.asarray(getattr(sd, f))
            sc = max(np.max(np.abs(x)), 1e-30)
            assert np.max(np.abs(x - y)) / sc < 1e-9, f
