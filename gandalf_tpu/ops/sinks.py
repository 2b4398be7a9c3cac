"""Sink particles: creation and accretion (analogue of Sinks,
src/Headers/Sinks.h:57-148 / src/Nbody/Sinks.cpp:118-520).

TPU-native formulation with STATIC shapes:

- sinks live in pre-allocated star slots (Nsinkmax) with an `active` mask
  instead of the reference's dynamic star array,
- creation (Sinks::SearchForNewSinkParticles): at most one new sink per
  step — the densest eligible gas particle (rho > rho_sink, deepest local
  potential) is converted by scatter-activating the next free slot and
  flagging the gas particle dead,
- accretion (Sinks::AccreteMassToSinks, smooth_accretion=0 branch): gas
  particles inside a sink's accretion radius transfer mass and momentum to
  the sink (COM-conserving) and die.

Dead gas particles keep their position but have m = 0 (zero source
contribution everywhere) and are excluded from timestep/diagnostics by the
alive mask.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


class SinkConfig(NamedTuple):
    rho_sink: float
    sink_radius: float      # in units of h (sink_radius_mode = hmult)
    create: bool
    accrete: bool


class SinkState(NamedTuple):
    """Pre-allocated sink/star slots (leapfrog-KDK integrated)."""

    r: Array        # (Ns, ndim)
    v: Array
    a: Array
    r0: Array
    v0: Array
    a0: Array
    m: Array        # (Ns,)
    h: Array        # softening / accretion smoothing scale
    active: Array   # (Ns,) bool


def empty_sinks(n_max: int, ndim: int, dtype) -> SinkState:
    z = jnp.zeros((n_max, ndim), dtype)
    return SinkState(r=z, v=z, a=z, r0=z, v0=z, a0=z,
                     m=jnp.zeros((n_max,), dtype),
                     h=jnp.ones((n_max,), dtype),
                     active=jnp.zeros((n_max,), bool))


def make_sinks(r, v, m, h, n_extra: int = 0) -> SinkState:
    """SinkState from star IC arrays + n_extra empty creation slots."""
    import numpy as np

    r = jnp.asarray(np.asarray(r, dtype=np.float64))
    n, ndim = r.shape
    base = empty_sinks(n + n_extra, ndim, r.dtype)
    return base._replace(
        r=base.r.at[:n].set(r), r0=base.r0.at[:n].set(r),
        v=base.v.at[:n].set(jnp.asarray(v, r.dtype)),
        v0=base.v0.at[:n].set(jnp.asarray(v, r.dtype)),
        m=base.m.at[:n].set(jnp.asarray(m, r.dtype)),
        h=base.h.at[:n].set(jnp.asarray(h, r.dtype)),
        active=base.active.at[:n].set(True))


def create_sinks(cfg: SinkConfig, sinks: SinkState,
                 r: Array, v: Array, m: Array, h: Array, rho: Array,
                 gpot: Array, alive: Array) -> Tuple[SinkState, Array]:
    """Convert the densest eligible gas particle into a sink (at most one
    per call, like the reference's per-step search).  Returns the updated
    sinks and the updated gas alive mask."""
    cand, gi = sink_candidate(cfg, r, v, m, h, rho, alive)
    ndim = r.shape[1]
    new_sinks, created = apply_sink_creation(sinks, cand, ndim)
    alive_new = alive.at[gi].set(jnp.where(created, False, alive[gi]))
    return new_sinks, alive_new


def sink_candidate(cfg: SinkConfig, r: Array, v: Array, m: Array,
                   h: Array, rho: Array, alive: Array):
    """Best local sink-creation candidate as a packed row
    [r, v, m, h, score], score = rho of the densest eligible particle
    (-inf when none; the reference searches density/potential minima,
    Sinks.cpp:118).  Shards each compute theirs, gather, and apply the
    global best identically."""
    eligible = alive & (rho > cfg.rho_sink)
    score = jnp.where(eligible, rho, -jnp.inf)
    gi = jnp.argmax(score)
    cand = jnp.concatenate([r[gi], v[gi],
                            jnp.stack([m[gi], h[gi], score[gi]])])
    return cand, gi


def apply_sink_creation(sinks: SinkState, cand: Array,
                        ndim: int) -> Tuple[SinkState, Array]:
    """Activate the next free slot from a packed candidate row.
    Returns (sinks, created bool).  Deterministic given `cand`, so every
    shard applies the identical update when the candidate was chosen
    collectively."""
    score = cand[2 * ndim + 2]
    free = ~sinks.active
    do_create = (score > -jnp.inf) & jnp.any(free)
    slot = jnp.argmax(free)
    put = lambda field, val: field.at[slot].set(
        jnp.where(do_create, val, field[slot]))
    zed = jnp.zeros_like(sinks.a[0])
    r_c, v_c = cand[:ndim], cand[ndim:2 * ndim]
    m_c, h_c = cand[2 * ndim], cand[2 * ndim + 1]
    new_sinks = sinks._replace(
        r=put(sinks.r, r_c), r0=put(sinks.r0, r_c),
        v=put(sinks.v, v_c), v0=put(sinks.v0, v_c),
        a=put(sinks.a, zed), a0=put(sinks.a0, zed),
        m=put(sinks.m, m_c), h=put(sinks.h, h_c),
        active=sinks.active.at[slot].set(
            jnp.where(do_create, True, sinks.active[slot])))
    return new_sinks, do_create


def accretion_sums(cfg: SinkConfig, sinks: SinkState,
                   r: Array, v: Array, m: Array, alive: Array):
    """Per-sink accretion sums (dm, dmom, dmr) over the LOCAL gas plus the
    local eaten mask.  Each gas particle is claimed by its NEAREST
    accreting sink.  In distributed mode the sums are psum'd across shards
    before apply_accretion (reference MpiControl::UpdateSinksAfterAccretion
    src/Mpi/MpiControl.cpp:408-431)."""
    Ns = sinks.m.shape[0]
    dr = r[:, None, :] - sinks.r[None, :, :]          # (N, Ns, nd)
    dist = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
    racc = cfg.sink_radius * sinks.h
    inside = (dist < racc[None, :]) & sinks.active[None, :]
    dist_masked = jnp.where(inside, dist, jnp.inf)
    nearest = jnp.argmin(dist_masked, axis=1)         # (N,)
    eaten = alive & jnp.any(inside, axis=1)

    w = jnp.where(eaten, m, 0.0)
    dm = jnp.zeros((Ns,), m.dtype).at[nearest].add(w)
    dmom = jnp.zeros_like(sinks.v).at[nearest].add(w[:, None] * v)
    dmr = jnp.zeros_like(sinks.r).at[nearest].add(w[:, None] * r)
    return dm, dmom, dmr, eaten


def apply_accretion(sinks: SinkState, dm: Array, dmom: Array,
                    dmr: Array) -> SinkState:
    """COM-conserving sink update from (possibly psum'd) accretion sums."""
    m_new = sinks.m + dm
    msafe = jnp.maximum(m_new, 1e-300)
    v_new = (sinks.m[:, None] * sinks.v + dmom) / msafe[:, None]
    r_new = (sinks.m[:, None] * sinks.r + dmr) / msafe[:, None]
    upd = sinks.active & (dm > 0)
    return sinks._replace(
        r=jnp.where(upd[:, None], r_new, sinks.r),
        v=jnp.where(upd[:, None], v_new, sinks.v),
        r0=jnp.where(upd[:, None], r_new, sinks.r0),
        v0=jnp.where(upd[:, None], v_new, sinks.v0),
        m=jnp.where(upd, m_new, sinks.m))


def accrete_to_sinks(cfg: SinkConfig, sinks: SinkState,
                     r: Array, v: Array, m: Array, alive: Array
                     ) -> Tuple[SinkState, Array]:
    """Accrete gas inside each sink's accretion radius
    (radius = sink_radius * h_sink); mass/momentum conserving."""
    dm, dmom, dmr, eaten = accretion_sums(cfg, sinks, r, v, m, alive)
    return apply_accretion(sinks, dm, dmom, dmr), alive & ~eaten
