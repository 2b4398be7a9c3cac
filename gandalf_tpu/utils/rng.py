"""Random-number generators (reference src/Headers/RandomNumber.h:45-178).

XorshiftRand reproduces the reference generator BIT-EXACTLY (xorshift
triple a1=21/a2=35/a3=4 with the MLCG output multiply mod 2^64 and a
10-step warm-up; Numerical Recipes 3rd ed. ch. 3) — gated against a
compiled run of the reference header.  `rand_algorithm = xorshift`
selects it; `default` maps to numpy's Generator (the reference's system
rand has no cross-platform sequence to match).
"""

from __future__ import annotations

import numpy as np

_A1, _A2, _A3 = np.uint64(21), np.uint64(35), np.uint64(4)
_AMOD = np.uint64(4768777513237032717)
_INVRANDMAX = 1.0 / 1.84467440737095e19


class XorshiftRand:
    """Bit-exact reference xorshift (RandomNumber.h:64-131)."""

    def __init__(self, seed: int):
        self.x = np.uint64(seed)
        for _ in range(10):
            self._step()

    def _step(self) -> np.uint64:
        with np.errstate(over="ignore"):
            x = self.x
            x ^= x >> _A1
            x ^= (x << _A2) & np.uint64(0xFFFFFFFFFFFFFFFF)
            x ^= x >> _A3
            self.x = x
            return x * _AMOD

    def intrand(self) -> int:
        return int(self._step())

    def floatrand(self) -> float:
        return float(self._step()) * _INVRANDMAX

    def gaussrand(self, mean: float = 0.0, sigma: float = 1.0) -> float:
        u = 0.0
        v = 0.0
        while u == 0.0:
            u = self.floatrand()
            v = self.floatrand()
        return float(np.sqrt(-2.0 * np.log(u)) * np.cos(2 * np.pi * v))

    def fill(self, n: int) -> np.ndarray:
        """n sequential floatrand() draws, advancing the state by exactly
        n steps (native C loop when available — the state is the single
        uint64, so save/restore enables DRAW-EXACT rejection sampling)."""
        from ..native import load

        lib = load()
        out = np.empty(int(n), np.float64)
        if lib is not None and hasattr(lib, "xorshift_fill"):
            import ctypes

            self.x = np.uint64(lib.xorshift_fill(
                int(self.x), int(n),
                out.ctypes.data_as(ctypes.c_void_p)))
            return out
        for i in range(int(n)):
            out[i] = self.floatrand()
        return out

    def random_sphere(self, n: int, ndim: int) -> np.ndarray:
        """Unit-sphere rejection sampling with the reference's EXACT draw
        order and consumption (Ic::AddRandomSphere, src/Ic/Ic.cpp:481-492:
        per trial, ndim draws rpos_k = 1 - 2 u; accept while |rpos|^2 <= 1;
        the stream position after the n-th acceptance matches the
        reference bit-for-bit, so later draws stay in sync)."""
        out = np.empty((n, ndim))
        got = 0
        while got < n:
            x0 = self.x                       # save the stream position
            T = max(2 * (n - got), 1024)
            rpos = 1.0 - 2.0 * self.fill(T * ndim).reshape(T, ndim)
            acc = np.nonzero((rpos ** 2).sum(1) <= 1.0)[0]
            take = min(len(acc), n - got)
            if got + take == n and take > 0:
                # rewind to the exact post-acceptance stream position
                self.x = x0
                self.fill((int(acc[take - 1]) + 1) * ndim)
            if take > 0:
                out[got:got + take] = rpos[acc[:take]]
            got += take
        return out

    def montecarlo_field(self, n: int, ndim: int, box_min, box_max,
                         density_fn, rho_max: float) -> np.ndarray:
        """Monte-Carlo density-field sampling with the reference's exact
        draw cadence (Ic::AddMonteCarloDensityField, Ic.cpp:500-528: per
        trial ndim position draws + one rho draw; accept while
        rho(r) >= rho_max * u)."""
        lo = np.asarray(box_min, float)
        hi = np.asarray(box_max, float)
        out = np.empty((n, ndim))
        got = 0
        while got < n:
            x0 = self.x
            T = max(2 * (n - got), 1024)
            u = self.fill(T * (ndim + 1)).reshape(T, ndim + 1)
            rr = lo[None, :] + (hi - lo)[None, :] * u[:, :ndim]
            rho = rho_max * u[:, ndim]
            acc = np.nonzero(np.asarray(density_fn(rr)) >= rho)[0]
            take = min(len(acc), n - got)
            if got + take == n and take > 0:
                self.x = x0
                self.fill((int(acc[take - 1]) + 1) * (ndim + 1))
            if take > 0:
                out[got:got + take] = rr[acc[:take]]
            got += take
        return out

    # numpy-Generator-style adapters (IC generators consume these)
    def random(self, size=None):
        if size is None:
            return self.floatrand()
        n = int(np.prod(size))
        return self.fill(n).reshape(size)

    def uniform(self, lo=0.0, hi=1.0, size=None):
        return lo + (hi - lo) * self.random(size)

    def standard_normal(self, size=None):
        if size is None:
            return self.gaussrand()
        n = int(np.prod(size))
        out = np.asarray([self.gaussrand() for _ in range(n)])
        return out.reshape(size)


def rng_from_params(params):
    """Generator selected by rand_algorithm/randseed
    (Simulation::ProcessParameters RNG factory, Simulation.cpp:1107-1117)."""
    algo = params.stringparams.get("rand_algorithm", "default") \
        if hasattr(params.stringparams, "get") \
        else params.stringparams["rand_algorithm"]
    seed = params.intparams["randseed"]
    if algo == "xorshift":
        return XorshiftRand(seed)
    return np.random.default_rng(seed)
