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

    # numpy-Generator-style adapters (IC generators consume these)
    def random(self, size=None):
        if size is None:
            return self.floatrand()
        n = int(np.prod(size))
        out = np.asarray([self.floatrand() for _ in range(n)])
        return out.reshape(size)

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
