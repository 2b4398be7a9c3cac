"""Native interaction-list walk validation (gandalf_tpu/native/kdplan.cpp).

The listed gravity walk's correctness rests on one invariant: every
occupied leaf bucket must be covered EXACTLY once by each group's
(multipole cells) U (near leaves) — a missing leaf loses mass, a
double-covered leaf double-counts it.  This gates both implementations
(the per-group production walk and the dual-tree traversal) against that
invariant and against each other (near lists must agree bit-for-bit; the
dual walk's multipole lists may be finer-grained but must still cover).

Reference analogue of the invariant: the reference's gravity walk splits
all mass into {SPH-neib, direct, multipole-cell} partitions per cell
(Tree::ComputeGravityInteractionAndGhostList, src/Tree/Tree.cpp:628-735).
"""

import numpy as np
import pytest

from gandalf_tpu.native import load
from gandalf_tpu.ops.tree import plan_buckets_kd


def _run_walk(fn, gmap, r, m, h, theta_sqd, margin, mp_cap=0, near_cap=0):
    G_pad, L = gmap.shape
    N, ndim = r.shape
    r_c = np.ascontiguousarray(r, np.float64)
    g_c = np.ascontiguousarray(gmap, np.int32)
    m_c = np.ascontiguousarray(m, np.float64)
    h_c = np.ascontiguousarray(h, np.float64)
    counts = np.zeros(3, np.int32)
    mp = np.empty((G_pad, mp_cap), np.int32) if mp_cap else None
    near = np.empty((G_pad, near_cap), np.int32) if mp_cap else None
    rc = fn(r_c.ctypes.data, m_c.ctypes.data, h_c.ctypes.data, N, ndim,
            g_c.ctypes.data, G_pad, L, theta_sqd, 2.0, margin,
            mp_cap, near_cap,
            mp.ctypes.data if mp is not None else None,
            near.ctypes.data if near is not None else None,
            counts.ctypes.data)
    assert rc == 0
    return counts, mp, near


def _expand_packed(pid, depth):
    """Packed cell id (over the level-concatenated table) -> leaf range."""
    level = 0
    while (1 << (level + 1)) - 1 <= pid:
        level += 1
    c = pid - ((1 << level) - 1)
    shift = depth - level
    return range(c << shift, (c + 1) << shift)


@pytest.mark.parametrize("clustered", [False, True])
def test_walk_exact_coverage(clustered):
    lib = load()
    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    N = 4000
    r = rng.random((N, 3))
    if clustered:
        r = r ** 2
    m = rng.random(N) + 0.1
    h = 0.02 + 0.01 * rng.random(N)
    gmap = plan_buckets_kd(r, leaf_size=32)
    G_pad = gmap.shape[0]
    depth = int(np.log2(G_pad))
    theta_sqd, margin = 0.1, 0.004

    c0, _, _ = _run_walk(lib.tree_walk_lists, gmap, r, m, h,
                         theta_sqd, margin)
    c1, _, _ = _run_walk(lib.tree_walk_lists_dual, gmap, r, m, h,
                         theta_sqd, margin)
    assert c0[1] == c1[1], "near_max differs between walks"
    assert c0[2] == c1[2], "sup_max differs between walks"

    _, mp0, near0 = _run_walk(lib.tree_walk_lists, gmap, r, m, h,
                              theta_sqd, margin,
                              int(c0[0]) + 8, int(c0[1]) + 8)
    _, mp1, near1 = _run_walk(lib.tree_walk_lists_dual, gmap, r, m, h,
                              theta_sqd, margin,
                              int(c1[0]) + 8, int(c1[1]) + 8)
    occupied = [g for g in range(G_pad) if (gmap[g] >= 0).any()]
    occ_set = set(occupied)
    for g in occupied:
        n0 = set(near0[g][near0[g] >= 0])
        n1 = set(near1[g][near1[g] >= 0])
        assert n0 == n1, f"near list mismatch at group {g}"
        for mp, tag in ((mp0[g], "pergroup"), (mp1[g], "dual")):
            covered = list(n0)
            for pid in mp[mp >= 0]:
                covered.extend(l for l in _expand_packed(int(pid), depth)
                               if l in occ_set)
            assert sorted(covered) == occupied, \
                f"{tag} walk coverage violation at group {g}"
