"""N-body sub-system detection (NbodySystemTree,
src/Nbody/NbodySystemTree.cpp)."""

import numpy as np
import pytest

from gandalf_tpu.ops.systemtree import (build_subsystems,
                                        create_system_tree,
                                        orbital_elements)


def _gpot(r, m):
    dr = r[:, None, :] - r[None, :, :]
    d = np.sqrt((dr ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    return (m[None, :] / d).sum(1)


def test_detects_isolated_binary():
    """A tight binary far from field stars is found as a 2-component
    sub-system; the field stars are not."""
    rng = np.random.default_rng(1)
    r = np.concatenate([
        np.array([[0.0, 0.0, 0.0], [0.01, 0.0, 0.0]]),      # binary
        rng.uniform(5, 10, (6, 3))])                          # field
    m = np.ones(8)
    v = np.zeros((8, 3))
    # circular orbital velocities for the pair
    vorb = np.sqrt(2.0 / 0.01) / 2
    v[0, 1] = +vorb / 2
    v[1, 1] = -vorb / 2
    subs = build_subsystems(r, v, m, _gpot(r, m), Ncompmax=4,
                            gpefrac=0.1)
    assert any(set(s.members) == {0, 1} for s in subs)
    s = [s for s in subs if set(s.members) == {0, 1}][0]
    assert s.bound
    assert s.tcross > 0


def test_hierarchical_triple():
    """An inner binary + distant companion is detected as a triple (and
    absorbs the inner pair)."""
    r = np.array([[0.0, 0.0, 0.0], [0.02, 0.0, 0.0], [0.5, 0.0, 0.0],
                  [50.0, 50.0, 50.0], [-60.0, 10.0, 40.0]])
    m = np.ones(5)
    v = np.zeros((5, 3))
    # Ncompmax = 3 caps the component count, so the largest passing node
    # is the triple (with Ncompmax = 4 the outer 4-node, which is also
    # internally dominated relative to the remote 5th star, would win —
    # same behaviour as the reference's bottom-up replacement)
    subs = build_subsystems(r, v, m, _gpot(r, m), Ncompmax=3,
                            gpefrac=0.05)
    trip = [s for s in subs if s.n == 3]
    assert trip and set(trip[0].members) == {0, 1, 2}


def test_tree_pairs_mutual_nearest():
    r = np.array([[0.0, 0.0], [1.0, 0.0], [10.0, 0.0], [11.0, 0.0]])
    children, members = create_system_tree(r)
    pairs = [set(members[p]) for p in children if len(members[p]) == 2]
    assert {0, 1} in pairs and {2, 3} in pairs


def test_orbital_elements_circular():
    # circular binary, a = 1, m = 1 + 1 -> v_rel = sqrt(mu/a) = sqrt(2)
    a, e, P = orbital_elements(
        np.array([0.5, 0.0, 0.0]), np.array([0.0, np.sqrt(2.0) / 2, 0.0]),
        1.0,
        np.array([-0.5, 0.0, 0.0]), np.array([0.0, -np.sqrt(2.0) / 2, 0.0]),
        1.0)
    assert a == pytest.approx(1.0)
    assert e == pytest.approx(0.0, abs=1e-12)
    assert P == pytest.approx(2 * np.pi / np.sqrt(2.0))
