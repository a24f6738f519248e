import numpy as np
import jax
import jax.numpy as jnp

from lammps_buck_intel_tpu.core import make_box, build_topology
from lammps_buck_intel_tpu.neighbor import (
    make_spec, build, build_dense, build_cell, needs_rebuild, build_with_retry,
)


def brute_force_pairs(x, L, cut):
    """Golden reference: all pairs within cutoff under min image."""
    n = len(x)
    out = [set() for _ in range(n)]
    for i in range(n):
        d = x[i] - x
        d -= np.round(d / L) * L
        rsq = (d * d).sum(axis=1)
        for j in range(n):
            if j != i and rsq[j] <= cut * cut:
                out[i].add(j)
    return out


def _random_system(n, L, seed):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, L, size=(n, 3))
    box = make_box([0, 0, 0], [L, L, L], dtype=jnp.float64)
    return jnp.asarray(x), box


def _check_lists(nl, golden):
    n = len(golden)
    for i in range(n):
        got = set(int(j) for j in np.asarray(nl.idx[i]) if j < n)
        assert got == golden[i], f"atom {i}: {got ^ golden[i]}"


def test_dense_matches_brute_force():
    x, box = _random_system(64, 8.0, 0)
    cut = 2.2
    spec = make_spec(64, [8.0] * 3, cut, dense=True)
    nl = build(np.asarray(x), box, spec)
    golden = brute_force_pairs(np.asarray(x), 8.0, cut)
    _check_lists(nl, golden)
    np.testing.assert_array_equal(
        np.asarray(nl.nnei), [len(g) for g in golden]
    )


def test_cell_matches_brute_force():
    x, box = _random_system(400, 12.0, 1)
    cut = 2.5
    spec = make_spec(400, [12.0] * 3, cut, dense=False)
    assert not spec.dense
    nl = build(x, box, spec)
    assert not bool(nl.overflow)
    golden = brute_force_pairs(np.asarray(x), 12.0, cut)
    _check_lists(nl, golden)


def test_cell_matches_dense_fcc():
    # fcc lattice, like in.buck but small: periodic images matter
    from lammps_buck_intel_tpu.io import lattice

    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 6, 6, 6)
    box = make_box(lo, hi, dtype=jnp.float64)
    x = jnp.asarray(xs)
    cut = 2.8
    spec_d = make_spec(len(xs), hi - lo, cut, dense=True)
    spec_c = make_spec(len(xs), hi - lo, cut, dense=False)
    assert not spec_c.dense  # 6 cells * 1.68 / 2.8 = 3.6 -> 3 cells/axis
    nl_d = build(x, box, spec_d)
    nl_c = build(x, box, spec_c)
    np.testing.assert_array_equal(np.asarray(nl_c.nnei), np.asarray(nl_d.nnei))
    n = len(xs)
    for i in range(0, n, 37):
        sd = set(int(j) for j in np.asarray(nl_d.idx[i]) if j < n)
        sc = set(int(j) for j in np.asarray(nl_c.idx[i]) if j < n)
        assert sd == sc


def test_overflow_flag_and_retry():
    x, box = _random_system(200, 6.0, 2)
    spec = make_spec(200, [6.0] * 3, 2.9, dense=True, kmax=8)
    nl = build(x, box, spec)
    assert bool(nl.overflow)
    nl2, spec2 = build_with_retry(x, box, spec)
    assert not bool(nl2.overflow)
    assert spec2.kmax > spec.kmax


def test_special_codes():
    # 3 atoms bonded in a chain 0-1-2, all within cutoff
    x = jnp.asarray([[1.0, 1, 1], [2.0, 1, 1], [3.0, 1, 1]])
    box = make_box([0, 0, 0], [10, 10, 10], dtype=jnp.float64)
    topo = build_topology(3, bonds=[[0, 0, 1], [0, 1, 2]])
    spec = make_spec(3, [10] * 3, 3.0, dense=True)
    nl = build(x, box, spec, jnp.asarray(topo.special_idx),
               jnp.asarray(topo.special_code))
    idx0 = np.asarray(nl.idx[0])
    sb0 = np.asarray(nl.sb[0])
    m = {int(j): int(c) for j, c in zip(idx0, sb0) if j < 3}
    assert m == {1: 1, 2: 2}  # 0-1 bonded (1-2 code 1), 0-2 is 1-3 (code 2)


def test_needs_rebuild():
    x, box = _random_system(50, 10.0, 3)
    spec = make_spec(50, [10.0] * 3, 3.0, dense=True)
    nl = build(x, box, spec)
    skin = 0.6
    assert not bool(needs_rebuild(x, box, nl, (skin / 2) ** 2))
    x2 = x.at[7].add(jnp.asarray([0.4, 0.0, 0.0]))
    assert bool(needs_rebuild(x2, box, nl, (skin / 2) ** 2))
