import numpy as np
import jax.numpy as jnp

import lammps_buck_intel_tpu as lbi
from lammps_buck_intel_tpu.core import (
    get_units, make_box, minimum_image, wrap, unwrap, make_system,
    build_topology,
)


def test_units_lj():
    u = get_units("lj")
    assert u.boltz == 1.0 and u.qqrd2e == 1.0 and u.dt == 0.005


def test_units_real_metal():
    real = get_units("real")
    metal = get_units("metal")
    # qqr2e: Coulomb constant in kcal/mol*A/e^2 and eV*A/e^2
    assert abs(real.qqr2e - 332.06371) < 1e-5
    assert abs(metal.qqr2e - 14.399645) < 1e-6
    # mvv2e * ftm2v == 1 by construction in real units
    assert abs(real.mvv2e * real.ftm2v - 1.0) < 1e-12
    assert abs(metal.mvv2e * metal.ftm2v - 1.0) < 1e-10


def test_minimum_image():
    box = make_box([0, 0, 0], [10, 10, 10], dtype=jnp.float64)
    d = jnp.array([[9.0, -9.0, 4.9]])
    md = minimum_image(d, box)
    np.testing.assert_allclose(np.asarray(md), [[-1.0, 1.0, 4.9]], atol=1e-12)


def test_wrap_unwrap_roundtrip():
    box = make_box([0, 0, 0], [5, 6, 7], dtype=jnp.float64)
    x = jnp.array([[12.3, -0.5, 6.9], [4.9, 5.9, 0.1]])
    img = jnp.zeros((2, 3), jnp.int32)
    xw, img2 = wrap(x, img, box)
    assert np.all(np.asarray(xw) >= 0.0 - 1e-12)
    assert np.all(np.asarray(xw) < np.array([5, 6, 7]) + 1e-12)
    xu = unwrap(xw, img2, box)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-12)


def test_topology_special_water():
    # one SPC/E molecule: O(0)-H(1), O(0)-H(2) bonds
    bonds = [[0, 0, 1], [0, 0, 2]]
    topo = build_topology(3, bonds=bonds)
    # O: two 1-2 partners; H: one 1-2 (O) + one 1-3 (other H)
    row_o = {(int(j), int(c)) for j, c in
             zip(topo.special_idx[0], topo.special_code[0]) if j >= 0}
    assert row_o == {(1, 1), (2, 1)}
    row_h1 = {(int(j), int(c)) for j, c in
              zip(topo.special_idx[1], topo.special_code[1]) if j >= 0}
    assert row_h1 == {(0, 1), (2, 2)}


def test_topology_chain_14():
    # linear chain 0-1-2-3: 0 and 3 are 1-4 partners
    bonds = [[0, 0, 1], [0, 1, 2], [0, 2, 3]]
    topo = build_topology(4, bonds=bonds)
    row0 = {(int(j), int(c)) for j, c in
            zip(topo.special_idx[0], topo.special_code[0]) if j >= 0}
    assert row0 == {(1, 1), (2, 2), (3, 3)}


def test_make_system():
    box = make_box([0, 0, 0], [4, 4, 4])
    s = make_system(np.random.rand(10, 3) * 4, box)
    assert s.n_atoms == 10
    assert s.v.shape == (10, 3)
