import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box
from lammps_buck_intel_tpu.models.kspace import setup_ewald
from lammps_buck_intel_tpu.models.kspace.pppm import (
    setup_pppm, bspline_weights, mspline, deposit_rho,
)

import golden


def test_bspline_partition_of_unity():
    for order in (3, 4, 5, 7):
        u = jnp.asarray(np.random.RandomState(0).uniform(0, 50, 500))
        base, w = bspline_weights(u, order)
        np.testing.assert_allclose(np.asarray(w).sum(axis=1), 1.0,
                                   atol=1e-12)
        assert np.asarray(w).min() >= -1e-14


def test_bspline_matches_scipy():
    from scipy.interpolate import BSpline

    p = 5
    x = np.linspace(0.01, p - 0.01, 200)
    b = BSpline.basis_element(np.arange(p + 1), extrapolate=False)
    ours = np.asarray(mspline(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, b(x), atol=1e-12)


def test_deposition_conserves_charge():
    rng = np.random.RandomState(1)
    n, L = 50, 10.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    box = make_box([0, 0, 0], [L] * 3)
    pm = setup_pppm(box, q, cutoff=3.0, accuracy_rel=1e-4, qqrd2e=1.0,
                    acc_dtype=jnp.float64)
    mesh = deposit_rho(pm, jnp.asarray(x), jnp.asarray(q))
    np.testing.assert_allclose(float(mesh.sum()), q.sum(), atol=1e-12)


@pytest.mark.parametrize("order", [3, 5, 7])
def test_pppm_energy_forces_vs_ewald(order):
    rng = np.random.RandomState(2)
    n, L = 40, 8.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    g = 1.0
    pm = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-6, qqrd2e=1.0,
                    g_ewald=g, order=order, grid=(32, 32, 32),
                    acc_dtype=jnp.float64)
    res = pm.compute(jnp.asarray(x), jnp.asarray(q))
    _, e_recip, e_self, _, F_recip = golden.ewald_sum(
        x, q, [L] * 3, g, kmax=14,
    )
    scale = np.abs(F_recip).max()
    np.testing.assert_allclose(float(res.elong), e_recip + e_self,
                               rtol=5e-4 if order >= 5 else 5e-3)
    np.testing.assert_allclose(
        np.asarray(res.f) / scale, F_recip / scale,
        atol=2e-3 if order >= 5 else 2e-2,
    )


def test_pppm_matches_ewald_module():
    """PPPM and the Ewald solver should agree on the same system."""
    rng = np.random.RandomState(3)
    n, L = 30, 7.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    g = 1.1
    qq = 332.06371
    pm = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-6, qqrd2e=qq,
                    g_ewald=g, grid=(36, 36, 36), acc_dtype=jnp.float64)
    ew = setup_ewald(box, q, cutoff=2.5, accuracy_rel=1e-8, qqrd2e=qq,
                     g_ewald=g, acc_dtype=jnp.float64)
    rp = pm.compute(jnp.asarray(x), jnp.asarray(q))
    re = ew.compute(jnp.asarray(x), jnp.asarray(q))
    np.testing.assert_allclose(float(rp.elong), float(re.elong), rtol=2e-4)
    scale = np.abs(np.asarray(re.f)).max()
    np.testing.assert_allclose(np.asarray(rp.f) / scale,
                               np.asarray(re.f) / scale, atol=1e-3)
    # virial diagonal should also track
    np.testing.assert_allclose(np.asarray(rp.virial)[:3],
                               np.asarray(re.virial)[:3], rtol=5e-3,
                               atol=1e-3)


def test_pppm_forces_sum_zero():
    rng = np.random.RandomState(4)
    n, L = 25, 6.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    pm = setup_pppm(box, q, cutoff=2.2, accuracy_rel=1e-5, qqrd2e=1.0,
                    acc_dtype=jnp.float64)
    res = pm.compute(jnp.asarray(x), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(res.f).sum(axis=0), 0.0,
                               atol=1e-10)


def test_pppm_grid_selection_accuracy_scaling():
    """Tighter accuracy must never shrink the grid."""
    rng = np.random.RandomState(5)
    n, L = 100, 12.0
    q = rng.uniform(-1, 1, n)
    box = make_box([0, 0, 0], [L] * 3)
    g1 = setup_pppm(box, q, cutoff=3.5, accuracy_rel=1e-3, qqrd2e=1.0).grid
    g2 = setup_pppm(box, q, cutoff=3.5, accuracy_rel=1e-5, qqrd2e=1.0).grid
    assert all(b >= a for a, b in zip(g1, g2))
