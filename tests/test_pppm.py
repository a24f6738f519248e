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


# ---------- ad (analytic differentiation) path ----------

def _ad_setup(seed=7, n=36, L=8.0, order=5, grid=(32, 32, 32)):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    pm_ik = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-6, qqrd2e=1.0,
                       g_ewald=1.0, order=order, grid=grid,
                       acc_dtype=jnp.float64)
    pm_ad = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-6, qqrd2e=1.0,
                       g_ewald=1.0, order=order, grid=grid,
                       acc_dtype=jnp.float64, diff="ad")
    return x, q, pm_ik, pm_ad


def test_pppm_ad_raw_force_is_exact_energy_gradient():
    """Before the self-force correction, the ad force must equal
    -dE_discrete/dx of the deposited spectral energy EXACTLY (autodiff):
    the waiver in the ik tests does not apply to ad."""
    import dataclasses

    from lammps_buck_intel_tpu.models.kspace.pppm import deposit_rho

    x, q, _, pm_ad = _ad_setup()
    pm_raw = dataclasses.replace(
        pm_ad, sf_sine=np.zeros_like(pm_ad.sf_sine))
    f_raw = np.asarray(pm_raw.compute(jnp.asarray(x), jnp.asarray(q)).f)

    def energy(xx):
        mesh = deposit_rho(pm_raw, xx, jnp.asarray(q))
        rhat = jnp.fft.fftn(mesh.astype(jnp.complex128))
        ek = jnp.asarray(pm_raw.greensfn) * jnp.real(
            rhat * jnp.conj(rhat))
        return (0.5 / pm_raw.volume) * jnp.sum(ek)

    g = np.asarray(jax.grad(energy)(jnp.asarray(x)))
    fscale = np.abs(f_raw).max()
    np.testing.assert_allclose(f_raw, -g, rtol=0, atol=1e-9 * fscale)


def test_pppm_ad_matches_ik():
    x, q, pm_ik, pm_ad = _ad_setup()
    f_ik = np.asarray(pm_ik.compute(jnp.asarray(x), jnp.asarray(q)).f)
    r_ad = pm_ad.compute(jnp.asarray(x), jnp.asarray(q))
    f_ad = np.asarray(r_ad.f)
    scale = np.abs(f_ik).max()
    err = np.abs(f_ad - f_ik).max() / scale
    # energies identical (same spectral solve)
    e_ik = float(pm_ik.compute(jnp.asarray(x), jnp.asarray(q)).elong)
    np.testing.assert_allclose(float(r_ad.elong), e_ik, rtol=1e-12)
    # ad within the two schemes' shared discretization accuracy
    assert err < 2e-3, err


def test_pppm_ad_self_force_correction():
    """The measured sine-series sf (the sf_coeff analog) must cancel the
    spurious single-charge self-force by orders of magnitude."""
    import dataclasses

    L = 8.0
    box = make_box([0, 0, 0], [L] * 3)
    q1 = np.array([1.0])
    pm = setup_pppm(box, q1, cutoff=2.5, accuracy_rel=1e-6, qqrd2e=1.0,
                    g_ewald=1.0, order=5, grid=(32, 32, 32),
                    acc_dtype=jnp.float64, diff="ad")
    pm_raw = dataclasses.replace(pm, sf_sine=np.zeros_like(pm.sf_sine))
    h = np.asarray(pm.h)
    raws, cors = [], []
    for s in (0.137, 0.3, 0.444, 0.71, 0.9):
        x = np.array([[1.0 + s * h[0], 2.0 + 0.37 * h[1],
                       3.0 + 0.81 * h[2]]])
        raws.append(np.abs(np.asarray(
            pm_raw.compute(jnp.asarray(x), jnp.asarray(q1)).f)).max())
        cors.append(np.abs(np.asarray(
            pm.compute(jnp.asarray(x), jnp.asarray(q1)).f)).max())
    assert max(cors) < max(raws) / 50.0, (max(cors), max(raws))


def test_pppm_ad_vs_golden_ewald():
    x, q, _, pm_ad = _ad_setup(grid=(40, 40, 40), order=7)
    f_ad = np.asarray(pm_ad.compute(jnp.asarray(x), jnp.asarray(q)).f)
    _, _, _, _, ref_f = golden.ewald_sum(x, q, np.asarray([8.0] * 3),
                                         g_ewald=1.0, kmax=16)
    scale = np.abs(ref_f).max()
    np.testing.assert_allclose(f_ad, ref_f, rtol=0, atol=2e-4 * scale)


def test_pppm_slab_correction_vs_xy_periodic_direct():
    """kspace_modify slab analog (EW3DC): total electrostatics of a thin
    charge slab (real erfc pairs + z-extended PPPM + Yeh-Berkowitz
    dipole term) must match a direct sum that is periodic in x,y ONLY."""
    from lammps_buck_intel_tpu.models.kspace.pppm import slab_correction

    L = 8.0
    Lz = 12.0  # real box holds the vacuum gap; atoms live in z [3, 5]
    rng = np.random.RandomState(4)
    # four +/- dipole pairs with alternating orientation: the unit cell
    # carries NO net dipole, so the xy-image golden converges ~K^-3
    base = np.column_stack([
        rng.uniform(0, L, 4), rng.uniform(0, L, 4),
        rng.uniform(3.2, 4.0, 4),
    ])
    d = np.array([0.9, 0.7, 0.5])
    x = []
    q = []
    for p_i, pos in enumerate(base):
        s = 1.0 if p_i < 2 else -1.0
        x += [pos, pos + s * d]
        q += [s, -s]
    x = np.asarray(x)
    q = np.asarray(q)
    n = len(x)
    box = make_box([0, 0, 0], [L, L, Lz])
    pm = setup_pppm(box, q, cutoff=3.0, accuracy_rel=1e-6, qqrd2e=1.0,
                    order=7, acc_dtype=jnp.float64, slab=3.0)
    assert abs(pm.h[2] * pm.grid[2] - 3.0 * Lz) < 1e-9  # extended z
    kr = pm.compute(jnp.asarray(x), jnp.asarray(q))

    # real-space part: erfc-screened pairs, xy minimum image (no z wrap
    # matters: the gap exceeds any real-space range here)
    from scipy.special import erfc as sp_erfc

    g = pm.g_ewald
    e_real = 0.0
    f_real = np.zeros((n, 3))
    # generous real-space range: sum xy images explicitly
    for i in range(n):
        for j in range(n):
            for mx in (-1, 0, 1):
                for my in (-1, 0, 1):
                    if i == j and mx == 0 and my == 0:
                        continue
                    d = x[i] - x[j] + np.array([mx * L, my * L, 0.0])
                    r = np.linalg.norm(d)
                    pre = q[i] * q[j] / r
                    e_real += 0.5 * pre * sp_erfc(g * r)
                    fc = pre * (sp_erfc(g * r) + 2 / np.sqrt(np.pi)
                                * g * r * np.exp(-(g * r) ** 2))
                    f_real[i] += fc / r**2 * d

    # golden: bare Coulomb, periodic in x,y only
    K = 40
    e_dir = 0.0
    f_dir = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            for mx in range(-K, K + 1):
                for my in range(-K, K + 1):
                    if i == j and mx == 0 and my == 0:
                        continue
                    d = x[i] - x[j] + np.array([mx * L, my * L, 0.0])
                    r = np.linalg.norm(d)
                    e_dir += 0.5 * q[i] * q[j] / r
                    f_dir[i] += q[i] * q[j] / r**3 * d

    e_total = e_real + float(kr.elong)
    f_total = f_real + np.asarray(kr.f)
    np.testing.assert_allclose(e_total, e_dir, rtol=5e-4)
    scale = np.abs(f_dir).max()
    np.testing.assert_allclose(f_total / scale, f_dir / scale, atol=1e-3)

    # and WITHOUT the slab machinery the same comparison must fail badly
    pm3d = setup_pppm(box, q, cutoff=3.0, accuracy_rel=1e-6, qqrd2e=1.0,
                      order=7, acc_dtype=jnp.float64)
    kr3d = pm3d.compute(jnp.asarray(x), jnp.asarray(q))
    assert abs(e_real + float(kr3d.elong) - e_dir) > \
        50 * abs(e_total - e_dir)
