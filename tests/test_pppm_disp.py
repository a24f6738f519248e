"""Dispersion-PPPM validation against an absolutely convergent direct
lattice sum of -C6/r^6 (geometric mixing)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box
from lammps_buck_intel_tpu.models.pair import build_lj, compute_pair
from lammps_buck_intel_tpu.models.kspace.pppm_disp import (
    setup_pppm_disp, solve_g6, dispersion_kernel,
)
from lammps_buck_intel_tpu.neighbor import make_spec, build

import golden


def _disp_system(seed=0, n=24, L=7.0):
    rng = np.random.RandomState(seed)
    x = []
    while len(x) < n:
        p = rng.uniform(0, L, 3)
        if all(np.sum(golden.min_image(p - xx, np.array([L] * 3)) ** 2) > 1.2
               for xx in x):
            x.append(p)
    x = np.asarray(x)
    typ = rng.randint(0, 2, n).astype(np.int32)
    return x, typ, L


def test_kernel_limits():
    kern = dispersion_kernel(0.8)
    import math
    w0 = kern(np.array([0.0]))[0]
    np.testing.assert_allclose(w0, -math.pi**1.5 * 0.8**3 / 3.0, rtol=1e-12)
    # decays for large k
    assert abs(kern(np.array([400.0]))[0]) < abs(w0) * 1e-4


def test_disp_total_vs_direct_sum():
    """pair(real, damped) + pppm/disp(recip + self + k0) == direct sum."""
    x, typ, L = _disp_system()
    n = len(x)
    box = make_box([0, 0, 0], [L] * 3)
    # LJ with sigma such that C6 = 4 eps sig^6; geometric mixing
    eps = np.array([0.30, 0.18])
    sig = np.array([1.10, 1.25])
    cut = 3.2
    g6 = solve_g6(cut, 1e-5)
    style = build_lj(
        2, {0: (eps[0], sig[0]), 1: (eps[1], sig[1])},
        cut_global=cut, disp="long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    # kill the r^-12 repulsion so ONLY dispersion physics remains:
    t = np.array(style.tables)
    t[..., 0] = 0.0  # lj1 (force r^-12)
    t[..., 2] = 0.0  # lj3 (energy r^-12)
    style = style.replace(tables=t)

    B = np.sqrt(4.0 * eps) * sig**3
    pm = setup_pppm_disp(box, B, typ, cutoff=cut, tol_real=1e-5,
                         g_ewald_6=g6, grid=(32, 32, 32),
                         acc_dtype=jnp.float64)
    spec = make_spec(n, [L] * 3, cut + 0.3, dense=True)
    nl = build(jnp.asarray(x), box, spec)
    pr = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                      jnp.zeros(n), box, nl, eflag=True, vflag=False,
                      acc_dtype=jnp.float64)
    b_atom = jnp.asarray(B[typ])
    kr = pm.compute(jnp.asarray(x), b_atom)

    e_direct, f_direct = golden.dispersion_direct(x, B[typ], [L] * 3,
                                                  images=3)
    e_total = float(pr.evdwl) + float(kr.elong)
    np.testing.assert_allclose(e_total, e_direct, rtol=2e-4)
    f_total = np.asarray(pr.f) + np.asarray(kr.f)
    scale = np.abs(f_direct).max()
    np.testing.assert_allclose(f_total / scale, f_direct / scale, atol=2e-3)


def test_disp_forces_sum_zero():
    x, typ, L = _disp_system(seed=3)
    box = make_box([0, 0, 0], [L] * 3)
    B = np.array([0.9, 0.5])
    pm = setup_pppm_disp(box, B, typ, cutoff=2.5, acc_dtype=jnp.float64)
    kr = pm.compute(jnp.asarray(x), jnp.asarray(B[typ]))
    np.testing.assert_allclose(np.asarray(kr.f).sum(axis=0), 0.0, atol=1e-10)


def test_g6_heuristic_monotonic():
    assert solve_g6(9.8, 1e-4) < solve_g6(9.8, 1e-6)
    assert solve_g6(5.0, 1e-4) > solve_g6(10.0, 1e-4)


def test_disp_arithmetic_vs_direct_sum():
    """7-channel arithmetic mixing (function[2] analog) vs direct sum."""
    x, typ, L = _disp_system(seed=5)
    box = make_box([0, 0, 0], [L] * 3)
    eps = np.array([0.30, 0.18])
    sig = np.array([1.10, 1.45])   # distinct enough that LB != geometric
    cut = 3.2
    g6 = solve_g6(cut, 1e-5)
    pm = setup_pppm_disp(box, np.sqrt(4 * eps) * sig**3, typ, cutoff=cut,
                         g_ewald_6=g6, grid=(32, 32, 32),
                         acc_dtype=jnp.float64, mix="arithmetic",
                         epsilon=eps, sigma=sig)
    kr = pm.compute_typed(jnp.asarray(x), np.asarray(typ))

    # real-space damped part with arithmetic-mixed C6
    style = build_lj(
        2, {0: (eps[0], sig[0]), 1: (eps[1], sig[1])},
        cut_global=cut, disp="long", mix="arithmetic", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    t = np.array(style.tables)
    t[..., 0] = 0.0
    t[..., 2] = 0.0
    style = style.replace(tables=t)
    n = len(x)
    spec = make_spec(n, [L] * 3, cut + 0.3, dense=True)
    nl = build(jnp.asarray(x), box, spec)
    pr = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                      jnp.zeros(n), box, nl, eflag=True, vflag=True,
                      acc_dtype=jnp.float64)

    sij = 0.5 * (sig[:, None] + sig[None, :])
    C6 = 4.0 * np.sqrt(eps[:, None] * eps[None, :]) * sij**6
    e_direct, f_direct, v_direct = golden.dispersion_direct_c6(
        x, typ, C6, [L] * 3, images=3)
    e_total = float(pr.evdwl) + float(kr.elong)
    np.testing.assert_allclose(e_total, e_direct, rtol=3e-4)
    f_total = np.asarray(pr.f) + np.asarray(kr.f)
    scale = np.abs(f_direct).max()
    np.testing.assert_allclose(f_total / scale, f_direct / scale,
                               atol=2e-3)


def test_disp_nomix_vs_direct_sum():
    """nsplit eigen-channel pipeline (function[3] analog) with a C6 matrix
    that is NOT low-rank-1 (geometric) — includes a negative eigenvalue."""
    x, typ, L = _disp_system(seed=8)
    box = make_box([0, 0, 0], [L] * 3)
    C6 = np.array([[1.3, 0.25], [0.25, 0.9]])  # far from geometric
    cut = 3.2
    g6 = solve_g6(cut, 1e-5)
    pm = setup_pppm_disp(box, np.sqrt(np.diag(C6)), typ, cutoff=cut,
                         g_ewald_6=g6, grid=(32, 32, 32),
                         acc_dtype=jnp.float64, mix="none", C6=C6)
    assert pm.A.shape[0] >= 2  # really split into multiple channels
    kr = pm.compute_typed(jnp.asarray(x), np.asarray(typ))

    # real-space damped part with EXPLICIT per-pair coeffs matching C6
    coeffs = {}
    for i in range(2):
        for j in range(i, 2):
            sig_ij = 1.0
            eps_ij = C6[i, j] / 4.0
            coeffs[(i, j)] = (eps_ij, sig_ij)
    style = build_lj(2, coeffs, cut_global=cut, disp="long",
                     dtype=jnp.float64).replace(g_ewald_6=g6)
    t = np.array(style.tables)
    t[..., 0] = 0.0
    t[..., 2] = 0.0
    style = style.replace(tables=t)
    n = len(x)
    spec = make_spec(n, [L] * 3, cut + 0.3, dense=True)
    nl = build(jnp.asarray(x), box, spec)
    pr = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                      jnp.zeros(n), box, nl, eflag=True, vflag=False,
                      acc_dtype=jnp.float64)
    e_direct, f_direct, _ = golden.dispersion_direct_c6(
        x, typ, C6, [L] * 3, images=3)
    np.testing.assert_allclose(float(pr.evdwl) + float(kr.elong),
                               e_direct, rtol=3e-4)
    f_total = np.asarray(pr.f) + np.asarray(kr.f)
    scale = np.abs(f_direct).max()
    np.testing.assert_allclose(f_total / scale, f_direct / scale,
                               atol=2e-3)


def test_disp_anisotropic_virial_vs_direct_sum():
    """Full dispersion virial tensor (replaces the r1 isotropic stub):
    damped-real pair virial + kspace virial == direct-sum virial,
    including off-diagonals, in an anisotropy-revealing configuration."""
    x, typ, L = _disp_system(seed=11, n=16)
    # squash the configuration so the tensor is strongly anisotropic
    x = np.asarray(x)
    x[:, 2] *= 0.5
    box = make_box([0, 0, 0], [L] * 3)
    B = np.array([0.9, 0.55])
    cut = 3.2
    g6 = solve_g6(cut, 1e-5)
    pm = setup_pppm_disp(box, B, typ, cutoff=cut, g_ewald_6=g6,
                         grid=(32, 32, 32), acc_dtype=jnp.float64)
    kr = pm.compute(jnp.asarray(x), jnp.asarray(B[typ]))

    eps_sig = {}
    for t_ in range(2):
        eps_sig[t_] = (B[t_] ** 2 / 4.0, 1.0)
    style = build_lj(2, eps_sig, cut_global=cut, disp="long",
                     dtype=jnp.float64).replace(g_ewald_6=g6)
    t = np.array(style.tables)
    t[..., 0] = 0.0
    t[..., 2] = 0.0
    style = style.replace(tables=t)
    n = len(x)
    spec = make_spec(n, [L] * 3, cut + 0.3, dense=True)
    nl = build(jnp.asarray(x), box, spec)
    pr = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                      jnp.zeros(n), box, nl, eflag=True, vflag=True,
                      acc_dtype=jnp.float64)
    C6 = B[:, None] * B[None, :]
    _, _, v_direct = golden.dispersion_direct_c6(x, typ, C6, [L] * 3,
                                                 images=3)
    v_total = np.asarray(pr.virial) + np.asarray(kr.virial)
    scale = np.abs(v_direct).max()
    # off-diagonals must be nontrivial for this to mean anything
    assert np.abs(v_direct[3:]).max() > 1e-3 * scale
    np.testing.assert_allclose(v_total / scale, v_direct / scale,
                               atol=3e-3)


def test_disp_ad_vs_direct_sum():
    """ad differentiation (1 inverse FFT/channel + derivative-spline
    gather + measured self-force) against the direct lattice sum — the
    poisson_2s_ad/fieldforce dispatch of pppm_disp_intel.cpp:193-241."""
    x, typ, L = _disp_system()
    n = len(x)
    box = make_box([0, 0, 0], [L] * 3)
    eps = np.array([0.30, 0.18])
    sig = np.array([1.10, 1.25])
    cut = 3.2
    g6 = solve_g6(cut, 1e-5)
    style = build_lj(
        2, {0: (eps[0], sig[0]), 1: (eps[1], sig[1])},
        cut_global=cut, disp="long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    t = np.array(style.tables)
    t[..., 0] = 0.0
    t[..., 2] = 0.0
    style = style.replace(tables=t)

    B = np.sqrt(4.0 * eps) * sig**3
    pm = setup_pppm_disp(box, B, typ, cutoff=cut, tol_real=1e-5,
                         g_ewald_6=g6, grid=(32, 32, 32),
                         acc_dtype=jnp.float64, diff="ad")
    assert pm.diff == "ad" and pm.sf_sine is not None
    spec = make_spec(n, [L] * 3, cut + 0.3, dense=True)
    nl = build(jnp.asarray(x), box, spec)
    pr = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                      jnp.zeros(n), box, nl, eflag=True, vflag=False,
                      acc_dtype=jnp.float64)
    kr = pm.compute(jnp.asarray(x), jnp.asarray(B[typ]))

    e_direct, f_direct = golden.dispersion_direct(x, B[typ], [L] * 3,
                                                  images=3)
    np.testing.assert_allclose(float(pr.evdwl) + float(kr.elong),
                               e_direct, rtol=2e-4)
    f_total = np.asarray(pr.f) + np.asarray(kr.f)
    scale = np.abs(f_direct).max()
    np.testing.assert_allclose(f_total / scale, f_direct / scale,
                               atol=4e-3)
    # net force ~solver accuracy (ad interpolation is not exactly
    # momentum-conserving; the sf series removes the per-atom self term,
    # not the cross-interpolation residual — same as host LAMMPS ad)
    np.testing.assert_allclose(np.asarray(kr.f).sum(0) / scale, 0.0,
                               atol=1e-4)


def test_disp_ad_matches_ik_arithmetic():
    """ad == ik on the 7-channel arithmetic pipeline (solver-accuracy
    agreement; both interpolate the same spectral field)."""
    x, typ, L = _disp_system(seed=5)
    box = make_box([0, 0, 0], [L] * 3)
    eps = np.array([0.30, 0.18])
    sig = np.array([1.10, 1.25])
    cut = 3.0
    g6 = solve_g6(cut, 1e-5)
    kw = dict(cutoff=cut, tol_real=1e-5, g_ewald_6=g6, grid=(32, 32, 32),
              acc_dtype=jnp.float64, mix="arithmetic", epsilon=eps,
              sigma=sig)
    B = np.sqrt(4.0 * eps) * sig**3
    pm_ik = setup_pppm_disp(box, B, typ, **kw)
    pm_ad = setup_pppm_disp(box, B, typ, diff="ad", **kw)
    r_ik = pm_ik.compute_typed(jnp.asarray(x), jnp.asarray(typ))
    r_ad = pm_ad.compute_typed(jnp.asarray(x), jnp.asarray(typ))
    np.testing.assert_allclose(float(r_ad.elong), float(r_ik.elong),
                               rtol=1e-10)  # identical energy path
    scale = np.abs(np.asarray(r_ik.f)).max()
    np.testing.assert_allclose(np.asarray(r_ad.f) / scale,
                               np.asarray(r_ik.f) / scale, atol=5e-3)


@pytest.mark.parametrize("mix", ["geometric", "arithmetic"])
def test_disp_peratom_pins_to_global(mix):
    """Per-atom dispersion e/v (pppm_disp_intel.cpp:512-537): sums pin
    EXACTLY to the global elong/virial."""
    x, typ, L = _disp_system(seed=8)
    box = make_box([0, 0, 0], [L] * 3)
    eps = np.array([0.30, 0.18])
    sig = np.array([1.10, 1.25])
    B = np.sqrt(4.0 * eps) * sig**3
    kw = dict(cutoff=3.0, tol_real=1e-5, grid=(24, 24, 24),
              acc_dtype=jnp.float64)
    if mix == "arithmetic":
        kw.update(mix="arithmetic", epsilon=eps, sigma=sig)
    pm = setup_pppm_disp(box, B, typ, **kw)
    xj = jnp.asarray(x)
    if mix == "geometric":
        kr = pm.compute(xj, jnp.asarray(B[typ]))
        ea, va = pm.compute_peratom(xj, b_per_atom=jnp.asarray(B[typ]))
    else:
        kr = pm.compute_typed(xj, jnp.asarray(typ))
        ea, va = pm.compute_peratom(xj, typ=jnp.asarray(typ))
    np.testing.assert_allclose(float(jnp.sum(ea)), float(kr.elong),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.sum(va, axis=0)),
                               np.asarray(kr.virial), rtol=1e-9,
                               atol=1e-11)
