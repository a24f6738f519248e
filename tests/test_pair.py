import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box, build_topology
from lammps_buck_intel_tpu.neighbor import make_spec, build
from lammps_buck_intel_tpu.models.pair import (
    build_buck, build_lj, compute_pair, pair_energy_fn,
)
from lammps_buck_intel_tpu.models.pair.styles import erfc_approx

import golden


def _system(n, L, seed, ntypes=1, charged=False, min_sep=0.8):
    rng = np.random.RandomState(seed)
    # rejection-sample a loose random config (no catastrophic overlaps)
    x = []
    while len(x) < n:
        p = rng.uniform(0, L, 3)
        ok = True
        for xx in x[-60:]:
            d = golden.min_image(p - xx, np.array([L] * 3))
            if d @ d < min_sep**2:
                ok = False
                break
        if ok:
            x.append(p)
    x = np.asarray(x)
    typ = rng.randint(0, ntypes, n)
    q = np.zeros(n)
    if charged:
        q = rng.uniform(-1, 1, n)
        q -= q.mean()
    return x, typ, q


BUCK_COEFFS = {
    (0, 0): (1388.77, 0.3623188, 175.0),
    (0, 1): (18003.0, 0.2052124, 133.5381),
    (1, 1): (100.0, 0.3, 30.0),
}


def _buck_style(coul, cut_lj, cut_coul=None, g_ewald=0.0, qqrd2e=1.0,
                disp="cut", g6=0.0):
    st = build_buck(
        2, {k: v for k, v in BUCK_COEFFS.items()},
        cut_global=cut_lj, coul=coul, cut_coul=cut_coul, qqrd2e=qqrd2e,
        disp=disp, dtype=jnp.float64,
    )
    return st.replace(g_ewald=g_ewald, g_ewald_6=g6)


def _eval(style, x, typ, q, L, kmax=None):
    box = make_box([0, 0, 0], [L] * 3, dtype=jnp.float64)
    spec = make_spec(len(x), [L] * 3, np.sqrt(style.cutsq_max) + 0.3,
                     dense=True, kmax=kmax)
    nl = build(jnp.asarray(x), box, spec)
    assert not bool(nl.overflow)
    return compute_pair(
        style, jnp.asarray(x), jnp.asarray(typ), jnp.asarray(q), box, nl,
        acc_dtype=jnp.float64,
    ), nl, box


def test_erfc_accuracy():
    from scipy.special import erfc as sp_erfc
    x = jnp.linspace(0.01, 6.0, 2000, dtype=jnp.float64)
    approx = erfc_approx(x, jnp.exp(-x * x), jnp.float64)
    err = np.abs(np.asarray(approx) - sp_erfc(np.asarray(x)))
    assert err.max() < 1.5e-7  # A&S 7.1.26 bound


def test_buck_vs_golden():
    x, typ, q = _system(60, 8.0, 0, ntypes=2)
    style = _buck_style("none", cut_lj=3.5)
    res, _, _ = _eval(style, x, typ, q, 8.0)
    ev, ec, F, vir = golden.pair_buck_coul(
        x, typ, q, [8.0] * 3, BUCK_COEFFS, cut_lj=3.5
    )
    np.testing.assert_allclose(float(res.evdwl), ev, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.f), F, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.virial), vir, rtol=1e-9,
                               atol=1e-9)


def test_buck_coul_cut_vs_golden():
    x, typ, q = _system(60, 8.0, 1, ntypes=2, charged=True)
    style = _buck_style("cut", cut_lj=3.0, cut_coul=3.8, qqrd2e=14.399645)
    res, _, _ = _eval(style, x, typ, q, 8.0)
    ev, ec, F, vir = golden.pair_buck_coul(
        x, typ, q, [8.0] * 3, BUCK_COEFFS, cut_lj=3.0, cut_coul=3.8,
        coul="cut", qqrd2e=14.399645,
    )
    np.testing.assert_allclose(float(res.evdwl), ev, rtol=1e-12)
    np.testing.assert_allclose(float(res.ecoul), ec, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.f), F, rtol=1e-9, atol=1e-9)


def test_buck_coul_long_vs_golden():
    x, typ, q = _system(50, 8.0, 2, ntypes=2, charged=True)
    g = 0.9
    style = _buck_style("long", cut_lj=3.0, cut_coul=3.8, g_ewald=g,
                        qqrd2e=332.06371)
    res, _, _ = _eval(style, x, typ, q, 8.0)
    ev, ec, F, vir = golden.pair_buck_coul(
        x, typ, q, [8.0] * 3, BUCK_COEFFS, cut_lj=3.0, cut_coul=3.8,
        coul="long", g_ewald=g, qqrd2e=332.06371,
    )
    np.testing.assert_allclose(float(res.evdwl), ev, rtol=1e-12)
    # erfc is the A&S polynomial (|eps| <= 1.5e-7 abs on erfc)
    np.testing.assert_allclose(float(res.ecoul), ec, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(res.f), F, rtol=2e-5, atol=2e-5)


def test_lj_long_disp_vs_golden():
    x, typ, q = _system(40, 9.0, 3, ntypes=2)
    lj_c = {(0, 0): (0.1744742, 3.97), (1, 1): (0.1147228, 3.97)}
    g6 = 0.28
    style = build_lj(
        2, {0: (0.1744742, 3.97), 1: (0.1147228, 3.97)},
        cut_global=4.2, coul="none", disp="long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    res, _, _ = _eval(style, x, typ, q, 9.0)
    # geometric mixing for the golden cross coefficient
    lj_c[(0, 1)] = lj_c[(1, 0)] = (
        np.sqrt(lj_c[(0, 0)][0] * lj_c[(1, 1)][0]),
        np.sqrt(lj_c[(0, 0)][1] * lj_c[(1, 1)][1]),
    )
    ev, ec, F, vir = golden.pair_buck_coul(
        x, typ, q, [9.0] * 3, None, cut_lj=4.2, vdw="lj", lj_coeffs=lj_c,
        disp="long", g_ewald_6=g6,
    )
    np.testing.assert_allclose(float(res.evdwl), ev, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res.f), F, rtol=1e-8, atol=1e-9)


def test_buck_long_disp_vs_golden():
    x, typ, q = _system(40, 9.0, 4, ntypes=2)
    g6 = 0.25
    style = _buck_style("none", cut_lj=4.0, disp="long", g6=g6)
    res, _, _ = _eval(style, x, typ, q, 9.0)
    ev, ec, F, vir = golden.pair_buck_coul(
        x, typ, q, [9.0] * 3, BUCK_COEFFS, cut_lj=4.0, disp="long",
        g_ewald_6=g6,
    )
    np.testing.assert_allclose(float(res.evdwl), ev, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res.f), F, rtol=1e-8, atol=1e-9)


def test_special_bonds_subtractive_coul():
    # chain 0-1-2 with charges; coul/long must subtract (1-factor)*prefactor
    x = np.array([[2.0, 2, 2], [3.1, 2, 2], [4.1, 2.8, 2]])
    typ = np.zeros(3, int)
    q = np.array([0.4, -0.8, 0.4])
    sp_lj = (1.0, 0.0, 0.0, 0.5)
    sp_coul = (1.0, 0.0, 0.5, 0.5)
    topo = build_topology(3, bonds=[[0, 0, 1], [0, 1, 2]])
    style = build_buck(
        1, {(0, 0): (1000.0, 0.3, 10.0)}, cut_global=3.5, coul="long",
        special_lj=sp_lj, special_coul=sp_coul, qqrd2e=332.06371,
        dtype=jnp.float64,
    ).replace(g_ewald=0.8)
    box = make_box([0, 0, 0], [10] * 3, dtype=jnp.float64)
    spec = make_spec(3, [10] * 3, 4.0, dense=True)
    nl = build(jnp.asarray(x), box, spec, jnp.asarray(topo.special_idx),
               jnp.asarray(topo.special_code))
    res = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                       jnp.asarray(q), box, nl, acc_dtype=jnp.float64)
    sb_map = {(0, 1): 1, (1, 2): 1, (0, 2): 2}
    ev, ec, F, vir = golden.pair_buck_coul(
        x, typ, q, [10.0] * 3, {(0, 0): (1000.0, 0.3, 10.0)}, cut_lj=3.5,
        cut_coul=3.5, coul="long", g_ewald=0.8, qqrd2e=332.06371,
        special_lj=sp_lj, special_coul=sp_coul, sb_map=sb_map,
    )
    np.testing.assert_allclose(float(res.evdwl), ev, rtol=1e-10)
    np.testing.assert_allclose(float(res.ecoul), ec, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(res.f), F, rtol=1e-5, atol=1e-7)


def test_forces_are_gradient():
    # F == -dE/dx through the whole gather/mask pipeline
    x, typ, q = _system(40, 7.0, 5, ntypes=2, charged=True)
    style = _buck_style("cut", cut_lj=2.9, cut_coul=3.2, qqrd2e=1.0)
    res, nl, box = _eval(style, x, typ, q, 7.0)
    efn = pair_energy_fn(style, jnp.asarray(typ), jnp.asarray(q), box, nl,
                         acc_dtype=jnp.float64)
    g = jax.grad(efn)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(res.f), -np.asarray(g), rtol=1e-9,
                               atol=1e-10)


def test_peratom_sums_to_totals():
    """eatom/vatom (the eflag_atom/vflag_atom contract) sum to the global
    energy and virial."""
    from lammps_buck_intel_tpu.models.pair import compute_pair_peratom

    x, typ, q = _system(60, 8.0, 7, ntypes=2, charged=True)
    style = _buck_style("cut", cut_lj=3.0, cut_coul=3.8, qqrd2e=14.399645)
    res, nl, box = _eval(style, x, typ, q, 8.0)
    eatom, vatom = compute_pair_peratom(
        style, jnp.asarray(x), jnp.asarray(typ), jnp.asarray(q), box, nl,
        acc_dtype=jnp.float64)
    np.testing.assert_allclose(float(eatom.sum()),
                               float(res.evdwl + res.ecoul), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vatom).sum(axis=0),
                               np.asarray(res.virial), rtol=1e-10)
