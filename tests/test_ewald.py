import math

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box
from lammps_buck_intel_tpu.models.kspace import setup_ewald

import golden


def _nacl_cube():
    """2x2x2 rock-salt cube, unit charges, spacing 1 -> Madelung constant."""
    n = 4
    xs, qs = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                xs.append([i, j, k])
                qs.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    return np.asarray(xs, float) + 0.5, np.asarray(qs), float(n)


def test_ewald_vs_brute_force_random():
    rng = np.random.RandomState(0)
    n = 20
    L = 6.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    ew = setup_ewald(box, q, cutoff=2.8, accuracy_rel=1e-8, qqrd2e=1.0,
                     g_ewald=1.2, acc_dtype=jnp.float64)
    res = ew.compute(jnp.asarray(x), jnp.asarray(q))
    e_real, e_recip, e_self, F_real, F_recip = golden.ewald_sum(
        x, q, [L] * 3, 1.2, kmax=12,
    )
    np.testing.assert_allclose(float(res.elong), e_recip + e_self, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.f), F_recip, rtol=1e-4,
                               atol=1e-8)


def test_ewald_madelung():
    """Total Coulomb energy/ion of rock salt = -Madelung/a (a=1 here)."""
    x, q, L = _nacl_cube()
    box = make_box([0, 0, 0], [L] * 3)
    g = 2.2  # erfc(g*rc) ~ 3e-9: real-space truncation below test rtol
    ew = setup_ewald(box, q, cutoff=1.9, accuracy_rel=1e-10, qqrd2e=1.0,
                     g_ewald=g, acc_dtype=jnp.float64)
    res = ew.compute(jnp.asarray(x), jnp.asarray(q))
    # real-space part with erfc, min image (cut < L/2)
    e_real = 0.0
    from scipy.special import erfc

    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            d = golden.min_image(x[i] - x[j], np.array([L] * 3))
            r = np.linalg.norm(d)
            if r < 1.9:
                e_real += q[i] * q[j] / r * erfc(g * r)
    e_total = e_real + float(res.elong)
    # E_total = -(n/2) * M / d  (Madelung energy is per ion PAIR), d = 1
    madelung = -2.0 * e_total / n
    np.testing.assert_allclose(madelung, 1.7475645946, rtol=1e-5)


def test_ewald_forces_sum_zero():
    rng = np.random.RandomState(3)
    n = 16
    L = 5.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    ew = setup_ewald(box, q, cutoff=2.4, accuracy_rel=1e-6, qqrd2e=332.06371,
                     acc_dtype=jnp.float64)
    res = ew.compute(jnp.asarray(x), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(res.f).sum(axis=0), 0.0, atol=1e-9)


def test_ewald_peratom_pins_to_totals():
    """Per-atom Ewald energy/virial (stock ewald.cpp eatom/vatom) sum
    EXACTLY to elong/virial — closes the `compute pe/atom` gap on
    ewald decks (in.buck_coul_long)."""
    from lammps_buck_intel_tpu.models.kspace.ewald import \
        ewald_compute_peratom

    rng = np.random.RandomState(5)
    n = 24
    L = 6.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    box = make_box([0, 0, 0], [L] * 3)
    ew = setup_ewald(box, q, cutoff=2.4, accuracy_rel=1e-6,
                     qqrd2e=332.06371, acc_dtype=jnp.float64)
    res = ew.compute(jnp.asarray(x), jnp.asarray(q))
    ea, va = ewald_compute_peratom(ew, jnp.asarray(x), jnp.asarray(q))
    np.testing.assert_allclose(float(ea.sum()), float(res.elong),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(va).sum(axis=0),
                               np.asarray(res.virial), rtol=1e-10,
                               atol=1e-12)


def test_ewald_deck_pe_atom(reference_dir):
    """`compute pe/atom` on the literal ewald deck (buck_coul_long)
    pins to the thermo epair through the product compute surface."""
    import yaml

    from lammps_buck_intel_tpu import computes
    from lammps_buck_intel_tpu.run import build_simulation

    with open("examples/decks/buck_coul_long.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["run"] = 0
    cfg["replicate"] = [1, 1, 1]   # 1,200 atoms: fast CPU build
    sim = build_simulation(cfg)
    row = sim.thermo()
    e = computes.pe_atom(sim)
    assert abs(float(e.sum()) - row["epair"]) \
        <= 5e-3 * abs(row["epair"]), (float(e.sum()), row["epair"])
