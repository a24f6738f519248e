"""End-to-end buck/coul/long + ewald — the in.buck_coul_long deck physics
(examples/in.buck_coul_long: buck/coul/long 12.0 + kspace ewald 1e-6, metal
units, silica charges) on a reduced system size."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double,
)
from lammps_buck_intel_tpu.io import velocity
from lammps_buck_intel_tpu.models.pair import build_buck, compute_pair
from lammps_buck_intel_tpu.models.kspace import setup_ewald
from lammps_buck_intel_tpu.neighbor import make_spec, build
from lammps_buck_intel_tpu.integrate import Simulation, NeighborPolicy

import golden

QQRD2E = 14.399645  # metal units


def _ionic_system(n_cell=3, a=3.2, seed=0):
    """Rock-salt-like charged system, slightly perturbed off-lattice."""
    rng = np.random.RandomState(seed)
    xs, qs, ts = [], [], []
    for i in range(n_cell):
        for j in range(n_cell):
            for k in range(n_cell):
                for b, (dx, chg, t) in enumerate(
                    [((0, 0, 0), 1.2, 0), ((0.5, 0.5, 0.5), -1.2, 1)]
                ):
                    xs.append((np.array([i, j, k]) + dx) * a)
                    qs.append(chg)
                    ts.append(t)
    x = np.asarray(xs) + rng.uniform(-0.05, 0.05, (len(xs), 3))
    L = n_cell * a
    return x, np.asarray(qs), np.asarray(ts, np.int32), L


BUCK = {
    (0, 0): (1388.77, 0.3623188, 175.0),
    (0, 1): (18003.0, 0.2052124, 133.5381),
    (1, 1): (100.0, 0.35, 30.0),
}


def test_forces_vs_golden_pair_plus_ewald():
    x, q, typ, L = _ionic_system()
    cut = 4.5
    box = make_box([0, 0, 0], [L] * 3)
    ew = setup_ewald(box, q, cutoff=cut, accuracy_rel=1e-7, qqrd2e=QQRD2E,
                     acc_dtype=jnp.float64)
    style = build_buck(
        2, BUCK, cut_global=cut, coul="long", qqrd2e=QQRD2E,
        dtype=jnp.float64,
    ).replace(g_ewald=ew.g_ewald)
    spec = make_spec(len(x), [L] * 3, cut + 0.3, dense=True)
    nl = build(jnp.asarray(x), box, spec)
    pr = compute_pair(style, jnp.asarray(x), jnp.asarray(typ),
                      jnp.asarray(q), box, nl, acc_dtype=jnp.float64)
    kr = ew.compute(jnp.asarray(x), jnp.asarray(q))
    f_total = np.asarray(pr.f) + np.asarray(kr.f)

    ev_g, ec_g, F_pair, _ = golden.pair_buck_coul(
        x, typ, q, [L] * 3, BUCK, cut_lj=cut, cut_coul=cut, coul="long",
        g_ewald=ew.g_ewald, qqrd2e=QQRD2E,
    )
    _, e_recip, e_self, _, F_recip = golden.ewald_sum(
        x, q, [L] * 3, ew.g_ewald, kmax=10, qqrd2e=QQRD2E,
    )
    np.testing.assert_allclose(float(pr.evdwl), ev_g, rtol=1e-10)
    # ecoul uses the A&S erfc polynomial (|err| ~ 1.5e-7 per pair, as in the
    # reference itself) while golden uses exact erfc; the total suffers
    # cancellation, so the bound is absolute across ~7k pairs.
    np.testing.assert_allclose(float(pr.ecoul), ec_g, atol=1e-3)
    np.testing.assert_allclose(float(kr.elong), e_recip + e_self, rtol=1e-5)
    np.testing.assert_allclose(
        f_total, F_pair + F_recip, rtol=5e-4, atol=5e-5
    )


def test_nve_with_kspace_conserves_energy():
    u = get_units("metal")
    x, q, typ, L = _ionic_system()
    n = len(x)
    cut = 4.5
    box = make_box([0, 0, 0], [L] * 3)
    mass = np.array([28.0855, 15.9994])
    v = velocity.create(n, 300.0, 1281937, mass[typ], u)
    system = make_system(x, box, type=typ, v=v, q=q, mass=mass,
                         dtype=jnp.float64)
    ew = setup_ewald(box, q, cutoff=cut, accuracy_rel=1e-7, qqrd2e=QQRD2E,
                     acc_dtype=jnp.float64)
    style = build_buck(
        2, BUCK, cut_global=cut, coul="long", qqrd2e=QQRD2E, shift=True,
        dtype=jnp.float64,
    ).replace(g_ewald=ew.g_ewald)
    sim = Simulation(
        system, style, kspace=ew, units=u, precision=double(),
        neighbor=NeighborPolicy(skin=0.3, every=1, delay=0, check=True),
    )
    rows = sim.run(50, thermo_every=10, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    # dt^2-scaling integration truncation (verified: dt/4 -> drift/18;
    # independent of ewald accuracy), stiff perturbed ionic lattice
    assert drift < 3e-4, f"drift {drift}"
    assert abs(rows[0]["elong"]) > 0  # kspace actually contributing
