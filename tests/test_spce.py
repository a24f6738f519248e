"""SPC/E water system tests — the in.spce deck physics (examples/in.spce):
lj/cut/coul/long 6.8 8.8 + pppm 1e-4, harmonic bonds/angles, special_bonds
lj/coul 0.0 0.0 0.5, real units.  Run flexible (no SHAKE yet) at small dt.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double, build_topology,
)
from lammps_buck_intel_tpu.io import read_data, velocity
from lammps_buck_intel_tpu.models.pair import build_lj, compute_pair
from lammps_buck_intel_tpu.models.kspace import setup_pppm
from lammps_buck_intel_tpu.models.bonded import make_bonded, compute_bonded
from lammps_buck_intel_tpu.neighbor import make_spec, build
from lammps_buck_intel_tpu.integrate import Simulation, NeighborPolicy

SPECIAL_LJ = (1.0, 0.0, 0.0, 0.5)
SPECIAL_COUL = (1.0, 0.0, 0.0, 0.5)


def _spce_style(u, dtype):
    return build_lj(
        2, {(0, 0): (0.15535, 3.166), (0, 1): (0.0, 0.0), (1, 1): (0.0, 0.0)},
        cut_global=6.8, coul="long", cut_coul=8.8,
        special_lj=SPECIAL_LJ, special_coul=SPECIAL_COUL,
        qqrd2e=u.qqrd2e, name="lj/cut/coul/long", dtype=dtype,
    )


def test_water_dimer_force_is_gradient():
    """Total force (pair + pppm + bonded, with special bonds) == -dE/dx."""
    u = get_units("real")
    # two water molecules
    x = np.array([
        [5.0, 5.0, 5.0], [5.96, 5.0, 5.26], [4.55, 5.0, 5.86],
        [8.0, 5.0, 5.0], [8.96, 5.0, 5.26], [7.55, 5.0, 5.86],
    ])
    q = np.array([-0.8472, 0.4236, 0.4236] * 2)
    typ = np.array([0, 1, 1] * 2, np.int32)
    bonds = [[0, 0, 1], [0, 0, 2], [0, 3, 4], [0, 3, 5]]
    angles = [[0, 1, 0, 2], [0, 4, 3, 5]]
    topo = build_topology(6, bonds=bonds, angles=angles)
    L = 14.0
    box = make_box([0, 0, 0], [L] * 3)
    style = _spce_style(u, jnp.float64).replace()
    pm = setup_pppm(box, q, cutoff=6.0, accuracy_rel=1e-5, qqrd2e=u.qqrd2e,
                    grid=(24, 24, 24), acc_dtype=jnp.float64)
    style = style.replace(g_ewald=pm.g_ewald)
    bonded = make_bonded(bonds=bonds, angles=angles,
                         bond_coeffs=[[1000.0, 1.0]],
                         angle_coeffs=[[100.0, 109.47]])
    spec = make_spec(6, [L] * 3, 9.0, dense=True)
    nl = build(jnp.asarray(x), box, spec, jnp.asarray(topo.special_idx),
               jnp.asarray(topo.special_code))

    def energy(xx):
        pr = compute_pair(style, xx, jnp.asarray(typ), jnp.asarray(q), box,
                          nl, eflag=True, vflag=False, acc_dtype=jnp.float64)
        kr = pm.compute(xx, jnp.asarray(q), eflag=True, vflag=False)
        br = compute_bonded(bonded, xx, box, acc_dtype=jnp.float64)
        return (pr.evdwl + pr.ecoul + kr.elong + br.ebond + br.eangle,
                pr.f + kr.f + br.f)

    e, f = energy(jnp.asarray(x))
    g = jax.grad(lambda xx: energy(xx)[0])(jnp.asarray(x))
    f = np.asarray(f)
    g = np.asarray(g)
    scale = np.abs(f).max()
    # pppm ik-interpolated force is not exactly -grad of the mesh energy
    # (that's the ad scheme); agreement is at the pppm accuracy level.
    np.testing.assert_allclose(f / scale, -g / scale, atol=3e-4)


def test_spce_4500_energy_conservation(reference_dir):
    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/data.spce")
    n = d.n_atoms
    box = make_box(d.box_lo, d.box_hi)
    topo = build_topology(n, bonds=d.bonds, angles=d.angles)
    style = _spce_style(u, jnp.float64)
    pm = setup_pppm(box, d.q, cutoff=8.8, accuracy_rel=1e-4,
                    qqrd2e=u.qqrd2e, acc_dtype=jnp.float64)
    style = style.replace(g_ewald=pm.g_ewald)
    bonded = make_bonded(
        bonds=d.bonds, angles=d.angles,
        bond_coeffs=[[1000.0, 1.0]], angle_coeffs=[[100.0, 109.47]],
    )
    mass_per_atom = d.mass[d.type]
    v = velocity.create(n, 300.0, 432567, mass_per_atom, u, dist="uniform")
    system = make_system(d.x, box, type=d.type, v=v, q=d.q, image=d.image,
                         mass=d.mass, molecule=d.molecule, dtype=jnp.float64)
    sim = Simulation(
        system, style, topology=topo, kspace=pm, bonded=bonded, units=u,
        precision=double(), dt=0.1,  # flexible water needs small dt
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
    )
    rows = sim.run(20, thermo_every=10, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    # pure dt^2 Verlet truncation (verified dt/4 -> drift/16, independent of
    # pppm accuracy); flexible OH at K=1000 is stiff
    assert drift < 2e-4, f"spce drift {drift}"
    r0 = rows[0]
    # sanity (LAMMPS coul/long conventions): real-space ecoul is POSITIVE
    # for water (intramolecular exclusions subtracted), elong large negative
    # (contains the Ewald self-energy), net electrostatics strongly binding.
    assert r0["ecoul"] > 1000
    assert r0["elong"] < -10000
    assert r0["evdwl"] != 0
    assert r0["epair"] < -10000
