"""Molecular terms (bonded + SHAKE) in TRICLINIC boxes.

Validation strategy: lattice-vector invariance — translating a whole
molecule by any cell vector h @ n must leave every thermo quantity
unchanged (the minimum image absorbs the move).  An orthogonal per-axis
min image FAILS this in a tilted cell whenever the move crosses a tilted
face, so these tests pin the triclinic reduction in
models/bonded (compute_bonded) and integrate/shake (_minimg_cols).
Cross-engine parity (nlist vs production cell-slot) covers both wirings.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, get_precision, build_topology,
)
from lammps_buck_intel_tpu.io import velocity
from lammps_buck_intel_tpu.models.pair import build_lj
from lammps_buck_intel_tpu.integrate import (
    Simulation, CellPairSimulation, NeighborPolicy, NVTConfig, make_shake,
)

TILT = np.array([3.0, 2.0, -2.5])   # xy, xz, yz (restricted)
NM = 3                              # molecules per axis
SP = 6.8


def _tilted_water(shift_mol=None, shift_n=(1, 0, 0)):
    """Water molecules on a fractional grid of a tilted box; optionally
    translate molecule `shift_mol` by the lattice vector h @ shift_n."""
    u = get_units("real")
    lo = np.zeros(3)
    L = np.array([NM, NM, NM], np.float64) * SP
    box = make_box(lo, lo + L, tilt=TILT, dtype=jnp.float64)
    h = np.asarray(box.h_matrix, np.float64)
    xw = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.26],
                   [-0.55, 0.0, 0.83]])
    rng = np.random.RandomState(77)
    xs, bonds, angles, mol = [], [], [], []
    i = 0
    for ax in range(NM):
        for ay in range(NM):
            for az in range(NM):
                frac = (np.array([ax, ay, az]) + 0.5) / NM \
                    + rng.uniform(-0.03, 0.03, 3)
                c = lo + h @ frac
                xs.append(xw + c)
                bonds += [[0, i, i + 1], [0, i, i + 2]]
                angles += [[0, i + 1, i, i + 2]]
                mol += [i // 3] * 3
                i += 3
    n = i
    x = np.concatenate(xs)
    if shift_mol is not None:
        x[3 * shift_mol:3 * shift_mol + 3] += h @ np.asarray(
            shift_n, np.float64)
    typ = np.tile([0, 1, 1], n // 3).astype(np.int32)
    q = np.tile([-0.8472, 0.4236, 0.4236], n // 3)
    mass = np.array([15.9994, 1.008])
    v0 = velocity.create(n, 300.0, 87287, mass[typ], u)
    system = make_system(x, box, type=typ, v=v0, q=q, mass=mass,
                         molecule=np.asarray(mol, np.int32),
                         dtype=jnp.float64)
    topo = build_topology(n, bonds=bonds, angles=angles)
    return (u, box, system, np.asarray(bonds, np.int32),
            np.asarray(angles, np.int32), topo, mass[typ])


def _style(u):
    return build_lj(
        2, {(0, 0): (0.15535, 3.166), (0, 1): (0.05, 2.0),
            (1, 1): (0.02, 1.5)},
        cut_global=4.0, coul="cut", cut_coul=5.0,
        special_lj=(1.0, 0.0, 0.0, 0.0), special_coul=(1.0, 0.0, 0.0, 0.0),
        qqrd2e=u.qqrd2e, name="lj/cut/coul/cut", dtype=jnp.float64)


def _bonded(bonds, angles):
    from lammps_buck_intel_tpu.models.bonded import make_bonded

    return make_bonded(bonds=bonds, angles=angles,
                       bond_coeffs=[[450.0, 1.0]],
                       angle_coeffs=[[55.0, 109.47]])


def _sim(engine, shift_mol=None, shake=False, thermostat=None):
    u, box, system, bonds, angles, topo, mpa = _tilted_water(shift_mol)
    style = _style(u)
    prec = get_precision("double")
    nbr = NeighborPolicy(skin=1.0, every=5, check=False)
    sc = None
    bonded = _bonded(bonds, angles)
    if shake:
        sc = make_shake(bonds, np.array([[450.0, 1.0]]), angles,
                        np.array([[55.0, 109.47]]), mpa, iters=30)
        bonded = None
    cls = Simulation if engine == "nlist" else CellPairSimulation
    return cls(system, style, topology=topo, units=u, precision=prec,
               dt=1.0, neighbor=nbr, bonded=bonded, shake=sc,
               thermostat=thermostat)


@pytest.mark.parametrize("engine", ["nlist", "cellpair"])
def test_tilted_bonded_lattice_vector_invariance(engine):
    r0 = _sim(engine).thermo()
    for mol_id, nvec in ((0, (1, 0, 0)), (NM**3 - 1, (0, 1, 1))):
        r1 = _sim_shifted(engine, mol_id, nvec).thermo()
        for key in ("evdwl", "ecoul", "emol", "etotal", "press"):
            a, b = float(r0[key]), float(r1[key])
            assert abs(a - b) <= 1e-9 * max(abs(a), 1.0), (key, a, b)


def _sim_shifted(engine, mol_id, nvec):
    u, box, system, bonds, angles, topo, mpa = _tilted_water(mol_id, nvec)
    style = _style(u)
    prec = get_precision("double")
    nbr = NeighborPolicy(skin=1.0, every=5, check=False)
    cls = Simulation if engine == "nlist" else CellPairSimulation
    return cls(system, style, topology=topo, units=u, precision=prec,
               dt=1.0, neighbor=nbr, bonded=_bonded(bonds, angles))


@pytest.mark.parametrize("engine", ["nlist", "cellpair"])
def test_tilted_shake_runs_and_holds(engine):
    from lammps_buck_intel_tpu.integrate.shake import max_violation

    therm = NVTConfig(t_start=300.0, t_stop=300.0, t_damp=100.0)
    sim = _sim(engine, shake=True, thermostat=therm)
    rows = sim.run(10, thermo_every=5, log=False)
    assert all(np.isfinite(r["etotal"]) for r in rows)
    atoms = sim.get_atoms() if hasattr(sim, "get_atoms") else None
    x = (jnp.asarray(atoms["x"]) if atoms is not None
         else sim.state.x)
    u, box, *_ = _tilted_water()
    sc = sim.shake
    viol = float(max_violation(sc, x, box))
    assert viol < 2e-4, viol


def test_tilted_molecular_cross_engine_parity():
    therm = NVTConfig(t_start=300.0, t_stop=300.0, t_damp=100.0)
    simA = _sim("nlist", thermostat=therm)
    simB = _sim("cellpair", thermostat=therm)
    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("temp", "evdwl", "ecoul", "emol", "etotal", "press"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-7 * max(abs(a), 1.0), (key, a, b)


def test_tilted_shake_deck_runs_production_engine():
    """engine: cellpair + tilted box + fix shake no longer reroutes to
    the nlist engine."""
    from lammps_buck_intel_tpu.run import build_simulation

    u, box, system, bonds, angles, topo, mpa = _tilted_water()
    # deck-level: write a data file and run through build_simulation
    import os
    import tempfile
    from lammps_buck_intel_tpu.io import write_data

    class _S:
        pass

    s = _S()
    s.x = np.asarray(system.x)
    s.v = np.asarray(system.v)
    s.image = np.zeros_like(s.x, dtype=np.int32)
    s.type = np.asarray(system.type)
    s.q = np.asarray(system.q)
    s.molecule = np.asarray(system.molecule)
    s.mass = np.asarray(system.mass)
    s.box = box
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "tilted.data")
        write_data(p, s, topology=topo)
        cfg = {
            "units": "real", "precision": "double", "engine": "cellpair",
            "read_data": p,
            "pair_style": {"name": "lj/cut/coul/cut", "cut": 4.0,
                           "cut_coul": 5.0,
                           "coeffs": {"1 1": [0.15535, 3.166],
                                      "1 2": [0.05, 2.0],
                                      "2 2": [0.02, 1.5]}},
            "neighbor": {"skin": 1.0, "every": 5, "check": False},
            "bond_style": {"name": "harmonic", "coeffs": [[450.0, 1.0]]},
            "angle_style": {"name": "harmonic",
                            "coeffs": [[55.0, 109.47]]},
            "fixes": [{"name": "shake", "m": 1.0, "tol": 0.0001},
                      {"name": "nvt", "t_start": 300.0, "t_damp": 100.0}],
            "timestep": 1.0,
        }
        sim = build_simulation(cfg)
        assert isinstance(sim, CellPairSimulation), type(sim)
        row = sim.thermo()
        assert np.isfinite(row["press"]) and np.isfinite(row["etotal"])


def test_tilted_dihedral_improper_lattice_vector_invariance():
    """CHARMM dihedrals + harmonic impropers in a tilted box: translating
    a whole chain by a lattice vector leaves the bonded ledger unchanged
    (pins the Box-aware _minimg3 in models/bonded/charmm.py — without it
    a tilted deck with 4-body terms crashed at trace time)."""
    from lammps_buck_intel_tpu.models.bonded import make_bonded
    from lammps_buck_intel_tpu.models.bonded.harmonic import compute_bonded

    u = get_units("real")
    lo = np.zeros(3)
    L = np.array([3, 3, 3], np.float64) * 7.0
    box = make_box(lo, lo + L, tilt=TILT, dtype=jnp.float64)
    h = np.asarray(box.h_matrix, np.float64)
    # butane-ish 4-atom chains on a fractional grid
    chain = np.array([[0.0, 0.0, 0.0], [1.53, 0.0, 0.3],
                      [2.3, 1.3, 0.0], [3.83, 1.3, 0.3]])
    rng = np.random.RandomState(3)
    xs, bonds, angles, diheds, improps = [], [], [], [], []
    i = 0
    for ax in range(3):
        for ay in range(3):
            for az in range(3):
                frac = (np.array([ax, ay, az]) + 0.5) / 3.0 \
                    + rng.uniform(-0.02, 0.02, 3)
                xs.append(chain + lo + h @ frac)
                bonds += [[0, i, i + 1], [0, i + 1, i + 2],
                          [0, i + 2, i + 3]]
                angles += [[0, i, i + 1, i + 2], [0, i + 1, i + 2, i + 3]]
                diheds += [[0, i, i + 1, i + 2, i + 3]]
                improps += [[0, i + 1, i, i + 2, i + 3]]
                i += 4
    x = np.concatenate(xs)

    style = make_bonded(
        bonds=bonds, angles=angles, dihedrals=diheds, impropers=improps,
        bond_coeffs=[[300.0, 1.53]], angle_coeffs=[[40.0, 114.0]],
        dihedral_coeffs=[[1.2, 3, 0.0, 0.0]],
        improper_coeffs=[[5.0, 10.0]])

    def ledger(xa):
        br = compute_bonded(style, jnp.asarray(xa, jnp.float64), box,
                            eflag=True, acc_dtype=jnp.float64)
        return (float(br.ebond), float(br.eangle), float(br.edihed),
                float(br.eimp), np.asarray(br.virial))

    e0 = ledger(x)
    x2 = x.copy()
    x2[0:4] += h @ np.array([1.0, 0.0, 0.0])    # first chain, +a vector
    x2[-4:] += h @ np.array([0.0, -1.0, 1.0])   # last chain, -b+c
    e1 = ledger(x2)
    for a, b in zip(e0[:4], e1[:4]):
        assert abs(a - b) <= 1e-10 * max(abs(a), 1.0), (a, b)
    np.testing.assert_allclose(e1[4], e0[4], rtol=1e-10, atol=1e-12)
