import numpy as np
import jax.numpy as jnp

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double,
)
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_buck
from lammps_buck_intel_tpu.integrate import Simulation, NeighborPolicy


def _buck_melt(n_cells, precision, kmax=None, every=20, check=False,
               shift=True, dt=None, dense=None):
    """Miniature in.buck deck (examples/in.buck): fcc 0.8442, buck 2.5,
    NVE, lj units.  Energy-shifted at the cutoff for conservation tests
    (the unshifted potential has a genuine 3e-3 energy jump at r=2.5 that
    dominates drift, in LAMMPS too)."""
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, *([n_cells] * 3))
    n = len(xs)
    mass = np.ones(1)
    v = velocity.create(n, 1.44, 87287, np.ones(n), u)
    dtype = precision.flt
    box = make_box(lo, hi, dtype=dtype)
    system = make_system(xs, box, v=v, mass=mass, dtype=dtype)
    style = build_buck(
        1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5, shift=shift,
        dtype=dtype,
    )
    sim = Simulation(
        system, style, units=u, precision=precision, dt=dt,
        neighbor=NeighborPolicy(skin=0.3, every=every, delay=0, check=check),
        kmax=kmax, dense=dense,
    )
    return sim


def test_nve_energy_conservation_f64():
    sim = _buck_melt(4, double())  # 256 atoms
    rows = sim.run(200, thermo_every=50, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 2e-4, f"f64 energy drift {drift}"


def test_nve_energy_conservation_f32():
    from lammps_buck_intel_tpu.core import single

    sim = _buck_melt(4, single())
    rows = sim.run(200, thermo_every=50, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 1e-3, f"f32 energy drift {drift}"


def test_nve_drift_scales_dt_squared():
    """Symplectic integrator signature: halving dt quarters the drift."""
    drifts = []
    for dt in (0.005, 0.0025):
        sim = _buck_melt(4, double(), every=1, check=True, dt=dt)
        nsteps = int(100 * 0.005 / dt)
        rows = sim.run(nsteps, thermo_every=nsteps // 4, log=False)
        e0 = rows[0]["etotal"]
        drifts.append(max(abs(r["etotal"] - e0) for r in rows) / abs(e0))
    ratio = drifts[0] / drifts[1]
    assert 2.5 < ratio < 8.0, f"drift ratio {ratio}, drifts {drifts}"


def test_momentum_conserved():
    sim = _buck_melt(4, double())
    sim.run(100, thermo_every=0, log=False)
    p = np.asarray(sim.state.v).sum(axis=0)  # unit mass
    np.testing.assert_allclose(p, 0.0, atol=1e-9)


def test_cell_list_path_matches_dense():
    # 6^3 cells = 864 atoms: cell-list path; compare 50-step trajectory
    # against the dense-list path step for step.
    sim_c = _buck_melt(6, double())
    assert not sim_c.spec.dense
    sim_d = _buck_melt(6, double(), dense=True)
    assert sim_d.spec.dense
    sim_c.run(50, log=False)
    sim_d.run(50, log=False)
    np.testing.assert_allclose(
        np.asarray(sim_c.state.x), np.asarray(sim_d.state.x),
        rtol=1e-10, atol=1e-10,
    )


def test_check_yes_rebuild_cadence():
    sim = _buck_melt(4, double(), every=1, check=True)
    rows = sim.run(60, thermo_every=30, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 2e-4


def test_thermo_against_initial_lattice():
    # perfect fcc lattice at T=0: forces vanish by symmetry, energy is the
    # lattice sum — sanity anchor for the whole pipeline
    import jax

    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 4, 4, 4)
    box = make_box(lo, hi, dtype=jnp.float64)
    system = make_system(xs, box, mass=np.ones(1), dtype=jnp.float64)
    style = build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5,
                       dtype=jnp.float64)
    sim = Simulation(system, style, units=u, precision=double())
    row = sim.thermo()
    f = np.asarray(sim.state.f)
    assert np.abs(f).max() < 1e-9  # lattice symmetry
    assert row["temp"] == 0.0
    # golden brute force on the same lattice (in.buck's C=-0.8 makes the
    # r^-6 term repulsive: positive lattice energy)
    import golden

    ev, _, F, _ = golden.pair_buck_coul(
        xs, np.zeros(len(xs), int), np.zeros(len(xs)),
        np.asarray(hi - lo), {(0, 0): (1.0, 0.2, -0.8)}, cut_lj=2.5,
    )
    np.testing.assert_allclose(row["evdwl"], ev, rtol=1e-10)


def test_fire_minimize():
    """FIRE minimizer (integrate/minimize.py): drives fmax below ftol
    and strictly lowers the potential energy of a jittered melt."""
    import jax.numpy as jnp
    from lammps_buck_intel_tpu.core import make_box, make_system, \
        get_units, double
    from lammps_buck_intel_tpu.io import lattice
    from lammps_buck_intel_tpu.models.pair import build_buck
    from lammps_buck_intel_tpu.integrate import (Simulation,
                                                 NeighborPolicy,
                                                 fire_minimize)

    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 4, 4, 4)
    rng = np.random.RandomState(0)
    xs = xs + rng.uniform(-0.25, 0.25, xs.shape)   # strained
    n = len(xs)
    box = make_box(lo, hi, dtype=jnp.float64)
    style = build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5,
                       dtype=jnp.float64)
    system = make_system(xs, box, v=np.zeros((n, 3)), mass=np.ones(1),
                         dtype=jnp.float64)
    sim = Simulation(system, style, units=u, precision=double(),
                     dt=0.005,
                     neighbor=NeighborPolicy(skin=0.3, every=5, delay=0,
                                             check=False))
    e0 = sim.thermo()["epair"]
    it, fmax, epot = fire_minimize(sim, maxiter=600, ftol=0.05,
                                   dmax=0.05)
    assert fmax < 0.05, (it, fmax)
    e1 = sim.thermo()["epair"]
    assert e1 < e0 - 1.0, (e0, e1)
    # velocities zeroed; positions finite
    assert float(jnp.max(jnp.abs(sim.state.v))) == 0.0
