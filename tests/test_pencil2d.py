"""2-D (x, y) pencil engine vs single-device and 1-D slab engines.

Runs on the 8-virtual-CPU-device mesh (conftest): the pod-scale
decomposition (VERDICT r4 missing #6) — two-stage halo exchange and
migration relay over a (Dx, Dy) device grid.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_buck_intel_tpu.core import get_precision, get_units, \
    make_box, make_system
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_buck
from lammps_buck_intel_tpu.models.kspace import setup_ewald
from lammps_buck_intel_tpu.integrate import CellPairSimulation, \
    NeighborPolicy, NVTConfig
from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation, slab_mesh
from lammps_buck_intel_tpu.parallel.pencil2d import (
    Pencil2DSimulation, pencil_mesh, ext_nbr_table_2d,
)


def _melt(nx=8, ny=8, nz=6, charged=False):
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, nx, ny, nz)
    n = len(xs)
    v0 = velocity.create(n, 1.44, 87287, np.ones(n), u)
    box = make_box(lo, hi, dtype=jnp.float64)
    q = np.zeros(n)
    if charged:
        q[0::2] = 0.5
        q[1::2] = -0.5
    system = make_system(xs, box, v=v0, q=q, dtype=jnp.float64)
    return u, box, system, q


def _style(charged=False):
    kw = dict(coul="long", qqrd2e=1.0) if charged else {}
    return build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5, **kw)


def test_ext_nbr_table_2d_is_consistent():
    t = ext_nbr_table_2d(3, 4, 5)
    assert t.shape == (60, 27)
    # interior cell's center entry maps to itself in ext coordinates
    cx, cy, cz = 1, 2, 3
    i = (cx * 4 + cy) * 5 + cz
    assert t[i, 13] == ((cx + 1) * 6 + (cy + 1)) * 5 + cz


@pytest.mark.parametrize("dims", [(2, 4), (4, 2), (2, 2)])
def test_pencil2d_matches_single_device(dims):
    """Pure pair + NVT trajectory == single device (f64) across
    migration rebins on a (Dx, Dy) device grid."""
    u, box, system, _ = _melt()
    style = _style()
    prec = get_precision("double")
    nbr = NeighborPolicy(skin=0.3, every=5, check=False)
    therm = NVTConfig(t_start=1.1, t_stop=1.1, t_damp=0.5)
    simA = CellPairSimulation(system, style, units=u, precision=prec,
                              neighbor=nbr, thermostat=therm)
    simB = Pencil2DSimulation(system, style, dims=dims, units=u,
                              precision=prec, neighbor=nbr,
                              thermostat=therm)
    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "temp", "etotal"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-8 * max(abs(a), abs(b), 1.0), \
                (key, a, b)
    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    np.testing.assert_allclose(xb, xa, rtol=0, atol=1e-9)


def test_pencil2d_matches_1d_slab():
    """(4, 2) pencil == 4-device 1-D slab: the decompositions agree to
    reduction order on the same physics."""
    u, box, system, _ = _melt()
    style = _style()
    prec = get_precision("double")
    nbr = NeighborPolicy(skin=0.3, every=5, check=False)
    simA = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(4), units=u, precision=prec,
        neighbor=nbr)
    simB = Pencil2DSimulation(system, style, dims=(4, 2), units=u,
                              precision=prec, neighbor=nbr)
    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "temp", "press"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-8 * max(abs(a), abs(b), 1.0), \
                (key, a, b)
    np.testing.assert_allclose(simB.get_atoms()["x"],
                               simA.get_atoms()["x"], rtol=0, atol=1e-9)


def test_pencil2d_migration_preserves_atoms():
    u, box, system, _ = _melt()
    style = _style()
    sim = Pencil2DSimulation(
        system, style, dims=(2, 4), units=u,
        precision=get_precision("double"),
        neighbor=NeighborPolicy(skin=0.3, every=3, check=False))
    sim.run(30, log=False)
    row = sim.thermo()
    assert not row["overflow"]
    st = jax.device_get(sim.state)
    aid = np.asarray(st.aid)
    present = np.sort(aid[aid < sim.n_atoms])
    np.testing.assert_array_equal(present, np.arange(sim.n_atoms))


def test_pencil2d_sharded_ewald():
    """Charged melt: ShardedEwald psums over the flat (x, y) axis —
    k-space on the 2-D mesh without gathering atom planes."""
    from lammps_buck_intel_tpu.models.kspace.pppm_slab import ShardedEwald

    u, box, system, q = _melt(charged=True)
    style = _style(charged=True)
    prec = get_precision("double")
    ew = setup_ewald(box, q, cutoff=2.5, accuracy_rel=1e-4, qqrd2e=1.0,
                     acc_dtype=prec.acc)
    style = style.replace(g_ewald=ew.g_ewald)
    nbr = NeighborPolicy(skin=0.3, every=5, check=False)
    simA = CellPairSimulation(system, style, units=u, precision=prec,
                              kspace=ew, neighbor=nbr)
    simB = Pencil2DSimulation(
        system, style, dims=(2, 4), units=u, precision=prec,
        neighbor=nbr, kspace_setup=lambda s: ShardedEwald(ew, s.D))
    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "ecoul", "elong", "temp"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-7 * max(abs(a), abs(b), 1.0), \
                (key, a, b)


@pytest.mark.parametrize("dims", [(1, 4), (4, 1)])
def test_pencil2d_degenerate_dims(dims):
    """A 1-block axis owns every cell: no relative wrap, no dropped
    last plane (code-review r5 finding #1)."""
    u, box, system, _ = _melt()
    style = _style()
    sim = Pencil2DSimulation(
        system, style, dims=dims, units=u,
        precision=get_precision("double"),
        neighbor=NeighborPolicy(skin=0.3, every=3, check=False))
    rows = sim.run(12, thermo_every=6, log=False)
    assert not rows[-1]["overflow"]
    st = jax.device_get(sim.state)
    aid = np.asarray(st.aid)
    present = np.sort(aid[aid < sim.n_atoms])
    np.testing.assert_array_equal(present, np.arange(sim.n_atoms))


def test_pencil2d_nvt_ramp_and_check():
    """t_start != t_stop ramps (review finding #2) and check=True derives
    the cadence from vmax (finding #3) instead of silently ignoring
    both."""
    u, box, system, _ = _melt()
    style = _style()
    therm = NVTConfig(t_start=1.0, t_stop=2.0, t_damp=0.3)
    sim = Pencil2DSimulation(
        system, style, dims=(2, 2), units=u,
        precision=get_precision("double"),
        neighbor=NeighborPolicy(skin=0.6, every=50, check=True),
        thermostat=therm)
    # vmax-derived cadence must beat the absurd every=50
    assert sim._cadence(sim._vmax()) < 50
    rows = sim.run(400, thermo_every=200, log=False)
    temps = [r["temp"] for r in rows]
    # the ramp pulled the temperature UP toward 2.0
    assert temps[-1] > temps[0] + 0.3, temps


@pytest.mark.parametrize("dims", [(2, 2), (2, 4)])
def test_pencil2d_pppm_matches_single_device(dims):
    """buck/coul/long + the 2-D PENCIL PPPM (2-D brick deposition with
    two-hop overhang reduction, double-transpose pencil FFT over the
    (x, y) device grid, halo-filled patch gathers) == the single-device
    cell-patch solver — the full H4 contract at pod scale."""
    from lammps_buck_intel_tpu.models.kspace import CellPPPM, setup_pppm
    from lammps_buck_intel_tpu.models.kspace.pppm_slab import \
        Pencil2DCellPPPM

    u, box, system, q = _melt(charged=True)
    style = _style(charged=True)
    prec = get_precision("double")
    nbr = NeighborPolicy(skin=0.3, every=5, check=False)
    simA = CellPairSimulation(system, style, units=u, precision=prec,
                              neighbor=nbr)
    nc = simA.grid.coarse().nc
    # mesh: multiple of the cell grid; ny must also tile Dx (the x
    # transpose splits ny)
    m = int(np.lcm(nc[1], dims[0]))
    kgrid = (5 * nc[0], -(-5 * nc[1] // m) * m, 5 * nc[2])
    pm = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-4, qqrd2e=1.0,
                    order=5, grid=kgrid, acc_dtype=prec.acc)
    style2 = style.replace(g_ewald=pm.g_ewald)
    simA.pair = simA.pair.replace(g_ewald=pm.g_ewald)
    simA.kspace = CellPPPM(pm, simA.grid)
    simA.state = simA._init_force_fn()(simA.state)

    def ks(sim):
        sim.pair = sim.pair.replace(g_ewald=pm.g_ewald)
        return Pencil2DCellPPPM(pm, sim.grid, dims)

    simB = Pencil2DSimulation(system, style2, dims=dims, units=u,
                              precision=prec, neighbor=nbr,
                              kspace_setup=ks)
    assert simB.grid.nc == simA.grid.nc, (simB.grid.nc, simA.grid.nc)
    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "ecoul", "elong", "temp"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-8 * max(abs(a), abs(b), 1.0), \
                (key, a, b)
    np.testing.assert_allclose(simB.get_atoms()["x"],
                               simA.get_atoms()["x"], rtol=0, atol=1e-8)


def test_pencil2d_checkpoint_roundtrip(tmp_path):
    """save -> resume on the 2-D pencil engine: verbatim slot planes
    give bit-exact continuation."""
    from lammps_buck_intel_tpu.utils import checkpoint as ckpt

    u, box, system, _ = _melt()
    style = _style()
    prec = get_precision("double")
    nbr = NeighborPolicy(skin=0.3, every=5, check=False)
    sim = Pencil2DSimulation(system, style, dims=(2, 2), units=u,
                             precision=prec, neighbor=nbr)
    sim.run(10, log=False)
    path = str(tmp_path / "p2d.npz")
    ckpt.save(path, sim)
    rows_ref = sim.run(10, thermo_every=10, log=False)

    sim2 = Pencil2DSimulation(system, style, dims=(2, 2), units=u,
                              precision=prec, neighbor=nbr)
    ckpt.resume(sim2, ckpt.load(path))
    assert sim2.step_count == 10
    rows2 = sim2.run(10, thermo_every=10, log=False)
    for ra, rb in zip(rows_ref, rows2):
        assert abs(ra["etotal"] - rb["etotal"]) \
            <= 1e-12 * abs(ra["etotal"]), (ra["etotal"], rb["etotal"])
