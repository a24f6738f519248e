"""Quaternion rigid-body integrator tests (``fix rigid/small``,
integrate/rigid.py) — torque-free mechanics, rigidity, conservation, and
the literal hexane deck on the quaternion path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double,
)
from lammps_buck_intel_tpu.io import read_data
from lammps_buck_intel_tpu.integrate import (
    Simulation, NeighborPolicy, NVTConfig, make_rigid_bodies,
)
from lammps_buck_intel_tpu.integrate.rigid import (
    BodyState, init_body_state, atom_positions, atom_velocities,
    initial_integrate_rigid, final_integrate_rigid, rotational_ke,
    body_state_from_atoms, quat_rotate, quat_rotate_inv,
)
from lammps_buck_intel_tpu.models.pair import build_lj, build_buck


def _asym_body():
    """One 4-atom asymmetric rigid body (distinct principal moments)."""
    x = np.array([[0.0, 0, 0], [1.5, 0, 0], [0, 1.0, 0], [0, 0, 0.6]])
    x += 5.0
    mol = np.zeros(4, np.int32)
    mass = np.array([1.0, 2.0, 3.0, 4.0])
    rb = make_rigid_bodies(x, mol, mass, [20.0] * 3)
    return rb, x, mass


def test_quat_rotate_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v = rng.normal(size=(7, 3))
    out = quat_rotate_inv(jnp.asarray(q), quat_rotate(jnp.asarray(q),
                                                      jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-12)


def test_build_reconstructs_geometry():
    rb, x, mass = _asym_body()
    bs = init_body_state(rb, np.zeros((4, 3)))
    xa, _ = atom_positions(rb, bs)
    np.testing.assert_allclose(np.asarray(xa), x, atol=1e-10)
    assert rb.n_constraints == 3 * 4 - 6


def test_torque_free_tumbling():
    """Free asymmetric top: |L| and rotational KE exactly conserved; the
    body frame tumbles (Dzhanibekov-style) but rigidity holds to f64."""
    rb, x, mass = _asym_body()
    bs = init_body_state(rb, np.zeros((4, 3)))
    bs = bs._replace(L=jnp.asarray([[0.3, 2.0, 0.01]]))  # near mid axis
    dt = 0.01
    zeros = jnp.zeros((4, 3))

    def step(bs, _):
        _, d = atom_positions(rb, bs)
        bs = initial_integrate_rigid(rb, bs, zeros, d, dt, 0.5 * dt)
        _, d2 = atom_positions(rb, bs)
        bs = final_integrate_rigid(rb, bs, zeros, d2, 0.5 * dt)
        return bs, (jnp.linalg.norm(bs.L), rotational_ke(rb, bs))

    bs2, (lmag, ke) = jax.lax.scan(step, bs, None, length=4000)
    lmag = np.asarray(lmag)
    ke = np.asarray(ke)
    np.testing.assert_allclose(lmag, lmag[0], rtol=1e-12)   # exact (kicks=0)
    np.testing.assert_allclose(ke, ke[0], rtol=1e-6)        # midpoint drift
    # rigidity: interatomic distances unchanged
    xa, _ = atom_positions(rb, bs2)
    xa = np.asarray(xa)
    d0 = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    d1 = np.linalg.norm(xa[:, None] - xa[None, :], axis=-1)
    np.testing.assert_allclose(d1, d0, atol=1e-9)
    # it actually tumbled
    assert float(jnp.abs(bs2.q[0, 0]) - 1.0) < 0.999


def _dimer_sim(thermostat=None, dt=0.002):
    """Two rigid triatomic ions (buck + coul/cut) — interacting bodies."""
    u = get_units("lj")
    x = np.array([
        [3.0, 3.0, 3.0], [4.0, 3.0, 3.0], [3.0, 4.2, 3.0],     # body 0
        [6.5, 3.5, 3.2], [7.5, 3.5, 3.2], [6.5, 4.7, 3.2],     # body 1
    ])
    mol = np.array([0, 0, 0, 1, 1, 1], np.int32)
    typ = np.array([0, 1, 1, 0, 1, 1], np.int32)
    q = np.array([-0.8, 0.4, 0.4, -0.8, 0.4, 0.4])
    mass = np.array([16.0, 1.0])
    box = make_box([0] * 3, [12.0] * 3, dtype=jnp.float64)
    v0 = np.array([[0.05, 0, 0]] * 3 + [[-0.05, 0.01, 0]] * 3)
    rb = make_rigid_bodies(x, mol, mass[typ], box.lengths)
    style = build_buck(
        2, {(0, 0): (2000.0, 0.3, 1.0), (0, 1): (1500.0, 0.3, 0.5),
            (1, 1): (1000.0, 0.3, 0.2)},
        cut_global=5.5, coul="cut", dtype=jnp.float64, qqrd2e=1.0,
    )
    system = make_system(x, box, type=typ, v=v0, q=q, molecule=mol,
                         mass=mass, dtype=jnp.float64)
    sim = Simulation(system, style, units=u, precision=double(), dt=dt,
                     rigid=rb, exclude_intra=True, dense=True,
                     thermostat=thermostat,
                     neighbor=NeighborPolicy(skin=1.0, every=5, delay=0,
                                             check=False))
    return sim, rb


def test_rigid_dimer_conservation():
    sim, rb = _dimer_sim()
    rows = sim.run(2000, thermo_every=400, log=False)
    e = [r["etotal"] for r in rows]
    # etotal excludes rotational KE? no: temp/ke come from atom velocities
    # which include rotation — conserved total = ke + epair
    drift = max(abs(v - e[0]) for v in e)
    assert drift < 5e-6, e
    # rigidity over 2000 steps
    xa = np.asarray(sim.state.x)
    for b, sl in ((0, slice(0, 3)), (1, slice(3, 6))):
        xb = xa[sl]
        assert abs(np.linalg.norm(xb[1] - xb[0]) - 1.0) < 1e-8
        assert abs(np.linalg.norm(xb[2] - xb[0]) - 1.2) < 1e-8


def test_rigid_dof_and_temperature():
    sim, rb = _dimer_sim()
    rows = sim.run(10, thermo_every=10, log=False)
    # 2 bodies x 6 dof - 3 com = 9 thermal dof; n_constraints = 18-12 = 6
    assert rb.n_constraints == 6
    assert np.isfinite(rows[-1]["temp"])


def test_rigid_with_nvt():
    sim, rb = _dimer_sim(
        thermostat=NVTConfig(t_start=0.3, t_stop=0.3, t_damp=0.2))
    rows = sim.run(3000, thermo_every=1000, log=False)
    temps = [r["temp"] for r in rows[1:]]
    assert all(np.isfinite(t) for t in temps)
    # thermostat couples to both translation and rotation
    assert 0.1 < np.mean(temps[-2:]) < 0.6, temps


def test_body_state_from_atoms_roundtrip():
    sim, rb = _dimer_sim()
    sim.run(50, log=False)
    st = jax.device_get(sim.state)
    bs2 = body_state_from_atoms(rb, st.x, st.v, sim.box.lengths)
    xa, d = atom_positions(rb, bs2)
    va = atom_velocities(rb, bs2, d)
    np.testing.assert_allclose(np.asarray(xa), st.x, atol=1e-9)
    np.testing.assert_allclose(np.asarray(va), st.v, atol=1e-9)


def test_rigid_hexane_quaternion(reference_dir):
    """The literal in.hexane rigid path on the quaternion integrator at
    dt=2fs — conservation without any constraint iterations."""
    from lammps_buck_intel_tpu.models.kspace import (
        setup_pppm_disp, solve_g6, BoundKSpace,
    )

    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/equilibrated_data.hexane")
    box = make_box(d.box_lo, d.box_hi)
    EPS = (0.1744742, 0.1147228)
    SIG = (3.97, 3.97)
    CUT = 9.8
    g6 = solve_g6(CUT, 1e-4)
    style = build_lj(
        2, {0: (EPS[0], SIG[0]), 1: (EPS[1], SIG[1])},
        cut_global=CUT, coul="none", disp="long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    B = np.asarray([np.sqrt(4.0 * e) * s**3 for e, s in zip(EPS, SIG)])
    pm = setup_pppm_disp(box, B, d.type, cutoff=CUT, g_ewald_6=g6,
                         acc_dtype=jnp.float64)
    rb = make_rigid_bodies(d.x, d.molecule, d.mass[d.type], box.lengths)
    assert rb.nbody == 1000
    assert rb.n_constraints == 12 * 1000
    system = make_system(d.x, box, type=d.type, v=d.v, image=d.image,
                         mass=d.mass, molecule=d.molecule,
                         dtype=jnp.float64)
    sim = Simulation(
        system, style, kspace=BoundKSpace(pm, B[d.type]), units=u,
        precision=double(), dt=2.0, rigid=rb, kmax=384,
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
        exclude_intra=True,
    )
    rows = sim.run(10, thermo_every=5, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 2e-4, f"quaternion hexane drift {drift}"
    # rigidity: first molecule's bond pattern preserved exactly
    xa = np.asarray(sim.state.x)
    idx = np.nonzero(rb.body_of == 0)[0]
    r01 = np.linalg.norm(xa[idx[1]] - xa[idx[0]])
    x0 = np.asarray(d.x)
    r01_0 = np.linalg.norm(x0[idx[1]] - x0[idx[0]])
    assert abs(r01 - r01_0) < 1e-6


def test_rigid_constraint_virial_pressure_fd():
    """Static (v=0) rigid-dimer pressure equals the f64 finite difference
    -dU/dV where the dilation moves body COMs affinely and keeps each
    body rigid — the fix_rigid constraint-virial contract (VERDICT r2
    missing #5).  Without constraint_virial() the atomic virial would
    report -dU/dV of an all-atom affine scaling, which is wrong for
    rigid molecules."""
    from lammps_buck_intel_tpu.integrate.rigid import init_body_state

    u = get_units("lj")
    x = np.array([
        [3.0, 3.0, 3.0], [4.0, 3.0, 3.0], [3.0, 4.2, 3.0],
        [6.5, 3.5, 3.2], [7.5, 3.5, 3.2], [6.5, 4.7, 3.2],
    ])
    mol = np.array([0, 0, 0, 1, 1, 1], np.int32)
    typ = np.array([0, 1, 1, 0, 1, 1], np.int32)
    q = np.array([-0.8, 0.4, 0.4, -0.8, 0.4, 0.4])
    mass = np.array([16.0, 1.0])
    L = 12.0

    def build(s):
        """Simulation with box and COMs scaled by s, bodies rigid."""
        rb0 = make_rigid_bodies(x, mol, mass[typ], [L] * 3)
        bs0 = init_body_state(rb0, np.zeros((6, 3)))
        X = np.asarray(bs0.X)            # (2, 3) COMs
        xs = x + (s - 1.0) * X[rb0.body_of]
        box = make_box([0] * 3, [L * s] * 3, dtype=jnp.float64)
        rb = make_rigid_bodies(xs, mol, mass[typ], box.lengths)
        style = build_buck(
            2, {(0, 0): (2000.0, 0.3, 1.0), (0, 1): (1500.0, 0.3, 0.5),
                (1, 1): (1000.0, 0.3, 0.2)},
            cut_global=5.5, coul="cut", dtype=jnp.float64, qqrd2e=1.0,
        )
        system = make_system(xs, box, type=typ, v=np.zeros((6, 3)), q=q,
                             molecule=mol, mass=mass, dtype=jnp.float64)
        return Simulation(system, style, units=u, precision=double(),
                          dt=0.002, rigid=rb, exclude_intra=True,
                          dense=True,
                          neighbor=NeighborPolicy(skin=1.0, every=5,
                                                  delay=0, check=False))

    press = build(1.0).thermo()["press"]
    h = 1e-4
    up = build(1.0 + h).thermo()
    dn = build(1.0 - h).thermo()
    U_up, U_dn = up["etotal"], dn["etotal"]
    dV = ((1 + h) ** 3 - (1 - h) ** 3) * L**3
    p_fd = -(U_up - U_dn) / dV  # lj units: nktv2p = 1
    assert abs(press - p_fd) < 1e-6 * max(abs(p_fd), 1.0), (press, p_fd)


def _rigid_melt(n_side=3):
    """Lattice of rigid triatomic ions big enough for the cell grid."""
    u = get_units("lj")
    base = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.2, 0]])
    rng = np.random.default_rng(11)
    xs, mols = [], []
    m = 0
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                org = np.array([2.0 + 4.0 * i, 2.0 + 4.0 * j,
                                2.0 + 4.0 * k])
                xs.append(base + org + rng.uniform(-0.05, 0.05, 3))
                mols += [m] * 3
                m += 1
    x = np.concatenate(xs)
    mol = np.asarray(mols, np.int32)
    nm = m
    typ = np.tile(np.array([0, 1, 1], np.int32), nm)
    q = np.tile(np.array([-0.8, 0.4, 0.4]), nm)
    mass = np.array([16.0, 1.0])
    box = make_box([0] * 3, [4.0 * n_side] * 3, dtype=jnp.float64)
    v0 = rng.normal(scale=0.05, size=(3 * nm, 3))
    rb = make_rigid_bodies(x, mol, mass[typ], box.lengths)
    style = build_buck(
        2, {(0, 0): (2000.0, 0.3, 1.0), (0, 1): (1500.0, 0.3, 0.5),
            (1, 1): (1000.0, 0.3, 0.2)},
        cut_global=3.0, coul="cut", dtype=jnp.float64, qqrd2e=1.0,
    )
    system = make_system(x, box, type=typ, v=v0, q=q, molecule=mol,
                         mass=mass, dtype=jnp.float64)
    return system, style, rb, u


def test_rigid_cellpair_matches_nlist():
    """fix rigid/small on the production cell-pair engine == the nlist
    engine (f64): same quaternion dynamics, same mol-excluded pair
    forces, same constraint-virial pressure."""
    from lammps_buck_intel_tpu.integrate import CellPairSimulation

    kw = dict(dt=0.002, neighbor=NeighborPolicy(skin=0.5, every=5,
                                                delay=0, check=False))
    fields = ("temp", "evdwl", "ecoul", "etotal", "press")

    system, style, rb, u = _rigid_melt()
    ref = Simulation(system, style, units=u, precision=double(),
                     rigid=rb, exclude_intra=True, **kw)
    system, style, rb, u = _rigid_melt()
    cp = CellPairSimulation(system, style, units=u, precision=double(),
                            rigid=rb, **kw)
    for label, engines in (("step0", (ref, cp)),):
        a, b = [e.thermo() for e in engines]
        for f in fields:
            scale = max(abs(a[f]), 1.0)
            assert abs(a[f] - b[f]) <= 1e-9 * scale, (label, f, a[f], b[f])
    ref.run(25, log=False)
    cp.run(25, log=False)
    a, b = ref.thermo(), cp.thermo()
    for f in fields:
        scale = max(abs(a[f]), 1.0)
        assert abs(a[f] - b[f]) <= 1e-7 * scale, (f, a[f], b[f])


def test_rigid_cellpair_nvt_conserves_rigidity():
    """Cell-pair rigid + NVT: finite dynamics, bodies stay rigid through
    rebins, thermostat couples to rotation."""
    from lammps_buck_intel_tpu.integrate import CellPairSimulation

    system, style, rb, u = _rigid_melt()
    sim = CellPairSimulation(
        system, style, units=u, precision=double(), dt=0.002, rigid=rb,
        thermostat=NVTConfig(t_start=0.3, t_stop=0.3, t_damp=0.2),
        neighbor=NeighborPolicy(skin=0.5, every=5, delay=0, check=False))
    rows = sim.run(400, thermo_every=100, log=False)
    assert all(np.isfinite(r["temp"]) for r in rows)
    atoms = sim.get_atoms()
    xa = np.asarray(atoms["x"])
    Lb = np.asarray(sim.box.lengths)
    for b in range(rb.nbody):
        idx = np.nonzero(rb.body_of == b)[0]
        d01 = xa[idx[1]] - xa[idx[0]]
        d01 -= np.round(d01 / Lb) * Lb
        d02 = xa[idx[2]] - xa[idx[0]]
        d02 -= np.round(d02 / Lb) * Lb
        assert abs(np.linalg.norm(d01) - 1.0) < 1e-8
        assert abs(np.linalg.norm(d02) - 1.2) < 1e-8


def test_rigid_cellpair_checkpoint_resume():
    """Resume on the cell-pair rigid engine rebuilds the BODY state from
    the checkpoint (Kabsch) — without it the first block would revert to
    the stale build-time bodies.  Kabsch reconstruction is exact to
    ~1e-10 in f64 (not bit-exact; same contract as the nlist engine)."""
    import os
    import tempfile

    from lammps_buck_intel_tpu.integrate import CellPairSimulation
    from lammps_buck_intel_tpu.utils import checkpoint

    kw = dict(dt=0.002, neighbor=NeighborPolicy(skin=0.5, every=5,
                                                delay=0, check=False))

    def build():
        system, style, rb, u = _rigid_melt()
        return CellPairSimulation(system, style, units=u,
                                  precision=double(), rigid=rb, **kw)

    simA = build()
    simA.run(10, log=False)
    simA.run(10, log=False)

    simB = build()
    simB.run(10, log=False)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ck.npz")
        checkpoint.save(p, simB)
        ck = checkpoint.load(p)
        simC = build()
        checkpoint.resume(simC, ck)
        assert simC.step_count == 10
        simC.run(10, log=False)

    xa = simA.get_atoms()["x"]
    xc = simC.get_atoms()["x"]
    np.testing.assert_allclose(xc, xa, rtol=0, atol=1e-8)


def test_rigid_cellpair_pppm_boundary_crossing():
    """Rigid + coulomb cell-patch PPPM with a body CROSSING the periodic
    boundary: derived positions must stay continuous with the binned
    planes (per-slot wrap offsets), else the fold-free patch spline
    weights silently drop the crossing body's charges (review finding
    r3) and image flags double-count.  Gate: cellpair+CellPPPM matches
    nlist+generic-PPPM through the crossing, and image flags stay in
    {-1, 0, 1}."""
    from lammps_buck_intel_tpu.models.kspace import setup_pppm, CellPPPM
    from lammps_buck_intel_tpu.integrate import CellPairSimulation

    u = get_units("lj")
    base = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.2, 0]])
    rng = np.random.default_rng(11)
    xs, mols = [], []
    m = 0
    for i in range(3):
        for j in range(3):
            for k in range(3):
                if (i, j, k) == (2, 0, 0):
                    continue     # vacate the racer's lane near the face
                org = np.array([2.0 + 4.0 * i, 2.0 + 4.0 * j,
                                2.0 + 4.0 * k])
                xs.append(base + org + rng.uniform(-0.05, 0.05, 3))
                mols += [m] * 3
                m += 1
    x = np.concatenate(xs)
    # park molecule 0 against the +x face in the vacated lane, moving
    # outward: it crosses at ~step 133 and coasts into its own vacated
    # (0,0,0) site — free flight, no Buckingham-core collision
    x[0:3, 0] += (11.2 - x[0, 0])
    mol = np.asarray(mols, np.int32)
    typ = np.tile(np.array([0, 1, 1], np.int32), m)
    q = np.tile(np.array([-0.8, 0.4, 0.4]), m)
    mass = np.array([16.0, 1.0])
    box = make_box([0] * 3, [12.0] * 3, dtype=jnp.float64)
    v0 = rng.normal(scale=0.02, size=(3 * m, 3))
    # crosses +x at ~step 67 and flies into its OWN vacated lattice site
    # (free flight — no Buckingham-core collision on the far side)
    v0[0:3] = [3.0, 0.0, 0.0]
    rb = make_rigid_bodies(x, mol, mass[typ], box.lengths)
    style = build_buck(
        2, {(0, 0): (2000.0, 0.3, 1.0), (0, 1): (1500.0, 0.3, 0.5),
            (1, 1): (1000.0, 0.3, 0.2)},
        cut_global=3.0, coul="long", cut_coul=3.0, dtype=jnp.float64,
        qqrd2e=1.0,
    )
    pm = setup_pppm(box, q, cutoff=3.0, accuracy_rel=1e-4, qqrd2e=1.0,
                    grid=(18, 18, 18), order=5, acc_dtype=jnp.float64)
    style = style.replace(g_ewald=pm.g_ewald)

    def mksys():
        return make_system(x, box, type=typ, v=v0, q=q, molecule=mol,
                           mass=mass, dtype=jnp.float64)

    kw = dict(units=u, precision=double(), dt=0.002,
              neighbor=NeighborPolicy(skin=0.5, every=5, delay=0,
                                      check=False))
    ref = Simulation(mksys(), style, rigid=rb, exclude_intra=True,
                     kspace=pm, **kw)
    cp = CellPairSimulation(mksys(), style, rigid=rb, kspace=None, **kw)
    cp.kspace = CellPPPM(pm, cp.grid, skin=0.5)
    cp.state = cp._init_force_fn()(cp.state)

    ref.run(170, log=False)   # molecule 0 crosses the +x boundary
    cp.run(170, log=False)
    ra, rc = ref.thermo(), cp.thermo()
    for f in ("temp", "evdwl", "ecoul", "elong", "etotal"):
        scale = max(abs(ra[f]), 1.0)
        assert abs(ra[f] - rc[f]) <= 1e-6 * scale, (f, ra[f], rc[f])
    atoms = cp.get_atoms()
    # one crossing -> image flag exactly 1 for molecule 0, and NOT > 1
    assert np.all(np.abs(atoms["image"]) <= 1), atoms["image"].max()
    assert np.all(atoms["image"][0:3, 0] == 1), atoms["image"][0:3]
    # unwrapped positions continuous with the nlist engine's unwrapped x
    import jax as _jax
    xr = np.asarray(_jax.device_get(ref.state.x))
    L = np.asarray(box.lengths)
    xu = atoms["x"] + atoms["image"] * L
    np.testing.assert_allclose(xu, xr, rtol=0, atol=1e-6)


def _dimer_sim_tilted(tilt, dt=0.002, wrap_straddler=False):
    """The _dimer_sim system on a TILTED box (fix rigid/small triclinic,
    VERDICT r4 missing #3)."""
    u = get_units("lj")
    x = np.array([
        [3.0, 3.0, 3.0], [4.0, 3.0, 3.0], [3.0, 4.2, 3.0],     # body 0
        [6.5, 3.5, 3.2], [7.5, 3.5, 3.2], [6.5, 4.7, 3.2],     # body 1
    ])
    mol = np.array([0, 0, 0, 1, 1, 1], np.int32)
    typ = np.array([0, 1, 1, 0, 1, 1], np.int32)
    q = np.array([-0.8, 0.4, 0.4, -0.8, 0.4, 0.4])
    mass = np.array([16.0, 1.0])
    # 16^3 box: half the min perp width clears cut+skin even tilted
    box = make_box([0] * 3, [16.0] * 3, tilt=tilt, dtype=jnp.float64)
    if wrap_straddler and tilt is not None:
        # body 1's last atom wrapped across the y-hi face: displaced by
        # the tilted B vector (xy, Ly, 0) — assembly must min-image it
        B = np.array([tilt[0], 16.0, 0.0])
        x[5] = x[5] + B
    v0 = np.array([[0.05, 0, 0]] * 3 + [[-0.05, 0.01, 0]] * 3)
    rb = make_rigid_bodies(x, mol, mass[typ], box)
    style = build_buck(
        2, {(0, 0): (2000.0, 0.3, 1.0), (0, 1): (1500.0, 0.3, 0.5),
            (1, 1): (1000.0, 0.3, 0.2)},
        cut_global=5.5, coul="cut", dtype=jnp.float64, qqrd2e=1.0,
    )
    system = make_system(x, box, type=typ, v=v0, q=q, molecule=mol,
                         mass=mass, dtype=jnp.float64)
    sim = Simulation(system, style, units=u, precision=double(), dt=dt,
                     rigid=rb, exclude_intra=True, dense=True,
                     neighbor=NeighborPolicy(skin=1.0, every=5, delay=0,
                                             check=False))
    return sim, rb


def test_rigid_triclinic_near_ortho_limit():
    """fix rigid/small on a tilted box: tilt -> 0 reproduces the
    orthogonal quaternion path exactly."""
    simT, _ = _dimer_sim_tilted([1e-12, -1e-12, 1e-12])
    assert simT.box.is_triclinic
    simO, _ = _dimer_sim_tilted(None)  # same cut, orthogonal box
    assert not simO.box.is_triclinic
    rowsT = simT.run(400, thermo_every=200, log=False)
    rowsO = simO.run(400, thermo_every=200, log=False)
    for rt, ro in zip(rowsT, rowsO):
        for key in ("temp", "etotal", "epair"):
            a, b = float(rt[key]), float(ro[key])
            assert abs(a - b) <= 1e-8 * max(abs(a), abs(b), 1.0), \
                (key, a, b)


def test_rigid_triclinic_conservation_and_straddler():
    """Real tilt + a body wrapped across the tilted face: assembly
    min-images through the box vectors, energy conserves, rigidity
    holds over 1500 steps."""
    tilt = [1.5, -1.0, 1.2]
    sim, rb = _dimer_sim_tilted(tilt, wrap_straddler=True)
    # straddler reassembled: bond lengths exact at build
    bs0 = sim.state.body
    xa0, _ = atom_positions(rb, bs0)
    xa0 = np.asarray(xa0)
    assert abs(np.linalg.norm(xa0[4] - xa0[3]) - 1.0) < 1e-9
    assert abs(np.linalg.norm(xa0[5] - xa0[3]) - 1.2) < 1e-9
    rows = sim.run(1500, thermo_every=300, log=False)
    e = [r["etotal"] for r in rows]
    drift = max(abs(v - e[0]) for v in e)
    assert drift < 5e-6, e
    xa = np.asarray(sim.state.x)
    for b, sl in ((0, slice(0, 3)), (1, slice(3, 6))):
        xb = xa[sl]
        assert abs(np.linalg.norm(xb[1] - xb[0]) - 1.0) < 1e-8
        assert abs(np.linalg.norm(xb[2] - xb[0]) - 1.2) < 1e-8
