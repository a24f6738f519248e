import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box, make_system, get_units, double
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_buck
from lammps_buck_intel_tpu.integrate import Simulation, NeighborPolicy, make_nve
from lammps_buck_intel_tpu.neighbor import make_spec, build
from lammps_buck_intel_tpu.parallel import (
    make_mesh, make_spmd_step, ShardedState, pad_to_multiple,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spmd_step_matches_single_device():
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 4, 4, 4)  # 256 atoms
    n = len(xs)
    v0 = velocity.create(n, 1.44, 87287, np.ones(n), u)
    dtype = jnp.float64
    box = make_box(lo, hi, dtype=dtype)
    style = build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5,
                       dtype=dtype)

    # single-device reference: 10 steps without rebuild
    system = make_system(xs, box, v=v0, mass=np.ones(1), dtype=dtype)
    sim = Simulation(system, style, units=u, precision=double(),
                     neighbor=NeighborPolicy(skin=0.3, every=1000, delay=0,
                                             check=False))
    sim.run(10, log=False)
    x_ref = np.asarray(sim.state.x)

    # sharded: same initial state, same neighbor list, 10 spmd steps
    mesh = make_mesh(8)
    spec = make_spec(n, np.asarray(hi - lo), 2.8)
    nl = build(jnp.asarray(xs, dtype), box, spec)
    typ = jnp.zeros(n, jnp.int32)
    q = jnp.zeros(n, dtype)
    nve = make_nve(u.dt, u.ftm2v, np.ones(n), dtype=dtype)
    step = make_spmd_step(style, nve, box, mesh, eflag=True,
                          acc_dtype=dtype)
    # initial force
    from lammps_buck_intel_tpu.models.pair import compute_pair

    f0 = compute_pair(style, jnp.asarray(xs, dtype), typ, q, box, nl,
                      acc_dtype=dtype).f
    state = ShardedState(jnp.asarray(xs, dtype), jnp.asarray(v0, dtype), f0)
    energies = None
    for _ in range(10):
        state, energies = step(state, typ, q, nve.mass_inv, nl.idx, nl.sb)
    np.testing.assert_allclose(np.asarray(state.x), x_ref, rtol=1e-12,
                               atol=1e-12)
    # energy replicated scalar is finite and matches the single-device run
    row = sim.thermo()
    np.testing.assert_allclose(float(energies["evdwl"]), row["evdwl"],
                               rtol=1e-10)


def test_pad_to_multiple():
    arr = np.ones((10, 3))
    p, n = pad_to_multiple(arr, 8)
    assert p.shape == (16, 3) and n == 10
    p2, n2 = pad_to_multiple(np.ones((16, 3)), 8)
    assert p2.shape == (16, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spmd_step_with_ewald_matches_single_device():
    """Sharded k-space: partial structure factors + psum == replicated."""
    from lammps_buck_intel_tpu.models.kspace import setup_ewald
    from lammps_buck_intel_tpu.models.pair import compute_pair

    u = get_units("metal")
    rng = np.random.RandomState(0)
    n = 256
    L = 12.0
    x0 = rng.uniform(0, L, (n, 3))
    q0 = rng.uniform(-1, 1, n)
    q0 -= q0.mean()
    dtype = jnp.float64
    box = make_box([0, 0, 0], [L] * 3)
    style = build_buck(
        1, {(0, 0): (1000.0, 0.3, 10.0)}, cut_global=4.0, coul="long",
        qqrd2e=u.qqrd2e, dtype=dtype,
    )
    ew = setup_ewald(box, q0, cutoff=4.0, accuracy_rel=1e-6,
                     qqrd2e=u.qqrd2e, acc_dtype=dtype)
    style = style.replace(g_ewald=ew.g_ewald)
    spec = make_spec(n, [L] * 3, 4.3)
    x = jnp.asarray(x0, dtype)
    q = jnp.asarray(q0, dtype)
    typ = jnp.zeros(n, jnp.int32)
    nl = build(x, box, spec)
    nve = make_nve(u.dt, u.ftm2v, np.ones(n) * 28.0, dtype=dtype)

    # single-device reference: 5 manual velocity-verlet steps
    from lammps_buck_intel_tpu.integrate import (
        initial_integrate, final_integrate,
    )

    f0 = compute_pair(style, x, typ, q, box, nl, acc_dtype=dtype).f \
        + ew.compute(x, q).f
    xs, vs, fs = x, jnp.zeros_like(x), f0
    for _ in range(5):
        xs, vs = initial_integrate(nve, xs, vs, fs)
        fr = compute_pair(style, xs, typ, q, box, nl, acc_dtype=dtype).f \
            + ew.compute(xs, q).f
        vs = final_integrate(nve, vs, fr)
        fs = fr

    mesh = make_mesh(8)
    step = make_spmd_step(style, nve, box, mesh, eflag=True,
                          acc_dtype=dtype, ewald=ew)
    state = ShardedState(x, jnp.zeros_like(x), f0)
    for _ in range(5):
        state, energies = step(state, typ, q, nve.mass_inv, nl.idx, nl.sb)
    # psum reduction order differs from the single-device sum: ~1e-8 rel
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(xs),
                               rtol=1e-7, atol=1e-9)
    assert np.isfinite(float(energies["elong"]))
