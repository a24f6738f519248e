"""Hexane deck physics (examples/in.hexane): lj/long/coul/long long off 9.8
+ pppm/disp 1e-4, real units, uncharged united-atom hexane.

The deck holds molecules together with fix rigid/small (quaternion path
covered in tests/test_rigid.py); here we run unconstrained NVE — a direct
conservation test of the long-range-dispersion force field alone.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box, make_system, get_units, double
from lammps_buck_intel_tpu.io import read_data, velocity
from lammps_buck_intel_tpu.models.pair import build_lj
from lammps_buck_intel_tpu.models.kspace import (
    setup_pppm_disp, solve_g6, BoundKSpace,
)
from lammps_buck_intel_tpu.integrate import Simulation, NeighborPolicy

EPS = (0.1744742, 0.1147228)   # in.hexane:19-20 (CH3, CH2)
SIG = (3.97, 3.97)
CUT = 9.8


def test_hexane_nve_conservation(reference_dir):
    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/equilibrated_data.hexane")
    n = d.n_atoms
    box = make_box(d.box_lo, d.box_hi)
    g6 = solve_g6(CUT, 1e-4)
    style = build_lj(
        2, {0: (EPS[0], SIG[0]), 1: (EPS[1], SIG[1])},
        cut_global=CUT, coul="none", disp="long",
        name="lj/long/coul/long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    B = np.sqrt(4.0 * np.asarray(EPS)) * np.asarray(SIG) ** 3
    pm = setup_pppm_disp(box, B, d.type, cutoff=CUT, g_ewald_6=g6,
                         acc_dtype=jnp.float64)
    kspace = BoundKSpace(pm, B[d.type])
    system = make_system(d.x, box, type=d.type, v=d.v, image=d.image,
                         mass=d.mass, molecule=d.molecule, dtype=jnp.float64)
    # the deck's fix rigid/small makes intramolecular LJ a constant;
    # pending rigid bodies we exclude intra pairs (neigh_modify
    # exclude molecule/intra semantics) and integrate free beads.
    sim = Simulation(
        system, style, kspace=kspace, units=u, precision=double(), dt=1.0,
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
        exclude_intra=True,
    )
    rows = sim.run(15, thermo_every=5, log=False)
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 5e-4, f"hexane drift {drift}"
    # dispersion kspace term must be active and attractive overall
    assert rows[0]["elong"] != 0.0
    assert rows[0]["epair"] < 0


def test_hexane_deck_cell_dispersion_engine(reference_dir):
    """The hexane deck binds the cell-patch dispersion pipeline
    (CellPPPMDisp) on the production engine, with step-0 thermo parity
    vs the generic channel pipeline (nlist engine)."""
    import copy
    import yaml

    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.models.kspace.pppm_cells import CellPPPMDisp

    with open(f"{reference_dir}/../repo/examples/decks/hexane.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["run"] = 0
    sim = build_simulation(copy.deepcopy(cfg))
    assert isinstance(sim.kspace, CellPPPMDisp), type(sim.kspace)
    row = sim.thermo()

    cfg2 = copy.deepcopy(cfg)
    cfg2["engine"] = "nlist"
    sim2 = build_simulation(cfg2)
    row2 = sim2.thermo()
    for k in ("epair", "elong", "etotal"):
        assert abs(row[k] - row2[k]) <= 2e-5 * max(1.0, abs(row2[k])), (
            k, row[k], row2[k])
