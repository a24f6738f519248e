"""Checkpoint/resume on the slab engines (multi-chip NVT + NPT).

Same-grid resumes restore the slot planes verbatim (bit-exact
continuation, the cellpair contract); the slab NPT resume also restores
the replicated barostat state (boxL, omega_dot, virial).
"""
import copy
import os
import tempfile

import numpy as np
import pytest

from lammps_buck_intel_tpu.run import build_simulation
from lammps_buck_intel_tpu.utils import checkpoint
from lammps_buck_intel_tpu.parallel import (
    SlabCellPairSimulation, SlabNPTSimulation,
)


def _base(npt=False):
    cfg = {
        "units": "lj", "precision": "double", "engine": "slab",
        "devices": 8,
        "lattice": {"style": "fcc", "density": 0.8442, "nx": 16,
                    "ny": 6, "nz": 6},
        "pair_style": {"name": "lj/cut", "cut": 2.5,
                       "coeffs": {"1 1": [1.0, 1.0]}},
        "velocity": {"temp": 1.44, "seed": 87287},
        "neighbor": {"skin": 0.3, "every": 5, "check": False},
        "timestep": 0.004,
        "thermo": 0,
    }
    if npt:
        cfg["fixes"] = [{"name": "npt", "t_start": 1.0, "t_damp": 0.5,
                         "tchain": 3, "iso": [0.5, 0.5, 5.0]}]
    else:
        cfg["fixes"] = [{"name": "nvt", "t_start": 1.0, "t_damp": 0.5,
                         "tchain": 3}]
    return cfg


def test_slab_checkpoint_resume_bitexact():
    base = _base()
    simA = build_simulation(copy.deepcopy(base))
    assert isinstance(simA, SlabCellPairSimulation)
    simA.run(10, log=False)
    simA.run(20, log=False)

    simB = build_simulation(copy.deepcopy(base))
    simB.run(10, log=False)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ck.npz")
        checkpoint.save(p, simB)
        ck = checkpoint.load(p)
        simC = build_simulation(copy.deepcopy(base))
        checkpoint.resume(simC, ck)
        assert simC.step_count == 10
        simC.run(20, log=False)
    xa = simA.get_atoms()["x"]
    xc = simC.get_atoms()["x"]
    np.testing.assert_allclose(xc, xa, rtol=0, atol=1e-12)


def test_slab_npt_checkpoint_resume():
    base = _base(npt=True)
    simA = build_simulation(copy.deepcopy(base))
    assert isinstance(simA, SlabNPTSimulation)
    simA.run(10, log=False)
    simA.run(20, log=False)

    simB = build_simulation(copy.deepcopy(base))
    simB.run(10, log=False)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ck.npz")
        checkpoint.save(p, simB)
        ck = checkpoint.load(p)
        assert "npt_boxL" in ck and "npt_omega_dot" in ck
        simC = build_simulation(copy.deepcopy(base))
        checkpoint.resume(simC, ck)
        assert simC.step_count == 10
        # barostat state restored, not reset
        np.testing.assert_allclose(
            np.asarray(simC.extras.omega_dot), ck["npt_omega_dot"],
            rtol=0, atol=0)
        simC.run(20, log=False)
    import jax

    La = np.asarray(jax.device_get(simA.extras.boxL))
    Lc = np.asarray(jax.device_get(simC.extras.boxL))
    np.testing.assert_allclose(Lc, La, rtol=0, atol=1e-12)
    xa = simA.get_atoms()["x"]
    xc = simC.get_atoms()["x"]
    np.testing.assert_allclose(xc, xa, rtol=0, atol=1e-10)
