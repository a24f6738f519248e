"""Slab engine at production scale: the 259,200-atom north-star silica
deck (buck/coul/long + PPPM, NVE) on the 8-virtual-device mesh vs the
single-device cell-pair engine — the round-1 'done' criterion
(VERDICT r2 next-round #2).

Costs ~30 CPU-minutes at this scale, so it is gated behind RUN_SLOW=1;
the recorded result of the last run lives in tests/goldens/
slab_scale_259k.json and is checked cheaply by test_slab_scale_recorded.
"""
import json
import os

import numpy as np
import pytest
import yaml

DECKS = os.path.join(os.path.dirname(__file__), "..", "examples", "decks")
RECORD = os.path.join(os.path.dirname(__file__), "goldens",
                      "slab_scale_259k.json")

# thermo fields compared between the engines and their relative
# tolerances (f64).  Step 0 is tight: identical inputs, only reduction
# order differs.  Stepped rows compare to SOLVER accuracy, not bit
# noise: the slab PPPM mesh must tile the device axis (ny % D == 0), so
# the two engines run slightly different k-space meshes — both within
# the deck's 1e-4 accuracy target, diverging measurably after dynamics
# (measured: temp rel 2.5e-8 after 4 steps).  A broken halo/migration
# shows up at >= 1e-2 immediately.
FIELDS = {"temp": 1e-9, "evdwl": 1e-8, "ecoul": 1e-8, "elong": 1e-6,
          "press": 1e-6, "etotal": 1e-8}
FIELDS_STEPPED = {"temp": 1e-6, "evdwl": 1e-6, "ecoul": 1e-6,
                  "elong": 1e-4, "press": 1e-4, "etotal": 1e-6}


def _cfg():
    with open(os.path.join(DECKS, "silica_pppm.yaml")) as f:
        cfg = yaml.safe_load(f)
    for k in ("dump", "write_data", "write_restart", "run", "thermo"):
        cfg.pop(k, None)
    cfg["precision"] = "double"
    return cfg


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="259k-atom x 2 engines: set RUN_SLOW=1")
def test_slab_silica_259k_matches_single_device(reference_dir):
    import jax
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation

    assert len(jax.devices()) >= 8
    steps = 4

    cfg = _cfg()
    ref_sim = build_simulation(cfg)
    ref_rows = [ref_sim.thermo()]
    ref_sim.run(steps, log=False)
    ref_rows.append(ref_sim.thermo())

    cfg2 = _cfg()
    cfg2["engine"] = "slab"
    cfg2["devices"] = 8
    slab_sim = build_simulation(cfg2)
    assert isinstance(slab_sim, SlabCellPairSimulation)
    assert slab_sim.D == 8
    rows = [slab_sim.thermo()]
    slab_sim.run(steps, log=False)
    rows.append(slab_sim.thermo())

    out = {"n_atoms": int(ref_sim.n_atoms), "steps": steps, "rows": []}
    for i, (r_ref, r_slab) in enumerate(zip(ref_rows, rows)):
        rec = {}
        tols = FIELDS if i == 0 else FIELDS_STEPPED
        for key, rtol in tols.items():
            a, b = float(r_ref[key]), float(r_slab[key])
            scale = max(abs(a), 1.0)
            assert abs(a - b) <= rtol * scale, (i, key, a, b)
            rec[key] = {"single": a, "slab8": b,
                        "rel": abs(a - b) / scale}
        out["rows"].append(rec)
    with open(RECORD, "w") as f:
        json.dump(out, f, indent=1)


def test_slab_scale_recorded():
    """Cheap gate on the recorded 259k parity artifact: every field met
    its tolerance when last run (re-run with RUN_SLOW=1 after slab or
    engine changes)."""
    if not os.path.exists(RECORD):
        pytest.skip("no recorded slab-scale run yet (RUN_SLOW=1)")
    with open(RECORD) as f:
        rec = json.load(f)
    assert rec["n_atoms"] == 259200
    for i, row in enumerate(rec["rows"]):
        tols = FIELDS if i == 0 else FIELDS_STEPPED
        for key, rtol in tols.items():
            assert row[key]["rel"] <= rtol, (i, key, row[key])


# elong/etotal compare to SOLVER accuracy (the slab pencil mesh must
# tile the device axis, so the k-meshes differ; measured step-0 elong
# rel 1.1e-6 on 72k atoms); real-space fields stay reduction-tight.
SPCE_FIELDS = {"temp": 1e-8, "evdwl": 1e-8, "ecoul": 1e-8, "elong": 1e-5,
               "emol": 1e-6, "etotal": 1e-5}
# stepped rows: 4 steps of dt=2fs constrained water amplify reduction-
# order noise through the stiff H-bond network + SHAKE feedback far
# faster than the silica melt (measured temp rel 7e-6 after 4 steps vs
# 2.5e-8 at 259k atomic).  Step 0 is the halo/migration-correctness
# gate; the stepped window just has to catch structural breakage
# (a lost plane shows up at >= 1e-2 immediately).
SPCE_FIELDS_STEPPED = {"temp": 1e-4, "evdwl": 1e-4, "ecoul": 1e-4,
                       "elong": 1e-4, "emol": 1e-4, "etotal": 1e-5}
SPCE_RECORD = os.path.join(os.path.dirname(__file__), "goldens",
                           "slab_spce_multichip.json")


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="72k-atom x 2 engines: set RUN_SLOW=1")
def test_slab_spce_shake_multichip(reference_dir):
    """The in.spce fix set (SHAKE + NVT + PPPM + special bonds) at
    production scale on the 8-virtual-device slab mesh vs single-device —
    VERDICT r2 item 3's done-criterion."""
    import jax
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation

    assert len(jax.devices()) >= 8

    def cfg():
        with open(os.path.join(DECKS, "spce.yaml")) as f:
            c = yaml.safe_load(f)
        for k in ("dump", "write_data", "write_restart", "run", "thermo"):
            c.pop(k, None)
        c["precision"] = "double"
        c["replicate"] = [4, 2, 2]     # 72,000 atoms; ncx 12 -> 8 planes
        return c

    ref_sim = build_simulation(cfg())
    r_ref = ref_sim.thermo()

    c2 = cfg()
    c2["engine"] = "slab"
    c2["devices"] = 8
    slab_sim = build_simulation(c2)
    assert isinstance(slab_sim, SlabCellPairSimulation)
    assert slab_sim.shake is not None and slab_sim.bonded is None
    r_slab = slab_sim.thermo()

    out = {"n_atoms": int(ref_sim.n_atoms), "rows": []}
    rec = {}
    for key, rtol in SPCE_FIELDS.items():
        a, b = float(r_ref[key]), float(r_slab[key])
        scale = max(abs(a), 1.0)
        assert abs(a - b) <= rtol * scale, (key, a, b)
        rec[key] = {"single": a, "slab8": b, "rel": abs(a - b) / scale}
    out["rows"].append(rec)

    # a few steps of real dynamics through rebins + SHAKE + NH chain
    steps = 4
    ref_sim.run(steps, log=False)
    slab_sim.run(steps, log=False)
    r_ref = ref_sim.thermo()
    r_slab = slab_sim.thermo()
    rec = {}
    for key, rtol in SPCE_FIELDS_STEPPED.items():
        a, b = float(r_ref[key]), float(r_slab[key])
        scale = max(abs(a), 1.0)
        assert abs(a - b) <= rtol * scale, (key, a, b)
        rec[key] = {"single": a, "slab8": b, "rel": abs(a - b) / scale}
    out["rows"].append(rec)
    out["steps"] = steps
    with open(SPCE_RECORD, "w") as f:
        json.dump(out, f, indent=1)


def test_slab_spce_recorded():
    """Cheap gate on the recorded spce multichip parity artifact."""
    if not os.path.exists(SPCE_RECORD):
        pytest.skip("no recorded spce multichip run yet (RUN_SLOW=1)")
    with open(SPCE_RECORD) as f:
        rec = json.load(f)
    assert rec["n_atoms"] == 72000
    for i, row in enumerate(rec["rows"]):
        tols = SPCE_FIELDS if i == 0 else SPCE_FIELDS_STEPPED
        for key, rtol in tols.items():
            assert row[key]["rel"] <= rtol, (key, row[key])


PENCIL_RECORD = os.path.join(os.path.dirname(__file__), "goldens",
                             "pencil2d_scale_259k.json")


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="259k-atom x 2 engines: set RUN_SLOW=1")
def test_pencil2d_silica_259k_matches_single_device(reference_dir):
    """The north-star deck on the 2-D (4, 2) pencil mesh — atom blocks
    AND the 2-D pencil PPPM — vs the single-device engine (the pod-scale
    decomposition at production scale)."""
    import jax
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.parallel import Pencil2DSimulation

    assert len(jax.devices()) >= 8
    steps = 4

    cfg = _cfg()
    ref_sim = build_simulation(cfg)
    ref_rows = [ref_sim.thermo()]
    ref_sim.run(steps, log=False)
    ref_rows.append(ref_sim.thermo())

    cfg2 = _cfg()
    cfg2["devices_2d"] = [4, 2]
    p_sim = build_simulation(cfg2)
    assert isinstance(p_sim, Pencil2DSimulation)
    assert (p_sim.Dx, p_sim.Dy) == (4, 2)
    rows = [p_sim.thermo()]
    p_sim.run(steps, log=False)
    rows.append(p_sim.thermo())

    out = {"n_atoms": int(ref_sim.n_atoms), "steps": steps,
           "dims": [4, 2], "rows": []}
    # press/etotal compare at SOLVER accuracy: the pencil mesh must
    # tile the device grid (ny % lcm(ncy, Dx)), so the k-meshes differ
    # within the deck's 1e-4 accuracy target — measured step-0 press rel
    # 1.5e-6 and etotal rel 8.3e-8 (the same ~0.63-unit elong delta);
    # real-space fields stay reduction-tight, a broken halo >= 1e-2
    p_fields = dict(FIELDS, press=1e-5, etotal=1e-7)
    for i, (r_ref, r_p) in enumerate(zip(ref_rows, rows)):
        rec = {}
        tols = p_fields if i == 0 else FIELDS_STEPPED
        for key, rtol in tols.items():
            a, b = float(r_ref[key]), float(r_p[key])
            scale = max(abs(a), 1.0)
            assert abs(a - b) <= rtol * scale, (i, key, a, b)
            rec[key] = {"single": a, "pencil4x2": b,
                        "rel": abs(a - b) / scale}
        out["rows"].append(rec)
    with open(PENCIL_RECORD, "w") as f:
        json.dump(out, f, indent=1)


def test_pencil2d_scale_recorded():
    """Cheap gate on the recorded 259k 2-D pencil parity artifact."""
    if not os.path.exists(PENCIL_RECORD):
        pytest.skip("no recorded pencil2d-scale run yet (RUN_SLOW=1)")
    with open(PENCIL_RECORD) as f:
        rec = json.load(f)
    assert rec["n_atoms"] == 259200
    p_fields = dict(FIELDS, press=1e-5, etotal=1e-7)
    for i, row in enumerate(rec["rows"]):
        tols = p_fields if i == 0 else FIELDS_STEPPED
        for key, rtol in tols.items():
            assert row[key]["rel"] <= rtol, (i, key, row[key])
