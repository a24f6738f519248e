"""LAMMPS input-script front-end (io/lammps_input.py): the nine literal
reference scripts translate and the cheap ones run end-to-end."""
import numpy as np
import pytest

from lammps_buck_intel_tpu.io.lammps_input import (
    translate, is_lammps_input, TranslateError,
)

REF = "/root/reference/examples"


def test_all_reference_scripts_translate():
    expect = {
        "in.buck": ("buck", ["nve"], 100),
        "in.buck_big": ("buck", ["nve"], 1000),
        "in.buck_coul_cut": ("buck/coul/cut", ["nve"], 100),
        "in.buck_coul_long": ("buck/coul/long", ["nve"], 500),
        "in.spce": ("lj/cut/coul/long", ["shake", "nvt"], 100),
        "in.spce_if": ("lj/cut/coul/long", ["shake", "nvt"], 10000),
        "in.hexane": ("lj/long/coul/long", ["rigid/small"], 200),
        "in.hexane_if": ("lj/long/coul/long", ["rigid/small"], 10000),
        "in.rhodo": ("lj/charmm/coul/long", ["shake", "npt"], 100),
    }
    for deck, (pair, fixes, steps) in expect.items():
        cfg = translate(f"{REF}/{deck}")
        assert cfg["pair_style"]["name"] == pair, deck
        assert [f["name"] for f in cfg.get("fixes", [])] == fixes, deck
        assert cfg["run"] == steps, deck


def test_in_buck_details():
    cfg = translate(f"{REF}/in.buck")
    # variable x index 1 -> 20*$x = 20 lattice cells per axis
    assert cfg["lattice"] == {"style": "fcc", "density": 0.8442,
                              "nx": 20, "ny": 20, "nz": 20}
    assert cfg["pair_style"]["cut"] == 2.5
    assert cfg["pair_style"]["coeffs"]["1 1"] == [1.0, 0.2, -0.8]
    assert cfg["neighbor"] == {"skin": 0.3, "delay": 0, "every": 20,
                               "check": False}
    assert cfg["mass"] == [1.0]
    assert cfg["velocity"]["temp"] == 1.44


def test_in_spce_details():
    cfg = translate(f"{REF}/in.spce")
    ps = cfg["pair_style"]
    assert ps["cut"] == 6.8 and ps["cut_coul"] == 8.8
    # `pair_coeff * 2 0 0` wildcard expands over both types
    assert ps["coeffs"]["1 2"] == [0.0, 0.0]
    assert ps["coeffs"]["2 2"] == [0.0, 0.0]
    assert cfg["special_bonds"] == {"lj/coul": [0.0, 0.0, 0.5]}
    assert cfg["replicate"] == [4, 4, 4]
    shake = cfg["fixes"][0]
    assert shake["b"] == [1] and shake["a"] == [1]
    assert cfg["dump"]["style"] == "image"
    assert cfg["bond_style"]["coeffs"] == [[1000.0, 1.0]]
    assert cfg["angle_style"]["coeffs"] == [[100.0, 109.47]]


def test_in_rhodo_details():
    cfg = translate(f"{REF}/in.rhodo")
    assert cfg["pair_style"]["inner"] == 4.0
    assert cfg["pair_style"]["cut"] == 6.0
    npt = cfg["fixes"][1]
    assert npt["z"] == [0.0, 0.0, 1000.0]
    assert npt["mtk"] is False and npt["pchain"] == 0
    shake = cfg["fixes"][0]
    assert shake["m"] == [1.0] and shake["a"] == [232]
    assert cfg["special_bonds"] == "charmm"


def test_in_spce_if_region_delete():
    cfg = translate(f"{REF}/in.spce_if")
    assert cfg["delete_atoms"] == [{"region": "bigZ", "mol": True}]
    assert cfg["regions"]["bigZ"]["bounds"] == [0.0, 72.0, 72.0, 145.0,
                                                0.0, 36.0]


def test_is_lammps_input():
    assert is_lammps_input(f"{REF}/in.buck")
    assert not is_lammps_input("examples/decks/buck.yaml")


def test_unknown_command_raises(tmp_path):
    p = tmp_path / "in.bad"
    p.write_text("units lj\ncompute 1 all msd\n")
    with pytest.raises(TranslateError, match="compute"):
        translate(str(p))


def test_literal_in_buck_runs():
    """The literal reference script runs end-to-end (short)."""
    from lammps_buck_intel_tpu.run import run_deck

    cfg = translate(f"{REF}/in.buck")
    cfg["run"] = 10
    cfg["thermo"] = 5
    sim, rows = run_deck(cfg, log=False)
    assert sim.n_atoms == 32000
    for r in rows:
        assert np.isfinite(r["etotal"])
    e0 = rows[0]["etotal"]
    assert abs(rows[-1]["etotal"] - e0) / abs(e0) < 1e-3
