"""Long-horizon parity gates over the recorded golden traces.

The goldens in tests/goldens/long_*.json are thermo traces of the literal
reference decks at the reference's own run lengths, recorded on real
hardware by tools/record_goldens.py.  These tests gate on them WITHOUT
re-running the decks (a 1000-step 192k-atom run is a hardware job, not a
unit test): they are the drift contract the recorded engine satisfied,
and they fail loudly if a physics change invalidates a trace without
re-recording.
"""
import glob
import json
import os

import numpy as np
import pytest

GOLD = glob.glob(os.path.join(os.path.dirname(__file__), "goldens",
                              "long_*.json"))


@pytest.mark.parametrize("path", GOLD or ["<missing>"])
def test_long_horizon_golden(path):
    if path == "<missing>":
        pytest.skip("no long-horizon goldens recorded yet "
                    "(run tools/record_goldens.py on the TPU)")
    with open(path) as f:
        g = json.load(f)
    rows = g["rows"]
    assert len(rows) >= 2
    assert rows[-1]["step"] == g["steps"]
    for r in rows:
        for k, v in r.items():
            assert np.isfinite(v), (path, r)
    if g["conserved"]:
        assert g["drift_gate"] is not None
        assert g["drift_per_atom"] <= g["drift_gate"], (
            f"{g['deck']}: etotal drift {g['drift_per_atom']:.3e}/atom "
            f"exceeds the gate {g['drift_gate']:.1e}")
    else:
        # thermostatted decks: temperature must stay physical
        temps = [r["temp"] for r in rows[1:]]
        assert max(temps) < 5000.0 and min(temps) > 0.0
