"""Checkpoint / resume (SURVEY.md §5.4).

The reference's checkpoint story is ``write_data`` -> ``read_data``
(examples/equilibrated_data.hexane is such a product).  Here the native
format is an .npz of the full simulation state pytree (positions,
velocities, image flags, thermostat chain, step counter); LAMMPS data-file
interop lives in io.data_reader.write_data.
"""
from __future__ import annotations

import json

import jax
import numpy as np


def save(path: str, sim) -> None:
    """Snapshot a Simulation (or CellPairSimulation via get_atoms)."""
    if hasattr(sim, "get_atoms"):  # cell-pair engine: slot -> atom order
        atoms = sim.get_atoms()
        x, v, image = atoms["x"], atoms["v"], atoms["image"]
        therm = np.zeros((2, 0))
    else:
        st = jax.device_get(sim.state)
        x, v, image, therm = st.x, st.v, st.image, st.therm
    np.savez_compressed(
        path,
        x=np.asarray(x, np.float64),
        v=np.asarray(v, np.float64),
        image=np.asarray(image, np.int32),
        therm=np.asarray(therm, np.float64),
        typ=sim.typ if hasattr(sim, "typ") else np.zeros(0),
        q=np.asarray(getattr(sim, "q", np.zeros(0)), np.float64),
        box_lo=np.asarray(sim.box.lo, np.float64),
        box_hi=np.asarray(sim.box.hi, np.float64),
        step_count=np.asarray(sim.step_count, np.int64),
        meta=np.frombuffer(
            json.dumps({"pair": sim.pair.cfg.name}).encode(), np.uint8
        ),
    )


def load(path: str) -> dict:
    """Load a checkpoint into plain numpy arrays (feed make_system +
    Simulation to resume; step_count restores the clock)."""
    z = np.load(path)
    out = {k: z[k] for k in z.files if k != "meta"}
    out["step_count"] = int(out["step_count"])
    if "meta" in z.files:
        out["meta"] = json.loads(bytes(z["meta"]).decode())
    return out


def resume(sim, ckpt: dict) -> None:
    """Restore dynamic state into an already-constructed Simulation."""
    import jax.numpy as jnp

    flt = sim.precision.flt
    st = sim.state
    therm = ckpt["therm"]
    if therm.shape[1] != st.therm.shape[1]:
        therm = np.zeros(np.asarray(st.therm).shape)
    sim.state = st._replace(
        x=jnp.asarray(ckpt["x"], flt),
        v=jnp.asarray(ckpt["v"], flt),
        image=jnp.asarray(ckpt["image"], jnp.int32),
        therm=jnp.asarray(therm, flt),
    )
    sim.state = sim._init_force_fn(sim.state)
    sim.step_count = ckpt["step_count"]
