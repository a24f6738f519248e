"""Checkpoint / resume (SURVEY.md §5.4).

The reference's checkpoint story is ``write_data`` -> ``read_data``
(examples/equilibrated_data.hexane is such a product).  Here the native
format is an .npz of the full simulation state pytree (positions,
velocities, image flags, thermostat chain, step counter); LAMMPS data-file
interop lives in io.data_reader.write_data.

Both engines are covered: the neighbor-list ``Simulation`` checkpoints its
(N, 3) arrays directly; ``CellPairSimulation`` round-trips through atom
order (slots -> atoms at save, atoms -> fresh slot binning at resume) and
persists the Nose-Hoover chain, which lives in the slot state's global
``therm`` field.
"""
from __future__ import annotations

import json

import jax
import numpy as np


def save(path: str, sim) -> None:
    """Snapshot a Simulation (or CellPairSimulation via get_atoms)."""
    extra = {}
    if hasattr(sim, "get_atoms"):  # cell-pair engine: slot -> atom order
        atoms = sim.get_atoms()
        x, v, image = atoms["x"], atoms["v"], atoms["image"]
        typ, q = atoms["typ"], atoms["q"]
        therm = np.asarray(jax.device_get(sim.state.therm))
        # verbatim slot planes too: resuming into an identically-sized grid
        # restores the exact slot permutation -> bit-exact continuation
        st = jax.device_get(sim.state)
        extra = {f"slot_{k}": np.asarray(p)
                 for k, p in st._asdict().items()
                 if p is not None and not isinstance(p, tuple)}
        # rigid body state (BodyState) is NOT saved verbatim: resume
        # rebuilds it from atom x/v via the Kabsch fit (the established
        # rigid-checkpoint contract, see the slab rigid branch below)
        if hasattr(sim, "extras"):  # slab NPT: replicated barostat state
            ex = jax.device_get(sim.extras)
            extra.update(npt_boxL=np.asarray(ex.boxL, np.float64),
                         npt_omega_dot=np.asarray(ex.omega_dot,
                                                  np.float64),
                         npt_virial=np.asarray(ex.virial, np.float64),
                         npt_ptherm=np.asarray(ex.ptherm, np.float64))
    else:
        st = jax.device_get(sim.state)
        x, v, image, therm = st.x, st.v, st.image, st.therm
        typ = sim.typ if hasattr(sim, "typ") else np.zeros(0)
        q = np.asarray(getattr(sim, "q", np.zeros(0)), np.float64)
    np.savez_compressed(
        path,
        **extra,
        x=np.asarray(x, np.float64),
        v=np.asarray(v, np.float64),
        image=np.asarray(image, np.int32),
        therm=np.asarray(therm, np.float64),
        typ=np.asarray(typ),
        q=np.asarray(q, np.float64),
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
    """Restore dynamic state into an already-constructed simulation
    (any engine)."""
    import jax.numpy as jnp

    flt = sim.precision.flt
    from ..parallel.pencil2d import Pencil2DSimulation

    if isinstance(sim, Pencil2DSimulation):
        # device-major slot layout: verbatim planes when the geometry
        # matches (bit-exact continuation), else re-bin from atom order
        # through the engine's own device-major cid (the global
        # cell-major rebin of the slab branch would scramble blocks)
        import jax.numpy as jnp
        from ..neighbor import cell_slots as cs

        tchain = (sim.thermostat.tchain
                  if getattr(sim, "thermostat", None) is not None else 0)
        if ("slot_x" in ckpt
                and len(ckpt["slot_x"]) == sim.grid.nslots
                and ckpt["slot_therm"].shape
                == tuple(np.asarray(sim.state.therm).shape)):
            st = cs.SlotState(**{
                k: (jnp.asarray(ckpt[f"slot_{k}"])
                    if f"slot_{k}" in ckpt else None)
                for k in cs.SlotState._fields
            })
        else:
            st = sim._from_arrays(
                ckpt["x"], ckpt["v"], ckpt["image"],
                np.asarray(ckpt["typ"], np.int32), ckpt["q"], flt,
                tchain)
            st = st._replace(therm=jnp.asarray(ckpt["therm"], flt))
        sim.state = jax.device_put(st, sim._state_sharding)
        sim.state = sim._make_init_force_fn()(sim.state, sim._kc)
        sim.step_count = int(ckpt["step_count"])
        return

    if hasattr(sim, "mesh"):  # slab engines: restore + re-shard
        from ..core.box import make_box
        from ..neighbor import cell_slots as cs

        box_ck = make_box(ckpt["box_lo"], ckpt["box_hi"])
        tchain = (sim.thermostat.tchain
                  if getattr(sim, "thermostat", None) is not None else 0)
        if ("slot_x" in ckpt
                and len(ckpt["slot_x"]) == sim.grid.nslots
                and ckpt["slot_therm"].shape
                == tuple(np.asarray(sim.state.therm).shape)):
            # same grid geometry: verbatim slot planes -> the exact slot
            # permutation, bit-exact continuation (cellpair contract)
            st = cs.SlotState(**{
                k: (jnp.asarray(ckpt[f"slot_{k}"])
                    if f"slot_{k}" in ckpt else None)
                for k in cs.SlotState._fields
            })
        else:                 # geometry changed: re-bin from atom order
            st = cs.from_atoms(
                sim.grid, box_ck, ckpt["x"], ckpt["v"], ckpt["image"],
                np.asarray(ckpt["typ"], np.int32), ckpt["q"], dtype=flt,
                tchain=tchain)
            therm = ckpt["therm"]
            if therm.shape != tuple(np.asarray(st.therm).shape):
                therm = np.zeros(np.asarray(st.therm).shape)
            st = st._replace(therm=jnp.asarray(therm, flt))
        sim.state = jax.device_put(st, sim._state_sharding)
        if hasattr(sim, "extras"):   # SlabNPTSimulation
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(sim.mesh, P())
            ex = sim.extras._replace(
                boxL=jnp.asarray(ckpt["npt_boxL"], flt),
                omega_dot=jnp.asarray(ckpt["npt_omega_dot"], flt),
                virial=jnp.asarray(ckpt["npt_virial"],
                                   sim.precision.acc),
                ptherm=(jnp.asarray(ckpt["npt_ptherm"], flt)
                        if "npt_ptherm" in ckpt
                        else jnp.zeros((2, sim.npt.pchain), flt)))
            sim.extras = jax.tree.map(
                lambda a: jax.device_put(a, rep), ex)
            sim._shrink_guard(np.asarray(ckpt["npt_boxL"], np.float64))
            sim.state, sim.extras = sim._make_npt_init_fn()(
                sim.state, sim.extras)
        else:
            if getattr(sim, "rigid", None) is not None:
                # slab rigid: body state derives positions — rebuild it
                # (Kabsch) exactly like the cell-pair branch below
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..integrate.rigid import (
                    body_state_from_atoms, atom_positions,
                    atom_velocities,
                )

                bs = body_state_from_atoms(
                    sim.rigid, np.asarray(ckpt["x"]),
                    np.asarray(ckpt["v"]), box_ck.lengths, dtype=flt)
                xa, d = atom_positions(sim.rigid, bs)
                va = atom_velocities(sim.rigid, bs, d)
                st2 = cs.from_atoms(
                    sim.grid, box_ck, np.asarray(xa), np.asarray(va),
                    np.asarray(ckpt["image"], np.int32),
                    np.asarray(ckpt["typ"], np.int32), ckpt["q"],
                    dtype=flt, tchain=tchain)
                st2 = st2._replace(therm=st.therm)
                sim.state = jax.device_put(st2, sim._state_sharding)
                rep = NamedSharding(sim.mesh, P())
                sim.body = jax.tree.map(
                    lambda a: jax.device_put(a, rep), bs)
            sim.state = sim._make_init_force_fn()(sim.state, sim._kc)
        sim.step_count = ckpt["step_count"]
        return
    if hasattr(sim, "npt"):   # NPTSimulation: full NPTState round-trip
        from ..integrate.npt import NPTState

        casts = dict(image=jnp.int32, overflow=bool,
                     virial=sim.precision.acc)
        fields = {
            f: jnp.asarray(ckpt[f"slot_{f}"], casts.get(f, flt))
            for f in NPTState._fields if f"slot_{f}" in ckpt
        }
        if "ptherm" not in fields:   # pre-pchain checkpoint
            fields["ptherm"] = jnp.zeros((2, sim.npt.pchain), flt)
        if getattr(sim, "rigid", None) is not None:
            from ..integrate.rigid import body_state_from_atoms

            fields["body"] = body_state_from_atoms(
                sim.rigid, np.asarray(ckpt["slot_x"]),
                np.asarray(ckpt["slot_v"]),
                np.asarray(ckpt["slot_boxL"], np.float64), dtype=flt)
        st = NPTState(**fields)
        sim.state = jax.jit(sim._init_forces)(st)
        sim.step_count = ckpt["step_count"]
        return
    if hasattr(sim, "grid"):  # cell-pair engine
        from ..neighbor import cell_slots as cs

        if ("slot_x" in ckpt
                and len(ckpt["slot_x"]) == sim.grid.nslots
                and ckpt["slot_therm"].shape
                == tuple(np.asarray(sim.state.therm).shape)):
            # same grid geometry: restore slot planes verbatim (bit-exact)
            st = cs.SlotState(**{
                k: jnp.asarray(ckpt[f"slot_{k}"])
                for k in cs.SlotState._fields if f"slot_{k}" in ckpt
            })
            if st.comp is None and sim.state.comp is not None:
                # resumed from a plain-precision checkpoint into a
                # compensated sim: residuals restart at zero
                st = st._replace(comp=jnp.zeros_like(sim.state.comp))
        else:  # geometry changed: re-bin from atom order
            atoms = sim.get_atoms()  # current typ/q in atom order
            typ = ckpt["typ"] if len(ckpt.get("typ", ())) else atoms["typ"]
            q = ckpt["q"] if len(ckpt.get("q", ())) else atoms["q"]
            st = cs.from_atoms(
                sim.grid, sim.box, ckpt["x"], ckpt["v"], ckpt["image"],
                np.asarray(typ, np.int32), q, dtype=flt,
                tchain=sim._tchain,
                compensated=sim.state.comp is not None,
            )
            therm = ckpt["therm"]
            if therm.shape != tuple(np.asarray(st.therm).shape):
                therm = np.zeros(np.asarray(st.therm).shape)
            st = st._replace(therm=jnp.asarray(therm, flt))
        if getattr(sim, "rigid", None) is not None:
            # cell-pair rigid: positions/velocities DERIVE from sim.body,
            # so the body state must be rebuilt from the checkpoint too
            # (Kabsch), else the first block reverts to the stale build-
            # time bodies.  Re-bin from the manifold-projected atoms.
            from ..integrate.rigid import (
                body_state_from_atoms, atom_positions, atom_velocities,
            )

            atoms = cs.to_atoms(sim.grid, st)
            bs = body_state_from_atoms(
                sim.rigid, np.asarray(atoms["x"]), np.asarray(atoms["v"]),
                sim.box.lengths, dtype=flt)
            xa, d = atom_positions(sim.rigid, bs)
            va = atom_velocities(sim.rigid, bs, d)
            st2 = cs.from_atoms(
                sim.grid, sim.box, np.asarray(xa), np.asarray(va),
                np.asarray(atoms["image"], np.int32),
                np.asarray(atoms["typ"], np.int32), atoms["q"],
                dtype=flt, tchain=sim._tchain)
            st = st2._replace(therm=st.therm)
            sim.body = bs
        sim.state = sim._init_force_fn()(st)
    else:
        st = sim.state
        therm = ckpt["therm"]
        if therm.shape[1] != st.therm.shape[1]:
            therm = np.zeros(np.asarray(st.therm).shape)
        sim.state = st._replace(
            x=jnp.asarray(ckpt["x"], flt),
            v=jnp.asarray(ckpt["v"], flt),
            image=jnp.asarray(ckpt["image"], jnp.int32),
            therm=jnp.asarray(therm, flt),
            # compensation planes restart at zero for the restored x/v
            cx=None if st.cx is None else jnp.zeros_like(st.cx),
            cv=None if st.cv is None else jnp.zeros_like(st.cv),
        )
        if getattr(sim, "rigid", None) is not None:
            # rebuild body state (Kabsch) and re-derive atom arrays so the
            # state is exactly on the rigid manifold
            from ..integrate.rigid import (
                body_state_from_atoms, atom_positions, atom_velocities,
            )

            bs = body_state_from_atoms(sim.rigid, ckpt["x"], ckpt["v"],
                                       sim.box, dtype=flt)
            xa, d = atom_positions(sim.rigid, bs)
            va = atom_velocities(sim.rigid, bs, d)
            sim.state = sim.state._replace(
                x=xa.astype(flt), v=va.astype(flt), body=bs)
        sim.state = sim._init_force_fn(sim.state)
    sim.step_count = ckpt["step_count"]
