"""Per-atom computes: ``compute pe/atom`` / ``compute stress/atom``.

The host-LAMMPS compute surface over the reference fork's per-atom
tallies (SURVEY.md §5.5): the ``/intel`` pair styles accumulate per-atom
energy/virial under eflag_atom/vflag_atom (pair_buck_intel.cpp:303-322),
and PPPM interpolates per-atom mesh shares plus self/background
corrections (pppm_intel.cpp:224-252, pppm_disp_intel.cpp:512-537).
This module assembles those solver-level per-atom paths into the two
computes every reference deck could name, working on any engine whose
snapshot fits one host: nlist ``Simulation``, ``CellPairSimulation``,
``NPTSimulation``, and the slab-mesh engines (atoms are gathered at
analysis cadence; the Coulomb/dispersion pencils re-solve per-atom
shares from the same baked tables).

Host-driven at analysis cadence — exactly where host LAMMPS evaluates
computes (only at output steps) — so nothing here touches the hot jitted
loop.  A fresh padded neighbor list is built from the snapshot (cheap at
dump cadence; the production list lives in slot layout on the cell-pair
engine and is not atom-addressable).

Scope (the ``compute pe/atom pair kspace`` keyword semantics):

- ``pair``   — half of every pair term to each participant, including
  special-bond scaled terms, the same-molecule exclusion the engine
  applies (fix rigid / neigh_modify exclude molecule/intra), and the
  CHARMM 1-4 pair terms (tallied through Pair in host LAMMPS).
- ``kspace`` — Coulomb PPPM and dispersion PPPM per-atom shares, pinned
  exactly to the global sums (sum eatom == elong).
- ``bond`` / ``angle`` / ``dihedral`` / ``improper`` — bonded terms by
  the ev_tally equal-division convention (each term's energy/virial
  split evenly among its participants; sums pin to the thermo emol
  ledger over the engine's ACTIVE bonded table).
- ``ke``     — (stress only) the m v⊗v kinetic term
  (compute_stress_atom.cpp contract).

The default scope is ALL of the above (the LAMMPS default).  Still
global-only (documented): SHAKE/rigid constraint virials — thermo
pressure carries them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PAIR_KSPACE = ("pair", "kspace")
_BONDED_KEYS = ("bond", "angle", "dihedral", "improper")


def _snapshot(sim):
    """Atom-ordered (x, v, typ, q, box, mass_per_atom) off any engine."""
    if hasattr(sim, "get_atoms"):
        a = sim.get_atoms()
        x, v = np.asarray(a["x"]), np.asarray(a["v"])
        typ = np.asarray(a.get("typ", getattr(sim, "typ", None)), np.int32)
        q = a.get("q")
        if q is None:
            q = getattr(sim, "q")
        q = np.asarray(q)
    else:
        st = jax.device_get(sim.state)
        x, v = np.asarray(st.x), np.asarray(st.v)
        typ = np.asarray(sim.typ, np.int32)
        q = np.asarray(sim.q)
    box = sim.current_box if hasattr(sim, "current_box") else sim.box
    if hasattr(sim, "mass_per_atom"):
        m = np.asarray(sim.mass_per_atom, np.float64)
    elif hasattr(sim, "_mass_col"):  # NPT engine: (N, 1) column
        m = np.asarray(sim._mass_col, np.float64)[:, 0]
    else:  # cell-pair engines: per-type 1/m
        m = (1.0 / np.asarray(sim._minv_per_type, np.float64))[typ]
    return x, v, typ, q, box, m


def _specials(sim):
    si = getattr(sim, "special_idx", None)
    if si is None:
        si = getattr(sim, "_special_idx", None)
        sc = getattr(sim, "_special_code", None)
        if si is not None:
            # cell-pair engines pad a sentinel row; trim to n
            si = si[: sim.n_atoms]
            sc = sc[: sim.n_atoms]
    else:
        sc = getattr(sim, "special_code", None)
    return si, sc


def _excl_mol(sim):
    if hasattr(sim, "_excl_mol"):  # cell-pair: padded, None = no exclusion
        em = sim._excl_mol
        return None if em is None else np.asarray(em[: sim.n_atoms])
    m = getattr(sim, "_mol", None)  # nlist/NPT: set only when excluding
    return None if m is None else np.asarray(m, np.int32)


def _pair_peratom(sim, x, typ, q, box):
    from .models.pair.driver import compute_pair_peratom
    from .neighbor import neighbor_list as nlmod

    style = sim.pair
    n = x.shape[0]
    cut = float(np.sqrt(style.cutsq_max))
    si, sc = _specials(sim)
    mol = _excl_mol(sim)
    pw = (np.asarray(box.perp_widths, np.float64)
          if getattr(box, "is_triclinic", False) else None)
    spec = nlmod.make_spec(n, np.asarray(box.lengths, np.float64),
                           cut * 1.0001, perp_widths=pw)
    xj = jnp.asarray(x, np.float32)
    nl, spec = nlmod.build_with_retry(
        xj, box, spec,
        None if si is None else jnp.asarray(si),
        None if sc is None else jnp.asarray(sc),
        None if mol is None else jnp.asarray(mol))
    return compute_pair_peratom(
        style, xj, jnp.asarray(typ), jnp.asarray(q, np.float32), box, nl,
        use_special=si is not None and si.shape[1] > 0)


def _kspace_peratom(sim, x, typ, q, n):
    """Dispatch per-atom kspace over every solver the runner binds."""
    from .models.kspace.base import BoundKSpace, CombinedKSpace
    from .models.kspace.pppm import PPPM, compute_peratom
    from .models.kspace.pppm_cells import CellPPPM, CellPPPMDisp
    from .models.kspace.pppm_disp import PPPMDisp
    from .models.kspace.pppm_slab import (
        SlabCellPPPM, SlabCellPPPMDisp, SlabCombinedKSpace,
    )

    ks = sim.kspace
    xj = jnp.asarray(x, np.float32)
    qj = jnp.asarray(q, np.float32)

    def one(s):
        if isinstance(s, PPPM):
            return compute_peratom(s, xj, qj)
        if isinstance(s, SlabCellPPPMDisp):  # before the SlabCellPPPM base
            return s.pm.compute_peratom(xj, typ=jnp.asarray(typ))
        if isinstance(s, CellPPPMDisp):  # before the CellPPPM base
            # production dispersion tables (g6/grid/order); geometric
            # single channel — b per atom from the baked per-type table
            # (b follows xj's dtype: a double deck keeps f64 charges)
            b = np.asarray(s.b_per_type, np.float64)[np.asarray(typ)]
            return s.pmd.compute_peratom(
                xj, b_per_atom=jnp.asarray(b, xj.dtype))
        if isinstance(s, (CellPPPM, SlabCellPPPM)):
            # same solver tables (grid/g_ewald/order) the production
            # patch/pencil pipelines bake — only the transfer differs
            return compute_peratom(s.pm, xj, qj)
        if isinstance(s, BoundKSpace):
            if s.typed:
                return s.solver.compute_peratom(xj, typ=jnp.asarray(typ))
            return s.solver.compute_peratom(
                xj, b_per_atom=jnp.asarray(s.per_atom, np.float32))
        if isinstance(s, PPPMDisp):
            raise TypeError("unbound PPPMDisp (runner always wraps in "
                            "BoundKSpace)")
        from .models.kspace.ewald import Ewald, ewald_compute_peratom
        from .models.kspace.pppm_slab import ShardedEwald

        if isinstance(s, Ewald):
            return ewald_compute_peratom(s, xj, qj)
        if isinstance(s, ShardedEwald):
            return ewald_compute_peratom(s.ew, xj, qj)
        from .models.kspace.pppm_npt import TracedPPPM

        if isinstance(s, TracedPPPM):
            # NPT deck: the solver's tables are traced functions of the
            # box; per-atom analysis rebuilds the box-baked PPPM at the
            # CURRENT box (grid/order/g_ewald pinned — the same
            # setup-on-box-change contract the traced step follows)
            from .models.kspace import setup_pppm

            pm0 = s.pm
            box_now = (sim.current_box if hasattr(sim, "current_box")
                       else sim.box)
            pm2 = setup_pppm(
                box_now, np.asarray(q, np.float64), cutoff=1.0,
                accuracy_rel=1e-4, qqrd2e=pm0.qqrd2e, grid=pm0.grid,
                g_ewald=pm0.g_ewald, order=pm0.order, diff=pm0.diff,
                slab=pm0.slab, acc_dtype=pm0.acc_dtype)
            return compute_peratom(pm2, xj, qj)
        raise NotImplementedError(
            f"per-atom kspace for {type(s).__name__} (the traced "
            "dispersion NPT solvers have no per-atom path)")

    if ks is None:
        z = jnp.zeros((n,), np.float64)
        return z, jnp.zeros((n, 6), np.float64)
    solvers = (ks.solvers
               if isinstance(ks, (CombinedKSpace, SlabCombinedKSpace))
               else [ks])
    eat = vat = None
    for s in solvers:
        e, v = one(s)
        eat = e if eat is None else eat + e
        vat = v if vat is None else vat + v
    return eat, vat


def _check_scope(sim, scope):
    bad = [s for s in scope
           if s not in _PAIR_KSPACE and s not in _BONDED_KEYS]
    if bad:
        raise NotImplementedError(
            f"per-atom scope {bad}: supported contributions are "
            f"{list(_PAIR_KSPACE) + list(_BONDED_KEYS)} (SHAKE/rigid "
            "constraint virials remain global-only)")


def _bonded_peratom(sim, x, box, include):
    """Per-atom bonded tallies over the engine's ACTIVE bonded table
    (post-shake-strip, matching the thermo emol ledger).  The 1-4 pair
    terms ride the PAIR channel (dihedral_charmm.cpp tallies them
    through Pair::ev_tally), so they return separately."""
    from .models.bonded import compute_bonded_peratom

    bonded = getattr(sim, "bonded", None)
    n = x.shape[0]
    if bonded is None or not bonded.has_terms:
        z = jnp.zeros((n,), np.float64)
        return z, jnp.zeros((n, 6), np.float64), z, \
            jnp.zeros((n, 6), np.float64)
    return compute_bonded_peratom(
        bonded, jnp.asarray(x, np.float64), box,
        acc_dtype=np.float64, include=include)


_DEFAULT = _PAIR_KSPACE + _BONDED_KEYS


def _cached(cache, key, fn):
    """Frame-level memo: pe_atom and stress_atom discard half of each
    (eatom, vatom) solver result — a shared per-frame cache runs the
    expensive pair + kspace per-atom passes ONCE when a dump requests
    both computes (advisor r3)."""
    if cache is None:
        return fn()
    if key not in cache:
        cache[key] = fn()
    return cache[key]


def pe_atom(sim, scope=_DEFAULT, cache=None) -> np.ndarray:
    """``compute pe/atom`` (compute_pe_atom.cpp contract): per-atom
    potential energy over the requested contributions.  Pins to thermo:
    sum == epair (+ elong) on pair/kspace decks."""
    _check_scope(sim, scope)
    x, _v, typ, q, box, _m = _snapshot(sim)
    n = x.shape[0]
    e = jnp.zeros((n,), np.float64)
    if "pair" in scope:
        ep, _ = _cached(cache, "pair",
                        lambda: _pair_peratom(sim, x, typ, q, box))
        e = e + ep.astype(np.float64)
    if "kspace" in scope and sim.kspace is not None:
        ek, _ = _cached(cache, "kspace",
                        lambda: _kspace_peratom(sim, x, typ, q, n))
        e = e + ek.astype(np.float64)
    inc = tuple(k for k in _BONDED_KEYS if k in scope)
    if inc:
        eb, _, eb14, _ = _cached(
            cache, ("bonded", inc),
            lambda: _bonded_peratom(sim, x, box, inc))
        e = e + eb.astype(np.float64)
        if "pair" in scope:
            # 1-4 pair terms belong to the pair ledger (they add into
            # thermo evdwl/ecoul, run.py compute_bonded wiring)
            e = e + eb14.astype(np.float64)
    return np.asarray(jax.device_get(e))


def stress_atom(sim, scope=_DEFAULT, include_ke: bool = True,
                cache=None) -> np.ndarray:
    """``compute stress/atom`` (compute_stress_atom.cpp contract):
    per-atom stress in pressure*volume units,
    S_i = -(mvv2e * m v⊗v + W_i) * nktv2p, so the global identity
    press == -trace(sum S_i) / (3 V) holds against thermo on
    unconstrained pair/kspace decks."""
    _check_scope(sim, scope)
    x, v, typ, q, box, m = _snapshot(sim)
    n = x.shape[0]
    u = sim.units
    w = jnp.zeros((n, 6), np.float64)
    if "pair" in scope:
        _, vp = _cached(cache, "pair",
                        lambda: _pair_peratom(sim, x, typ, q, box))
        w = w + vp.astype(np.float64)
    if "kspace" in scope and sim.kspace is not None:
        _, vk = _cached(cache, "kspace",
                        lambda: _kspace_peratom(sim, x, typ, q, n))
        w = w + vk.astype(np.float64)
    inc = tuple(k for k in _BONDED_KEYS if k in scope)
    if inc:
        _, vb, _, vb14 = _cached(
            cache, ("bonded", inc),
            lambda: _bonded_peratom(sim, x, box, inc))
        w = w + vb.astype(np.float64)
        if "pair" in scope:
            w = w + vb14.astype(np.float64)
    if include_ke:
        vv = jnp.asarray(v, np.float64)
        mc = jnp.asarray(m * u.mvv2e, np.float64)
        ke6 = jnp.stack([
            mc * vv[:, 0] * vv[:, 0], mc * vv[:, 1] * vv[:, 1],
            mc * vv[:, 2] * vv[:, 2], mc * vv[:, 0] * vv[:, 1],
            mc * vv[:, 0] * vv[:, 2], mc * vv[:, 1] * vv[:, 2],
        ], axis=-1)
        w = w + ke6
    return np.asarray(jax.device_get(-w * u.nktv2p))


# ---- deck surface -------------------------------------------------------

_COMPUTES = {"pe/atom": pe_atom, "stress/atom": stress_atom}


def evaluate(sim, name: str, scope=None, cache=None):
    """Evaluate a named compute on the current frame.  ``scope`` is the
    optional LAMMPS keyword list (e.g. ["pair", "kspace"]); ``cache`` an
    optional per-frame dict sharing the pair/kspace per-atom passes
    between computes (see _cached)."""
    fn = _COMPUTES.get(name)
    if fn is None:
        raise NotImplementedError(
            f"compute {name!r}: only {sorted(_COMPUTES)} implemented")
    return fn(sim, tuple(scope) if scope else _DEFAULT, cache=cache)
