"""Cell-pair engine runner — production TPU path.

Same L5 role as integrate/verlet.py but over the sorted slot layout
(neighbor/cell_slots.py) with the dense cell-pair force kernel
(models/pair/cellpair.py).  Rebinning replaces neighbor-list rebuilds;
everything between thermo fetches is a single fori_loop dispatch.
"""
from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from ..core.state import System, Topology
from ..core.units import Units, LJ
from ..core.precision import Precision, single
from ..neighbor import cell_slots as cs
from ..models.pair.cellpair import compute_cellpair
from ..models.pair.driver import _select_small
from ..models.pair.styles import PairStyle
from .verlet import NeighborPolicy
from .nvt import NVTConfig, NHChain, nhc_half
from .shake import (ShakeConstraints, make_clusters,
                    shake_positions_clustered, rattle_velocities_clustered)


def _detect_uniform_special(sidx, scode, mol, f_lj_tab, f_coul_tab):
    """(f_lj, f_coul) when the special topology is exactly 'every intra-
    molecular pair, one factor pair' (SPC/E-class rigid molecules); None
    otherwise.  Host-side, runs once at engine build."""
    mol = np.asarray(mol, np.int64)
    if mol.size == 0 or sidx.shape[1] == 0:
        return None
    valid = sidx >= 0
    n = len(mol)
    # every special partner shares the atom's molecule
    part_mol = mol[np.clip(sidx, 0, n - 1)]
    if not np.all(part_mol[valid] == mol[:, None].repeat(
            sidx.shape[1], 1)[valid]):
        return None
    # every intra pair IS special: per-atom special count == mol size - 1
    sizes = np.bincount(mol)
    if not np.all(valid.sum(1) == sizes[mol] - 1):
        return None
    codes = np.unique(np.asarray(scode)[valid])
    if len(codes) == 0:
        return None
    flj = f_lj_tab[codes]
    fc = f_coul_tab[codes]
    if not (np.all(flj == flj[0]) and np.all(fc == fc[0])):
        return None
    return float(flj[0]), float(fc[0])


class CellOverflowError(RuntimeError):
    """A rebin dropped atoms: per-cell occupancy exceeded the capacity.

    ``run`` catches this at segment boundaries, rolls the state back to
    the segment start (pre-overflow — the flag is sticky, so any dropped
    pair poisons everything after it), grows the capacity, re-bins, and
    replays — the TPU analog of IntelBuffers' grow-on-demand + the
    offload overflow-flag retry (SURVEY.md §5.3, intel_buffers.h:65-99).
    """


class CellPairSimulation:
    """MD driver on the slot layout.  API mirrors ``Simulation``."""

    def __init__(
        self,
        system: System,
        pair: PairStyle,
        topology: Optional[Topology] = None,
        kspace=None,
        units: Units = LJ,
        precision: Precision = None,
        dt: Optional[float] = None,
        neighbor: Optional[NeighborPolicy] = None,
        cap: Optional[int] = None,
        bonded=None,
        shake: Optional[ShakeConstraints] = None,
        thermostat: Optional[NVTConfig] = None,
        rigid=None,
        exclude_intra: bool = False,
        pair_kernel: str = "xla",
    ):
        self.units = units
        self.precision = precision or single()
        self.dt = units.dt if dt is None else dt
        self.pair = pair
        self.kspace = kspace
        self.topology = topology
        self.neighbor = neighbor or NeighborPolicy(skin=units.skin)
        self.box = system.box
        n = system.n_atoms
        self.n_atoms = n
        flt = self.precision.flt

        if self.box.is_triclinic and rigid is not None:
            raise NotImplementedError(
                "triclinic cell-pair engine: rigid bodies (unwrapped-COM "
                "positions) are excluded; pair/bonded/SHAKE/NVT + "
                "cell-patch or generic kspace run tilted")
        if rigid is not None and shake is not None:
            raise ValueError("fix rigid/small and fix shake are exclusive")
        self.rigid = rigid
        # rigid positions derive from body COMs but are kept CONTINUOUS
        # with the binned planes via per-slot wrap offsets (_block_rigid),
        # so the Newton half-stencil kernel's static shifts stay valid
        self._newton = True
        cutneigh = float(np.sqrt(pair.cutsq_max)) + self.neighbor.skin
        # cell sizing bounds cutoffs by the PERPENDICULAR face widths —
        # equal to lengths when orthogonal (lamda-space cells of a tilted
        # box are slabs of perpendicular extent W/nc)
        L = np.asarray(self.box.perp_widths)
        grid = cs.make_grid(n, L, cutneigh, cap=cap)
        if grid is None:
            raise ValueError(
                "box too small for the cell-pair engine (needs >=3 cells "
                "per axis); use Simulation (neighbor-list engine) instead"
            )
        if cap is None:
            # size capacity from OBSERVED max occupancy (+8% margin), not
            # the mean-density guess — padding enters the pair cost
            # quadratically ((cap/mean)^2 overcompute).  Overflow during a
            # run is detected by the sticky flag and raised at thermo; the
            # 8-quantized margin plus the skin-bounded drift makes it rare.
            # Density-adaptive z refinement (judge r3 #2): pick reach_z by
            # the MEASURED padded-work model — finer z cells shrink the
            # candidate volume per atom if this system's occupancy is
            # tight enough to pay for the extra stencil offsets.
            adaptive = (not self.box.is_triclinic and pair_kernel == "xla"
                        and rigid is None)
            best = None
            for reach in ((1, 2, 3) if adaptive else (1,)):
                g = cs.make_grid(n, L, cutneigh, reach_z=reach)
                if g is None:
                    continue
                self.grid = g
                occ = self._occupancy(system, None)
                capr = max(8, ((max(int(occ * 1.08), occ + 4) + 7) // 8)
                           * 8)
                K = 9 * reach + 5        # half-stencil offsets
                minor = ((K * capr + 127) // 128) * 128
                work = g.ncell * capr * minor
                if best is None or work < best[0]:
                    best = (work, reach, capr)
            _, reach, capr = best
            grid = cs.make_grid(n, L, cutneigh, cap=capr, reach_z=reach)
        self.grid = grid

        typ_np = np.asarray(jax.device_get(system.type), np.int32)
        self._mol = np.asarray(jax.device_get(system.molecule), np.int32)
        mass = np.asarray(jax.device_get(system.mass), np.float64)
        # per-TYPE 1/mass — baked select chain (typ varies per rebin)
        self._minv_per_type = (1.0 / mass).astype(np.dtype(flt))
        self.dtf = float(0.5 * self.dt * units.ftm2v)
        self.dtv = float(self.dt)

        self.bonded = bonded if (bonded is not None
                                 and bonded.has_terms) else None
        self.shake = shake
        # same-molecule pair exclusion (neigh_modify exclude molecule/
        # intra): padded atom-order mol table, gathered per slot in
        # _forces.  fix rigid/small always excludes (intramolecular pairs
        # exert no force on rigid motion — README deviation note).
        if exclude_intra or rigid is not None:
            if self._mol is None or self._mol.ndim == 0:
                raise ValueError("exclude_intra needs molecule ids")
            self._excl_mol = np.concatenate(
                [self._mol.astype(np.int32), [-1]])
        else:
            self._excl_mol = None
        self.thermostat = None
        tchain = 0
        if thermostat is not None:
            t_dof = 3 * n - 3
            if shake is not None:
                t_dof -= shake.n_constraints
            if rigid is not None:
                t_dof -= rigid.n_constraints
            self.thermostat = dataclasses.replace(
                thermostat, dof=max(t_dof, 1), boltz=units.boltz,
                mvv2e=units.mvv2e, dt=self.dt,
            )
            tchain = self.thermostat.tchain
        self._tchain = tchain

        if topology is not None and topology.special_idx.shape[1] > 0:
            s_idx = topology.special_idx
            s_code = topology.special_code
            # pad with a sentinel row for aid == n
            self._special_idx = np.concatenate(
                [s_idx, np.full((1, s_idx.shape[1]), -1, np.int32)], 0
            )
            self._special_code = np.concatenate(
                [s_code, np.zeros((1, s_code.shape[1]), np.int8)], 0
            )
        else:
            self._special_idx = None
            self._special_code = None
        # uniform-special fast path: when every molecule's intra pairs are
        # ALL special with ONE (f_lj, f_coul) — SPC/E-class waters — the
        # kernel replaces the (tile, cap, K*cap, S) partner matching with
        # a single molecule-id compare (measured ~4 ms/step at 288k)
        self._uniform_special = None
        self._umol_pad = None
        if (self._special_idx is not None and self._mol is not None
                and self._mol.ndim > 0 and self._excl_mol is None):
            us = _detect_uniform_special(
                self._special_idx[:-1], self._special_code[:-1],
                self._mol, np.asarray(pair.special_lj),
                np.asarray(pair.special_coul))
            if us is not None:
                self._uniform_special = us
                self._umol_pad = np.concatenate(
                    [self._mol.astype(np.int32), [-1]])

        comp = self.precision.compensated
        if comp and self.box.is_triclinic:
            raise NotImplementedError(
                "compensated precision on a triclinic box (the lamda wrap "
                "reconstructs positions, destroying the two-float split)")

        # Pair kernel: XLA only.  Three hand Pallas variants (v1 dense,
        # v2 lane-fused, v3 grid-pipelined) lost every hardware A/B to
        # XLA's fusion of the pre-gathered j-planes into the physics
        # (105.5 / 67.0 / 77.7 ms vs 34.4 ms on the 259k pair pass —
        # PERF.md "Pair-kernel A/B") and were pruned in r5: a strictly
        # dominated path is dead weight, and the measured record stays.
        if pair_kernel != "xla":
            raise ValueError(
                f"unknown pair_kernel {pair_kernel!r}: the Pallas "
                "variants were retired after losing every hardware A/B "
                "(PERF.md); the XLA cell-tile kernel is the pair path")
        self.pair_kernel = pair_kernel
        st = cs.from_atoms(
            self.grid, self.box, jax.device_get(system.x),
            jax.device_get(system.v), jax.device_get(system.image),
            typ_np, jax.device_get(system.q), dtype=flt, tchain=tchain,
            compensated=comp,
        )
        # one host round-trip at setup to right-size the capacity
        if bool(jax.device_get(st.overflow)):
            cid_counts = self._occupancy(system, typ_np)
            self.grid = cs.grow(self.grid, observed_max=cid_counts)
            st = cs.from_atoms(
                self.grid, self.box, jax.device_get(system.x),
                jax.device_get(system.v), jax.device_get(system.image),
                typ_np, jax.device_get(system.q), dtype=flt, tchain=tchain,
                compensated=comp,
            )
            if bool(jax.device_get(st.overflow)):
                raise RuntimeError("cell capacity sizing failed")
        self._shake_cl = (make_clusters(self.shake)
                          if self.shake is not None else None)
        if self.shake is not None:
            # settle initial state onto the constraint manifold
            Lbox = (self.box if self.box.is_triclinic
                    else np.asarray(self.box.lengths, np.float64))
            sc = self.shake
            cl = self._shake_cl

            @jax.jit
            def settle(state: cs.SlotState) -> cs.SlotState:
                inv = self._inv_map(state)
                rows = inv[jnp.asarray(cl.rows_np(self.n_atoms))]
                xs = (state.x, state.y, state.z)
                vs = (state.vx, state.vy, state.vz)
                xs2, _ = shake_positions_clustered(sc, cl, xs, xs, vs,
                                                   1.0, Lbox, rows)
                vs2 = rattle_velocities_clustered(sc, cl, xs2, vs, Lbox,
                                                  rows)
                return state._replace(
                    x=xs2[0], y=xs2[1], z=xs2[2],
                    vx=vs2[0], vy=vs2[1], vz=vs2[2],
                )

            st = settle(st)
        self.body = None
        if rigid is not None:
            if comp:
                raise NotImplementedError(
                    "compensated precision with fix rigid/small (positions "
                    "are derived from body state, not integrated)")
            from .rigid import (init_body_state, atom_positions,
                                atom_velocities)

            bs = init_body_state(rigid, jax.device_get(system.v),
                                 dtype=flt)
            xa, d = atom_positions(rigid, bs)
            va = atom_velocities(rigid, bs, d)
            # projecting out non-rigid velocity components IS the settle
            st = cs.from_atoms(
                self.grid, self.box, jax.device_get(xa),
                jax.device_get(va), jax.device_get(system.image),
                typ_np, jax.device_get(system.q), dtype=flt,
                tchain=tchain, compensated=False,
            )
            self.body = bs
        self.state = self._init_force_fn()(st)
        self.step_count = 0
        self._chunk_fns: dict[int, Callable] = {}
        self.timings = {"run": 0.0}
        self._thermo_jit = jax.jit(self._thermo_device)

    def _occupancy(self, system, typ_np) -> int:
        x = np.asarray(jax.device_get(system.x))
        lo = np.asarray(self.box.lo)
        nc = np.asarray(self.grid.nc)
        if self.box.is_triclinic:
            s = (x - lo) @ self.box.h_inv.T      # lamda coordinates
        else:
            s = (x - lo) / np.asarray(self.box.lengths)
        # wrap periodically BEFORE binning — the engine's rebin does
        # (wrap_state), and clipping out-of-box coordinates (read_data /
        # replicate products) piles them into edge cells, inflating the
        # observed max and oversizing cap: the silica deck measured 155
        # clipped vs 126 wrapped -> cap 168 vs 136, a (168/136)^2 = 1.53x
        # pair-slot overcompute
        s = s - np.floor(s)
        ci = np.clip((s * nc).astype(int), 0, nc - 1)
        cid = (ci[:, 0] * nc[1] + ci[:, 1]) * nc[2] + ci[:, 2]
        return int(np.bincount(cid, minlength=self.grid.ncell).max())

    # ---------- force + integrate ----------

    def _inv_map(self, state: cs.SlotState):
        """slot_of_atom: (N+1,) traced map, rebuilt per rebin."""
        ns = self.grid.nslots
        inv = jnp.zeros((self.n_atoms + 1,), jnp.int32)
        return inv.at[state.aid].set(
            jnp.arange(ns, dtype=jnp.int32), mode="drop")

    def _slot_specials(self, state: cs.SlotState):
        """(special_idx, special_code, uniform_mol) slot planes — the
        third is set (and the first two None) on the uniform-special
        fast path (see __init__)."""
        if self._uniform_special is not None:
            aid = jnp.minimum(state.aid, self.n_atoms)
            return None, None, jnp.asarray(self._umol_pad)[aid]
        if self._special_idx is None:
            return None, None, None
        aid = jnp.minimum(state.aid, self.n_atoms)
        return (
            jnp.asarray(self._special_idx)[aid],
            jnp.asarray(self._special_code)[aid],
            None,
        )

    def _slot_mol(self, state: cs.SlotState):
        if self._excl_mol is None:
            return None
        from ..models.pair.cellpair import slot_mol_gather

        return slot_mol_gather(self._excl_mol, state.aid, self.n_atoms)

    def _forces(self, state: cs.SlotState, sp, eflag: bool, vflag: bool):
        sp_idx, sp_code, umol = sp
        r = compute_cellpair(
            self.pair, self.grid, self.box, state,
            eflag=eflag, vflag=vflag, acc_dtype=self.precision.acc,
            slot_special_idx=sp_idx, slot_special_code=sp_code,
            newton=self._newton, slot_mol=self._slot_mol(state),
            uniform_special=self._uniform_special, slot_umol=umol,
        )
        fx, fy, fz = r.fx, r.fy, r.fz
        virial = r.virial
        elong = jnp.zeros((), self.precision.acc)
        if self.kspace is not None:
            if hasattr(self.kspace, "compute_slots"):
                kfx, kfy, kfz, elong, kvir = self.kspace.compute_slots(
                    state, eflag, vflag)
                fx = fx + kfx
                fy = fy + kfy
                fz = fz + kfz
                virial = virial + kvir
            else:
                xs = jnp.stack([state.x, state.y, state.z], axis=-1)
                if hasattr(self.kspace, "compute_slot"):
                    # atom-order-baked inputs (dispersion B) gather by aid
                    kr = self.kspace.compute_slot(
                        xs, jnp.minimum(state.aid, self.n_atoms), state.q,
                        eflag=eflag, vflag=vflag)
                else:
                    kr = self.kspace.compute(xs, state.q, eflag=eflag,
                                             vflag=vflag)
                fx = fx + kr.f[:, 0]
                fy = fy + kr.f[:, 1]
                fz = fz + kr.f[:, 2]
                elong = kr.elong
                virial = virial + kr.virial
        z = jnp.zeros((), self.precision.acc)
        return ((fx, fy, fz), z if r is None else r.evdwl,
                z if r is None else r.ecoul, elong, virial)

    def _minv(self, state: cs.SlotState):
        m = _select_small(self._minv_per_type, state.typ, state.typ.shape,
                          self.precision.flt)
        if isinstance(m, float):
            m = jnp.full(state.typ.shape, m, self.precision.flt)
        # freeze empty slots
        return jnp.where(state.aid < self.n_atoms, m, 0.0)

    def _init_force_fn(self):
        @jax.jit
        def f(state):
            sp = self._slot_specials(state)
            (fx, fy, fz), *_ = self._forces(state, sp, False, False)
            if self.bonded is not None:
                inv = self._inv_map(state)
                br = self._bonded_forces(state, self._bonded_idx(inv),
                                         False)
                fx = fx + br.f[:, 0]
                fy = fy + br.f[:, 1]
                fz = fz + br.f[:, 2]
            return state._replace(
                fx=fx.astype(state.x.dtype),
                fy=fy.astype(state.x.dtype),
                fz=fz.astype(state.x.dtype),
            )
        return f

    def _bonded_idx(self, inv):
        """Traced slot-index overrides for every bonded term class."""
        b = self.bonded
        out = {}
        if len(b.bonds):
            out["bonds_idx"] = inv[jnp.asarray(b.bonds[:, 1:])]
        if len(b.angles):
            out["angles_idx"] = inv[jnp.asarray(b.angles[:, 1:])]
        if len(b.dihedrals):
            out["dihedrals_idx"] = inv[jnp.asarray(b.dihedrals[:, 1:])]
        if len(b.impropers):
            out["impropers_idx"] = inv[jnp.asarray(b.impropers[:, 1:])]
        return out

    def _bonded_forces(self, st: cs.SlotState, idx_kw, eflag):
        from ..models.bonded import compute_bonded

        xs = jnp.stack([st.x, st.y, st.z], -1)
        return compute_bonded(self.bonded, xs, self.box, eflag=eflag,
                              acc_dtype=self.precision.acc, **idx_kw)

    def _block(self, state: cs.SlotState, nsteps: int,
               t_target: float = 0.0) -> cs.SlotState:
        state = cs.rebin_incremental(self.grid, self.box, state)
        sp = self._slot_specials(state)
        minv = self._minv(state)
        dtf, dtv = self.dtf, self.dtv
        flt = self.precision.flt
        cfg = self.thermostat
        sc = self.shake
        Lbox = (self.box if self.box.is_triclinic
                else np.asarray(self.box.lengths, np.float64))
        need_inv = (sc is not None or self.bonded is not None)
        inv = self._inv_map(state) if need_inv else None
        cl = self._shake_cl
        shake_rows = (inv[jnp.asarray(cl.rows_np(self.n_atoms))]
                      if sc is not None else None)
        bonded_kw = (self._bonded_idx(inv) if self.bonded is not None
                     else None)
        if cfg is not None:
            mass_col = jnp.where(minv > 0, 1.0 / jnp.maximum(minv, 1e-30),
                                 0.0)[:, None]

        comp = self.precision.compensated
        from .nve import two_sum_acc

        def one_step(st: cs.SlotState, _):
            th = st.therm
            vx, vy, vz = st.vx, st.vy, st.vz
            if comp:
                ccx, ccy, ccz = st.comp[0], st.comp[1], st.comp[2]
                cvx, cvy, cvz = st.comp[3], st.comp[4], st.comp[5]
            if cfg is not None:
                vs = jnp.stack([vx, vy, vz], -1)
                chain = NHChain(eta=th[0], eta_dot=th[1])
                scale, chain = nhc_half(cfg, chain, vs, mass_col, t_target)
                vx, vy, vz = vx * scale, vy * scale, vz * scale
                if comp:
                    cvx, cvy, cvz = cvx * scale, cvy * scale, cvz * scale
                th = jnp.stack([chain.eta, chain.eta_dot])
            if comp:
                vx, cvx = two_sum_acc(vx, cvx, (dtf * minv) * st.fx)
                vy, cvy = two_sum_acc(vy, cvy, (dtf * minv) * st.fy)
                vz, cvz = two_sum_acc(vz, cvz, (dtf * minv) * st.fz)
                x, ccx = two_sum_acc(st.x, ccx, dtv * (vx + cvx))
                y, ccy = two_sum_acc(st.y, ccy, dtv * (vy + cvy))
                z, ccz = two_sum_acc(st.z, ccz, dtv * (vz + cvz))
            else:
                vx = vx + (dtf * minv) * st.fx
                vy = vy + (dtf * minv) * st.fy
                vz = vz + (dtf * minv) * st.fz
                x = st.x + dtv * vx
                y = st.y + dtv * vy
                z = st.z + dtv * vz
            shake_r = None
            if sc is not None:
                (x, y, z), (vx, vy, vz), shake_r = \
                    shake_positions_clustered(
                        sc, cl, (st.x, st.y, st.z), (x, y, z),
                        (vx, vy, vz), dtv, Lbox, shake_rows,
                        return_r=True)
            st = st._replace(x=x, y=y, z=z)
            (fx, fy, fz), *_ = self._forces(st, sp, False, False)
            if self.bonded is not None:
                br = self._bonded_forces(st, bonded_kw, False)
                fx = fx + br.f[:, 0]
                fy = fy + br.f[:, 1]
                fz = fz + br.f[:, 2]
            fx = fx.astype(flt); fy = fy.astype(flt); fz = fz.astype(flt)
            if comp:
                vx, cvx = two_sum_acc(vx, cvx, (dtf * minv) * fx)
                vy, cvy = two_sum_acc(vy, cvy, (dtf * minv) * fy)
                vz, cvz = two_sum_acc(vz, cvz, (dtf * minv) * fz)
            else:
                vx = vx + (dtf * minv) * fx
                vy = vy + (dtf * minv) * fy
                vz = vz + (dtf * minv) * fz
            if sc is not None:
                # r_pre: reuse SHAKE's corrected bond vectors (positions
                # are unchanged since) — skips 3 scalar-bound gathers
                vx, vy, vz = rattle_velocities_clustered(
                    sc, cl, (x, y, z), (vx, vy, vz), Lbox, shake_rows,
                    r_pre=shake_r)
            if cfg is not None:
                vs = jnp.stack([vx, vy, vz], -1)
                chain = NHChain(eta=th[0], eta_dot=th[1])
                scale, chain = nhc_half(cfg, chain, vs, mass_col, t_target)
                vx, vy, vz = vx * scale, vy * scale, vz * scale
                if comp:
                    cvx, cvy, cvz = cvx * scale, cvy * scale, cvz * scale
                th = jnp.stack([chain.eta, chain.eta_dot])
            kw = {}
            if comp:
                kw["comp"] = jnp.stack([ccx, ccy, ccz, cvx, cvy, cvz])
            return st._replace(vx=vx, vy=vy, vz=vz, fx=fx, fy=fy, fz=fz,
                               therm=th, **kw), None

        state, _ = jax.lax.scan(one_step, state, None, length=nsteps)
        return state

    def _block_rigid(self, state: cs.SlotState, body, nsteps: int,
                     t_target):
        """fix rigid/small block: rebin once, then nsteps of batched
        quaternion rigid-body velocity-Verlet (integrate/rigid.py) —
        the nlist engine's _block_rigid on the slot layout.  Body math
        runs in ATOM order (reusing the validated kernels verbatim);
        slot<->atom conversion is one aid gather + one aid scatter per
        step.  Slot x planes are DERIVED from the body state (unwrapped;
        the full-stencil kernel min-images, see __init__ note); slot v
        planes are refreshed at block end for thermo/IO."""
        from .rigid import (atom_positions, atom_velocities,
                            initial_integrate_rigid, final_integrate_rigid)

        rg = self.rigid
        state = cs.rebin_incremental(self.grid, self.box, state)
        sp = self._slot_specials(state)
        aid = jnp.minimum(state.aid, self.n_atoms)
        flt = self.precision.flt
        dtf, dtv = self.dtf, self.dtv
        cfg = self.thermostat
        if cfg is not None:
            mass_col = jnp.asarray(rg.mass_per_atom, flt)[:, None]

        def to_planes(arr3):
            p = jnp.concatenate([arr3.astype(flt),
                                 jnp.zeros((1, 3), flt)])
            g = p[aid]
            return g[:, 0], g[:, 1], g[:, 2]

        def atom_forces(fx, fy, fz):
            f = jnp.zeros((self.n_atoms + 1, 3), flt)
            f = f.at[aid].set(jnp.stack(
                [fx.astype(flt), fy.astype(flt), fz.astype(flt)], -1))
            return f[:self.n_atoms]

        # per-slot wrap offsets (exact multiples of L): the rebin wrapped
        # state.x, but atom_positions derives UNWRAPPED coordinates from
        # body COMs.  Adding the block-static offset keeps stored
        # positions CONTINUOUS with the binned values, so the fold-free
        # cell-patch PPPM spline weights stay inside their patches and
        # image flags don't re-accumulate the same crossing every block
        # (review findings r3).
        from .rigid import atom_positions as _ap

        _x0, _y0, _z0 = to_planes(_ap(rg, body)[0])
        offx = state.x - _x0
        offy = state.y - _y0
        offz = state.z - _z0

        def one_step(carry, _):
            st, bs, fa = carry
            th = st.therm
            if cfg is not None:
                _, d0 = atom_positions(rg, bs)
                va = atom_velocities(rg, bs, d0)
                chain = NHChain(eta=th[0], eta_dot=th[1])
                scale, chain = nhc_half(cfg, chain, va, mass_col,
                                        t_target)
                bs = bs._replace(V=bs.V * scale, L=bs.L * scale)
                th = jnp.stack([chain.eta, chain.eta_dot])
            _, d = atom_positions(rg, bs)
            bs = initial_integrate_rigid(rg, bs, fa, d, dtv, dtf)
            xa, d2 = atom_positions(rg, bs)
            x, y, z = to_planes(xa)
            st = st._replace(x=x + offx, y=y + offy, z=z + offz)
            (fx, fy, fz), *_ = self._forces(st, sp, False, False)
            fa = atom_forces(fx, fy, fz)
            bs = final_integrate_rigid(rg, bs, fa, d2, dtf)
            if cfg is not None:
                va = atom_velocities(rg, bs, d2)
                chain = NHChain(eta=th[0], eta_dot=th[1])
                scale, chain = nhc_half(cfg, chain, va, mass_col,
                                        t_target)
                bs = bs._replace(V=bs.V * scale, L=bs.L * scale)
                th = jnp.stack([chain.eta, chain.eta_dot])
            st = st._replace(fx=fx.astype(flt), fy=fy.astype(flt),
                             fz=fz.astype(flt), therm=th)
            return (st, bs, fa), None

        fa0 = atom_forces(state.fx, state.fy, state.fz)
        (state, body, _), _ = jax.lax.scan(
            one_step, (state, body, fa0), None, length=nsteps)
        _, d = atom_positions(rg, body)
        va = atom_velocities(rg, body, d)
        vx, vy, vz = to_planes(va)
        return state._replace(vx=vx, vy=vy, vz=vz), body

    def _repeat_blocks(self, size: int):
        # t_target is a traced argument (not baked): a thermostat ramp
        # re-dispatches per segment without recompiling (see verlet.py)
        fn = self._chunk_fns.get(size)
        if fn is None:
            if self.rigid is not None:
                def chunk(state, body, n_blocks, t_target):
                    return jax.lax.fori_loop(
                        0, n_blocks,
                        lambda i, sb: self._block_rigid(
                            sb[0], sb[1], size, t_target),
                        (state, body),
                    )
            else:
                def chunk(state, n_blocks, t_target):
                    return jax.lax.fori_loop(
                        0, n_blocks,
                        lambda i, s: self._block(s, size, t_target), state
                    )
            fn = jax.jit(chunk)
            self._chunk_fns[size] = fn
        return fn

    # ---------- thermo ----------

    def _thermo_device(self, state: cs.SlotState, body=None) -> dict:
        state = cs.rebin_incremental(self.grid, self.box, state)
        sp = self._slot_specials(state)
        (tfx, tfy, tfz), evdwl, ecoul, elong, virial = self._forces(
            state, sp, True, True)
        emol = jnp.zeros((), self.precision.acc)
        if self.bonded is not None:
            inv = self._inv_map(state)
            br = self._bonded_forces(state, self._bonded_idx(inv), True)
            emol = br.emol
            # CHARMM 1-4 pair terms are tallied into the PAIR energies
            # (dihedral_charmm.cpp ev_tally convention)
            evdwl = evdwl + br.e14_lj
            ecoul = ecoul + br.e14_coul
            virial = virial + br.virial
            # fold bonded forces into the totals: the constraint-virial
            # tallies below (rigid/SHAKE) are defined on TOTAL forces
            # (the fix_rigid/fix_shake contract; the nlist engine's fr.f
            # already includes them)
            tfx = tfx + br.f[:, 0]
            tfy = tfy + br.f[:, 1]
            tfz = tfz + br.f[:, 2]
        u = self.units
        acc = self.precision.acc
        valid = state.aid < self.n_atoms
        mpt = self._minv_per_type
        minv = _select_small(mpt, state.typ, state.typ.shape,
                             self.precision.flt)
        if isinstance(minv, float):
            minv = jnp.full(state.typ.shape, minv, self.precision.flt)
        mass = jnp.where(valid, 1.0 / minv, 0.0)
        v2 = state.vx**2 + state.vy**2 + state.vz**2
        sum_mv2 = jnp.sum((mass * v2).astype(acc)) * u.mvv2e
        dof = 3 * self.n_atoms - 3
        if self.shake is not None:
            dof -= self.shake.n_constraints
        if self.rigid is not None:
            dof -= self.rigid.n_constraints
        dof = max(dof, 1)
        if self.rigid is not None and body is not None:
            # rigid constraint virial (same contract as the nlist engine):
            # tally against atom-order total forces derived via aid scatter
            from .rigid import atom_positions, constraint_virial

            aid = jnp.minimum(state.aid, self.n_atoms)
            f = jnp.zeros((self.n_atoms + 1, 3), self.precision.flt)
            f = f.at[aid].set(jnp.stack(
                [tfx.astype(self.precision.flt),
                 tfy.astype(self.precision.flt),
                 tfz.astype(self.precision.flt)], -1))
            _, d = atom_positions(self.rigid, body)
            virial = virial + constraint_virial(
                self.rigid, body, d, f[:self.n_atoms], u.ftm2v,
                acc_dtype=self.precision.acc)
        if self.shake is not None:
            # SHAKE constraint virial (fix_shake.cpp pressure tally):
            # scatter slot planes to atom order, tally on static pairs
            from .shake import shake_virial

            flt = self.precision.flt
            aid = jnp.minimum(state.aid, self.n_atoms)

            def at_atoms(px, py, pz):
                arr = jnp.zeros((self.n_atoms + 1, 3), flt)
                return arr.at[aid].set(jnp.stack(
                    [px.astype(flt), py.astype(flt),
                     pz.astype(flt)], -1))[:self.n_atoms]

            virial = virial + shake_virial(
                self.shake,
                at_atoms(state.x, state.y, state.z),
                at_atoms(state.vx, state.vy, state.vz),
                at_atoms(tfx, tfy, tfz), u.ftm2v,
                self.box if self.box.is_triclinic
                else np.asarray(self.box.lengths, np.float64),
                acc_dtype=self.precision.acc)
        temp = sum_mv2 / (dof * u.boltz)
        ke = 0.5 * sum_mv2
        vol = self.box.volume
        vir_trace = virial[0] + virial[1] + virial[2]
        press = (sum_mv2 + vir_trace) / (3.0 * vol) * u.nktv2p
        epair = evdwl + ecoul + elong
        vmax = jnp.sqrt(jnp.max(jnp.where(valid, v2, 0.0)))
        return dict(
            temp=temp, evdwl=evdwl, ecoul=ecoul, elong=elong, emol=emol,
            epair=epair, ke=ke, etotal=epair + emol + ke, press=press,
            overflow=state.overflow, vmax=vmax, virial=virial,
        )

    def thermo(self) -> dict:
        row = jax.device_get(self._thermo_jit(self.state, self.body))
        out = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v))
               for k, v in row.items()}
        out["step"] = self.step_count
        out["overflow"] = bool(row["overflow"])
        if not np.isfinite(out["etotal"]) or not np.isfinite(out["temp"]):
            raise RuntimeError(
                f"non-finite thermodynamics at step {out['step']} "
                f"(etotal={out['etotal']}, temp={out['temp']}): "
                "simulation diverged — reduce the timestep or check "
                "overlapping atoms / force-field coefficients"
            )
        if out["overflow"]:
            raise CellOverflowError(
                "cell capacity overflow during run; increase cap "
                "(CellPairSimulation(cap=...))"
            )
        return out

    # ---------- IO ----------

    def get_atoms(self) -> dict:
        """Atom-ordered state snapshot (host numpy)."""
        out = jax.device_get(
            jax.jit(lambda s: cs.to_atoms(self.grid, s))(self.state)
        )
        return {k: np.asarray(v) for k, v in out.items()}

    # ---------- main loop ----------

    def _cadence(self, vmax: Optional[float]) -> int:
        # 1.5x vmax headroom: vmax is sampled at the previous thermo fetch
        # and may grow mid-segment (see verlet.Simulation._cadence)
        nb = self.neighbor
        if not nb.check or vmax is None or vmax <= 0:
            return max(1, nb.every)
        safe = int(nb.skin / (2.0 * 1.5 * vmax * self.dt))
        return max(1, min(max(safe, 1), 100))

    def _vmax_now(self) -> float:
        """One-off device max |v| (invalid slots carry v=0 — harmless
        in a max of magnitudes).  Sampled at run() entry when check=true
        and no thermo fetch will supply vmax: without it the cadence
        falls back to `every`, and LAMMPS-idiom 'every 1 delay N check
        yes' decks (in.spce) would do a FULL rebin every step."""
        st = self.state
        return float(jax.device_get(jax.jit(
            lambda s: jnp.sqrt(jnp.max(s.vx**2 + s.vy**2 + s.vz**2)))(st)))

    def _t_target(self, ahead: int = 0) -> float:
        cfg = self.thermostat
        if cfg is None:
            return 0.0
        if self._run_total <= 0 or cfg.t_start == cfg.t_stop:
            return cfg.t_start
        frac = min(max((self._run_done + ahead) / self._run_total, 0.0), 1.0)
        return cfg.t_start + (cfg.t_stop - cfg.t_start) * frac

    def _advance(self, total: int, cadence: int):
        tt = jnp.asarray(self._t_target(ahead=total), self.precision.flt)
        n_full, rem = divmod(total, cadence)
        if self.rigid is not None:
            if n_full:
                self.state, self.body = self._repeat_blocks(cadence)(
                    self.state, self.body, n_full, tt)
            if rem:
                self.state, self.body = self._repeat_blocks(rem)(
                    self.state, self.body, 1, tt)
            return
        if n_full:
            self.state = self._repeat_blocks(cadence)(self.state, n_full, tt)
        if rem:
            self.state = self._repeat_blocks(rem)(self.state, 1, tt)

    def run(self, nsteps: int, thermo_every: int = 0, log: bool = True):
        rows = []
        vmax = None

        def emit():
            nonlocal vmax
            row = self.thermo()
            vmax = row.pop("vmax")
            rows.append(row)
            if log:
                if not getattr(self, "_printed_header", False):
                    self._printed_header = True
                    print(f"{'Step':>8} {'Temp':>12} {'E_pair':>14} "
                          f"{'E_long':>14} {'TotEng':>14} {'Press':>14}")
                print(f"{row['step']:>8d} {row['temp']:>12.6g} "
                      f"{row['epair']:>14.8g} {row['elong']:>14.8g} "
                      f"{row['etotal']:>14.8g} {row['press']:>14.6g}")

        t0 = time.perf_counter()
        self._run_total = nsteps
        self._run_done = 0
        if thermo_every:
            emit()
        elif self.neighbor.check:
            vmax = self._vmax_now()
        end = self.step_count + nsteps
        grows = 0
        while self.step_count < end:
            target = end
            if thermo_every:
                target = min(
                    end,
                    ((self.step_count // thermo_every) + 1) * thermo_every,
                )
            # segment snapshot for overflow rollback (jax arrays are
            # immutable — keeping the references is free)
            snap = (self.state, self.body, self.step_count, self._run_done)
            self._advance(target - self.step_count, self._cadence(vmax))
            self._run_done += target - self.step_count
            self.step_count = target
            try:
                if thermo_every and self.step_count % thermo_every == 0:
                    emit()
                elif self.step_count >= end:
                    float(self.state.x[0])  # force completion
                    # surface the sticky overflow flag even with thermo
                    # disabled — a run must never return silently with
                    # dropped pairs (same contract as the NPT/slab engines)
                    if bool(jax.device_get(self.state.overflow)):
                        raise CellOverflowError("cell capacity overflow")
            except CellOverflowError:
                # roll back to the segment start (pre-overflow), grow the
                # capacity, re-bin, replay — grow-on-demand (§5.3)
                grows += 1
                if grows > 4:
                    raise
                self.state, self.body = snap[0], snap[1]
                self.step_count, self._run_done = snap[2], snap[3]
                self._grow_capacity()
        if thermo_every and (not rows or rows[-1]["step"] != self.step_count):
            emit()
        self.timings["run"] += time.perf_counter() - t0
        return rows

    def _grow_capacity(self):
        """Grow the per-cell capacity and re-bin the CURRENT state into
        the bigger grid; invalidate every grid-shaped compiled artifact.
        Pays one recompile — strictly better than dying, and what makes
        occupancy-tight default capacities safe."""
        old = self.grid
        new = cs.grow(old)
        self.grid = new
        self.state = jax.jit(
            lambda s: cs.rebin(new, self.box, s))(self.state)
        if bool(jax.device_get(self.state.overflow)):
            raise CellOverflowError(
                f"cell capacity overflow persists after growing "
                f"{old.cap} -> {new.cap}")
        if self.kspace is not None and hasattr(self.kspace, "rebind"):
            self.kspace = self.kspace.rebind(new)
        self._chunk_fns = {}
        self._thermo_jit = jax.jit(self._thermo_device)
