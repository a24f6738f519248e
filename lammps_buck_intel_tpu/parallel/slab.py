"""Slab-sharded production MD engine — multi-chip CellPairSimulation.

Spatial decomposition of the sorted cell-slot layout (SURVEY.md §5.7, H3)
over a 1-D device mesh: each device owns a contiguous slab of cell x-planes
of the SAME flat slot arrays the single-device engine uses (the x-major
slot order makes ``PartitionSpec('x')`` on the flat planes exactly the slab
decomposition — no re-layout).  Per step:

* pair forces: ppermute the two boundary cell-planes (ghost-atom exchange,
  the reference's forward_comm analog — /root/reference/pair_buck_intel.cpp:86
  nlocal/nghost contract), evaluate dense (cap, 27*cap) tiles of local
  i-cells against the halo-extended j-slab.  Full neighbor lists mean no
  reverse force communication — each device owns its atoms' forces.
* k-space: SlabCellPPPM (models/kspace/pppm_slab.py) — ppermute mesh
  halos + all_to_all pencil FFT.
* rebin (atom migration): atoms drift <= skin/2 < one cell between rebins,
  so migrants can only cross into the adjacent slab.  Each device ships
  copies of its two boundary cell-planes to its ring neighbors; every
  device then bins {my slots} + {received planes} by LOCAL cell id —
  out-of-range rows (stay-at-home copies on the receiver, migrants on the
  sender) drop out as invalid.  Faster drift sets the sticky overflow flag
  (surfaced at thermo, like capacity overflow).
* scalars: lax.psum (the MPI_Allreduce analog).
* bonded terms + SHAKE/RATTLE: molecular terms are strictly local —
  every atom of a term lies within one cell (<< cutoff+skin) of any
  owned member, so the halo-extended slab always contains the whole
  term.  The full (replicated, static) term lists are evaluated on
  every device against a per-rebin aid->extended-slot map; terms with
  missing atoms are redirected to fake off-manifold rows (their garbage
  forces land on discarded rows), energies/virials are tallied only by
  the device owning the term's first atom (psum-exact, no double
  count), and constraint corrections are sliced to owned rows.  This is
  the host-LAMMPS contract H3/H7: bonded/SHAKE ride the same ghost
  exchange the pair pass uses (/root/reference/pppm_intel.cpp:185
  machinery exists so full decks scale).

* rigid bodies (``fix rigid/small``): body state (B << N) is REPLICATED;
  each device segment-sums its owned slots into per-body force/torque
  partials, one psum completes them (a body straddling a slab boundary
  needs no ghost machinery — the partial sums ARE the decomposition),
  and every device advances all bodies identically.  Slot x/v planes are
  derived from the body state through local aid gathers.

Scope: pair + PPPM (pencil, or gathered for dispersion/ewald) + NVE/NVT
+ SHAKE/RATTLE + bonded terms + rigid/small + same-molecule exclusion —
the in.spce- and in.hexane-class decks.  fix npt runs on the
SlabNPTSimulation subclass (parallel/slab_npt.py): the same slab
decomposition under a TRACED box (the fractional cell walls dilate with
the MTK barostat).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import System, Topology
from ..core.units import Units, LJ
from ..core.precision import Precision, single
from ..neighbor import cell_slots as cs
from ..models.pair.cellpair import compute_cell_tiles, _state_planes
from ..models.pair.driver import _select_small
from ..models.pair.styles import PairStyle
from ..models.kspace.pppm_slab import SlabCellPPPM, _perm_left, _perm_right
from ..integrate.verlet import NeighborPolicy
from ..integrate.nvt import NVTConfig, NHChain, nhc_half
from ..integrate.shake import (ShakeConstraints, make_clusters,
                               shake_positions_clustered,
                               rattle_velocities_clustered)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def slab_mesh(n_devices: int, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if len(devs) < n_devices:
        raise ValueError(
            f"slab engine: {n_devices} devices requested, only {len(devs)} "
            "visible (for CPU testing set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices})")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def ext_nbr_table(ncx_loc: int, ncy: int, ncz: int) -> np.ndarray:
    """(ncell_loc, 27) neighbor ids into the halo-extended slab
    ((ncx_loc+2, ncy, ncz) cells; x offset shifts, y/z wrap)."""
    lx, cy, cz = np.meshgrid(np.arange(ncx_loc), np.arange(ncy),
                             np.arange(ncz), indexing="ij")
    out = np.zeros((ncx_loc * ncy * ncz, 27), np.int32)
    o = 0
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            for c in (-1, 0, 1):
                nb = ((lx + 1 + a) * ncy + (cy + b) % ncy) * ncz \
                    + (cz + c) % ncz
                out[:, o] = nb.reshape(-1)
                o += 1
    return out


class SlabCellPairSimulation:
    """Multi-device MD driver on the slot layout.  API mirrors
    ``CellPairSimulation`` (run/thermo/get_atoms)."""

    def __init__(
        self,
        system: System,
        pair: PairStyle,
        mesh: Optional[Mesh] = None,
        n_devices: Optional[int] = None,
        units: Units = LJ,
        precision: Precision = None,
        dt: Optional[float] = None,
        neighbor: Optional[NeighborPolicy] = None,
        cap: Optional[int] = None,
        kspace_setup: Optional[Callable] = None,
        thermostat: Optional[NVTConfig] = None,
        topology: Optional[Topology] = None,
        bonded=None,
        shake: Optional[ShakeConstraints] = None,
        rigid=None,
        exclude_intra: bool = False,
        cutneigh_scale: float = 1.0,
        defer_init_force: bool = False,
    ):
        """kspace_setup: optional fn (sim) -> SlabCellPPPM called after the
        grid exists (the runner wires setup_pppm through it).
        cutneigh_scale: grow the cell-sizing cutoff (> 1 leaves shrink
        headroom for the variable-cell subclass — cells stay >= cutneigh
        down to boxL/cutneigh_scale).  defer_init_force: skip the initial
        force pass (the traced-box subclass runs its own)."""
        if mesh is None:
            mesh = slab_mesh(n_devices or len(jax.devices()))
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.D = mesh.devices.size
        self.units = units
        self.precision = precision or single()
        self.dt = units.dt if dt is None else dt
        self.pair = pair
        self.neighbor = neighbor or NeighborPolicy(skin=units.skin)
        self.box = system.box
        n = system.n_atoms
        self.n_atoms = n
        flt = self.precision.flt

        cutneigh = (float(np.sqrt(pair.cutsq_max))
                    + self.neighbor.skin) * float(cutneigh_scale)
        # cell sizing bounds cutoffs by the PERPENDICULAR face widths
        # (== lengths when orthogonal; lamda-slab extents when tilted)
        L = np.asarray(self.box.perp_widths)
        grid = cs.make_grid(n, L, cutneigh, cap=cap)
        if grid is None:
            raise ValueError("box too small for the cell-pair engine")
        # x extent must tile the device axis; rounding DOWN keeps cells
        # >= cutneigh (bigger cells are always correct)
        ncx = (grid.nc[0] // self.D) * self.D
        if ncx < 3 or (self.D == 2 and ncx // self.D < 2):
            raise ValueError(
                f"cannot cut {grid.nc[0]} x-planes into {self.D} slabs "
                "(need >= 1 plane/device; >= 2 with 2 devices)")
        grid = dataclasses.replace(grid, nc=(ncx,) + grid.nc[1:])
        if cap is None:
            self.grid = grid
            occ = self._occupancy(system)
            grid = dataclasses.replace(
                grid, cap=max(8, ((int(occ * 1.2) + 4 + 7) // 8) * 8))
        self.grid = grid
        self.ncx_loc = ncx // self.D
        self.nc_loc = (self.ncx_loc,) + grid.nc[1:]
        self.ncell_loc = self.ncx_loc * grid.nc[1] * grid.nc[2]
        self._plane = grid.nc[1] * grid.nc[2] * grid.cap
        self._nbr_ext = ext_nbr_table(self.ncx_loc, grid.nc[1], grid.nc[2])

        typ_np = np.asarray(jax.device_get(system.type), np.int32)
        self._mol = np.asarray(jax.device_get(system.molecule), np.int32)
        mass = np.asarray(jax.device_get(system.mass), np.float64)
        self._minv_per_type = (1.0 / mass).astype(np.dtype(flt))
        self.dtf = float(0.5 * self.dt * units.ftm2v)
        self.dtv = float(self.dt)
        self.topology = topology
        self.bonded = bonded if (bonded is not None
                                 and bonded.has_terms) else None
        self.shake = shake
        self._shake_cl = make_clusters(shake) if shake is not None else None
        if rigid is not None and shake is not None:
            raise ValueError("fix rigid/small and fix shake are exclusive")
        self.rigid = rigid
        # same-molecule pair exclusion (fix rigid/small pair semantics):
        # padded atom-order table, gathered per slot + halo in _forces_local
        if exclude_intra or rigid is not None:
            if self._mol is None or self._mol.ndim == 0:
                raise ValueError("exclude_intra needs molecule ids")
            self._excl_mol = np.concatenate(
                [self._mol.astype(np.int32), [-1]])
        else:
            self._excl_mol = None
        if rigid is not None:
            # static padded body maps (aid -> body id / body-frame offset;
            # row n -> body B sentinel, segment-dropped)
            self._bof_pad = np.concatenate(
                [rigid.body_of.astype(np.int32), [rigid.nbody]])
            self._rbody_pad = np.concatenate(
                [rigid.r_body, np.zeros((1, 3))]).astype(np.dtype(flt))
        self.kspace: Optional[SlabCellPPPM] = None
        self._kc = {}
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
                mvv2e=units.mvv2e, dt=self.dt)
            tchain = self.thermostat.tchain

        if topology is not None and topology.special_idx.shape[1] > 0:
            s_idx = topology.special_idx
            s_code = topology.special_code
            # sentinel row for aid == n (empty slots)
            self._special_idx = np.concatenate(
                [s_idx, np.full((1, s_idx.shape[1]), -1, np.int32)], 0)
            self._special_code = np.concatenate(
                [s_code, np.zeros((1, s_code.shape[1]), np.int8)], 0)
        else:
            self._special_idx = None
            self._special_code = None

        x_np = jax.device_get(system.x)
        v_np = jax.device_get(system.v)
        if self.shake is not None:
            # settle the initial state onto the constraint manifold —
            # done in atom order on the replicated host arrays (setup
            # only; per-step SHAKE runs sharded, see _block_local)
            Lbox = (self.box if self.box.is_triclinic
                    else np.asarray(self.box.lengths, np.float64))
            sc = self.shake
            cl = self._shake_cl
            rows = jnp.asarray(cl.rows_np(0))

            @jax.jit
            def settle(xs, vs):
                x3 = tuple(xs[:, c] for c in range(3))
                v3 = tuple(vs[:, c] for c in range(3))
                xf, _ = shake_positions_clustered(sc, cl, x3, x3, v3,
                                                  1.0, Lbox, rows)
                vf = rattle_velocities_clustered(sc, cl, xf, v3, Lbox,
                                                 rows)
                return jnp.stack(xf, -1), jnp.stack(vf, -1)

            x_np, v_np = (np.asarray(a) for a in settle(
                jnp.asarray(x_np), jnp.asarray(v_np)))

        self.body = None
        if rigid is not None:
            from ..integrate.rigid import (init_body_state, atom_positions,
                                           atom_velocities)

            bs = init_body_state(rigid, v_np, dtype=flt)
            xa, d = atom_positions(rigid, bs)
            va = atom_velocities(rigid, bs, d)
            # projecting out non-rigid velocity components IS the settle
            x_np = np.asarray(jax.device_get(xa))
            v_np = np.asarray(jax.device_get(va))
            self.body = bs

        st = cs.from_atoms(
            self.grid, self.box, x_np,
            v_np, jax.device_get(system.image),
            typ_np, jax.device_get(system.q), dtype=flt, tchain=tchain,
        )
        if bool(jax.device_get(st.overflow)):
            self.grid = cs.grow(self.grid, observed_max=self._occupancy(
                system))
            self._plane = self.grid.nc[1] * self.grid.nc[2] * self.grid.cap
            st = cs.from_atoms(
                self.grid, self.box, x_np,
                v_np, jax.device_get(system.image),
                typ_np, jax.device_get(system.q), dtype=flt, tchain=tchain,
            )
            if bool(jax.device_get(st.overflow)):
                raise RuntimeError("cell capacity sizing failed")

        if kspace_setup is not None:
            self.kspace = kspace_setup(self)
            consts = self.kspace.spectral_consts()
            shards = self.kspace.shardings(self.mesh, self.axis)
            self._kc = {k: jax.device_put(np.asarray(v), shards[k])
                        for k, v in consts.items()}

        self._state_spec = cs.SlotState(
            **{f: P(self.axis) for f in cs.SlotState._fields
               if f not in ("overflow", "therm", "comp")},
            overflow=P(), therm=P(),
            # (6, NS) residual planes shard along slots when present;
            # the slab engine currently runs plain precision (comp=None)
            comp=None if st.comp is None else P(None, self.axis),
        )
        self._state_sharding = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), self._state_spec,
            is_leaf=lambda v: isinstance(v, P),
        )
        self.state = jax.device_put(st, self._state_sharding)
        if self.body is not None:
            from ..integrate.rigid import BodyState

            # body state is REPLICATED (B << N): per-device partial
            # force/torque psums drive an identical update everywhere
            self._body_spec = BodyState(X=P(), V=P(), q=P(), L=P())
            rep = NamedSharding(self.mesh, P())
            self.body = jax.tree.map(
                lambda a: jax.device_put(a, rep), self.body)
        self.step_count = 0
        self._chunk_fns: dict[int, Callable] = {}
        self.timings = {"run": 0.0}
        if not defer_init_force:
            self._thermo_jit = self._make_thermo_fn()
            self.state = self._make_init_force_fn()(self.state, self._kc)

    def _occupancy(self, system) -> int:
        x = np.asarray(jax.device_get(system.x))
        lo = np.asarray(self.box.lo)
        nc = np.asarray(self.grid.nc)
        # wrap before binning (matches rebin's wrap_state; clipping piles
        # out-of-box read_data/replicate coordinates into edge cells and
        # oversizes cap quadratically — see cellpair_verlet._occupancy)
        if self.box.is_triclinic:
            s = (x - lo) @ np.asarray(self.box.h_inv, np.float64).T
        else:
            s = (x - lo) / np.asarray(self.box.lengths)
        s = s - np.floor(s)
        ci = np.clip((s * nc).astype(int), 0, nc - 1)
        cid = (ci[:, 0] * nc[1] + ci[:, 1]) * nc[2] + ci[:, 2]
        return int(np.bincount(cid, minlength=self.grid.ncell).max())

    # ---------- local (inside shard_map) pieces ----------

    def _kc_in_specs(self):
        return (self.kspace.in_specs(self.axis) if self.kspace is not None
                else {})

    def _halo(self, p):
        """Extend a per-slot plane with the two neighbor boundary planes
        (ghost exchange; self-halo when D == 1)."""
        plane = self._plane
        first, last = p[:plane], p[-plane:]
        if self.D > 1:
            left = jax.lax.ppermute(last, self.axis, _perm_right(self.D))
            right = jax.lax.ppermute(first, self.axis, _perm_left(self.D))
        else:
            left, right = last, first
        return jnp.concatenate([left, p, right])

    def _halo_planes(self, state: cs.SlotState) -> dict:
        """j-side planes extended with the two neighbor boundary planes."""
        pl = _state_planes(state)
        return {k: self._halo(v) for k, v in pl.items()}

    # ---------- molecular terms on the halo-extended slab ----------
    #
    # Bonded/SHAKE terms are strictly short-ranged (every member atom
    # within one cell of any other), so a term with >= 1 OWNED atom lies
    # entirely inside the halo-extended slab.  The full static term lists
    # are evaluated everywhere against a per-rebin aid -> extended-slot
    # map; terms with missing atoms are redirected onto 4 fake rows of
    # non-degenerate geometry (finite garbage forces, discarded with the
    # ghost rows), and energy/virial carry a per-term ownership weight
    # (device owning the FIRST atom) so psum totals are exact.

    def _ext_xs(self, x_ext, y_ext, z_ext):
        """(n_ext + 4, 3) positions: halo-extended slab + 4 dummy rows
        (non-collinear, non-planar — finite bond/angle/dihedral math)."""
        lo = np.asarray(jax.device_get(self.box.lo), np.float64)
        d = np.asarray([[0.05, 0.05, 0.05], [1.02, 0.05, 0.05],
                        [0.55, 0.85, 0.05], [0.75, 0.45, 0.95]])
        dummy = jnp.asarray(lo[None, :] + d, x_ext.dtype)
        xs = jnp.stack([x_ext, y_ext, z_ext], -1)
        return jnp.concatenate([xs, dummy])

    def _ext_planes(self, x_ext, y_ext, z_ext):
        """Component-plane form of _ext_xs: ((n_ext+4,),)*3 tuples (the
        lanes-last clustered SHAKE interface — no (N, 3) stacking)."""
        lo = np.asarray(jax.device_get(self.box.lo), np.float64)
        d = np.asarray([[0.05, 0.05, 0.05], [1.02, 0.05, 0.05],
                        [0.55, 0.85, 0.05], [0.75, 0.45, 0.95]])
        return tuple(
            jnp.concatenate([p, jnp.asarray(lo[c] + d[:, c], p.dtype)])
            for c, p in enumerate((x_ext, y_ext, z_ext)))

    def _term_ctx(self, state: cs.SlotState) -> dict:
        """Binning-static per-block context: i-side special-bond slots +
        bonded/SHAKE index maps into the halo-extended slab."""
        n = self.n_atoms
        plane = self._plane
        ns_loc = self.grid.nslots // self.D
        ctx = {}
        if self._special_idx is not None:
            aid = jnp.minimum(state.aid, n)
            ctx["sp"] = (jnp.asarray(self._special_idx)[aid],
                         jnp.asarray(self._special_code)[aid])
        else:
            ctx["sp"] = (None, None)
        if self.bonded is None and self.shake is None:
            return ctx

        ext_aid = self._halo(state.aid)
        n_ext = ext_aid.shape[0]
        rows = jnp.arange(n_ext, dtype=jnp.int32)
        # ghost rows first, own rows override: with the D == 1 self-halo
        # (and shared boundary molecules) an owned atom must resolve to
        # its OWNED copy so scattered forces are kept, not discarded
        amap = jnp.full((n + 1,), -1, jnp.int32)
        ghost = jnp.concatenate([rows[:plane], rows[-plane:]])
        amap = amap.at[jnp.minimum(ext_aid[ghost], n)].set(ghost)
        own = rows[plane:plane + ns_loc]
        amap = amap.at[jnp.minimum(ext_aid[own], n)].set(own)
        amap = amap.at[n].set(-1)

        def owned(r):
            return (r >= plane) & (r < plane + ns_loc)

        if self.bonded is not None:
            b = self.bonded
            idx_kw, ew = {}, {}
            for key, terms in (("bonds", b.bonds), ("angles", b.angles),
                               ("dihedrals", b.dihedrals),
                               ("impropers", b.impropers)):
                if terms is None or not len(terms):
                    continue
                raw = amap[jnp.asarray(terms[:, 1:])]
                present = jnp.all(raw >= 0, axis=1)
                k = raw.shape[1]
                dummy = n_ext + jnp.arange(k, dtype=jnp.int32)
                idx_kw[f"{key}_idx"] = jnp.where(
                    present[:, None], raw, dummy[None, :])
                ew[key] = present & owned(raw[:, 0])
            ctx["bonded_idx"] = idx_kw
            ctx["eweights"] = ew
        if self.shake is not None:
            raw = amap[jnp.asarray(self.shake.pairs)]
            present = jnp.all(raw >= 0, axis=1)
            # constraint-virial ownership (device owning the FIRST atom
            # tallies — boundary molecules are solved on both owners)
            ctx["shake_vw"] = present & owned(raw[:, 0])
            # clustered-solver row map: (M, A) ext rows per cluster atom.
            # Clusters not fully resolvable on this shard (all their
            # constraints are absent here — halo keeps molecules whole)
            # map to an out-of-range row: gathers clamp to a dummy and
            # the net-correction scatter drops them (mode="drop"), the
            # dense analog of the scatter form's dummy-row sink.
            cl = self._shake_cl
            rawr = amap[jnp.asarray(cl.rows_np(n))]      # pads -> amap[n] = -1
            pad = jnp.asarray(cl.atoms < 0)
            present_c = jnp.all((rawr >= 0) | pad, axis=1)
            big = jnp.asarray(n_ext + 4, jnp.int32)      # ext_xs has n_ext+4
            ctx["shake_rows"] = jnp.where(
                present_c[:, None] & (rawr >= 0), rawr, big)
        return ctx

    def _bonded_local(self, jp: dict, ctx: dict, eflag: bool, box=None):
        """Bonded forces on owned rows + ownership-weighted energy/virial
        partials (psum at the consumer)."""
        from ..models.bonded import compute_bonded

        xs = self._ext_xs(jp["x"], jp["y"], jp["z"])
        br = compute_bonded(
            self.bonded, xs, box if box is not None else self.box,
            eflag=eflag, acc_dtype=self.precision.acc,
            eweights=ctx["eweights"], **ctx["bonded_idx"])
        plane = self._plane
        ns_loc = self.grid.nslots // self.D
        return br.f[plane:plane + ns_loc], br

    def _forces_local(self, state: cs.SlotState, kc: dict, eflag: bool,
                      vflag: bool, ctx: Optional[dict] = None,
                      boxL=None, box=None):
        """Local forces + energy terms.  evdwl/ecoul/emol/vir_pair are
        LOCAL partial sums (psum at the consumer); elong/vir_k come back
        from the k-space pipeline already psum-completed (replicated).

        boxL/box: optional TRACED box lengths / Box (the slab-NPT
        subclass threads the variable cell through here; kc then holds
        the traced per-block k-space tables)."""
        if ctx is None:
            ctx = self._term_ctx(state)
        jp = self._halo_planes(state)
        ip = _state_planes(state)
        if self._excl_mol is not None:
            from ..models.pair.cellpair import slot_mol_gather

            mol_slot = slot_mol_gather(self._excl_mol, state.aid,
                                       self.n_atoms)
            ip["mol"] = mol_slot
            jp["mol"] = self._halo(mol_slot)
        sp_idx, sp_code = ctx["sp"]
        r = compute_cell_tiles(
            self.pair, boxL if boxL is not None else self.box.lengths,
            self.n_atoms, self.grid.cap,
            self._nbr_ext, ip, jp,
            eflag=eflag, vflag=vflag, acc_dtype=self.precision.acc,
            slot_special_idx=sp_idx, slot_special_code=sp_code,
            h_matrix=(self.box.h_matrix
                      if boxL is None and self.box.is_triclinic else None),
        )
        fx, fy, fz = r.fx, r.fy, r.fz
        evdwl, ecoul, vir_pair = r.evdwl, r.ecoul, r.virial
        emol = jnp.zeros((), self.precision.acc)
        if self.bonded is not None:
            fb, br = self._bonded_local(jp, ctx, eflag, box=box)
            fx = fx + fb[:, 0]
            fy = fy + fb[:, 1]
            fz = fz + fb[:, 2]
            emol = br.emol
            # CHARMM 1-4 pair terms tally into the PAIR energies
            # (dihedral_charmm.cpp ev_tally convention)
            evdwl = evdwl + br.e14_lj
            ecoul = ecoul + br.e14_coul
            vir_pair = vir_pair + br.virial
        elong = jnp.zeros((), self.precision.acc)
        vir_k = jnp.zeros((6,), self.precision.acc)
        if self.kspace is not None:
            if boxL is None:
                kfx, kfy, kfz, elong, vir_k = \
                    self.kspace.compute_slots_local(
                        state, kc, eflag, vflag, axis=self.axis)
            else:
                kfx, kfy, kfz, elong, vir_k = \
                    self.kspace.compute_slots_local_traced(
                        state, boxL, kc, eflag, vflag, axis=self.axis)
            fx, fy, fz = fx + kfx, fy + kfy, fz + kfz
        return (fx, fy, fz), evdwl, ecoul, elong, emol, vir_pair, vir_k

    def _rebin_local(self, state: cs.SlotState,
                     boxL=None, box_lo=None) -> cs.SlotState:
        """Wrap + migrate boundary planes + bin by local cell id.

        boxL/box_lo: optional TRACED box lengths/origin (slab NPT — bin
        assignment follows the variable cell while the cell COUNTS stay
        static, the LAMMPS static-neigh-grid-between-reneighborings
        contract)."""
        grid = self.grid
        n = self.n_atoms
        ncx, ncy, ncz = grid.nc
        D = self.D
        ncx_loc = self.ncx_loc
        plane = self._plane

        tric = boxL is None and self.box.is_triclinic
        if boxL is None:
            lo = [float(v) for v in np.asarray(self.box.lo)]
            L = [float(v) for v in np.asarray(self.box.lengths)]
            state = cs.wrap_state(self.box, state)
        else:
            lo = [box_lo[0], box_lo[1], box_lo[2]]
            L = [boxL[0], boxL[1], boxL[2]]
            state = cs.wrap_state_traced(state, box_lo, boxL)
        if D > 1:
            # ship COPIES of the boundary planes both ways; receivers keep
            # only rows that bin into their range, senders drop migrants
            from_left = jax.tree.map(
                lambda p: jax.lax.ppermute(p[-plane:], self.axis,
                                           _perm_right(D))
                if p.ndim and p.shape[0] == grid.nslots // D else p,
                state)
            from_right = jax.tree.map(
                lambda p: jax.lax.ppermute(p[:plane], self.axis,
                                           _perm_left(D))
                if p.ndim and p.shape[0] == grid.nslots // D else p,
                state)
            merged = cs.SlotState(*[
                (jnp.concatenate([a, b, c]) if a is not None and a.ndim
                 and a.shape[0] == grid.nslots // D else a)
                for a, b, c in zip(state, from_left, from_right)
            ])
        else:
            merged = state

        valid = merged.aid < n
        if tric:
            # cells are uniform in LAMDA space (cell_slots._slot_cid)
            sx, sy, sz = cs._lamda_planes(self.box, merged.x, merged.y,
                                          merged.z)
            cx = jnp.clip(jnp.floor(sx * ncx).astype(jnp.int32), 0,
                          ncx - 1)
            cy = jnp.clip(jnp.floor(sy * ncy).astype(jnp.int32), 0,
                          ncy - 1)
            cz = jnp.clip(jnp.floor(sz * ncz).astype(jnp.int32), 0,
                          ncz - 1)
        else:
            cx = cs.cell_index(merged.x, lo[0], L[0], ncx)
            cy = cs.cell_index(merged.y, lo[1], L[1], ncy)
            cz = cs.cell_index(merged.z, lo[2], L[2], ncz)
        if D == 1:
            cid = jnp.where(valid, (cx * ncy + cy) * ncz + cz,
                            self.ncell_loc)
            return cs.bin_to_slots(merged, cid, self.ncell_loc, grid.cap, n)

        x0 = jax.lax.axis_index(self.axis) * ncx_loc
        rel = jnp.mod(cx - x0 + 1, ncx) - 1   # [-1, ncx-2]
        keep = valid & (rel >= 0) & (rel < ncx_loc)
        cid = jnp.where(keep, (rel * ncy + cy) * ncz + cz, self.ncell_loc)
        # an OWN atom leaving my range is only legitimate when it exits
        # through the boundary plane it sits in (<= 1-plane drift: the
        # skin/cadence bound).  Anything else would vanish silently from
        # every device -> sticky overflow, surfaced at the next thermo.
        ns_loc = grid.nslots // D
        row = jnp.arange(merged.aid.shape[0])
        own = row < ns_loc
        in_first = row < plane
        in_last = own & (row >= ns_loc - plane)
        ok_exit = (in_first & (rel == -1)) | (in_last & (rel == ncx_loc))
        lost = jnp.any(own & valid & ~keep & ~ok_exit)
        merged = merged._replace(overflow=merged.overflow | lost)
        out = cs.bin_to_slots(merged, cid, self.ncell_loc, grid.cap, n)
        ov = jax.lax.psum(out.overflow.astype(jnp.int32), self.axis) > 0
        return out._replace(overflow=ov)

    def _minv(self, state: cs.SlotState):
        m = _select_small(self._minv_per_type, state.typ, state.typ.shape,
                          self.precision.flt)
        if isinstance(m, float):
            m = jnp.full(state.typ.shape, m, self.precision.flt)
        return jnp.where(state.aid < self.n_atoms, m, 0.0)

    # ---------- sharded step functions ----------

    def _shmap(self, fn, out_specs):
        kc_specs = self._kc_in_specs()
        return shard_map(
            fn, mesh=self.mesh,
            in_specs=(self._state_spec, kc_specs),
            out_specs=out_specs,
            check_vma=False,
        )

    def _make_init_force_fn(self):
        def local(state, kc):
            state = self._rebin_local(state)
            (fx, fy, fz), *_ = self._forces_local(state, kc, False, False)
            flt = state.x.dtype
            return state._replace(fx=fx.astype(flt), fy=fy.astype(flt),
                                  fz=fz.astype(flt))

        return jax.jit(self._shmap(local, self._state_spec))

    def _dof(self) -> int:
        dof = 3 * self.n_atoms - 3
        if self.shake is not None:
            dof -= self.shake.n_constraints
        if self.rigid is not None:
            dof -= self.rigid.n_constraints
        return max(dof, 1)

    def _nhc_scale(self, st: cs.SlotState, th, minv, t_target):
        """Global NH chain half-step: psum'd kinetic energy drives a chain
        update computed identically (replicated) on every device."""
        cfg = self.thermostat
        mass = jnp.where(st.aid < self.n_atoms,
                         1.0 / jnp.maximum(minv, 1e-30), 0.0)
        ke2 = jnp.sum((mass * (st.vx**2 + st.vy**2 + st.vz**2))
                      .astype(self.precision.acc)) * cfg.mvv2e
        if self.D > 1:
            ke2 = jax.lax.psum(ke2, self.axis)
        chain = NHChain(eta=th[0], eta_dot=th[1])
        scale, chain = nhc_half(cfg, chain, None, None, t_target,
                                ke2=ke2.astype(th.dtype))
        return scale, jnp.stack([chain.eta, chain.eta_dot])

    def _block_local(self, state: cs.SlotState, kc: dict, nsteps: int,
                     t_target=0.0):
        state = self._rebin_local(state)
        ctx = self._term_ctx(state)
        minv = self._minv(state)
        dtf, dtv = self.dtf, self.dtv
        flt = self.precision.flt
        cfg = self.thermostat
        sc = self.shake
        Lbox = (self.box if self.box.is_triclinic
                else np.asarray(self.box.lengths, np.float64))
        plane = self._plane
        ns_loc = self.grid.nslots // self.D
        sl = slice(plane, plane + ns_loc)

        def ext3(a, b, c):
            # halo-extended component planes + the 4 dummy rows
            # (constraints of boundary molecules are solved identically
            # on both owners)
            return self._ext_planes(self._halo(a), self._halo(b),
                                    self._halo(c))

        def one_step(st, _):
            th = st.therm
            vx, vy, vz = st.vx, st.vy, st.vz
            if cfg is not None:
                scale, th = self._nhc_scale(st, th, minv, t_target)
                vx, vy, vz = vx * scale, vy * scale, vz * scale
            vx = vx + (dtf * minv) * st.fx
            vy = vy + (dtf * minv) * st.fy
            vz = vz + (dtf * minv) * st.fz
            x = st.x + dtv * vx
            y = st.y + dtv * vy
            z = st.z + dtv * vz
            if sc is not None:
                xs_fix, vs = shake_positions_clustered(
                    sc, self._shake_cl, ext3(st.x, st.y, st.z),
                    ext3(x, y, z), ext3(vx, vy, vz), dtv, Lbox,
                    ctx["shake_rows"])
                x, y, z = (p[sl] for p in xs_fix)
                vx, vy, vz = (p[sl] for p in vs)
            st = st._replace(x=x, y=y, z=z)
            (fx, fy, fz), *_ = self._forces_local(st, kc, False, False,
                                                  ctx=ctx)
            fx = fx.astype(flt)
            fy = fy.astype(flt)
            fz = fz.astype(flt)
            vx = vx + (dtf * minv) * fx
            vy = vy + (dtf * minv) * fy
            vz = vz + (dtf * minv) * fz
            if sc is not None:
                vs = rattle_velocities_clustered(
                    sc, self._shake_cl, ext3(st.x, st.y, st.z),
                    ext3(vx, vy, vz), Lbox, ctx["shake_rows"])
                vx, vy, vz = (p[sl] for p in vs)
            if cfg is not None:
                st2 = st._replace(vx=vx, vy=vy, vz=vz)
                scale, th = self._nhc_scale(st2, th, minv, t_target)
                vx, vy, vz = vx * scale, vy * scale, vz * scale
            return st._replace(
                vx=vx, vy=vy, vz=vz, fx=fx, fy=fy, fz=fz, therm=th), None

        state, _ = jax.lax.scan(one_step, state, None, length=nsteps)
        return state

    # ---------- fix rigid/small on the slab mesh ----------
    #
    # Body state (B, ...) is REPLICATED: each device reduces its owned
    # slots into per-body force/torque partials, one psum completes them
    # (a body straddling a slab boundary needs no ghost machinery — the
    # partial sums ARE the decomposition), and every device advances all
    # bodies identically.  Slot x/v planes are DERIVED from the body
    # state each step through local aid gathers; migration/rebin moves
    # slot rows only, never body state.

    def _rigid_maps(self, state: cs.SlotState):
        """Per-block (binning-static) local body maps."""
        aid = jnp.minimum(state.aid, self.n_atoms)
        bof = jnp.asarray(self._bof_pad)[aid]          # (NS_loc,), B=empty
        rb_s = jnp.asarray(self._rbody_pad)[aid]       # (NS_loc, 3)
        return bof, rb_s

    def _body_ft(self, bs, bof, rb_s, fx, fy, fz):
        """psum-completed body force/torque from local slot forces."""
        from ..integrate.rigid import quat_rotate

        B = self.rigid.nbody
        qp = jnp.concatenate(
            [bs.q, jnp.asarray([[1.0, 0, 0, 0]], bs.q.dtype)])
        d = quat_rotate(qp[bof], rb_s.astype(bs.q.dtype))
        f = jnp.stack([fx, fy, fz], -1).astype(bs.V.dtype)
        F = jax.ops.segment_sum(f, bof, num_segments=B + 1)[:B]
        T = jax.ops.segment_sum(jnp.cross(d, f), bof,
                                num_segments=B + 1)[:B]
        if self.D > 1:
            F = jax.lax.psum(F, self.axis)
            T = jax.lax.psum(T, self.axis)
        return F, T, d

    def _derive_xv(self, bs, bof, rb_s, want_x=True):
        """Local slot planes from the replicated body state."""
        from ..integrate.rigid import (quat_rotate, quat_rotate_inv)

        rg = self.rigid
        flt = self.precision.flt
        qp = jnp.concatenate(
            [bs.q, jnp.asarray([[1.0, 0, 0, 0]], bs.q.dtype)])
        d = quat_rotate(qp[bof], rb_s.astype(bs.q.dtype))
        z1 = jnp.zeros((1, 3), bs.X.dtype)
        out = []
        if want_x:
            Xp = jnp.concatenate([bs.X, z1])
            xs = Xp[bof] + d
            out += [xs[:, 0].astype(flt), xs[:, 1].astype(flt),
                    xs[:, 2].astype(flt)]
        iinv = jnp.asarray(rg.iinv, bs.q.dtype)
        om = quat_rotate(bs.q, iinv * quat_rotate_inv(bs.q, bs.L))
        omp = jnp.concatenate([om, z1])
        Vp = jnp.concatenate([bs.V, z1])
        vs = Vp[bof] + jnp.cross(omp[bof], d)
        out += [vs[:, 0].astype(flt), vs[:, 1].astype(flt),
                vs[:, 2].astype(flt)]
        return out

    def _block_rigid_local(self, state: cs.SlotState, body, kc: dict,
                           nsteps: int, t_target=0.0):
        from ..integrate.rigid import (initial_integrate_rigid_ft,
                                       final_integrate_rigid_ft)

        rg = self.rigid
        state = self._rebin_local(state)
        ctx = self._term_ctx(state)
        bof, rb_s = self._rigid_maps(state)
        minv = self._minv(state)
        dtf, dtv = self.dtf, self.dtv
        flt = self.precision.flt
        cfg = self.thermostat
        # per-slot wrap offsets (exact multiples of L): keep derived
        # positions CONTINUOUS with the just-rebinned (wrapped) planes so
        # the fold-free pencil-PPPM patch weights stay valid and image
        # flags don't double-count crossings (see cellpair _block_rigid)
        _x0, _y0, _z0, _, _, _ = self._derive_xv(body, bof, rb_s)
        offx = state.x - _x0
        offy = state.y - _y0
        offz = state.z - _z0

        def one_step(carry, _):
            st, bs = carry
            th = st.therm
            if cfg is not None:
                # v planes are current (derived after the last kick)
                scale, th = self._nhc_scale(st, th, minv, t_target)
                bs = bs._replace(V=bs.V * scale, L=bs.L * scale)
                st = st._replace(vx=st.vx * scale, vy=st.vy * scale,
                                 vz=st.vz * scale)
            F, T, _ = self._body_ft(bs, bof, rb_s, st.fx, st.fy, st.fz)
            bs = initial_integrate_rigid_ft(rg, bs, F, T, dtv, dtf)
            x, y, z, _, _, _ = self._derive_xv(bs, bof, rb_s)
            st = st._replace(x=x + offx, y=y + offy, z=z + offz)
            (fx, fy, fz), *_ = self._forces_local(st, kc, False, False,
                                                  ctx=ctx)
            fx = fx.astype(flt)
            fy = fy.astype(flt)
            fz = fz.astype(flt)
            F, T, _ = self._body_ft(bs, bof, rb_s, fx, fy, fz)
            bs = final_integrate_rigid_ft(rg, bs, F, T, dtf)
            vx, vy, vz = self._derive_xv(bs, bof, rb_s, want_x=False)
            st = st._replace(vx=vx, vy=vy, vz=vz)
            if cfg is not None:
                scale, th = self._nhc_scale(st, th, minv, t_target)
                bs = bs._replace(V=bs.V * scale, L=bs.L * scale)
                st = st._replace(vx=st.vx * scale, vy=st.vy * scale,
                                 vz=st.vz * scale)
            st = st._replace(fx=fx, fy=fy, fz=fz, therm=th)
            return (st, bs), None

        (state, body), _ = jax.lax.scan(one_step, (state, body), None,
                                        length=nsteps)
        return state, body

    def _repeat_blocks(self, size: int):
        fn = self._chunk_fns.get(size)
        if fn is None:
            if self.rigid is not None:
                def local(state, body, kc, n_blocks, t_target):
                    return jax.lax.fori_loop(
                        0, n_blocks,
                        lambda i, sb: self._block_rigid_local(
                            sb[0], sb[1], kc, size, t_target),
                        (state, body))

                sharded = shard_map(
                    local, mesh=self.mesh,
                    in_specs=(self._state_spec, self._body_spec,
                              self._kc_in_specs(), P(), P()),
                    out_specs=(self._state_spec, self._body_spec),
                    check_vma=False,
                )
            else:
                def local(state, kc, n_blocks, t_target):
                    return jax.lax.fori_loop(
                        0, n_blocks,
                        lambda i, s: self._block_local(s, kc, size,
                                                       t_target),
                        state)

                sharded = shard_map(
                    local, mesh=self.mesh,
                    in_specs=(self._state_spec, self._kc_in_specs(),
                              P(), P()),
                    out_specs=self._state_spec,
                    check_vma=False,
                )
            fn = jax.jit(sharded)
            self._chunk_fns[size] = fn
        return fn

    def _make_thermo_fn(self):
        u = self.units
        acc = self.precision.acc
        D = self.D

        def local(state, body, kc):
            state = self._rebin_local(state)
            ctx = self._term_ctx(state)
            (tfx, tfy, tfz), evdwl, ecoul, elong, emol, vir_pair, vir_k = \
                self._forces_local(state, kc, True, True, ctx=ctx)

            def allsum(v):
                return jax.lax.psum(v, self.axis) if D > 1 else v

            evdwl, ecoul, emol = (allsum(evdwl), allsum(ecoul),
                                  allsum(emol))
            # vir_pair is a local partial; vir_k/elong arrive replicated
            virial = allsum(vir_pair) + vir_k
            if self.rigid is not None:
                # rigid constraint virial (integrate/rigid.py
                # constraint_virial, decomposed): psum-completed torque
                # drives a replicated body-frame Euler; the d (x) fc tally
                # runs on owned slots and psums.  fc = (m/ftm2v) a - f.
                from ..integrate.rigid import quat_rotate, quat_rotate_inv

                rg = self.rigid
                bof, rb_s = self._rigid_maps(state)
                F, T, d = self._body_ft(body, bof, rb_s,
                                        tfx.astype(self.precision.flt),
                                        tfy.astype(self.precision.flt),
                                        tfz.astype(self.precision.flt))
                iinv = jnp.asarray(rg.iinv, body.q.dtype)
                Lb = quat_rotate_inv(body.q, body.L)
                wb = iinv * Lb
                wdotb = iinv * (u.ftm2v * quat_rotate_inv(body.q, T)
                                - jnp.cross(wb, Lb))
                alpha = quat_rotate(body.q, wdotb)
                om = quat_rotate(body.q, wb)
                z1 = jnp.zeros((1, 3), body.q.dtype)
                alp = jnp.concatenate([alpha, z1])[bof]
                omp = jnp.concatenate([om, z1])[bof]
                a = (jnp.cross(alp, d)
                     + jnp.cross(omp, jnp.cross(omp, d)))
                minv_s = self._minv(state)
                m_s = jnp.where(state.aid < self.n_atoms,
                                1.0 / jnp.maximum(minv_s, 1e-30), 0.0)
                f = jnp.stack([tfx, tfy, tfz], -1).astype(d.dtype)
                fc = (m_s / u.ftm2v)[:, None] * a - f
                vir_c = jnp.stack([
                    jnp.sum((d[:, 0] * fc[:, 0]).astype(acc)),
                    jnp.sum((d[:, 1] * fc[:, 1]).astype(acc)),
                    jnp.sum((d[:, 2] * fc[:, 2]).astype(acc)),
                    jnp.sum((d[:, 0] * fc[:, 1]).astype(acc)),
                    jnp.sum((d[:, 0] * fc[:, 2]).astype(acc)),
                    jnp.sum((d[:, 1] * fc[:, 2]).astype(acc)),
                ])
                virial = virial + allsum(vir_c)
            if self.shake is not None:
                # SHAKE constraint virial on the halo-extended rows with
                # per-constraint ownership weights (fix_shake.cpp tally).
                # Clustered form: the scatter form's shared dummy rows
                # make absent constraints diverge (f32 inf -> nan psum).
                from ..integrate.shake import shake_virial_clustered

                flt = self.precision.flt

                def ext3(a, b, c):
                    return self._ext_planes(self._halo(a), self._halo(b),
                                            self._halo(c))

                vir_s = shake_virial_clustered(
                    self.shake, self._shake_cl,
                    ext3(state.x, state.y, state.z),
                    ext3(state.vx, state.vy, state.vz),
                    ext3(tfx.astype(flt), tfy.astype(flt),
                         tfz.astype(flt)),
                    u.ftm2v,
                    (self.box if self.box.is_triclinic
                     else np.asarray(self.box.lengths, np.float64)),
                    ctx["shake_rows"],
                    vweights=ctx["shake_vw"].astype(flt),
                    acc_dtype=acc)
                virial = virial + allsum(vir_s)
            valid = state.aid < self.n_atoms
            minv = self._minv(state)
            mass = jnp.where(valid, 1.0 / jnp.maximum(minv, 1e-30), 0.0)
            v2 = state.vx**2 + state.vy**2 + state.vz**2
            sum_mv2 = allsum(jnp.sum((mass * v2).astype(acc))) * u.mvv2e
            vmax2 = jnp.max(jnp.where(valid, v2, 0.0))
            if D > 1:
                vmax2 = jax.lax.pmax(vmax2, self.axis)
            temp = sum_mv2 / (self._dof() * u.boltz)
            ke = 0.5 * sum_mv2
            vir_trace = virial[0] + virial[1] + virial[2]
            press = (sum_mv2 + vir_trace) / (3.0 * self.box.volume) \
                * u.nktv2p
            epair = evdwl + ecoul + elong
            return dict(
                temp=temp, evdwl=evdwl, ecoul=ecoul, elong=elong,
                emol=emol, epair=epair, ke=ke,
                etotal=epair + emol + ke, press=press,
                overflow=state.overflow,
                vmax=jnp.sqrt(vmax2), virial=virial,
            )

        scalar_specs = dict(
            temp=P(), evdwl=P(), ecoul=P(), elong=P(), emol=P(), epair=P(),
            ke=P(), etotal=P(), press=P(), overflow=P(), vmax=P(),
            virial=P(),
        )
        body_spec = self._body_spec if self.rigid is not None else None
        sharded = shard_map(
            local, mesh=self.mesh,
            in_specs=(self._state_spec, body_spec, self._kc_in_specs()),
            out_specs=scalar_specs,
            check_vma=False,
        )
        return jax.jit(sharded)

    # ---------- host API (mirrors CellPairSimulation) ----------

    def thermo(self) -> dict:
        row = jax.device_get(
            self._thermo_jit(self.state, self.body, self._kc))
        out = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v))
               for k, v in row.items()}
        out["step"] = self.step_count
        out["overflow"] = bool(row["overflow"])
        if not np.isfinite(out["etotal"]) or not np.isfinite(out["temp"]):
            raise RuntimeError(
                f"non-finite thermodynamics at step {out['step']}: "
                "simulation diverged")
        if out["overflow"]:
            raise RuntimeError(
                "slab engine overflow: cell capacity exceeded or an atom "
                "drifted past the adjacent slab between rebins — increase "
                "cap, shrink the rebuild interval, or add devices")
        return out

    def get_atoms(self) -> dict:
        grid = self.grid

        def to_atoms(s):
            return cs.to_atoms(grid, s)

        out = jax.device_get(jax.jit(to_atoms)(self.state))
        return {k: np.asarray(v) for k, v in out.items()}

    def _cadence(self, vmax: Optional[float]) -> int:
        nb = self.neighbor
        if not nb.check or vmax is None or vmax <= 0:
            return max(1, nb.every)
        safe = int(nb.skin / (2.0 * 1.5 * vmax * self.dt))
        return max(1, min(max(safe, 1), 100))

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
        if thermo_every:
            emit()
        elif self.neighbor.check:
            # no thermo fetches will supply vmax — sample once so the
            # displacement-bound cadence applies (else cadence falls to
            # `every`, a full rebin+migration every step for LAMMPS-idiom
            # 'every 1 delay N check yes' decks)
            vmax = float(jax.device_get(jax.jit(
                lambda s: jnp.max(s.vx**2 + s.vy**2 + s.vz**2))(
                    self.state))) ** 0.5
        end = self.step_count + nsteps
        while self.step_count < end:
            target = end
            if thermo_every:
                target = min(
                    end,
                    ((self.step_count // thermo_every) + 1) * thermo_every,
                )
            total = target - self.step_count
            cadence = self._cadence(vmax)
            cfg = self.thermostat
            if cfg is None:
                tt_val = 0.0
            elif cfg.t_start == cfg.t_stop:
                tt_val = cfg.t_start
            else:
                # linear ramp evaluated at the end of this segment (the
                # verlet.py _t_target contract)
                done_after = self.step_count - (end - nsteps) + total
                frac = min(max(done_after / max(nsteps, 1), 0.0), 1.0)
                tt_val = cfg.t_start + (cfg.t_stop - cfg.t_start) * frac
            tt = jnp.asarray(tt_val, self.precision.flt)
            n_full, rem = divmod(total, cadence)
            if self.rigid is not None:
                if n_full:
                    self.state, self.body = self._repeat_blocks(cadence)(
                        self.state, self.body, self._kc, n_full, tt)
                if rem:
                    self.state, self.body = self._repeat_blocks(rem)(
                        self.state, self.body, self._kc, 1, tt)
            else:
                if n_full:
                    self.state = self._repeat_blocks(cadence)(
                        self.state, self._kc, n_full, tt)
                if rem:
                    self.state = self._repeat_blocks(rem)(
                        self.state, self._kc, 1, tt)
            self.step_count = target
            if thermo_every and self.step_count % thermo_every == 0:
                emit()
        if thermo_every and (not rows or rows[-1]["step"] != self.step_count):
            emit()
        else:
            # guards fire even with thermo_every=0 (advisor r2 contract):
            # one cheap scalar fetch of the sticky overflow flag
            if bool(np.asarray(jax.device_get(self.state.overflow)).any()):
                raise RuntimeError(
                    "slab engine overflow: cell capacity exceeded or an "
                    "atom drifted past the adjacent slab between rebins — "
                    "increase cap, shrink the rebuild interval, or add "
                    "devices")
        self.timings["run"] += time.perf_counter() - t0
        return rows
