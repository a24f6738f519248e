"""2-D (x, y) pencil decomposition over the device mesh — pod-scale
headroom past the 1-D slab engine.

The slab engine (parallel/slab.py) shards x cell-planes over a 1-D mesh;
on a fixed box the planes thin out as devices grow (the 259k north star
is ~3 cell planes/device at 32 chips).  This module decomposes cells
into (Dx, Dy) pencil BLOCKS — the 2-D analog of host LAMMPS' 3-D brick
decomposition (SURVEY.md H3) — with:

* device-major slot layout: global slot order = (device block, local
  cell, slot), so the flat "xy" mesh axis shards contiguous chunks;
* two-stage ppermute ghost exchange: x boundary planes first, then y
  boundary strips OF THE x-EXTENDED array — the 8-neighbor halo
  (edges + corners) in two hops, the standard dimension-ordered halo;
* two-stage migration relay in the rebin: boundary slots ship along x,
  then the y boundaries of the merged candidate set ship along y, so a
  diagonally-migrating atom reaches the corner device in two hops;
* psum scalars over the flat axis (energies, NH kinetic energy).

Scope: the hot production surface — pair styles, NVT, and the sharded
k-space adapters (ShardedEwald psums over any axis; GatheredKSpace
likewise).  The molecular fix stack (SHAKE/bonded/rigid/NPT) ships on
the 1-D slab engine; this engine extends the *decomposition* so the
atom axis keeps scaling when 1-D slabs run out of planes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import System
from ..core.units import Units, LJ
from ..core.precision import Precision, single
from ..neighbor import cell_slots as cs
from ..models.pair.cellpair import compute_cell_tiles, _state_planes
from ..models.pair.styles import PairStyle
from ..integrate.verlet import NeighborPolicy
from ..integrate.nvt import NVTConfig, NHChain, nhc_half

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def pencil_mesh(dx: int, dy: int) -> Mesh:
    """True 2-axis ("x", "y") device mesh: named-axis collectives give
    subgroup ppermute/all_to_all for free (halos ride rows/columns of
    the device grid; the pencil FFT transposes within one axis)."""
    n = dx * dy
    devs = np.asarray(jax.devices()[:n])
    if devs.size < n:
        raise ValueError(
            f"pencil mesh: {n} devices requested, only "
            f"{len(jax.devices())} visible")
    return Mesh(devs.reshape(dx, dy), ("x", "y"))


def _ring(d: int, step: int):
    """Within-axis ring permutation (named-axis ppermute indices)."""
    return [(i, (i + step) % d) for i in range(d)]


def ext_nbr_table_2d(ncx_loc: int, ncy_loc: int, ncz: int) -> np.ndarray:
    """(ncell_loc, 27) j-cell ids into the halo-extended local grid
    ((ncx_loc+2) x (ncy_loc+2) x ncz); x/y reach the halo (never wrap),
    z wraps locally (unsharded axis)."""
    ex, ey = ncx_loc + 2, ncy_loc + 2
    out = np.empty((ncx_loc * ncy_loc * ncz, 27), np.int32)
    i = 0
    for cx in range(ncx_loc):
        for cy in range(ncy_loc):
            for cz in range(ncz):
                k = 0
                for ox in (-1, 0, 1):
                    for oy in (-1, 0, 1):
                        for oz in (-1, 0, 1):
                            jx = cx + 1 + ox
                            jy = cy + 1 + oy
                            jz = (cz + oz) % ncz
                            out[i, k] = (jx * ey + jy) * ncz + jz
                            k += 1
                i += 1
    return out


class Pencil2DSimulation:
    """2-D pencil MD driver on the slot layout (run/thermo/get_atoms)."""

    def __init__(
        self,
        system: System,
        pair: PairStyle,
        mesh: Optional[Mesh] = None,
        dims: tuple[int, int] = (2, 2),
        units: Units = LJ,
        precision: Precision = None,
        dt: Optional[float] = None,
        neighbor: Optional[NeighborPolicy] = None,
        cap: Optional[int] = None,
        kspace_setup: Optional[Callable] = None,
        thermostat: Optional[NVTConfig] = None,
    ):
        self.Dx, self.Dy = int(dims[0]), int(dims[1])
        self.D = self.Dx * self.Dy
        if mesh is None:
            mesh = pencil_mesh(self.Dx, self.Dy)
        self.mesh = mesh
        self.ax_x, self.ax_y = mesh.axis_names
        # joint axis handle: psum/all_gather over both mesh axes
        self.axis = (self.ax_x, self.ax_y)
        self.units = units
        self.precision = precision or single()
        self.dt = units.dt if dt is None else dt
        self.pair = pair
        self.neighbor = neighbor or NeighborPolicy(skin=units.skin)
        self.box = system.box
        n = system.n_atoms
        self.n_atoms = n
        flt = self.precision.flt

        cutneigh = float(np.sqrt(pair.cutsq_max)) + self.neighbor.skin
        L = np.asarray(self.box.perp_widths)
        grid = cs.make_grid(n, L, cutneigh, cap=cap)
        if grid is None:
            raise ValueError("box too small for the cell-pair engine")
        # x/y extents must tile the device grid; round DOWN (cells only
        # get bigger, staying >= cutneigh)
        ncx = (grid.nc[0] // self.Dx) * self.Dx
        ncy = (grid.nc[1] // self.Dy) * self.Dy
        for nc_ax, d_ax, nm in ((ncx, self.Dx, "x"), (ncy, self.Dy, "y")):
            if nc_ax < 3 or (d_ax == 2 and nc_ax // d_ax < 2):
                raise ValueError(
                    f"cannot cut {nc_ax} {nm}-cells into {d_ax} blocks "
                    "(need >= 1 cell/device; >= 2 with 2 devices)")
        grid = dataclasses.replace(grid, nc=(ncx, ncy, grid.nc[2]))
        if cap is None:
            self.grid = grid
            occ = self._occupancy(system)
            grid = dataclasses.replace(
                grid, cap=max(8, ((int(occ * 1.2) + 4 + 7) // 8) * 8))
        self.grid = grid
        self.ncx_loc = ncx // self.Dx
        self.ncy_loc = ncy // self.Dy
        self.ncz = grid.nc[2]
        self.ncell_loc = self.ncx_loc * self.ncy_loc * self.ncz
        self._nbr_ext = ext_nbr_table_2d(self.ncx_loc, self.ncy_loc,
                                         self.ncz)

        typ_np = np.asarray(jax.device_get(system.type), np.int32)
        mass = np.asarray(jax.device_get(system.mass), np.float64)
        self._minv_per_type = (1.0 / mass).astype(np.dtype(flt))
        self.dtf = float(0.5 * self.dt * units.ftm2v)
        self.dtv = float(self.dt)
        self.thermostat = None
        tchain = 0
        if thermostat is not None:
            self.thermostat = dataclasses.replace(
                thermostat, dof=max(3 * n - 3, 1), boltz=units.boltz,
                mvv2e=units.mvv2e, dt=self.dt)
            tchain = self.thermostat.tchain

        st = self._from_atoms(system, typ_np, flt, tchain)
        if bool(jax.device_get(st.overflow)):
            self.grid = cs.grow(self.grid, observed_max=self._occupancy(
                system))
            st = self._from_atoms(system, typ_np, flt, tchain)
            if bool(jax.device_get(st.overflow)):
                raise RuntimeError("cell capacity sizing failed")

        self.kspace = None
        self._kc = {}
        if kspace_setup is not None:
            self.kspace = kspace_setup(self)
            consts = self.kspace.spectral_consts()
            shards = self.kspace.shardings(self.mesh, self.axis)
            self._kc = {k: jax.device_put(np.asarray(v), shards[k])
                        for k, v in consts.items()}

        self._state_spec = cs.SlotState(
            **{f: P((self.ax_x, self.ax_y))
               for f in cs.SlotState._fields
               if f not in ("overflow", "therm", "comp")},
            overflow=P(), therm=P(), comp=None,
        )
        self._state_sharding = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), self._state_spec,
            is_leaf=lambda v: isinstance(v, P),
        )
        self.state = jax.device_put(st, self._state_sharding)
        self.step_count = 0
        self._chunk_fns: dict[int, Callable] = {}
        self._thermo_jit = self._make_thermo_fn()
        self.state = self._make_init_force_fn()(self.state, self._kc)

    # ---------- device-major binning ----------

    def _dev_cid(self, cx, cy, cz):
        """Device-major global bin: d * ncell_loc + local cell id."""
        d = (cx // self.ncx_loc) * self.Dy + cy // self.ncy_loc
        lcid = ((cx % self.ncx_loc) * self.ncy_loc
                + cy % self.ncy_loc) * self.ncz + cz
        return d * self.ncell_loc + lcid

    def _from_atoms(self, system, typ_np, flt, tchain):
        return self._from_arrays(
            jax.device_get(system.x), jax.device_get(system.v),
            jax.device_get(system.image), typ_np,
            jax.device_get(system.q), flt, tchain)

    def _from_arrays(self, x_np, v_np, image_np, typ_np, q_np, flt,
                     tchain):
        # device-major binning from atom-ordered arrays (init and
        # checkpoint resume share this path)
        n = self.n_atoms
        x = jnp.asarray(x_np, flt)
        v = jnp.asarray(v_np, flt)
        image = jnp.asarray(image_np, jnp.int32)
        st = cs.SlotState(
            x=x[:, 0], y=x[:, 1], z=x[:, 2],
            vx=v[:, 0], vy=v[:, 1], vz=v[:, 2],
            fx=jnp.zeros((n,), flt), fy=jnp.zeros((n,), flt),
            fz=jnp.zeros((n,), flt),
            ix=image[:, 0], iy=image[:, 1], iz=image[:, 2],
            typ=jnp.asarray(typ_np, jnp.int32),
            q=jnp.asarray(q_np, flt),
            aid=jnp.arange(n, dtype=jnp.int32),
            overflow=jnp.zeros((), bool),
            therm=jnp.zeros((2, tchain), flt), comp=None,
        )
        st = cs.wrap_state(self.box, st)
        cx, cy, cz = self._global_cells(st.x, st.y, st.z)
        cid = jnp.where(st.aid < n, self._dev_cid(cx, cy, cz),
                        self.D * self.ncell_loc)
        return cs.bin_to_slots(st, cid, self.D * self.ncell_loc,
                               self.grid.cap, n)

    def _global_cells(self, x, y, z):
        box, grid = self.box, self.grid
        if box.is_triclinic:
            sx, sy, sz = cs._lamda_planes(box, x, y, z)
            cx = jnp.clip(jnp.floor(sx * grid.nc[0]).astype(jnp.int32),
                          0, grid.nc[0] - 1)
            cy = jnp.clip(jnp.floor(sy * grid.nc[1]).astype(jnp.int32),
                          0, grid.nc[1] - 1)
            cz = jnp.clip(jnp.floor(sz * grid.nc[2]).astype(jnp.int32),
                          0, grid.nc[2] - 1)
            return cx, cy, cz
        lo = [float(v) for v in np.asarray(box.lo)]
        L = [float(v) for v in np.asarray(box.lengths)]
        return (cs.cell_index(x, lo[0], L[0], grid.nc[0]),
                cs.cell_index(y, lo[1], L[1], grid.nc[1]),
                cs.cell_index(z, lo[2], L[2], grid.nc[2]))

    def _occupancy(self, system) -> int:
        x = np.asarray(jax.device_get(system.x))
        lo = np.asarray(self.box.lo)
        nc = np.asarray(self.grid.nc)
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

    def _halo2d(self, p):
        """Slot plane (ns_loc,) -> halo-extended
        ((ncx_loc+2)*(ncy_loc+2)*ncz*cap,): x planes first, then y strips
        of the x-extended array (corners ride the second hop)."""
        cap = self.grid.cap
        nzc = self.ncz * cap
        a = p.reshape(self.ncx_loc, self.ncy_loc, nzc)
        first, last = a[:1], a[-1:]
        if self.Dx > 1:
            left = jax.lax.ppermute(last, self.ax_x, _ring(self.Dx, 1))
            right = jax.lax.ppermute(first, self.ax_x, _ring(self.Dx, -1))
        else:
            left, right = last, first
        a = jnp.concatenate([left, a, right], axis=0)
        first_y, last_y = a[:, :1], a[:, -1:]
        if self.Dy > 1:
            low = jax.lax.ppermute(last_y, self.ax_y, _ring(self.Dy, 1))
            high = jax.lax.ppermute(first_y, self.ax_y,
                                    _ring(self.Dy, -1))
        else:
            low, high = last_y, first_y
        a = jnp.concatenate([low, a, high], axis=1)
        return a.reshape(-1)

    def _forces_local(self, state: cs.SlotState, kc: dict, eflag: bool,
                      vflag: bool):
        jp = {k: self._halo2d(v) for k, v in _state_planes(state).items()}
        ip = _state_planes(state)
        r = compute_cell_tiles(
            self.pair, self.box.lengths, self.n_atoms, self.grid.cap,
            self._nbr_ext, ip, jp,
            eflag=eflag, vflag=vflag, acc_dtype=self.precision.acc,
            h_matrix=(self.box.h_matrix if self.box.is_triclinic
                      else None),
        )
        fx, fy, fz = r.fx, r.fy, r.fz
        elong = jnp.zeros((), self.precision.acc)
        vir_k = jnp.zeros((6,), self.precision.acc)
        if self.kspace is not None:
            kfx, kfy, kfz, elong, vir_k = self.kspace.compute_slots_local(
                state, kc, eflag, vflag, axis=self.axis)
            fx, fy, fz = fx + kfx, fy + kfy, fz + kfz
        return (fx, fy, fz), r.evdwl, r.ecoul, elong, r.virial, vir_k

    def _rebin_local(self, state: cs.SlotState) -> cs.SlotState:
        """Wrap + two-stage migration relay + bin by local cell id."""
        grid = self.grid
        n = self.n_atoms
        cap = grid.cap
        ns_loc = self.ncell_loc * cap
        nzc = self.ncz * cap
        plane_x = self.ncy_loc * nzc

        state = cs.wrap_state(self.box, state)

        def is_slot_plane(p):
            return p.ndim and p.shape[0] == ns_loc

        # stage 1: ship COPIES of the x boundary planes both ways
        if self.Dx > 1:
            from_left = jax.tree.map(
                lambda p: jax.lax.ppermute(
                    p[-plane_x:], self.ax_x, _ring(self.Dx, 1))
                if is_slot_plane(p) else p, state)
            from_right = jax.tree.map(
                lambda p: jax.lax.ppermute(
                    p[:plane_x], self.ax_x, _ring(self.Dx, -1))
                if is_slot_plane(p) else p, state)
            merged = cs.SlotState(*[
                (jnp.concatenate([a, b, c]) if a is not None
                 and is_slot_plane(a) else a)
                for a, b, c in zip(state, from_left, from_right)
            ])
            m_rows = ns_loc + 2 * plane_x
        else:
            merged = state
            m_rows = ns_loc

        # stage 2: y boundary strips OF THE MERGED candidate set (the
        # received x planes included — diagonal migrants relay through)
        nx_eff = m_rows // plane_x  # ncx_loc (+2 when Dx > 1)

        def ystrips(p, side):
            a = p[:nx_eff * plane_x].reshape(nx_eff, self.ncy_loc, nzc)
            return (a[:, -1] if side else a[:, 0]).reshape(-1)

        if self.Dy > 1:
            from_low = jax.tree.map(
                lambda p: jax.lax.ppermute(
                    ystrips(p, True), self.ax_y, _ring(self.Dy, 1))
                if p is not None and p.ndim and p.shape[0] == m_rows
                else p, merged)
            from_high = jax.tree.map(
                lambda p: jax.lax.ppermute(
                    ystrips(p, False), self.ax_y, _ring(self.Dy, -1))
                if p is not None and p.ndim and p.shape[0] == m_rows
                else p, merged)
            merged = cs.SlotState(*[
                (jnp.concatenate([a, b, c]) if a is not None and a.ndim
                 and a.shape[0] == m_rows else a)
                for a, b, c in zip(merged, from_low, from_high)
            ])

        valid = merged.aid < n
        cx, cy, cz = self._global_cells(merged.x, merged.y, merged.z)
        x0 = jax.lax.axis_index(self.ax_x) * self.ncx_loc
        y0 = jax.lax.axis_index(self.ax_y) * self.ncy_loc
        ncx, ncy = grid.nc[0], grid.nc[1]
        # single-block axes own every cell — no relative wrap (the wrap
        # would map the last plane to -1 and drop it)
        relx = cx if self.Dx == 1 else jnp.mod(cx - x0 + 1, ncx) - 1
        rely = cy if self.Dy == 1 else jnp.mod(cy - y0 + 1, ncy) - 1
        keep = (valid & (relx >= 0) & (relx < self.ncx_loc)
                & (rely >= 0) & (rely < self.ncy_loc))
        cid = jnp.where(
            keep, (relx * self.ncy_loc + rely) * self.ncz + cz,
            self.ncell_loc)

        # lost-atom guard: an OWN atom leaving my block must exit through
        # a boundary plane it occupies (<= 1-plane drift per axis)
        row = jnp.arange(merged.aid.shape[0])
        own = row < ns_loc
        lx = (row // plane_x) * (row < ns_loc)
        ly = jnp.mod(row // nzc, self.ncy_loc)
        ok_x = ((relx >= 0) & (relx < self.ncx_loc)) \
            | ((lx == 0) & (relx == -1)) \
            | ((lx == self.ncx_loc - 1) & (relx == self.ncx_loc))
        ok_y = ((rely >= 0) & (rely < self.ncy_loc)) \
            | ((ly == 0) & (rely == -1)) \
            | ((ly == self.ncy_loc - 1) & (rely == self.ncy_loc))
        lost = jnp.any(own & valid & ~keep & ~(ok_x & ok_y))
        merged = merged._replace(overflow=merged.overflow | lost)
        out = cs.bin_to_slots(merged, cid, self.ncell_loc, cap, n)
        ov = jax.lax.psum(out.overflow.astype(jnp.int32), self.axis) > 0
        return out._replace(overflow=ov)

    def _minv(self, state: cs.SlotState):
        inv = jnp.asarray(self._minv_per_type)
        m = inv[jnp.clip(state.typ, 0, inv.shape[0] - 1)]
        return jnp.where(state.aid < self.n_atoms, m, 0.0)

    def _nhc_scale(self, st, th, minv, t_target):
        cfg = self.thermostat
        mass = jnp.where(st.aid < self.n_atoms,
                         1.0 / jnp.maximum(minv, 1e-30), 0.0)
        ke2 = jnp.sum((mass * (st.vx**2 + st.vy**2 + st.vz**2))
                      .astype(self.precision.acc)) * cfg.mvv2e
        ke2 = jax.lax.psum(ke2, self.axis)
        chain = NHChain(eta=th[0], eta_dot=th[1])
        scale, chain = nhc_half(cfg, chain, None, None, t_target,
                                ke2=ke2.astype(th.dtype))
        return scale, jnp.stack([chain.eta, chain.eta_dot])

    def _block_local(self, state, kc, nsteps: int, t_target=0.0):
        state = self._rebin_local(state)
        minv = self._minv(state)
        dtf, dtv = self.dtf, self.dtv
        flt = self.precision.flt
        cfg = self.thermostat

        def one_step(st, _):
            th = st.therm
            if cfg is not None:
                scale, th = self._nhc_scale(st, th, minv, t_target)
                st = st._replace(vx=st.vx * scale, vy=st.vy * scale,
                                 vz=st.vz * scale)
            vx = st.vx + (dtf * minv * st.fx).astype(flt)
            vy = st.vy + (dtf * minv * st.fy).astype(flt)
            vz = st.vz + (dtf * minv * st.fz).astype(flt)
            st = st._replace(
                x=st.x + dtv * vx, y=st.y + dtv * vy, z=st.z + dtv * vz)
            (fx, fy, fz), *_ = self._forces_local(st, kc, False, False)
            vx = vx + (dtf * minv * fx).astype(flt)
            vy = vy + (dtf * minv * fy).astype(flt)
            vz = vz + (dtf * minv * fz).astype(flt)
            st = st._replace(vx=vx, vy=vy, vz=vz,
                             fx=fx.astype(flt), fy=fy.astype(flt),
                             fz=fz.astype(flt), therm=th)
            if cfg is not None:
                scale, th = self._nhc_scale(st, st.therm, minv, t_target)
                st = st._replace(vx=st.vx * scale, vy=st.vy * scale,
                                 vz=st.vz * scale, therm=th)
            return st, None

        state, _ = jax.lax.scan(one_step, state, None, length=nsteps)
        return state

    def _shmap(self, fn, out_specs):
        return shard_map(
            fn, mesh=self.mesh,
            in_specs=(self._state_spec, self._kc_in_specs()),
            out_specs=out_specs, check_vma=False,
        )

    def _make_init_force_fn(self):
        def local(state, kc):
            state = self._rebin_local(state)
            (fx, fy, fz), *_ = self._forces_local(state, kc, False, False)
            flt = state.x.dtype
            return state._replace(fx=fx.astype(flt), fy=fy.astype(flt),
                                  fz=fz.astype(flt))

        return jax.jit(self._shmap(local, self._state_spec))

    def _block_fn(self, size: int):
        fn = self._chunk_fns.get(size)
        if fn is None:
            def local(state, kc, t_target):
                return self._block_local(state, kc, size, t_target)

            fn = jax.jit(shard_map(
                local, mesh=self.mesh,
                in_specs=(self._state_spec, self._kc_in_specs(), P()),
                out_specs=self._state_spec, check_vma=False,
            ))
            self._chunk_fns[size] = fn
        return fn

    # ---------- thermo ----------

    def _make_thermo_fn(self):
        u = self.units
        acc = self.precision.acc

        def local(state, kc):
            state = self._rebin_local(state)
            _, evdwl, ecoul, elong, vir_p, vir_k = self._forces_local(
                state, kc, True, True)
            def allsum(v):
                return jax.lax.psum(v, self.axis)
            evdwl = allsum(evdwl)
            ecoul = allsum(ecoul)
            vir = allsum(vir_p) + vir_k   # vir_k arrives replicated
            minv = self._minv(state)
            mass = jnp.where(state.aid < self.n_atoms,
                             1.0 / jnp.maximum(minv, 1e-30), 0.0)
            mv2 = allsum(jnp.sum(
                (mass * (state.vx**2 + state.vy**2 + state.vz**2))
                .astype(acc))) * u.mvv2e
            dof = max(3 * self.n_atoms - 3, 1)
            temp = mv2 / (dof * u.boltz)
            ke = 0.5 * mv2
            vol = self.box.volume
            press = (mv2 + vir[0] + vir[1] + vir[2]) / (3.0 * vol) \
                * u.nktv2p
            epair = evdwl + ecoul + elong
            return dict(temp=temp, ke=ke, evdwl=evdwl, ecoul=ecoul,
                        elong=elong, epair=epair, etotal=epair + ke,
                        press=press, virial=vir,
                        overflow=state.overflow)

        return jax.jit(shard_map(
            local, mesh=self.mesh,
            in_specs=(self._state_spec, self._kc_in_specs()),
            out_specs=P(), check_vma=False,
        ))

    def thermo(self) -> dict:
        row = jax.device_get(self._thermo_jit(self.state, self._kc))
        out = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v))
               for k, v in row.items()}
        out["step"] = self.step_count
        out["overflow"] = bool(row["overflow"])
        if out["overflow"]:
            raise RuntimeError(
                "pencil2d engine overflow: cell capacity exceeded or an "
                "atom drifted past the adjacent block between rebins")
        if not np.isfinite(out["etotal"]):
            raise RuntimeError(
                f"non-finite thermodynamics at step {out['step']}")
        return out

    def get_atoms(self) -> dict:
        st = jax.device_get(self.state)
        return {k: np.asarray(v)
                for k, v in jax.device_get(
                    cs.to_atoms(self.grid, cs.SlotState(*st))).items()}

    def _cadence(self, vmax=None) -> int:
        # stale-list bound: drift <= min(skin/2, one cell plane) — the
        # slab engine's displacement-bound contract
        nb = self.neighbor
        if not nb.check or vmax is None or vmax <= 0:
            return max(1, int(nb.every))
        safe = int(nb.skin / (2.0 * 1.5 * vmax * self.dt))
        return max(1, min(max(safe, 1), 100))

    def _vmax(self) -> float:
        return float(jax.device_get(jax.jit(
            lambda s: jnp.max(s.vx**2 + s.vy**2 + s.vz**2))(
                self.state))) ** 0.5

    def run(self, nsteps: int, thermo_every: int = 0, log: bool = True):
        rows = []

        def emit():
            row = self.thermo()
            rows.append(row)
            if log:
                print({k: round(float(v), 5) for k, v in row.items()
                       if np.ndim(v) == 0})

        if thermo_every:
            emit()
        vmax = self._vmax() if self.neighbor.check else None
        cad = self._cadence(vmax)
        cfg = self.thermostat
        done = 0
        while done < nsteps:
            chunk = min(cad, nsteps - done)
            # align chunks to the thermo cadence
            if thermo_every:
                to_next = thermo_every - (done % thermo_every)
                chunk = min(chunk, to_next)
            if cfg is None:
                t_target = 0.0
            else:
                # linear ramp evaluated at the end of this segment
                frac = min(max((done + chunk) / max(nsteps, 1), 0.0), 1.0)
                t_target = float(cfg.t_start
                                 + (cfg.t_stop - cfg.t_start) * frac)
            self.state = self._block_fn(chunk)(self.state, self._kc,
                                               t_target)
            done += chunk
            self.step_count += chunk
            if thermo_every and done % thermo_every == 0:
                emit()
        return rows
