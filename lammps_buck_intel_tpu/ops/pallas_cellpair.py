"""Pallas cell-pair force kernels — EXPERIMENTS, not the production path.

VERDICT (three hardware A/Bs, judge r3 #9 resolution): XLA's dense
kernel wins at every tile shape tried, because it fuses the pre-gathered
j-planes directly into the physics while a hand kernel re-stages them
through VMEM block specs.  Measured on the 259k silica pair pass
(TPU v5e): v1 full-27 105.5 ms, v2 lane-fused 67.0 ms, v3 pipelined
77.7 ms vs XLA Newton half-stencil 34.4 ms (PERF.md, r3).  v1 (the
least competitive and least instructive variant: lane padding 168->256
+ an unpipelined 27-iteration loop, both diagnosed and fixed in v2/v3)
is retired; v2/v3 stay selectable via the deck key `pair_kernel:`
(integrate/cellpair_verlet.py) as the recorded experiment and the
starting point should the fusion balance shift on future hardware.
`bench.py` defaults to the XLA kernel; BENCH_AUTOTUNE=full re-runs the
full A/B.

The j-side (ncell, 27*cap) planes are pre-gathered by XLA (a static
row-gather, bandwidth-cheap); Pallas removes only the expensive part — the
pair-tile traffic.  This is the reference's SIMD j-loop
(pair_buck_intel.cpp:236-275) in its most literal TPU form: an 8x128-lane
inner tile with VMASK-style selects, per-cell instead of per-thread.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.pair.styles import PairStyle, pair_terms
from ..models.pair.driver import _select_small, COEF_NAMES
from ..neighbor.cell_slots import CellGrid, SlotState


def _tile_physics(style, L, n_atoms, ntypes, flat_tables,
                  xi, yi, zi, qi, ti, aidi,
                  xj, yj, zj, qj, tj, aidj):
    """(cap,) i-arrays x (cap_j,) j-arrays -> per-pair force scalar and
    displacement planes; pure jnp, runs inside the Pallas kernel."""
    flt = xi.dtype
    mask = (
        (aidi[:, None] != aidj[None, :])
        & (aidi[:, None] < n_atoms)
        & (aidj[None, :] < n_atoms)
    )
    d = []
    rsq = None
    for ci, cj, La in ((xi, xj, L[0]), (yi, yj, L[1]), (zi, zj, L[2])):
        dd = ci[:, None] - cj[None, :]
        dd = dd - jnp.round(dd * (1.0 / La)) * La
        d.append(dd)
        rsq = dd * dd if rsq is None else rsq + dd * dd
    rsq = jnp.where(mask, rsq, jnp.asarray(1e30, flt))
    if ntypes == 1:
        coef = {name: float(flat_tables[0, k])
                for k, name in enumerate(COEF_NAMES)}
    else:
        tt = ti[:, None] * ntypes + tj[None, :]
        coef = {name: _select_small(flat_tables[:, k], tt, rsq.shape, flt)
                for k, name in enumerate(COEF_NAMES)}
    if style.cfg.has_coul:
        qip, qjp = qi[:, None], qj[None, :]
    else:
        qip = qjp = 0.0
    fscalar, _, _ = pair_terms(style, rsq, coef, qip, qjp, 1.0, 1.0,
                               eflag=False)
    fscalar = jnp.where(mask, fscalar, 0.0)
    return fscalar, d


def make_pallas_cellpair_v2(style: PairStyle, grid: CellGrid, box,
                            interpret: bool = False, group: int = 9):
    """Lane-fused variant: the 27 neighbor sub-tiles are processed in
    27/group groups whose j atoms are FUSED along the lane axis — tile
    (cap, group*cap).  With group=9 and cap a multiple of 8, lanes pad
    1512 -> 1536 (1.6%) instead of the v1 (cap, cap) tiles' 168 -> 256
    (52%), attacking exactly the gap v1 measured against XLA (see module
    docstring).  The host feeds j planes pre-reshaped (ncell, 27/group,
    group*cap), so no in-kernel relayout is needed.
    """
    assert 27 % group == 0
    ngroup = 27 // group
    cap = grid.cap
    ncell = grid.ncell
    n = grid.n_atoms
    ntypes = style.tables.shape[0]
    flat_tables = np.asarray(style.tables).reshape(ntypes * ntypes, -1)
    L = [float(v) for v in np.asarray(box.lengths)]
    nbr = grid.nbr_array()

    CB = 8
    ncell_p = ((ncell + CB - 1) // CB) * CB

    def kernel(xi_r, yi_r, zi_r, qi_r, ti_r, ai_r,
               xj_r, yj_r, zj_r, qj_r, tj_r, aj_r,
               fx_r, fy_r, fz_r):
        for c in range(CB):
            xi = xi_r[c, :]
            yi = yi_r[c, :]
            zi = zi_r[c, :]
            qi = qi_r[c, :]
            ti = ti_r[c, :]
            ai = ai_r[c, :]

            def body(g, acc, c=c, xi=xi, yi=yi, zi=zi, qi=qi, ti=ti,
                     ai=ai):
                accx, accy, accz = acc
                fs, d = _tile_physics(
                    style, L, n, ntypes, flat_tables,
                    xi, yi, zi, qi, ti, ai,
                    xj_r[c, g, :], yj_r[c, g, :], zj_r[c, g, :],
                    qj_r[c, g, :], tj_r[c, g, :], aj_r[c, g, :],
                )
                accx = accx + jnp.sum(fs * d[0], axis=1)
                accy = accy + jnp.sum(fs * d[1], axis=1)
                accz = accz + jnp.sum(fs * d[2], axis=1)
                return accx, accy, accz

            z = jnp.zeros((cap,), xi.dtype)
            fx, fy, fz = jax.lax.fori_loop(0, ngroup, body, (z, z, z))
            fx_r[c, :] = fx
            fy_r[c, :] = fy
            fz_r[c, :] = fz

    ispec = pl.BlockSpec((CB, cap), lambda c: (c, 0),
                         memory_space=pltpu.VMEM)
    jspec = pl.BlockSpec((CB, ngroup, group * cap), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(ncell_p // CB,),
        in_specs=[ispec] * 6 + [jspec] * 6,
        out_specs=[ispec] * 3,
        out_shape=[jax.ShapeDtypeStruct((ncell_p, cap), jnp.float32)] * 3,
        interpret=interpret,
    )

    nbr_j = jnp.asarray(nbr)
    padc = ncell_p - ncell

    def fn(state: SlotState):
        def cv(p, fill=0):
            a = p.reshape(ncell, cap)
            if padc:
                a = jnp.concatenate(
                    [a, jnp.full((padc, cap), fill, a.dtype)])
            return a

        def jv(p, fill=0):
            a = p.reshape(ncell, cap)[nbr_j]          # (ncell, 27, cap)
            a = a.reshape(ncell, ngroup, group * cap)
            if padc:
                a = jnp.concatenate(
                    [a, jnp.full((padc, ngroup, group * cap), fill,
                                 a.dtype)])
            return a

        fx, fy, fz = call(
            cv(state.x), cv(state.y), cv(state.z), cv(state.q),
            cv(state.typ), cv(state.aid, fill=n),
            jv(state.x), jv(state.y), jv(state.z), jv(state.q),
            jv(state.typ), jv(state.aid, fill=n),
        )
        return (fx[:ncell].reshape(-1), fy[:ncell].reshape(-1),
                fz[:ncell].reshape(-1))

    return fn


def make_pallas_cellpair_v3(style: PairStyle, grid: CellGrid, box,
                            interpret: bool = False, group: int = 9):
    """Pipelined lane-fused variant: v2's neighbor-group fori_loop becomes
    the MINOR grid dimension, so the Pallas pipeline double-buffers each
    (CB, group*cap) j block's HBM->VMEM DMA against the previous group's
    physics (the module docstring's remaining candidate fix), and forces
    accumulate in the output block, which stays VMEM-resident across the
    inner grid steps (its index map ignores g).  VMEM working set also
    drops ngroup-fold vs v2, which helps Mosaic's register scheduling at
    big caps.
    """
    assert 27 % group == 0
    ngroup = 27 // group
    cap = grid.cap
    ncell = grid.ncell
    n = grid.n_atoms
    ntypes = style.tables.shape[0]
    flat_tables = np.asarray(style.tables).reshape(ntypes * ntypes, -1)
    L = [float(v) for v in np.asarray(box.lengths)]
    nbr = grid.nbr_array()

    CB = 8
    ncell_p = ((ncell + CB - 1) // CB) * CB

    def kernel(xi_r, yi_r, zi_r, qi_r, ti_r, ai_r,
               xj_r, yj_r, zj_r, qj_r, tj_r, aj_r,
               fx_r, fy_r, fz_r):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _init():
            fx_r[...] = jnp.zeros_like(fx_r)
            fy_r[...] = jnp.zeros_like(fy_r)
            fz_r[...] = jnp.zeros_like(fz_r)

        for c in range(CB):
            fs, d = _tile_physics(
                style, L, n, ntypes, flat_tables,
                xi_r[c, :], yi_r[c, :], zi_r[c, :],
                qi_r[c, :], ti_r[c, :], ai_r[c, :],
                xj_r[c, 0, 0, :], yj_r[c, 0, 0, :], zj_r[c, 0, 0, :],
                qj_r[c, 0, 0, :], tj_r[c, 0, 0, :], aj_r[c, 0, 0, :],
            )
            fx_r[c, :] += jnp.sum(fs * d[0], axis=1)
            fy_r[c, :] += jnp.sum(fs * d[1], axis=1)
            fz_r[c, :] += jnp.sum(fs * d[2], axis=1)

    ispec = pl.BlockSpec((CB, cap), lambda c, g: (c, 0),
                         memory_space=pltpu.VMEM)
    # j planes are 4-D (ncell, ngroup, 1, group*cap) so the block's last
    # two dims (1, group*cap) EQUAL the array's — Mosaic requires the
    # last two block dims divisible by (8, 128) or exactly equal (the
    # 3-D (CB, 1, group*cap) block failed that check on hardware).
    jspec = pl.BlockSpec((CB, 1, 1, group * cap), lambda c, g: (c, g, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((CB, cap), lambda c, g: (c, 0),
                         memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(ncell_p // CB, ngroup),
        in_specs=[ispec] * 6 + [jspec] * 6,
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((ncell_p, cap), jnp.float32)] * 3,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )

    nbr_j = jnp.asarray(nbr)
    padc = ncell_p - ncell

    def fn(state: SlotState):
        def cv(p, fill=0):
            a = p.reshape(ncell, cap)
            if padc:
                a = jnp.concatenate(
                    [a, jnp.full((padc, cap), fill, a.dtype)])
            return a

        def jv(p, fill=0):
            a = p.reshape(ncell, cap)[nbr_j]          # (ncell, 27, cap)
            a = a.reshape(ncell, ngroup, 1, group * cap)
            if padc:
                a = jnp.concatenate(
                    [a, jnp.full((padc, ngroup, 1, group * cap), fill,
                                 a.dtype)])
            return a

        fx, fy, fz = call(
            cv(state.x), cv(state.y), cv(state.z), cv(state.q),
            cv(state.typ), cv(state.aid, fill=n),
            jv(state.x), jv(state.y), jv(state.z), jv(state.q),
            jv(state.typ), jv(state.aid, fill=n),
        )
        return (fx[:ncell].reshape(-1), fy[:ncell].reshape(-1),
                fz[:ncell].reshape(-1))

    return fn


def _time_force(fn, state, nscan: int = 10, reps: int = 3) -> float:
    """Honest ms/step for a force fn over SlotState: chained data
    dependencies inside one jit + a final value fetch (the tunneled TPU
    runtime's block_until_ready does not block — see README)."""
    import time

    @jax.jit
    def run(st):
        def body(c, _):
            fx, fy, fz = fn(c)
            eps = jnp.asarray(1e-30, c.x.dtype)
            c = c._replace(x=c.x + eps * fx.astype(c.x.dtype),
                           y=c.y + eps * fy.astype(c.y.dtype),
                           z=c.z + eps * fz.astype(c.z.dtype))
            return c, None

        c, _ = jax.lax.scan(body, st, None, length=nscan)
        return c

    out = run(state)
    float(jnp.sum(out.x))          # compile + sync
    t0 = time.perf_counter()
    c = state
    for _ in range(reps):
        c = run(c)
    float(jnp.sum(c.x))
    return (time.perf_counter() - t0) / (reps * nscan) * 1000.0


def benchmark_vs_xla(deck: str = "silica_pppm.yaml", nscan: int = 10,
                     reps: int = 3) -> dict:
    """Hardware A/B: this Pallas kernel vs the XLA dense kernels (full
    27-stencil and the production Newton half-stencil) on the north-star
    deck's pair pass.  Returns {variant: ms_per_step}."""
    import os

    import yaml

    from ..run import build_simulation
    from ..models.pair.cellpair import compute_cellpair

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    with open(os.path.join(root, "examples", "decks", deck)) as f:
        cfg = yaml.safe_load(f)
    sim = build_simulation(cfg)
    state, grid, box, style = sim.state, sim.grid, sim.box, sim.pair

    def xla_variant(newton):
        def fn(st):
            r = compute_cellpair(style, grid, box, st, newton=newton)
            return r.fx, r.fy, r.fz
        return fn

    out = {}
    out["xla_newton_half"] = _time_force(xla_variant(True), state,
                                         nscan, reps)
    out["xla_full27"] = _time_force(xla_variant(False), state, nscan, reps)
    for name, builder in (
                          ("pallas_v2_lanefused", make_pallas_cellpair_v2),
                          ("pallas_v3_pipelined", make_pallas_cellpair_v3)):
        try:
            out[name] = _time_force(builder(style, grid, box), state,
                                    nscan, reps)
        except Exception as e:  # CPU backends can't lower the TPU kernel
            out[name] = f"unavailable: {type(e).__name__}"
    return out
