"""Multi-chip SPMD layer: shard_map over a device mesh.

TPU-native replacement for the reference's MPI machinery (SURVEY.md H3/H10,
§5.8): the atom axis is sharded over a 1-D chip mesh; per-step the position
shard is exchanged with ``all_gather`` over ICI (replicated-data MD — exact;
the halo/`ppermute` spatial-slab variant is the planned upgrade, SURVEY.md
§5.7), forces are computed on local i-rows only, and scalar reductions use
``psum`` (the MPI_Allreduce analog, /root/reference/pppm_intel.cpp:260,273).

Neighbor lists are built globally (the build is data-parallel over i-rows)
and consumed shard-wise — indices point into the gathered global arrays.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.box import Box
from ..neighbor.neighbor_list import NeighborList
from ..models.pair.driver import compute_pair
from ..models.pair.styles import PairStyle
from ..integrate.nve import NVEParams, initial_integrate, final_integrate

try:  # jax >= 0.4.35 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: int, axis: str = "atoms") -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


class ShardedState(NamedTuple):
    x: jnp.ndarray      # (N, 3) sharded on axis 0
    v: jnp.ndarray
    f: jnp.ndarray


def pad_to_multiple(arr, m, fill=0.0):
    """Pad the leading axis to a multiple of m; returns (padded, n_orig)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    pad = (-n) % m
    if pad == 0:
        return arr, n
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill), n


def make_spmd_step(
    style: PairStyle,
    nve: NVEParams,
    box: Box,
    mesh: Mesh,
    *,
    eflag: bool = False,
    acc_dtype=jnp.float32,
    axis: str = "atoms",
    ewald=None,
):
    """Build a jitted sharded MD step.

    Every per-atom array (state, typ, q, mass_inv, neighbor idx/sb rows) is
    sharded along the atom axis.  Neighbor indices point into the gathered
    global position array.  With ``ewald`` set, the reciprocal solve runs
    sharded too: each device computes partial structure factors over its
    atom shard, ``psum`` completes S(k) (the MPI_Allreduce analog), and the
    force matmul stays local — the k-space counterpart of SURVEY.md §2.3's
    reduction-parallel row.  Returns
    ``step(state, typ, q, mass_inv, idx, sb) -> (state, energies)`` with
    energies a dict of replicated (psum'd) scalars.
    """

    def _ewald_local(x_l, q_l):
        flt = x_l.dtype
        kv = jnp.asarray(ewald.kvecs, flt)          # host consts, baked
        ug = jnp.asarray(ewald.ug, flt)
        phase = x_l @ kv.T                           # (n_l, K)
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        s_re = jax.lax.psum(jnp.sum(q_l[:, None] * c, axis=0), axis)
        s_im = jax.lax.psum(jnp.sum(q_l[:, None] * s, axis=0), axis)
        w = 2.0 * ug
        coef = s * s_re[None, :] - c * s_im[None, :]
        f = (coef * w[None, :]) @ kv
        f = (float(ewald.qqrd2e) * q_l[:, None] * f).astype(acc_dtype)
        elong = jnp.sum(ug.astype(acc_dtype) * (s_re * s_re + s_im * s_im
                                                ).astype(acc_dtype))
        elong = elong * ewald.qqrd2e + ewald.elong_self
        return f, elong

    def _local_step(x_l, v_l, f_l, typ_l, q_l, minv_l, idx_l, sb_l,
                    typ_g, q_g):
        nve_l = NVEParams(dtv=nve.dtv, dtf=nve.dtf, mass_inv=minv_l)
        x_l, v_l = initial_integrate(nve_l, x_l, v_l, f_l)
        x_full = jax.lax.all_gather(x_l, axis, axis=0, tiled=True)
        nl = NeighborList(idx=idx_l, sb=sb_l, nnei=None, x0=None,
                          overflow=None)
        pr = compute_pair(
            style, x_l, typ_l, q_l, box, nl,
            eflag=eflag, vflag=False, acc_dtype=acc_dtype,
            src=(x_full, typ_g, q_g),
        )
        f_tot = pr.f
        elong = jnp.zeros((), acc_dtype)
        if ewald is not None:
            fk, elong = _ewald_local(x_l, q_l)
            f_tot = f_tot + fk
        v_l = final_integrate(nve_l, v_l, f_tot)
        evdwl = jax.lax.psum(pr.evdwl, axis)
        ecoul = jax.lax.psum(pr.ecoul, axis)
        return ShardedState(x_l, v_l, f_tot), {
            "evdwl": evdwl, "ecoul": ecoul, "elong": elong,
        }

    sharded = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(), P(),
        ),
        out_specs=(
            ShardedState(P(axis), P(axis), P(axis)),
            {"evdwl": P(), "ecoul": P(), "elong": P()},
        ),
    )

    @jax.jit
    def step(state: ShardedState, typ, q, mass_inv, idx, sb):
        return sharded(state.x, state.v, state.f, typ, q, mass_inv,
                       idx, sb, typ, q)

    return step
