"""Nosé-Hoover chain NVT thermostat (``fix nvt temp Tstart Tstop Tdamp``).

Host-LAMMPS contract (SURVEY.md H7; examples/in.spce:30).  Faithful
re-implementation of fix_nh's nhc_temp_integrate with chain length M
(default 3), one Suzuki-Yoshida step: the half-step chain update brackets
the velocity-Verlet kick-drift-kick.

The conserved quantity
    H' = KE + PE + sum_k Q_k eta_dot_k^2 / 2
         + dof kB T eta_1 + kB T sum_{k>1} eta_k
is exposed for testing (econs term returned by the half-step).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NVTConfig:
    t_start: float
    t_stop: float
    t_damp: float
    tchain: int = 3
    dof: int = 0          # filled by runner (3N - 3)
    boltz: float = 1.0
    mvv2e: float = 1.0
    dt: float = 0.0


class NHChain(NamedTuple):
    eta: jnp.ndarray      # (M,)
    eta_dot: jnp.ndarray  # (M,)


def init_chain(cfg: NVTConfig, dtype=jnp.float32) -> NHChain:
    m = cfg.tchain
    return NHChain(eta=jnp.zeros((m,), dtype), eta_dot=jnp.zeros((m,), dtype))


def _masses(cfg: NVTConfig, t_target: float):
    kt = cfg.boltz * t_target
    q1 = cfg.dof * kt * cfg.t_damp**2
    qk = kt * cfg.t_damp**2
    return q1, qk


def nhc_half(cfg: NVTConfig, chain: NHChain, v, mass_col, t_target,
             ke2=None):
    """One half-step of the NH chain; returns (scale for v, new chain).

    mass_col: (N, 1) per-atom masses (host numpy — baked).
    t_target: python float (baked) or traced scalar.
    ke2: optional precomputed 2*KE (energy units) — pass the psum'd global
    value on sharded engines (parallel/slab.py), where v/mass_col are then
    unused and may be None.
    """
    m = cfg.tchain
    dt2 = 0.5 * cfg.dt
    dt4 = 0.25 * cfg.dt
    dt8 = 0.125 * cfg.dt
    kt = cfg.boltz * t_target
    q1, qk = _masses(cfg, t_target)

    if ke2 is None:
        ke2 = jnp.sum(mass_col * v * v) * cfg.mvv2e  # = 2 KE
    eta = chain.eta
    ed = chain.eta_dot

    # backward sweep: update eta_dot from the tail to the head
    g = [None] * m
    g[0] = (ke2 - cfg.dof * kt) / q1
    for k in range(1, m):
        qprev = q1 if k == 1 else qk
        g[k] = (qprev * ed[k - 1] * ed[k - 1] - kt) / qk
    ed = ed.at[m - 1].add(g[m - 1] * dt4)
    for k in range(m - 2, -1, -1):
        expf = jnp.exp(-dt8 * ed[k + 1])
        ed = ed.at[k].set((ed[k] * expf + g[k] * dt4) * expf)

    scale = jnp.exp(-dt2 * ed[0])
    ke2 = ke2 * scale * scale
    eta = eta + dt2 * ed

    # forward sweep with updated kinetic energy
    g0 = (ke2 - cfg.dof * kt) / q1
    expf = jnp.exp(-dt8 * ed[1]) if m > 1 else 1.0
    ed = ed.at[0].set((ed[0] * expf + g0 * dt4) * expf)
    for k in range(1, m - 1):
        qprev = q1 if k == 1 else qk
        gk = (qprev * ed[k - 1] * ed[k - 1] - kt) / qk
        expf = jnp.exp(-dt8 * ed[k + 1])
        ed = ed.at[k].set((ed[k] * expf + gk * dt4) * expf)
    if m > 1:
        qprev = q1 if m == 2 else qk
        gm = (qprev * ed[m - 2] * ed[m - 2] - kt) / qk
        ed = ed.at[m - 1].add(gm * dt4)

    return scale, NHChain(eta=eta, eta_dot=ed)


def chain_energy(cfg: NVTConfig, chain: NHChain, t_target: float):
    """Thermostat contribution to the conserved quantity H'."""
    kt = cfg.boltz * t_target
    q1, qk = _masses(cfg, t_target)
    qs = jnp.concatenate([
        jnp.asarray([q1], chain.eta_dot.dtype),
        jnp.full((cfg.tchain - 1,), qk, chain.eta_dot.dtype),
    ])
    e = jnp.sum(0.5 * qs * chain.eta_dot**2)
    e = e + cfg.dof * kt * chain.eta[0]
    if cfg.tchain > 1:
        e = e + kt * jnp.sum(chain.eta[1:])
    return e
