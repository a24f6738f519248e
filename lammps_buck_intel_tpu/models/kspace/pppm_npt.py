"""PPPM under a TRACED (variable) simulation box — the `fix npt` solver.

Host LAMMPS runs PPPM under NPT by re-running ``PPPM::setup()`` whenever
the box changes (the setup contract behind /root/reference/
pppm_intel.cpp:67-98): grid size, order and g_ewald stay fixed from
``init()``; the box-dependent tables — Green's function, fkx/fky/fkz,
volume, self-energy background — are rebuilt at reneighbor cadence.

TPU-native equivalent: rebuild those tables *inside the trace* from the
traced box lengths, once per neighbor-cadence block (not per step).  The
alias sums of the Hockney-Eastwood influence function factor into
box-INDEPENDENT B-spline transforms (sinc powers live in grid-index
space) and box-dependent wave vectors k = 2 pi m / L, so the traced
rebuild is a static 125-term (nalias=2) sum of cheap broadcasted
elementwise ops over the grid — XLA fuses it, no host round-trip, no
recompile (the box is an argument, never a constant).

Scope (matches the NPT engine): orthogonal boxes, ik AND ad
differentiation, slab-corrected solvers — the in.rhodo configuration
(/root/reference/examples/in.rhodo:13,18-19) plus the kspace_modify
variants.  The ad self-force sine series (sf_coeff analog) is re-FIT
inside the trace: its per-axis spline DFT factors live in grid-index
space (box-independent, precomputed host-side), so the traced part is
one small contraction against the traced influence function per
cadence block.  Triclinic NPT keeps the traced-h Ewald substitute.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .base import KSpaceResult
from .pppm import (
    PPPM, _fold_idx, _np_axis_A, bspline_weights, coulomb_kernel,
    stencil_offsets,
)


class TracedPPPM:
    """PPPM solver whose box-baked tables are traced functions of boxL.

    Built from a ``setup_pppm`` result at the INITIAL box (which fixes
    grid, order and g_ewald exactly as ``PPPM::init()`` does); per-block
    tables come from :meth:`tables`, forces from :meth:`compute_traced`.
    """

    def __init__(self, pm: PPPM, center, nalias: int = 2):
        if not isinstance(pm, PPPM):
            raise NotImplementedError(
                f"TracedPPPM wraps a plain PPPM solver, got {type(pm)}")
        if pm.recip is not None:
            raise NotImplementedError("TracedPPPM: orthogonal boxes only")
        self.pm = pm
        self.diff = pm.diff
        # kspace_modify slab <factor>: all k-space geometry below runs on
        # the z-EXTENDED box (traced L_eff = L * [1, 1, slab]); atoms keep
        # the real box origin.  The Yeh-Berkowitz dipole term is traced in
        # compute_traced (slab_correction with the traced extended volume).
        self.slab = None if pm.slab is None else float(pm.slab)
        self.grid = pm.grid
        self.order = pm.order
        self.g_ewald = float(pm.g_ewald)
        self.qqrd2e = float(pm.qqrd2e)
        self.qsum = float(pm.qsum)
        self.qsqsum = float(pm.qsqsum)
        self.acc_dtype = pm.acc_dtype
        self._center = np.asarray(center, np.float64)

        # ---- static (box-independent) pieces of the influence fn ----
        nx, ny, nz = pm.grid
        order = pm.order
        shifts = range(-nalias, nalias + 1)

        def sinc(t):
            out = np.ones_like(t)
            m = t != 0
            out[m] = np.sin(t[m]) / t[m]
            return out

        # per-axis: folded harmonic numbers and, per alias shift, the
        # shifted harmonic numbers m + s*n and U^2 spline factors
        self._m = [_fold_idx(n).astype(np.float64) for n in pm.grid]
        self._ms = []       # [(S, n)] shifted harmonics per axis
        self._u2 = []       # [(S, n)] squared per-axis spline transforms
        for ax, n in enumerate(pm.grid):
            i = np.arange(n)
            i = np.where(i > n // 2, i - n, i).astype(np.float64)
            ms, u2 = [], []
            for s in shifts:
                ms.append(i + s * n)
                u2.append(sinc(np.pi * (i + s * n) / n) ** (2 * order))
            self._ms.append(np.asarray(ms))
            self._u2.append(np.asarray(u2))
        # denominator sum_m U^2 is fully box-independent; precompute its
        # squared full-grid form once (host numpy)
        dx = self._u2[0].sum(0)
        dy = self._u2[1].sum(0)
        dz = self._u2[2].sum(0)
        den = dx[:, None, None] * dy[None, :, None] * dz[None, None, :]
        self._den_sq = den * den
        self._nalias = nalias
        self._kmask = np.ones(pm.grid)
        self._kmask[0, 0, 0] = 0.0

        # ---- static pieces of the ad self-force sine fit ----
        # (pppm.py _sf_sine_fit with the box-dependent factors deferred:
        # A/dA are DFTs of B-spline deposits at fractional offsets — pure
        # grid-index-space objects)
        if self.diff == "ad":
            nsamp, nterms = 32, (np.asarray(pm.sf_sine).shape[1]
                                 if pm.sf_sine is not None else 4)
            s = np.arange(nsamp) / nsamp + 1e3
            self._sf_nsamp = nsamp
            self._sf_selfterm = []   # per axis: (S, n_ax) Re(A conj dA)
            self._sf_m = []          # per axis: (n_ax,) mean |A|^2
            for ax in range(3):
                a, da = _np_axis_A(pm.grid[ax], s, pm.order)
                self._sf_selfterm.append(np.real(a * np.conj(da)))
                self._sf_m.append(np.mean(np.abs(a) ** 2, axis=0))
            js = np.arange(1, nterms + 1)
            self._sf_basis = np.sin(
                2.0 * np.pi * js[None, :] * (s % 1.0)[:, None])  # (S, J)

    def _L_eff(self, boxL):
        """Traced k-space box lengths (z extended under slab mode)."""
        L = [boxL[ax].astype(jnp.float64) for ax in range(3)]
        if self.slab is not None:
            L[2] = L[2] * self.slab
        return L

    # ---- per-block tables ----

    def tables(self, boxL):
        """Traced box-dependent tables: call once per cadence block.

        Returns {"G": (nx,ny,nz)} plus, in ad mode, the re-fit self-force
        sine coefficients {"sf": (3, J)} — everything else (k vectors,
        volume, grid origin) is cheap enough to rebuild per force call."""
        acc = self.acc_dtype
        g2 = self.g_ewald * self.g_ewald
        L = self._L_eff(boxL)
        twopi = 2.0 * np.pi
        # folded k components (traced)
        k = [jnp.asarray(self._m[ax]) * (twopi / L[ax]) for ax in range(3)]
        kx = k[0][:, None, None]
        ky = k[1][None, :, None]
        kz = k[2][None, None, :]
        ksq = kx * kx + ky * ky + kz * kz
        S = 2 * self._nalias + 1
        # shifted k components per axis/alias (traced, (S, n))
        km = [jnp.asarray(self._ms[ax]) * (twopi / L[ax]) for ax in range(3)]
        num = jnp.zeros(self.grid, jnp.float64)
        for sx in range(S):
            u2x = self._u2[0][sx][:, None, None]
            kmx = km[0][sx][:, None, None]
            for sy in range(S):
                u2y = self._u2[1][sy][None, :, None]
                kmy = km[1][sy][None, :, None]
                for sz in range(S):
                    u2z = self._u2[2][sz][None, None, :]
                    kmz = km[2][sz][None, None, :]
                    kmsq = kmx * kmx + kmy * kmy + kmz * kmz
                    safe = jnp.where(kmsq == 0.0, 1.0, kmsq)
                    g = jnp.where(
                        kmsq == 0.0, 0.0,
                        (4.0 * np.pi) / safe * jnp.exp(-0.25 * safe / g2))
                    kdot = kx * kmx + ky * kmy + kz * kmz
                    num = num + (u2x * u2y * u2z) * g * kdot
        ksq_safe = jnp.where(ksq == 0.0, 1.0, ksq)
        G = num / (ksq_safe * jnp.asarray(self._den_sq))
        G = G * jnp.asarray(self._kmask)
        out = {"G": G.astype(acc)}
        if self.diff == "ad":
            # re-fit the self-force sine series against the traced G
            # (pppm.py _sf_sine_fit, box factors applied here)
            V = L[0] * L[1] * L[2]
            sf = []
            for ax in range(3):
                # contract G down to the ax axis with the mean spline
                # powers of the other two axes (trailing axes stay in
                # original order after moveaxis)
                t0, t1 = [a for a in range(3) if a != ax]
                g1 = jnp.moveaxis(G.astype(jnp.float64), ax, 0)
                g1 = jnp.tensordot(g1, jnp.asarray(self._sf_m[t1]),
                                   axes=[[2], [0]])
                g1 = jnp.tensordot(g1, jnp.asarray(self._sf_m[t0]),
                                   axes=[[1], [0]])               # (n_ax,)
                h_ax = L[ax] / self.grid[ax]
                e_s = -(jnp.asarray(self._sf_selfterm[ax]) @ g1) \
                    / (V * h_ax)                                  # (S,)
                sf.append((2.0 / self._sf_nsamp)
                          * (jnp.asarray(self._sf_basis).T @ e_s))
            out["sf"] = jnp.stack(sf).astype(acc)                 # (3, J)
        return out

    # ---- force/energy pass ----

    def _weights(self, x, boxL, deriv: bool = False):
        # grid origin = real box lo; grid span = the (slab-extended)
        # k-space box, vacuum padding above
        p = self.order
        lo = jnp.asarray(self._center, x.dtype) - 0.5 * boxL.astype(x.dtype)
        Leff = self._L_eff(boxL)
        out = []
        for ax, n in enumerate(self.grid):
            u = (x[:, ax] - lo[ax]) * (n / Leff[ax].astype(x.dtype))
            out.append(bspline_weights(u, p, deriv=deriv))
        return out

    def _stencil(self, bases):
        offs = jnp.asarray(stencil_offsets(self.order), jnp.int32)
        return [jnp.mod(bases[ax][:, None] + offs, n)
                for ax, n in enumerate(self.grid)]

    def compute_traced(self, x, q, boxL, eflag: bool = True,
                       vflag: bool = True, kc=None) -> KSpaceResult:
        """Same contract as Ewald.compute_traced, plus optional ``kc``
        tables from :meth:`tables` (recomputed here when absent — pass
        them per block to amortize the influence-function rebuild)."""
        acc = self.acc_dtype
        nx, ny, nz = self.grid
        ngrid = nx * ny * nz
        qqrd2e = self.qqrd2e
        if kc is None:
            kc = self.tables(boxL)
        ad = self.diff == "ad"
        Leff = self._L_eff(boxL)
        V = (Leff[0] * Leff[1] * Leff[2]).astype(acc)

        # deposition (particle_map/make_rho under the traced box)
        wx_ = self._weights(x, boxL, deriv=ad)
        bases = [w[0] for w in wx_]
        ws = [w[1] for w in wx_]
        dws = [w[2] for w in wx_] if ad else None
        ix, iy, iz = self._stencil(bases)
        w3 = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
              * ws[2][:, None, None, :]) * q[:, None, None, None]
        flat = ((ix[:, :, None, None] * ny + iy[:, None, :, None]) * nz
                + iz[:, None, None, :])
        mesh = jnp.zeros((ngrid,), x.dtype)
        mesh = mesh.at[flat.reshape(-1)].add(w3.reshape(-1))
        mesh = mesh.reshape(nx, ny, nz)

        rhat = jnp.fft.fftn(mesh.astype(acc))
        G = kc["G"].astype(acc)
        phi_hat = G * rhat

        k = [jnp.asarray(self._m[ax], acc)
             * jnp.asarray(2.0 * np.pi, acc) / Leff[ax].astype(acc)
             for ax in range(3)]
        kx = k[0][:, None, None]
        ky = k[1][None, :, None]
        kz = k[2][None, None, :]

        if eflag or vflag:
            s2 = jnp.real(rhat * jnp.conj(rhat))
            ek = G * s2
        if eflag:
            elong = (0.5 / V) * jnp.sum(ek.astype(acc)) * qqrd2e
            g = self.g_ewald
            self_e = -g * self.qsqsum / math.sqrt(math.pi) * qqrd2e
            bg = -(math.pi / 2.0 * self.qsum**2 / (g * g)) * qqrd2e / V
            elong = elong + self_e + bg
        else:
            elong = jnp.zeros((), acc)

        if vflag:
            ksq = kx * kx + ky * ky + kz * kz
            ksq_safe = jnp.where(ksq == 0.0, 1.0, ksq)
            pref = 2.0 * (1.0 / ksq_safe + 0.25 / self.g_ewald**2)
            c = (0.5 / V) * qqrd2e
            virial = jnp.stack([
                jnp.sum((ek * (1.0 - pref * kx * kx)).astype(acc)),
                jnp.sum((ek * (1.0 - pref * ky * ky)).astype(acc)),
                jnp.sum((ek * (1.0 - pref * kz * kz)).astype(acc)),
                jnp.sum((ek * (-pref * kx * ky)).astype(acc)),
                jnp.sum((ek * (-pref * kx * kz)).astype(acc)),
                jnp.sum((ek * (-pref * ky * kz)).astype(acc)),
            ]) * c
        else:
            virial = jnp.zeros((6,), acc)

        flat2 = flat.reshape(x.shape[0], -1)
        if ad:
            # ONE inverse FFT -> potential mesh; forces from derivative
            # splines minus the re-fit self-force (poisson_ad /
            # fieldforce_ad, pppm_intel.cpp:985-1054, :678-804)
            u = jnp.real(jnp.fft.ifftn(phi_hat)) * (ngrid / V)
            uv = u.reshape(-1)[flat2]
            combos = ((dws[0], ws[1], ws[2]), (ws[0], dws[1], ws[2]),
                      (ws[0], ws[1], dws[2]))
            lo = (jnp.asarray(self._center, x.dtype)
                  - 0.5 * boxL.astype(x.dtype))
            f = []
            for ax, (aw, bw, cw) in enumerate(combos):
                w3d = (aw[:, :, None, None] * bw[:, None, :, None]
                       * cw[:, None, None, :]).reshape(x.shape[0], -1)
                h_ax = (Leff[ax] / self.grid[ax]).astype(acc)
                e_ax = -jnp.sum(w3d * uv, axis=1) * (1.0 / h_ax)
                # traced sf sine series (grid-unit fractional offset)
                ug = (x[:, ax] - lo[ax]) * (self.grid[ax]
                                            / Leff[ax].astype(x.dtype))
                sf = kc["sf"]
                e_self = jnp.zeros_like(e_ax)
                for j in range(sf.shape[1]):
                    e_self = e_self + sf[ax, j] * jnp.sin(
                        2.0 * jnp.pi * (j + 1) * ug).astype(acc)
                f.append(qqrd2e * q * e_ax - (qqrd2e * q * q) * e_self)
            fvec = jnp.stack(f, axis=-1).astype(acc)
        else:
            scale = 1.0 / V
            e_mesh = []
            for kax in (kx, ky, kz):
                ehat = (-1j) * kax.astype(phi_hat.dtype) * phi_hat
                e_mesh.append(jnp.real(jnp.fft.ifftn(ehat))
                              * (scale * ngrid))

            w3g = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
                   * ws[2][:, None, None, :]).reshape(x.shape[0], -1)
            f = []
            for em in e_mesh:
                ev = em.reshape(-1)[flat2]
                f.append(jnp.sum(w3g * ev, axis=1))
            fvec = jnp.stack(f, axis=-1).astype(acc)
            fvec = fvec * (qqrd2e * q[:, None]).astype(acc)
        if self.slab is not None:
            # traced Yeh-Berkowitz EW3DC dipole term (slabcorr(),
            # pppm_intel.cpp:305) on the extended volume
            zprd = Leff[2].astype(acc)
            z = x[:, 2].astype(acc)
            qa = q.astype(acc)
            dipole = jnp.sum(qa * z)
            dipole_r2 = jnp.sum(qa * z * z)
            two_pi = 2.0 * math.pi
            if eflag:
                elong = elong + (two_pi / V) * (
                    dipole * dipole - self.qsum * dipole_r2
                    - self.qsum**2 * zprd * zprd / 12.0) * qqrd2e
            ffact = -(2.0 * two_pi / V) * qqrd2e
            fvec = fvec.at[:, 2].add(ffact * qa * (dipole - self.qsum * z))
        return KSpaceResult(f=fvec, elong=elong, virial=virial)
