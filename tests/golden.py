"""Independent f64 NumPy brute-force golden reference implementations.

Used as oracles for the JAX kernels (SURVEY.md §4: unit tests per kernel
against brute-force O(N^2) reference in f64).
"""
import numpy as np
from scipy.special import erfc as sp_erfc


def min_image(d, L):
    return d - np.round(d / L) * L


def min_image_cell(d, H, reach=1):
    """Brute-force minimum image for a general cell matrix H (columns are
    the cell vectors): search all integer shifts |n| <= reach and return
    the shortest candidate.  Exact for any separation below half the
    minimum perpendicular width when reach=1."""
    best = np.asarray(d, float)
    bsq = float(best @ best)
    for nx in range(-reach, reach + 1):
        for ny in range(-reach, reach + 1):
            for nz in range(-reach, reach + 1):
                c = d - H @ np.array([nx, ny, nz], float)
                csq = float(c @ c)
                if csq < bsq:
                    best, bsq = c, csq
    return best


def pair_buck_coul(
    x, typ, q, L, buck_coeffs, cut_lj, cut_coul=None, coul="none",
    g_ewald=0.0, qqrd2e=1.0, special_lj=(1, 0, 0, 0), special_coul=(1, 0, 0, 0),
    sb_map=None, vdw="buck", lj_coeffs=None, disp="cut", g_ewald_6=0.0,
    H=None,
):
    """O(N^2) Buckingham/LJ + Coulomb energies & forces.

    sb_map: optional dict {(i, j): code 1|2|3} of special-bond pairs.
    H: optional (3,3) triclinic cell matrix — overrides L's orthogonal
    minimum image with the brute-force cell-image search.
    Returns (evdwl, ecoul, F(N,3), virial(6,)).
    """
    n = len(x)
    L = np.asarray(L, float)
    cut_coul = cut_lj if cut_coul is None else cut_coul
    F = np.zeros((n, 3))
    evdwl = ecoul = 0.0
    virial = np.zeros(6)
    sb_map = sb_map or {}
    for i in range(n):
        for j in range(i + 1, n):
            d = (min_image(x[i] - x[j], L) if H is None
                 else min_image_cell(x[i] - x[j], H))
            rsq = float(d @ d)
            r = np.sqrt(rsq)
            code = sb_map.get((i, j), sb_map.get((j, i), 0))
            flj = special_lj[code]
            fcl = special_coul[code]
            fpair = 0.0
            if vdw == "buck" and rsq < cut_lj**2:
                key = (typ[i], typ[j])
                if key not in buck_coeffs:
                    key = (typ[j], typ[i])
                A, rho, C = buck_coeffs[key]
                rexp = np.exp(-r / rho)
                r6 = rsq**-3
                if disp == "long":
                    g2 = g_ewald_6**2
                    grij2 = g2 * rsq
                    a2 = 1.0 / grij2
                    x2 = a2 * np.exp(-grij2) * C
                    fb = r * rexp * A / rho - g_ewald_6**8 * x2 * rsq * (
                        ((6 * a2 + 6) * a2 + 3) * a2 + 1
                    )
                    ev = A * rexp - g_ewald_6**6 * x2 * ((a2 + 1) * a2 + 0.5)
                    t = flj - 1.0
                    fb += t * (r * rexp * A / rho - 6 * C * r6)
                    ev += t * (A * rexp - C * r6)
                else:
                    fb = (r * rexp * A / rho - 6.0 * C * r6) * flj
                    ev = (A * rexp - C * r6) * flj
                evdwl += ev
                fpair += fb / rsq
            elif vdw == "lj" and rsq < cut_lj**2:
                key = (typ[i], typ[j])
                if key not in lj_coeffs:
                    key = (typ[j], typ[i])
                eps, sig = lj_coeffs[key]
                sr6 = (sig**2 / rsq) ** 3
                r6 = rsq**-3
                if disp == "long":
                    g2 = g_ewald_6**2
                    grij2 = g2 * rsq
                    a2 = 1.0 / grij2
                    c6 = 4 * eps * sig**6
                    x2 = a2 * np.exp(-grij2) * c6
                    fl = 48 * eps * sr6 * sr6 - g_ewald_6**8 * x2 * rsq * (
                        ((6 * a2 + 6) * a2 + 3) * a2 + 1
                    )
                    ev = 4 * eps * sr6 * sr6 - g_ewald_6**6 * x2 * (
                        (a2 + 1) * a2 + 0.5
                    )
                    tl = r6 * (1.0 - flj)
                    fl += tl * (24 * eps * sig**6 - r6 * 48 * eps * sig**12)
                    ev += tl * (4 * eps * sig**6 - r6 * 4 * eps * sig**12)
                else:
                    fl = (24 * eps * (2 * sr6 * sr6 - sr6)) * flj
                    ev = (4 * eps * (sr6 * sr6 - sr6)) * flj
                evdwl += ev
                fpair += fl / rsq
            if coul != "none" and rsq < cut_coul**2:
                qq = qqrd2e * q[i] * q[j]
                if coul == "cut":
                    ec = qq / r * fcl
                    fc = ec
                else:  # long
                    pre = qq / r
                    grij = g_ewald * r
                    erfc_v = sp_erfc(grij)
                    expm2 = np.exp(-grij * grij)
                    fc = pre * (erfc_v + 2.0 / np.sqrt(np.pi) * grij * expm2)
                    ec = pre * erfc_v
                    adj = (1.0 - fcl) * pre
                    fc -= adj
                    ec -= adj
                ecoul += ec
                fpair += fc / rsq
            fv = fpair * d
            F[i] += fv
            F[j] -= fv
            virial += fpair * np.array(
                [d[0] * d[0], d[1] * d[1], d[2] * d[2],
                 d[0] * d[1], d[0] * d[2], d[1] * d[2]]
            )
    return evdwl, ecoul, F, virial


def ewald_sum(x, q, L, g_ewald, kmax=8, qqrd2e=1.0, H=None):
    """Full Ewald reference: real (erfc, min image), reciprocal, self terms.

    Real-space part sums over min-image pairs with NO cutoff (use small boxes
    + large g_ewald so the real part converges within half a box).
    H: optional (3,3) triclinic cell matrix (columns = cell vectors);
    reciprocal vectors become 2 pi H^-T m and the real part uses the
    brute-force cell-image search.
    Returns (e_real, e_recip, e_self, F_real, F_recip).
    """
    n = len(x)
    L = np.asarray(L, float)
    V = float(np.prod(L)) if H is None else abs(float(np.linalg.det(H)))
    e_real = 0.0
    F_real = np.zeros((n, 3))
    for i in range(n):
        for j in range(i + 1, n):
            d = (min_image(x[i] - x[j], L) if H is None
                 else min_image_cell(x[i] - x[j], H))
            r = np.linalg.norm(d)
            grij = g_ewald * r
            pre = qqrd2e * q[i] * q[j] / r
            e_real += pre * sp_erfc(grij)
            fc = pre * (sp_erfc(grij) + 2 / np.sqrt(np.pi) * grij *
                        np.exp(-grij**2))
            F_real[i] += fc / r**2 * d
            F_real[j] -= fc / r**2 * d

    e_recip = 0.0
    F_recip = np.zeros((n, 3))
    twopi = 2 * np.pi
    recip = (np.diag(twopi / L) if H is None
             else twopi * np.linalg.inv(H).T)
    for nx in range(-kmax, kmax + 1):
        for ny in range(-kmax, kmax + 1):
            for nz in range(-kmax, kmax + 1):
                if nx == ny == nz == 0:
                    continue
                k = recip @ np.array([nx, ny, nz], float)
                ksq = float(k @ k)
                ak = np.exp(-ksq / (4 * g_ewald**2)) / ksq
                phase = x @ k
                S_re = float(np.sum(q * np.cos(phase)))
                S_im = float(np.sum(q * np.sin(phase)))
                e_recip += ak * (S_re**2 + S_im**2)
                coef = 2 * (twopi / V) * qqrd2e * ak
                F_recip += (
                    coef
                    * q[:, None]
                    * (np.sin(phase) * S_re - np.cos(phase) * S_im)[:, None]
                    * k[None, :]
                )
    e_recip *= (twopi / V) * qqrd2e
    e_self = -qqrd2e * g_ewald / np.sqrt(np.pi) * float(np.sum(q * q))
    return e_real, e_recip, e_self, F_real, F_recip


def dispersion_direct(x, B, L, images=3):
    """Absolutely convergent direct lattice sum of E = -sum_{i<j} C_ij/r^6
    (+ self-image terms), C_ij = B_i B_j.  Returns (E, F)."""
    n = len(x)
    L = np.asarray(L, float)
    E = 0.0
    F = np.zeros((n, 3))
    shifts = []
    for nx in range(-images, images + 1):
        for ny in range(-images, images + 1):
            for nz in range(-images, images + 1):
                shifts.append(np.array([nx, ny, nz]) * L)
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and not s.any():
                    continue
                d = x[i] - x[j] + s
                rsq = float(d @ d)
                c6 = B[i] * B[j]
                r6 = rsq**-3
                # half-count: every ordered pair (and self-image) counted
                # once here, so energy gets 1/2
                E += -0.5 * c6 * r6
                # F_i = -dE/dx_i: the (i,j) and (j,i) ordered terms each
                # contribute -3 c6 r^-8 d to F_i, so -6 per ordered term here
                F[i] += -6.0 * c6 * r6 / rsq * d
    return E, F


def dispersion_direct_c6(x, typ, C6, L, images=3):
    """Direct lattice sum of E = -sum_{i<j} C6[ti,tj]/r^6 with an
    arbitrary symmetric per-type C6 matrix.  Returns (E, F, virial(6,))
    with the repo's half-per-ordered-pair virial convention."""
    n = len(x)
    L = np.asarray(L, float)
    E = 0.0
    F = np.zeros((n, 3))
    vir = np.zeros(6)
    shifts = []
    for nx in range(-images, images + 1):
        for ny in range(-images, images + 1):
            for nz in range(-images, images + 1):
                shifts.append(np.array([nx, ny, nz]) * L)
    comps = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and not s.any():
                    continue
                d = x[i] - x[j] + s
                rsq = float(d @ d)
                c6 = C6[typ[i], typ[j]]
                r6 = rsq**-3
                E += -0.5 * c6 * r6
                fscalar = -6.0 * c6 * r6 / rsq
                F[i] += fscalar * d
                for ci, (a, b) in enumerate(comps):
                    vir[ci] += 0.5 * fscalar * d[a] * d[b]
    # ordered double-count gives each unordered pair twice; the 0.5 above
    # restores the single count (trace identity: vir_trace == 6 E)
    return E, F, vir
