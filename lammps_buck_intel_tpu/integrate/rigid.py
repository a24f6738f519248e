"""Quaternion rigid-body integrator (``fix rigid/small``).

Reference contract (SURVEY.md H7): examples/in.hexane:31 ``fix rigid/small
molecule``.  Host LAMMPS integrates each molecule as a torque-driven rigid
body (COM velocity-Verlet + Richardson quaternion update from angular
momentum).  This module is that scheme in batched (B, ...) array form —
every body advances in parallel through two ``segment_sum`` reductions
(force, torque), vectorized quaternion algebra, and one (N, 3) gather to
rebuild atom positions; no per-body loops, no constraint iterations.  It
replaces the earlier all-pair SHAKE rigidification (shake.py
make_rigid_from_molecules), which needed 200 Jacobi sweeps per step and
capped body size.

Conventions: q = (w, x, y, z) maps BODY frame to SPACE frame; r_body are
atom offsets in the principal frame; L is space-frame angular momentum.
omega_body = I^-1 A(q)^T L, qdot = 0.5 q (0, omega_body).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RigidBodies:
    """Static (host numpy, baked) rigid-body structure.

    body_of: (N,) int32 atom -> body id (every atom belongs to a body).
    mtotal: (B,) body masses; minv: (B,) 1/M.
    iinv: (B, 3) inverse principal moments (0 for degenerate axes).
    r_body: (N, 3) atom offsets in the principal (body) frame.
    mass_per_atom: (N,).
    q0/X0/...: initial body state (build-time geometry).
    n_constraints: removed DOF count (3N - sum body dof) for temperature
    bookkeeping — same contract as ShakeConstraints.n_constraints.
    """

    body_of: np.ndarray
    nbody: int
    mtotal: np.ndarray
    minv: np.ndarray
    iinv: np.ndarray
    r_body: np.ndarray
    mass_per_atom: np.ndarray
    X0: np.ndarray
    q0: np.ndarray
    n_constraints: int


class BodyState(NamedTuple):
    X: jnp.ndarray   # (B, 3) COM positions (unwrapped)
    V: jnp.ndarray   # (B, 3) COM velocities
    q: jnp.ndarray   # (B, 4) orientation quaternions
    L: jnp.ndarray   # (B, 3) space-frame angular momenta


# ---------- quaternion algebra (batched (..., 4)) ----------

def quat_rotate(q, v):
    """A(q) v — rotate body-frame vectors into space frame."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
    """A(q)^T v — space frame into body frame."""
    w = q[..., 0:1]
    u = -q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_mul_vec(q, wvec):
    """q (0, wvec) — quaternion product with a pure vector."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    rw = -jnp.sum(qv * wvec, axis=-1, keepdims=True)
    rv = qw * wvec + jnp.cross(qv, wvec)
    return jnp.concatenate([rw, rv], axis=-1)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def _quat_from_matrix(E: np.ndarray) -> np.ndarray:
    """Host: rotation matrix (3,3, columns=principal axes) -> (w,x,y,z)."""
    t = np.trace(E)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (E[2, 1] - E[1, 2]) / s
        y = (E[0, 2] - E[2, 0]) / s
        z = (E[1, 0] - E[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(E)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + E[i, i] - E[j, j] - E[k, k]) * 2
        vals = np.zeros(4)
        vals[1 + i] = 0.25 * s
        vals[0] = (E[k, j] - E[j, k]) / s
        vals[1 + j] = (E[j, i] + E[i, j]) / s
        vals[1 + k] = (E[k, i] + E[i, k]) / s
        w, x, y, z = vals
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


# ---------- build ----------

def _minimg_host(d, L_box):
    """Host-numpy minimum image: (k, 3) displacements against per-axis
    lengths, OR a Box (triclinic boxes run the greedy z->y->x tilt
    reduction of core.box.minimum_image)."""
    d = np.array(d, np.float64)
    if hasattr(L_box, "is_triclinic") and L_box.is_triclinic:
        lx, ly, lz = (float(v) for v in np.asarray(L_box.lengths))
        xy, xz, yz = (float(v) for v in np.asarray(L_box.tilt))
        n3 = np.round(d[:, 2] / lz)
        d[:, 0] -= n3 * xz
        d[:, 1] -= n3 * yz
        d[:, 2] -= n3 * lz
        n2 = np.round(d[:, 1] / ly)
        d[:, 0] -= n2 * xy
        d[:, 1] -= n2 * ly
        d[:, 0] -= np.round(d[:, 0] / lx) * lx
        return d
    Lb = (np.asarray(L_box.lengths, np.float64)
          if hasattr(L_box, "lengths") else np.asarray(L_box, np.float64))
    return d - np.round(d / Lb) * Lb


def make_rigid_bodies(x, molecule, mass_per_atom, L_box) -> RigidBodies:
    """``fix rigid/small molecule``: one body per molecule id.

    Straddling molecules are re-assembled by per-atom minimum image
    relative to the body's first atom (L_box: per-axis lengths or a Box —
    tilted cells use the triclinic reduction; data files store unwrapped
    coordinates, so this is a no-op for well-formed inputs)."""
    x = np.asarray(x, np.float64)
    mol = np.asarray(molecule)
    m = np.asarray(mass_per_atom, np.float64)
    uniq, body_of = np.unique(mol, return_inverse=True)
    B = len(uniq)
    n = len(x)
    r_body = np.zeros((n, 3))
    mtot = np.zeros(B)
    iinv = np.zeros((B, 3))
    X0 = np.zeros((B, 3))
    q0 = np.zeros((B, 4))
    removed = 0
    for b in range(B):
        idx = np.nonzero(body_of == b)[0]
        xb = x[idx].copy()
        xb = xb[0] + _minimg_host(xb - xb[0], L_box)
        mb = m[idx]
        M = mb.sum()
        com = (mb[:, None] * xb).sum(0) / M
        rel = xb - com
        # inertia tensor -> principal frame
        I = np.zeros((3, 3))
        for k in range(len(idx)):
            r = rel[k]
            I += mb[k] * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
        evals, E = np.linalg.eigh(I)
        if np.linalg.det(E) < 0:
            E[:, 2] = -E[:, 2]
        imax = float(evals.max()) if len(idx) > 1 else 0.0
        inv = np.zeros(3)
        ndeg = 0
        for ax in range(3):
            if imax > 0 and evals[ax] > 1e-9 * imax:
                inv[ax] = 1.0 / evals[ax]
            else:
                ndeg += 1
        mtot[b] = M
        iinv[b] = inv
        X0[b] = com
        q0[b] = _quat_from_matrix(E)
        r_body[idx] = rel @ E  # E^T applied row-wise
        # dof per body: 3 trans + (3 - degenerate rot axes)
        removed += 3 * len(idx) - (6 - ndeg)
    return RigidBodies(
        body_of=body_of.astype(np.int32), nbody=B, mtotal=mtot,
        minv=1.0 / mtot, iinv=iinv, r_body=r_body,
        mass_per_atom=m, X0=X0, q0=q0, n_constraints=int(removed),
    )


def init_body_state(rb: RigidBodies, v, dtype=jnp.float64) -> BodyState:
    """Build-time state: X/q from the build, V/L projected from atom
    velocities (any non-rigid velocity component is discarded, the
    fix rigid zero-ing of internal motion)."""
    v = jnp.asarray(v, dtype)
    bo = jnp.asarray(rb.body_of)
    mb = jnp.asarray(rb.mass_per_atom, dtype)[:, None]
    B = rb.nbody
    V = (jax.ops.segment_sum(mb * v, bo, num_segments=B)
         / jnp.asarray(rb.mtotal, dtype)[:, None])
    q = jnp.asarray(rb.q0, dtype)
    d = quat_rotate(q[bo], jnp.asarray(rb.r_body, dtype))
    L = jax.ops.segment_sum(
        jnp.cross(d, mb * (v - V[bo])), bo, num_segments=B)
    return BodyState(X=jnp.asarray(rb.X0, dtype), V=V, q=q, L=L)


# ---------- per-step kernels ----------

def atom_positions(rb: RigidBodies, bs: BodyState):
    bo = jnp.asarray(rb.body_of)
    d = quat_rotate(bs.q[bo], jnp.asarray(rb.r_body, bs.X.dtype))
    return bs.X[bo] + d, d


def body_omega(rb: RigidBodies, q, L):
    """Space-frame angular velocity from space-frame L."""
    iinv = jnp.asarray(rb.iinv, q.dtype)
    wb = iinv * quat_rotate_inv(q, L)
    return quat_rotate(q, wb)


def atom_velocities(rb: RigidBodies, bs: BodyState, d):
    """v_i = V_b + omega_b x d_i (d = space-frame offsets)."""
    bo = jnp.asarray(rb.body_of)
    om = body_omega(rb, bs.q, bs.L)
    return bs.V[bo] + jnp.cross(om[bo], d)


def force_torque(rb: RigidBodies, d, f):
    """Body force and torque from atom forces (d = space offsets)."""
    bo = jnp.asarray(rb.body_of)
    B = rb.nbody
    f = f.astype(d.dtype)
    F = jax.ops.segment_sum(f, bo, num_segments=B)
    T = jax.ops.segment_sum(jnp.cross(d, f), bo, num_segments=B)
    return F, T


def richardson(rb: RigidBodies, q, L, dt: float, iters: int = 2):
    """Midpoint (Richardson) quaternion drift at constant L."""
    iinv = jnp.asarray(rb.iinv, q.dtype)

    def qdot(qq):
        wb = iinv * quat_rotate_inv(qq, L)
        return 0.5 * quat_mul_vec(qq, wb)

    q_half = quat_normalize(q + (0.5 * dt) * qdot(q))
    for _ in range(iters):
        q_half = quat_normalize(q + (0.5 * dt) * qdot(q_half))
    return quat_normalize(q + dt * qdot(q_half))


def initial_integrate_rigid_ft(rb: RigidBodies, bs: BodyState, F, T,
                               dtv: float, dtf: float) -> BodyState:
    """Half kick + drift from PRE-REDUCED body force/torque (the slab
    engine psums per-device partials into these)."""
    V = bs.V + (dtf * jnp.asarray(rb.minv, bs.V.dtype))[:, None] * F
    L = bs.L + dtf * T
    X = bs.X + dtv * V
    q = richardson(rb, bs.q, L, dtv)
    return BodyState(X=X, V=V, q=q, L=L)


def final_integrate_rigid_ft(rb: RigidBodies, bs: BodyState, F, T,
                             dtf: float) -> BodyState:
    V = bs.V + (dtf * jnp.asarray(rb.minv, bs.V.dtype))[:, None] * F
    L = bs.L + dtf * T
    return bs._replace(V=V, L=L)


def initial_integrate_rigid(rb: RigidBodies, bs: BodyState, f, d,
                            dtv: float, dtf: float) -> BodyState:
    """Half kick + drift: v/L kicks use dtf = 0.5 dt ftm2v (force-to-
    velocity units, the NVEParams convention); X drifts by dtv."""
    F, T = force_torque(rb, d, f)
    return initial_integrate_rigid_ft(rb, bs, F, T, dtv, dtf)


def final_integrate_rigid(rb: RigidBodies, bs: BodyState, f, d,
                          dtf: float) -> BodyState:
    F, T = force_torque(rb, d, f)
    return final_integrate_rigid_ft(rb, bs, F, T, dtf)


def body_state_from_atoms(rb: RigidBodies, x, v, L_box,
                          dtype=jnp.float64) -> BodyState:
    """Host-side (checkpoint resume): reconstruct body state from atom
    arrays — COM/velocity projection plus a per-body Kabsch fit of the
    orientation against the build-time r_body."""
    x = np.asarray(x, np.float64)
    v = np.asarray(v, np.float64)
    m = rb.mass_per_atom
    B = rb.nbody
    X = np.zeros((B, 3))
    q = np.zeros((B, 4))
    V = np.zeros((B, 3))
    L = np.zeros((B, 3))
    for b in range(B):
        idx = np.nonzero(rb.body_of == b)[0]
        xb = x[idx].copy()
        xb = xb[0] + _minimg_host(xb - xb[0], L_box)
        mb = m[idx][:, None]
        M = rb.mtotal[b]
        com = (mb * xb).sum(0) / M
        rel = xb - com
        # Kabsch: find A with rel ~= A r_body
        H = (mb * rb.r_body[idx]).T @ rel
        U, _, Vt = np.linalg.svd(H)
        D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        A = Vt.T @ D @ U.T
        X[b] = com
        q[b] = _quat_from_matrix(A)
        Vb = (mb * v[idx]).sum(0) / M
        V[b] = Vb
        L[b] = np.sum(np.cross(rel, m[idx][:, None] * (v[idx] - Vb)),
                      axis=0)
    return BodyState(X=jnp.asarray(X, dtype), V=jnp.asarray(V, dtype),
                     q=jnp.asarray(q, dtype), L=jnp.asarray(L, dtype))


def rotational_ke(rb: RigidBodies, bs: BodyState, mvv2e: float = 1.0):
    """Diagnostic: 0.5 omega . L summed over bodies (energy units)."""
    om = body_omega(rb, bs.q, bs.L)
    return 0.5 * mvv2e * jnp.sum(om * bs.L)


def constraint_virial(rb: RigidBodies, bs: BodyState, d, f,
                      ftm2v: float, acc_dtype=jnp.float64):
    """Rigid constraint virial (6,): the pressure contribution of the
    internal forces holding each body rigid — the fix_rigid virial-tally
    contract implied by in.hexane's thermo pressure
    (/root/reference/examples/in.hexane:31,36).

    The constraint force on atom i is f_c = m a_rigid/ftm2v - f, with
    a_rigid = alpha x d + w x (w x d) the rotational acceleration about
    the COM (the COM part A_b contributes sum_i m_i d_i (x) A_b = 0 and
    is dropped).  Tallied against the body-relative offsets d (LAMMPS
    component convention [xx yy zz xy xz yz], v_ab = d_a f_b): per body
    sum_i f_c,i = -F_b only because the COM part is dropped, but the
    d-contraction makes the tally origin-independent regardless.  Trace
    identity: W_c = -2 KE_rot - sum d.f, so the molecular pressure
    (sum_b M V_b^2 + sum_b X_b.F_b)/3V is recovered exactly."""
    bo = jnp.asarray(rb.body_of)
    iinv = jnp.asarray(rb.iinv, d.dtype)
    _, T = force_torque(rb, d, f)
    Lb = quat_rotate_inv(bs.q, bs.L)
    wb = iinv * Lb
    # body-frame Euler: wdot_b = Iinv (ftm2v tau_b - w_b x L_b); L carries
    # the integrator's ftm2v-scaled units (dtf kick), so torque is scaled
    wdotb = iinv * (ftm2v * quat_rotate_inv(bs.q, T) - jnp.cross(wb, Lb))
    alpha = quat_rotate(bs.q, wdotb)
    om = quat_rotate(bs.q, wb)
    omi, ali = om[bo], alpha[bo]
    a = jnp.cross(ali, d) + jnp.cross(omi, jnp.cross(omi, d))
    m = jnp.asarray(rb.mass_per_atom, d.dtype)[:, None]
    fc = (m / ftm2v) * a - f.astype(d.dtype)
    acc = acc_dtype
    return jnp.stack([
        jnp.sum((d[:, 0] * fc[:, 0]).astype(acc)),
        jnp.sum((d[:, 1] * fc[:, 1]).astype(acc)),
        jnp.sum((d[:, 2] * fc[:, 2]).astype(acc)),
        jnp.sum((d[:, 0] * fc[:, 1]).astype(acc)),
        jnp.sum((d[:, 0] * fc[:, 2]).astype(acc)),
        jnp.sum((d[:, 1] * fc[:, 2]).astype(acc)),
    ])
