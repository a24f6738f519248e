"""Trajectory dumps (SURVEY.md §5.5 — the decks' ``dump`` commands).

LAMMPS-native ``lammpstrj`` text format (readable by OVITO/VMD/mdtraj) and
minimalist xyz.  The reference decks dump images (in.spce:39); trajectory
dumps are the analysis-grade superset.
"""
from __future__ import annotations

import jax
import numpy as np


def _atoms_of(sim):
    if hasattr(sim, "get_atoms"):
        a = sim.get_atoms()
        return a["x"], a["typ"], a["v"]
    st = jax.device_get(sim.state)
    return np.asarray(st.x), sim.typ, np.asarray(st.v)


def _box_bounds_lines(box):
    """(header, 3 bound lines) in lammpstrj convention.  Triclinic boxes
    use the ``xy xz yz`` header with LAMMPS' tilt-adjusted bounds
    (dump.cpp BOX BOUNDS xy xz yz): xlo_bound = xlo + min(0, xy, xz,
    xy+xz) etc. — an orthorhombic header would misrepresent the cell
    (advisor r3)."""
    lo = np.asarray(box.lo, np.float64)
    hi = np.asarray(box.hi, np.float64)
    tilt = getattr(box, "tilt", None)
    if tilt is None or not getattr(box, "is_triclinic", False):
        return ("ITEM: BOX BOUNDS pp pp pp\n",
                [f"{lo[ax]:.16e} {hi[ax]:.16e}\n" for ax in range(3)])
    xy, xz, yz = (float(t) for t in np.asarray(tilt, np.float64))
    xlo_b = lo[0] + min(0.0, xy, xz, xy + xz)
    xhi_b = hi[0] + max(0.0, xy, xz, xy + xz)
    ylo_b = lo[1] + min(0.0, yz)
    yhi_b = hi[1] + max(0.0, yz)
    return ("ITEM: BOX BOUNDS xy xz yz pp pp pp\n",
            [f"{xlo_b:.16e} {xhi_b:.16e} {xy:.16e}\n",
             f"{ylo_b:.16e} {yhi_b:.16e} {xz:.16e}\n",
             f"{lo[2]:.16e} {hi[2]:.16e} {yz:.16e}\n"])


def write_lammpstrj(path: str, sim, append: bool = True) -> None:
    x, typ, v = _atoms_of(sim)
    box = sim.box
    lo = np.asarray(box.lo, np.float64)
    hi = np.asarray(box.hi, np.float64)
    n = len(x)
    # native fast path (the reference's dump machinery is host C++ too);
    # python fallback below writes the identical format.  Triclinic boxes
    # take the python path (the native writer emits orthorhombic bounds).
    from . import fastdata

    if not getattr(box, "is_triclinic", False):
        if fastdata.write_lammpstrj_frame(path, append, sim.step_count,
                                          lo, hi, x, v, typ):
            return
    header, bound_lines = _box_bounds_lines(box)
    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write("ITEM: TIMESTEP\n")
        f.write(f"{sim.step_count}\n")
        f.write("ITEM: NUMBER OF ATOMS\n")
        f.write(f"{n}\n")
        f.write(header)
        for ln in bound_lines:
            f.write(ln)
        f.write("ITEM: ATOMS id type x y z vx vy vz\n")
        for i in range(n):
            f.write(
                f"{i + 1} {int(typ[i]) + 1} "
                f"{x[i, 0]:.8g} {x[i, 1]:.8g} {x[i, 2]:.8g} "
                f"{v[i, 0]:.8g} {v[i, 1]:.8g} {v[i, 2]:.8g}\n"
            )


def write_xyz(path: str, sim, append: bool = True,
              symbols=None) -> None:
    x, typ, _ = _atoms_of(sim)
    n = len(x)
    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write(f"{n}\n")
        f.write(f"step {sim.step_count}\n")
        for i in range(n):
            sym = symbols[typ[i]] if symbols else f"T{int(typ[i]) + 1}"
            f.write(f"{sym} {x[i, 0]:.8g} {x[i, 1]:.8g} {x[i, 2]:.8g}\n")


_TYPE_COLORS = np.array([
    [220, 60, 60], [60, 120, 220], [60, 200, 90], [230, 200, 60],
    [200, 90, 220], [90, 210, 210], [230, 140, 60], [160, 160, 160],
], np.int32)


def write_image(path: str, sim, size: int = 512, view: str = "xy",
                radius_frac: float = 0.01) -> None:
    """``dump image`` analog (examples/in.spce:39): orthographic
    depth-sorted sphere render of the current frame to a binary PPM
    (readable everywhere, zero dependencies).  Atoms colored by type,
    shaded by a simple z-normal lambert term."""
    x, typ, _ = _atoms_of(sim)
    lo = np.asarray(sim.box.lo, np.float64)
    hi = np.asarray(sim.box.hi, np.float64)
    L = hi - lo
    ax_u, ax_v = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}[view]
    ax_w = 3 - ax_u - ax_v
    xw = lo + np.mod(x - lo, L)          # wrapped view
    u = (xw[:, ax_u] - lo[ax_u]) / L[ax_u]
    v = (xw[:, ax_v] - lo[ax_v]) / L[ax_v]
    w = (xw[:, ax_w] - lo[ax_w]) / L[ax_w]
    order = np.argsort(w)                 # far -> near painter's sort
    img = np.zeros((size, size, 3), np.uint8)
    r_px = max(1, int(radius_frac * size))
    yy, xx = np.mgrid[-r_px:r_px + 1, -r_px:r_px + 1]
    disc = xx * xx + yy * yy <= r_px * r_px
    # lambert-ish: brighten toward the disc center
    shade = np.clip(1.0 - 0.5 * (xx * xx + yy * yy)
                    / max(r_px * r_px, 1), 0.4, 1.0)
    for i in order:
        cu = int(u[i] * (size - 1))
        cv = int((1.0 - v[i]) * (size - 1))
        col = _TYPE_COLORS[int(typ[i]) % len(_TYPE_COLORS)]
        depth = 0.6 + 0.4 * w[i]          # nearer = brighter
        u0, u1 = max(cu - r_px, 0), min(cu + r_px + 1, size)
        v0, v1 = max(cv - r_px, 0), min(cv + r_px + 1, size)
        du0, dv0 = u0 - (cu - r_px), v0 - (cv - r_px)
        d = disc[dv0:dv0 + (v1 - v0), du0:du0 + (u1 - u0)]
        s = shade[dv0:dv0 + (v1 - v0), du0:du0 + (u1 - u0)]
        tile = img[v0:v1, u0:u1]
        px = np.clip(col[None, None, :] * (s * depth)[..., None],
                     0, 255).astype(np.uint8)
        tile[d] = px[d]
    with open(path, "wb") as f:
        f.write(f"P6\n{size} {size}\n255\n".encode())
        f.write(img.tobytes())


def read_lammpstrj(path: str):
    """Parse frames back (round-trip testing / analysis)."""
    frames = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        lo = np.zeros(3)
        hi = np.zeros(3)
        for ax in range(3):
            parts = lines[i + 5 + ax].split()
            lo[ax], hi[ax] = float(parts[0]), float(parts[1])
        cols = lines[i + 8].split()[2:]
        data = np.array(
            [[float(t) for t in lines[i + 9 + k].split()] for k in range(n)]
        )
        frames.append(dict(step=step, lo=lo, hi=hi, cols=cols, data=data))
        i += 9 + n
    return frames


_STRESS_COLS = ("c_stress[1]", "c_stress[2]", "c_stress[3]",
                "c_stress[4]", "c_stress[5]", "c_stress[6]")


def write_custom(path: str, sim, columns, append: bool = True,
                 scope=None, scopes=None) -> None:
    """``dump custom`` analog: arbitrary per-atom columns in lammpstrj
    framing.  Supported columns: id, type, x/y/z, vx/vy/vz, fx/fy/fz,
    q, c_pe (compute pe/atom) and c_stress[1..6] (compute stress/atom).
    ``scope`` forwards one compute keyword list (e.g. ("pair", "kspace"))
    to every per-atom compute; ``scopes`` maps PER compute — {"pe": [...],
    "stress": [...]} — so two computes with different keywords never
    share one scope (advisor r3 medium).  The expensive pair/kspace
    per-atom passes run once per frame via a shared cache."""
    import jax

    from .. import computes

    if hasattr(sim, "get_atoms"):
        a = sim.get_atoms()
        x, v, f = (np.asarray(a["x"]), np.asarray(a["v"]),
                   np.asarray(a.get("f", np.zeros_like(a["x"]))))
        typ = np.asarray(a.get("typ", getattr(sim, "typ", None)))
        q = np.asarray(a.get("q")) if a.get("q") is not None else None
    else:
        st = jax.device_get(sim.state)
        x, v = np.asarray(st.x), np.asarray(st.v)
        f = np.asarray(getattr(st, "f", np.zeros_like(x)))
        typ = np.asarray(sim.typ)
        q = np.asarray(sim.q)
    n = len(x)
    scopes = scopes or {}
    sc_pe = scopes.get("pe", scope)
    sc_stress = scopes.get("stress", scope)
    sc_pe = tuple(sc_pe) if sc_pe else None
    sc_stress = tuple(sc_stress) if sc_stress else None
    cache = {}        # per-column memo
    frame_cache = {}  # shared pair/kspace per-atom passes

    def col(name):
        if name == "id":
            return np.arange(1, n + 1, dtype=np.float64)
        if name == "type":
            return typ.astype(np.float64) + 1
        base = {"x": x, "y": x, "z": x, "vx": v, "vy": v, "vz": v,
                "fx": f, "fy": f, "fz": f}
        if name in base:
            return base[name][:, "xyz".index(name[-1])]
        if name == "q":
            if q is None:
                raise ValueError("dump custom q: deck has no charges")
            return q.astype(np.float64)
        if name == "c_pe":
            if "pe" not in cache:
                cache["pe"] = computes.evaluate(sim, "pe/atom", sc_pe,
                                                cache=frame_cache)
            return cache["pe"]
        if name in _STRESS_COLS:
            if "stress" not in cache:
                cache["stress"] = computes.evaluate(
                    sim, "stress/atom", sc_stress, cache=frame_cache)
            return cache["stress"][:, _STRESS_COLS.index(name)]
        raise NotImplementedError(f"dump custom column {name!r}")

    cols = [col(c) for c in columns]
    box = sim.current_box if hasattr(sim, "current_box") else sim.box
    header, bound_lines = _box_bounds_lines(box)
    mode = "a" if append else "w"
    with open(path, mode) as fh:
        fh.write("ITEM: TIMESTEP\n")
        fh.write(f"{sim.step_count}\n")
        fh.write("ITEM: NUMBER OF ATOMS\n")
        fh.write(f"{n}\n")
        fh.write(header)
        for ln in bound_lines:
            fh.write(ln)
        fh.write("ITEM: ATOMS " + " ".join(columns) + "\n")
        for i in range(n):
            fh.write(" ".join(f"{c[i]:.8g}" for c in cols) + "\n")
