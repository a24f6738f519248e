"""LAMMPS input-script front-end: translate ``in.*`` scripts to deck
configs.

The L6 user surface (SURVEY.md §1): a user of the reference runs LAMMPS
input scripts, not YAML.  This module translates the command set the nine
reference decks exercise (/root/reference/examples/in.*) into the deck
schema run.py consumes, so the LITERAL scripts run:

    python -m lammps_buck_intel_tpu.run /root/reference/examples/in.buck

Covered commands: variable (index/equal with arithmetic), units,
atom_style, lattice, region block, create_box, create_atoms, mass,
velocity create, pair_style (buck family, lj/cut, lj/long, lj/charmm),
pair_coeff (with * wildcards), pair_modify mix, kspace_style
(ewald/pppm/pppm/disp), kspace_modify (force/disp/*, slab, mesh, gewald),
bond/angle/dihedral/improper styles + coeffs, special_bonds, neighbor,
neigh_modify, fix (nve/nvt/npt/shake/rigid small), timestep, thermo,
thermo_style (accepted, formatting ours), dump image/custom (PPM /
lammpstrj writers; custom columns incl. c_<ID> compute references),
compute (pe/atom, stress/atom — per-atom columns for dump custom),
dump_modify (ignored), replicate, delete_atoms region, read_data, run.
Unknown commands raise — silent skips would fake coverage.

Deviations (documented): `thermo_style one/multi` both print our thermo
table.  Translated velocities use the host-LAMMPS RanPark stream
(loop all AND loop geom — io/velocity.py `rng="lammps"`) for per-atom
value parity; geom parity additionally requires bit-identical f64
coordinates with the host run (lattice-generated decks).
"""
from __future__ import annotations

import os
import re


class TranslateError(ValueError):
    pass


# Styles compute_bonded actually implements; anything else must raise (the
# coeff column meanings differ per style — e.g. dihedral 'harmonic' is
# [K, d, n] but 'charmm' is [K, n, d, weight]).
_BONDED_STYLES = {
    "bond": {"harmonic"},
    "angle": {"harmonic", "charmm"},
    "dihedral": {"charmm"},
    "improper": {"harmonic"},
}


def _tok_sub(tok: str, vars_: dict) -> str:
    tok = re.sub(r"\$\{(\w+)\}", lambda m: str(vars_[m.group(1)]), tok)
    tok = re.sub(r"\$(\w)", lambda m: str(vars_[m.group(1)]), tok)
    return tok


def _num(s: str):
    v = float(s)
    return int(v) if v == int(v) else v


def _eval_expr(expr: str):
    """`variable ... equal` arithmetic: numbers and + - * / ( ) only."""
    if not re.fullmatch(r"[\d.eE+\-*/() ]+", expr):
        raise TranslateError(f"unsupported variable expression {expr!r}")
    return _num(str(eval(expr, {"__builtins__": {}})))  # noqa: S307


def _logical_lines(text: str):
    """Strip comments, join `&` continuations, split tokens."""
    out = []
    pending = ""
    for raw in text.splitlines():
        if "#" in raw:
            raw = raw[: raw.index("#")]
        raw = raw.strip()
        if not raw:
            continue
        if raw.endswith("&"):
            pending += raw[:-1] + " "
            continue
        out.append((pending + raw).split())
        pending = ""
    if pending.strip():
        out.append(pending.split())
    return out


def _expand_coeff_key(ti: str, tj: str, ntypes: int):
    """pair_coeff i j with * wildcards -> list of (i, j) 1-based pairs."""
    def rng(t):
        if t == "*":
            return range(1, ntypes + 1)
        return [int(t)]

    return [(i, j) for i in rng(ti) for j in rng(tj) if i <= j] + \
           [(j, i) for i in rng(ti) for j in rng(tj) if j < i]


def translate(path: str) -> dict:
    """LAMMPS input script -> deck config dict (run.py schema)."""
    with open(path) as f:
        text = f.read()
    base = os.path.dirname(os.path.abspath(path))

    cfg: dict = {}
    vars_: dict = {}
    regions: dict = {}
    lattice = None            # (style, density)
    box_region = None
    ntypes = 0
    masses: dict = {}
    raw_pair_coeffs = []      # (ti, tj, [vals])
    mix = None
    fixes = []
    computes = {}             # compute ID -> {name, scope}
    deferred_delete = []      # (region_name, mol_flag)
    bonded_styles = {}
    bonded_coeffs = {"bond": {}, "angle": {}, "dihedral": {},
                     "improper": {}}

    for toks in _logical_lines(text):
        toks = [_tok_sub(t, vars_) for t in toks]
        cmd = toks[0]
        a = toks[1:]

        if cmd == "variable":
            name, mode = a[0], a[1]
            if mode == "index":
                vars_.setdefault(name, _num(a[2]))
            elif mode == "equal":
                vars_[name] = _eval_expr(" ".join(a[2:]))
            else:
                raise TranslateError(f"variable mode {mode!r}")
        elif cmd == "units":
            cfg["units"] = a[0]
        elif cmd == "atom_style":
            cfg["atom_style"] = a[0]
        elif cmd == "lattice":
            lattice = (a[0], float(a[1]))
        elif cmd == "region":
            regions[a[0]] = {"style": a[1],
                             "bounds": [float(v) for v in a[2:8]]}
        elif cmd == "create_box":
            ntypes = int(a[0])
            box_region = a[1]
        elif cmd == "create_atoms":
            if lattice is None or box_region is None:
                raise TranslateError("create_atoms needs lattice + "
                                     "create_box")
            b = regions[box_region]["bounds"]
            style, dens = lattice
            nx, ny, nz = (int(round(b[1] - b[0])), int(round(b[3] - b[2])),
                          int(round(b[5] - b[4])))
            cfg["lattice"] = {"style": style, "density": dens,
                              "nx": nx, "ny": ny, "nz": nz}
        elif cmd == "mass":
            masses[int(a[0])] = float(a[1])
        elif cmd == "read_data":
            p = a[0] if os.path.isabs(a[0]) else os.path.join(base, a[0])
            cfg["read_data"] = p
        elif cmd == "replicate":
            cfg["replicate"] = [int(v) for v in a[:3]]
        elif cmd == "velocity":
            # velocity all create T seed [dist uniform|gaussian]
            # [loop all|geom] — literal scripts get the host-LAMMPS
            # RanPark stream (io/velocity.py) for per-atom value parity
            if a[1] != "create":
                raise TranslateError(f"velocity {a[1]!r}")
            v = {"temp": float(a[2]), "seed": int(a[3]),
                 "rng": "lammps", "dist": "uniform"}  # host default dist
            if "dist" in a:
                v["dist"] = a[a.index("dist") + 1]
            if "loop" in a:
                v["loop"] = a[a.index("loop") + 1]
            cfg["velocity"] = v
        elif cmd == "pair_style":
            name = a[0]
            ps: dict = {"name": name}
            args = a[1:]
            if name == "lj/long/coul/long":
                # `long off 9.8`: dispersion long, coulomb off
                ps["name"] = name
                if args[1] == "off":
                    ps["coul"] = "off"
                ps["cut"] = float(args[2])
            elif name == "lj/charmm/coul/long":
                ps["inner"] = float(args[0])
                ps["cut"] = float(args[1])
                if len(args) > 2:
                    ps["cut_coul"] = float(args[2])
            else:
                ps["cut"] = float(args[0])
                if len(args) > 1:
                    ps["cut_coul"] = float(args[1])
            cfg["pair_style"] = ps
        elif cmd == "pair_coeff":
            raw_pair_coeffs.append((a[0], a[1], [float(v) for v in a[2:]]))
        elif cmd == "pair_modify":
            if "mix" in a:
                mix = a[a.index("mix") + 1]
        elif cmd == "kspace_style":
            if a[0] == "none":
                continue
            cfg["kspace_style"] = {"name": a[0], "accuracy": float(a[1])}
        elif cmd == "kspace_modify":
            ks = cfg.setdefault("kspace_style", {})
            key = a[0]
            if key == "force/disp/real":
                ks["force_disp_real"] = float(a[1])
            elif key == "force/disp/kspace":
                ks["force_disp_kspace"] = float(a[1])
            elif key == "slab":
                ks["slab"] = float(a[1])
            elif key == "mesh":
                ks["grid"] = [int(v) for v in a[1:4]]
            elif key == "gewald":
                ks["gewald"] = float(a[1])
            else:
                raise TranslateError(f"kspace_modify {key!r}")
        elif cmd in ("bond_style", "angle_style", "dihedral_style",
                     "improper_style"):
            if a[0] != "none":
                kind = cmd.split("_")[0]
                allowed = _BONDED_STYLES[kind]
                if a[0] not in allowed:
                    raise TranslateError(
                        f"{cmd} {a[0]!r} not implemented (have: "
                        f"{', '.join(sorted(allowed))}) — coeff columns "
                        "differ per style; silently misreading them would "
                        "fake coverage")
                bonded_styles[kind] = a[0]
        elif cmd in ("bond_coeff", "angle_coeff", "dihedral_coeff",
                     "improper_coeff"):
            kind = cmd.split("_")[0]
            bonded_coeffs[kind][int(a[0])] = [float(v) for v in a[1:]]
        elif cmd == "special_bonds":
            if a[0] in ("charmm", "amber"):
                cfg["special_bonds"] = a[0]
            elif a[0] in ("lj/coul", "lj", "coul"):
                cfg["special_bonds"] = {a[0]: [float(v) for v in a[1:4]]}
            else:
                cfg["special_bonds"] = [float(v) for v in a[:3]]
        elif cmd == "neighbor":
            cfg.setdefault("neighbor", {})["skin"] = float(a[0])
        elif cmd == "neigh_modify":
            nb = cfg.setdefault("neighbor", {})
            i = 0
            while i < len(a):
                if a[i] == "delay":
                    nb["delay"] = int(a[i + 1])
                elif a[i] == "every":
                    nb["every"] = int(a[i + 1])
                elif a[i] == "check":
                    nb["check"] = a[i + 1] == "yes"
                i += 2
        elif cmd == "fix":
            fixes.append(_fix(a))
        elif cmd == "unfix":
            fixes = [f for f in fixes if f.get("_id") != a[0]]
        elif cmd == "timestep":
            cfg["timestep"] = float(a[0])
        elif cmd == "thermo":
            cfg["thermo"] = int(a[0])
        elif cmd == "thermo_style":
            pass  # one/multi: formatting is ours
        elif cmd == "dump":
            # dump id group style every file args...
            if a[1] != "all":
                # LAMMPS restricts dump output to group members; we dump
                # every atom — a silent difference (advisor r3), so loud
                raise TranslateError(
                    f"dump group {a[1]!r}: only 'all' is supported "
                    "(per-group dumps are not implemented)")
            style = a[2]
            every = int(a[3])
            # OUTPUT paths resolve against the CWD (the script dir may be
            # read-only, e.g. the mounted reference examples)
            fname = a[4]
            d = {"every": every}
            if style == "image":
                d["style"] = "image"
                d["file"] = fname
                if "size" in a:
                    d["size"] = int(a[a.index("size") + 1])
            elif style == "custom":
                # dump custom: per-atom columns; c_<ID> references map to
                # the registered computes (pe/atom, stress/atom).  Each
                # referenced compute keeps ITS OWN keyword scope (advisor
                # r3 medium: a dump-level scope let one compute's
                # keywords silently rescope another's columns)
                d["style"] = "custom"
                d["file"] = fname.replace("*", "")
                cols = []
                scopes = {}
                for c in a[5:]:
                    if c.startswith("c_"):
                        base = c[2:].split("[")[0]
                        reg = computes.get(base)
                        if reg is None:
                            raise TranslateError(
                                f"dump custom {c!r}: compute {base!r} not "
                                "defined")
                        if reg["name"] == "pe/atom":
                            cols.append("c_pe")
                            scopes["pe"] = reg.get("scope")
                        else:  # stress/atom
                            if "[" in c:
                                cols.append("c_stress[" + c.split("[")[1])
                            else:
                                cols += [f"c_stress[{k}]"
                                         for k in range(1, 7)]
                            scopes["stress"] = reg.get("scope")
                    else:
                        cols.append(c)
                d["columns"] = cols
                if scopes:
                    d["scopes"] = scopes
            else:
                d["file"] = fname.replace("*", "")
            cfg["dump"] = d
        elif cmd == "compute":
            # compute ID group style [keywords...]; only the per-atom
            # computes the engines tally are accepted (loud otherwise)
            if a[1] != "all":
                # per-group computes zero non-members in LAMMPS; we
                # evaluate every atom — reject rather than silently differ
                raise TranslateError(
                    f"compute group {a[1]!r}: only 'all' is supported")
            if a[2] not in ("pe/atom", "stress/atom"):
                raise TranslateError(f"compute {a[2]!r}")
            ok_kw = ("pair", "kspace", "bond", "angle", "dihedral",
                     "improper")
            scope = [k for k in a[3:] if k in ok_kw]
            bad = [k for k in a[3:] if k not in ok_kw]
            if bad:
                raise TranslateError(
                    f"compute {a[2]} keywords {bad!r}: supported "
                    f"contributions are {ok_kw}")
            computes[a[0]] = {"name": a[2],
                              "scope": scope or None}
        elif cmd == "dump_modify":
            pass
        elif cmd == "delete_atoms":
            if a[0] != "region":
                raise TranslateError(f"delete_atoms {a[0]!r}")
            deferred_delete.append({"region": a[1], "mol": "mol" in a})
        elif cmd == "run":
            cfg["run"] = cfg.get("run", 0) + int(a[0])
        elif cmd == "minimize":
            # minimize etol ftol maxiter maxeval -> FIRE (run.py wires
            # integrate/minimize.py; etol/maxeval have no FIRE analog —
            # the ftol force gate is the convergence contract)
            cfg["minimize"] = {"ftol": float(a[1]), "maxiter": int(a[2])}
        elif cmd in ("log", "echo", "print", "group", "reset_timestep",
                     "change_box", "min_style", "write_data",
                     "write_restart"):
            if cmd == "write_data":
                cfg["write_data"] = a[0]    # output: CWD-relative
            elif cmd == "write_restart":
                cfg["write_restart"] = a[0]
            # log/echo/print/group are IO/bookkeeping no-ops here
        else:
            raise TranslateError(f"unsupported command {cmd!r} — extend "
                                 "io/lammps_input.py")

    # ---- post-processing ----
    if masses:
        cfg["mass"] = [masses[t] for t in sorted(masses)]
        ntypes = max(ntypes, max(masses))
    if "read_data" in cfg and not ntypes:
        ntypes = _peek_ntypes(cfg["read_data"])
    if raw_pair_coeffs:
        coeffs = {}
        for ti, tj, vals in raw_pair_coeffs:
            for i, j in _expand_coeff_key(ti, tj, ntypes):
                key = f"{min(i, j)} {max(i, j)}"
                coeffs[key] = vals
        cfg["pair_style"]["coeffs"] = coeffs
    if mix:
        cfg["pair_style"]["mix"] = mix
    for kind, style in bonded_styles.items():
        entry = {"name": style}
        table = bonded_coeffs[kind]
        if table:
            T = max(table)
            width = max(len(v) for v in table.values())
            entry["coeffs"] = [
                table.get(t, [0.0] * width) for t in range(1, T + 1)
            ]
        cfg[f"{kind}_style"] = entry
    if deferred_delete:
        cfg["regions"] = regions
        cfg["delete_atoms"] = deferred_delete
    if fixes:
        for f in fixes:
            f.pop("_id", None)
        cfg["fixes"] = fixes
    return cfg


def _fix(a: list) -> dict:
    """fix <id> <group> <style> args..."""
    fid, _group, style = a[0], a[1], a[2]
    args = a[3:]
    out = {"_id": fid}
    if style == "nve":
        out["name"] = "nve"
    elif style == "nvt":
        assert args[0] == "temp"
        out.update(name="nvt", t_start=float(args[1]),
                   t_stop=float(args[2]), t_damp=float(args[3]))
        if "tchain" in args:
            out["tchain"] = int(args[args.index("tchain") + 1])
    elif style in ("npt", "rigid/npt/small"):
        if style == "rigid/npt/small":
            # `fix rigid/npt/small molecule temp ... iso ...` — skip the
            # bodystyle token (only `molecule` bodies are supported,
            # matching fix rigid/small)
            if args and args[0] == "molecule":
                args = args[1:]
        assert args[0] == "temp"
        out.update(name=style, t_start=float(args[1]),
                   t_stop=float(args[2]), t_damp=float(args[3]))
        i = 4
        while i < len(args):
            k = args[i]
            if k == "iso":
                out["iso"] = [float(args[i + 1]), float(args[i + 2]),
                              float(args[i + 3])]
                i += 4
            elif k == "aniso":
                out["aniso"] = [float(args[i + 1]), float(args[i + 2]),
                                float(args[i + 3])]
                i += 4
            elif k in ("x", "y", "z"):
                out[k] = [float(args[i + 1]), float(args[i + 2]),
                          float(args[i + 3])]
                i += 4
            elif k == "mtk":
                out["mtk"] = args[i + 1] == "yes"
                i += 2
            elif k in ("pchain", "tchain"):
                out[k] = int(args[i + 1])
                i += 2
            else:
                raise TranslateError(f"fix npt arg {k!r}")
        # host LAMMPS defaults to pchain 3 (fix_nh.cpp ctor); literal
        # scripts that do not say `pchain N` get the host default
        out.setdefault("pchain", 3)
    elif style == "shake":
        out.update(name="shake", tol=float(args[0]),
                   iters=max(int(args[1]), 20))
        i = 3  # skip tol, iter, N(print)
        while i < len(args):
            k = args[i]
            vals = []
            i += 1
            while i < len(args) and args[i] not in ("b", "a", "t", "m"):
                vals.append(args[i])
                i += 1
            if k == "b":
                out["b"] = [int(v) for v in vals]
            elif k == "a":
                out["a"] = [int(v) for v in vals]
            elif k == "m":
                out["m"] = [float(v) for v in vals]
            elif k == "t":
                raise TranslateError("fix shake t (type list) unsupported")
    elif style == "rigid/small":
        out["name"] = "rigid/small"
    else:
        raise TranslateError(f"unsupported fix style {style!r}")
    return out


def _peek_ntypes(path: str) -> int:
    if not os.path.exists(path):
        return 0   # read_data will raise with a clear error at run time
    with open(path) as f:
        for line in f:
            if "#" in line:
                line = line[: line.index("#")]
            toks = line.split()
            if len(toks) >= 3 and toks[-2:] == ["atom", "types"]:
                return int(toks[0])
    return 0


def is_lammps_input(path: str) -> bool:
    """Heuristic: not YAML -> LAMMPS script (in.* name or command words)."""
    name = os.path.basename(path)
    if name.startswith("in.") or name.endswith(".in"):
        return True
    if name.endswith((".yaml", ".yml")):
        return False
    with open(path) as f:
        head = f.read(4096)
    return bool(re.search(r"^\s*(units|atom_style|pair_style)\s", head,
                          re.M))
