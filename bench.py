"""Benchmark: the BASELINE.json north-star workload — atom-steps/sec on a
259,200-atom buck/coul/long + PPPM system (examples/decks/silica_pppm.yaml,
the reference's data.aC silica scaled to in.spce's size class), running on
the production cell-pair engine with the scatter-free cell-patch PPPM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness (round-2 lesson: the TPU tunnel flakes — BENCH_r02 died in
backend init): the backend is probed in a watchdog SUBPROCESS with retries
and backoff before committing this process to jax init (an in-process init
hang cannot be recovered).  All failures emit a structured JSON line with
an "error" field instead of a raw traceback.

Baseline note: the reference publishes no numbers (BASELINE.md).  The
vs_baseline denominator is 1.06e6 atom-steps/s — MEASURED, not guessed:
native/baseline_md.cpp (a C++ implementation of the reference's own
algorithm: half lists + Newton, A&S-erfc buck/coul/long, order-5 ik
PPPM) runs this exact workload at 37,836 atom-steps/s on one core of
this container's Xeon (energies cross-checked against the JAX engine to
<=1.5e-4), extrapolated x28 cores to one socket.  Full provenance and
the AVX-512 vectorization caveat: BASELINE.md "Measured CPU baseline".
Reproduce with `python bench_baseline.py`.
"""
import json
import os
import subprocess
import sys
import time

METRIC = "atom_steps_per_sec_silica_buck_coul_long_pppm_259k"
BASELINE = 1.06e6  # atom-steps/s, measured single-socket CPU (BASELINE.md)

_PROBE = (
    # honor JAX_PLATFORMS through the config API: the image pins axon at
    # the site level, so plain env is ignored (enables CPU smoke tests;
    # a no-op on the axon path where env == pin)
    "import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
    "p and jax.config.update('jax_platforms', p); "
    "d = jax.devices(); print('PROBE_OK', d[0].platform, len(d))"
)


def _fail(stage: str, detail: str) -> None:
    print(json.dumps({
        "metric": METRIC, "value": None, "unit": "atom-steps/s",
        "vs_baseline": None, "error": stage,
        "detail": detail[-2000:],
    }))
    sys.exit(1)


def probe_backend(attempts=(240, 240, 300), backoff=(15, 45)) -> str:
    """Probe jax backend init in a watchdog subprocess; returns platform.

    The round-2 failure mode was an in-process init that either raised
    UNAVAILABLE or hung >14 min.  A subprocess can be killed on timeout
    and retried — the tunnel has been observed to come back.
    """
    last = ""
    for i, tmo in enumerate(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE], capture_output=True,
                text=True, timeout=tmo)
            out = (r.stdout or "") + (r.stderr or "")
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return r.stdout.split("PROBE_OK", 1)[1].split()[0]
            last = f"rc={r.returncode}: {out[-500:]}"
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {tmo}s"
        sys.stderr.write(f"[bench] backend probe attempt {i + 1} failed: "
                         f"{last}\n")
        if i < len(attempts) - 1:
            time.sleep(backoff[min(i, len(backoff) - 1)])
    _fail("backend_init", last)


def main():
    platform = probe_backend()
    sys.stderr.write(f"[bench] backend up: {platform}\n")

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import yaml

    from lammps_buck_intel_tpu.run import build_simulation

    # BENCH_DECK overrides the workload (mechanism smoke tests on CPU /
    # alternative workloads); the certified north star stays the default.
    deck = os.environ.get("BENCH_DECK") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "examples", "decks", "silica_pppm.yaml")
    with open(deck) as f:
        cfg = yaml.safe_load(f)

    def build(kernel):
        c = dict(cfg)
        c.pop("pair_kernel", None)   # the xla trial must be really-XLA
        if kernel != "xla":
            c["pair_kernel"] = kernel
        return build_simulation(c)

    # ---- pair kernel: XLA (the Pallas variants were pruned in r5
    # after losing every hardware A/B — PERF.md "Pair-kernel A/B") ----
    candidates = ["xla"]
    best = None
    trials = {}
    ref_etotal = None
    for kernel in candidates:
        try:
            sim = build(kernel)
            sim.run(20, log=False)              # compile + warm
            row = sim.thermo()                  # XLA energy pass
            if ref_etotal is None:
                ref_etotal = row["etotal"]
            elif abs(row["etotal"] - ref_etotal) > 1e-3 * abs(ref_etotal):
                # hardware-only miscompile guard: interpret-mode parity
                # passes, but a Mosaic regression must not certify a fast
                # wrong number
                raise RuntimeError(
                    f"etotal {row['etotal']:.6g} != ref {ref_etotal:.6g}")
            t0 = time.perf_counter()
            # 40 = 2x the deck's rebuild cadence: the trial must reuse
            # the warmed block size (a fresh block length recompiles
            # mid-trial and reads as a bogus 10x slowdown)
            sim.run(40, log=False)
            ms = (time.perf_counter() - t0) / 40 * 1e3
            trials[kernel] = round(ms, 3)
            if best is None or ms < best[1]:
                best = (kernel, ms, sim)
        except Exception as e:                   # noqa: BLE001
            trials[kernel] = f"failed: {type(e).__name__}"
            sys.stderr.write(f"[bench] kernel {kernel} failed: {e}\n")
        if kernel == "xla" and best is None:
            _fail("build", f"default kernel failed: {trials}")
    sys.stderr.write(f"[bench] kernel trials (ms/step): {trials}\n")

    kernel, _, sim = best
    n = sim.n_atoms
    steps = 100
    t0 = time.perf_counter()
    sim.run(steps, log=False)
    dt = time.perf_counter() - t0
    rate = n * steps / dt
    print(json.dumps({
        "metric": METRIC,
        "value": rate,
        "unit": "atom-steps/s",
        "vs_baseline": rate / BASELINE,
        "platform": platform,
        "ms_per_step": dt / steps * 1e3,
        "pair_kernel": kernel,
        "kernel_trials_ms": trials,
    }))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # emit structured JSON, never a bare traceback
        import traceback
        _fail(type(e).__name__, traceback.format_exc())
