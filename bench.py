"""End-to-end benchmark: contigs/s vs the C++ reference.

Prints ONE JSON line:
  {"metric": "contigs_per_s", "value": N, "unit": "contigs/s",
   "vs_baseline": N / reference_contigs_per_s, ...}

Baseline = the reference binary (NDEBUG, threaded stub-TBB) on all host
cores — the strongest honest single-socket C++ number available here
(BASELINE.md).  Ours = the native host plane (same thread count), the
production path of the framework; the batched TPU engine's throughput
is reported alongside.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import time

REPO = pathlib.Path(__file__).resolve().parent
ORACLE_DIR = REPO / "tests" / "oracle"
FAST_BIN = ORACLE_DIR / "bin" / "alignasm_ref_fast"

N_CONTIGS = int(os.environ.get("BENCH_CONTIGS", "2000"))
SEED = 2024


def ensure_fast_bin():
    if not FAST_BIN.exists():
        subprocess.run(["make", "-C", str(ORACLE_DIR), "fast"],
                       check=True, capture_output=True)
    return FAST_BIN


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    import tempfile

    from alignasm_tpu import native
    from alignasm_tpu.testing.synth import generate_paf

    # memory-backed work dir when available: the VM's disk gets
    # throttled to ~13 MB/s at times, which would swamp the signal —
    # reference and native engines both read/write the same dir, so
    # the comparison stays fair either way
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = pathlib.Path(tempfile.mkdtemp(prefix="alignasm_bench_", dir=shm))
    import atexit
    import shutil

    atexit.register(shutil.rmtree, work, True)  # tmpfs pins RAM, not disk
    paf = work / "bench.paf"
    paf.write_text(generate_paf(n_contigs=N_CONTIGS, seed=SEED,
                                max_records_per_contig=24))
    ncpu = os.cpu_count() or 1

    reps = int(os.environ.get("BENCH_REPS", "7"))

    # --- reference vs native, INTERLEAVED ------------------------------
    # the shared VM has minutes-long CPU-steal windows; running all
    # reference reps then all native reps lets a window hit one side
    # only and skew the ratio (one driver run recorded 2.6x against a
    # steady-state ~5-7x).  Each rep times both back to back, so the
    # within-rep ratio is window-consistent; the reported ratio is the
    # median of the per-rep ratios and the throughputs are best-of.
    fast = ensure_fast_bin()
    native.build()

    def time_one(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    run_ref = lambda: subprocess.run(
        [str(fast), str(paf), "-t", str(ncpu)], check=True,
        capture_output=True)
    run_native = lambda: native.run(str(paf), threads=ncpu)

    run_ref()  # warm (page cache, binary load)
    ref_main = (work / "bench.aln.paf").read_bytes()
    run_native()
    identical = ref_main == (work / "bench.aln.paf").read_bytes()

    ratios = []
    ref_reps = []
    native_reps = []
    ref_elapsed = native_elapsed = float("inf")
    # rep 0 is a LABELED WARM-UP (first-touch page faults + allocator
    # growth made it a consistent outlier: one driver run recorded
    # ratio_reps[0]=5.36 against a 13.34 median); it is reported in the
    # rep vectors but excluded from the median and best-of
    for rep in range(reps + 1):
        r = time_one(run_ref)
        n = time_one(run_native)
        # join the rep's background teardown so its free() churn can't
        # compete with the next rep's timed work (4-vCPU VM)
        native.drain_teardowns()
        ratios.append(r / n)
        ref_reps.append(round(r, 4))
        native_reps.append(round(n, 4))
        if rep == 0:
            continue
        ref_elapsed = min(ref_elapsed, r)
        native_elapsed = min(native_elapsed, n)
    import statistics

    ratio = statistics.median(ratios[1:])
    ref_cps = N_CONTIGS / ref_elapsed
    native_cps = N_CONTIGS / native_elapsed

    # --- batched TPU engine + kernel roofline (subprocess) --------------
    # the device section runs in its OWN process (runtime/devbench.py):
    # a hung tunnel, a fatal plugin error, or a teardown abort is then a
    # recorded tpu_error, never a crashed bench (round-1 rc 134 was a
    # SIGALRM unwinding through the tunnel's C++ frames at exit)
    tpu_cps = None
    tpu_stats = None
    tpu_forced_cps = None
    tpu_forced_stats = None
    tpu_vs_native_inproc = None
    tpu_kernels = None
    tpu_error = None
    n_tpu = int(os.environ.get("BENCH_TPU_CONTIGS", "2000"))
    # the first device->host transfer in a process stalls ~285 s on
    # this tunnel (see BENCH_RESULTS notes); the budget must cover it
    tpu_budget = int(os.environ.get("BENCH_TPU_BUDGET_S", "1500"))
    tpu_sections_skipped = None
    if n_tpu:
        import sys

        from alignasm_tpu.runtime.devbench import _deep_merge

        # STREAMING harvest (round-4 verdict Next #1): devbench emits
        # each section as its own JSON line the moment it finishes;
        # stdout goes to a file so a timeout kill costs only the
        # sections still pending, never the finished ones (the old
        # all-or-nothing pipe dropped everything — BENCH_r04.json
        # recorded zero TPU evidence for a round whose claims all
        # reproduced by hand).  devbench also gets an internal deadline
        # at ~0.8x our budget so it degrades gracefully BEFORE the kill.
        out_path = work / "devbench.out"
        env = dict(os.environ)
        env.setdefault("ALIGNASM_DEVBENCH_DEADLINE_S",
                       str(int(tpu_budget * 0.8)))
        try:
            with open(out_path, "w") as out_fh, \
                    open(work / "devbench.err", "w") as err_fh:
                proc = subprocess.Popen(
                    [sys.executable, "-m", "alignasm_tpu.runtime.devbench",
                     str(n_tpu)],
                    stdout=out_fh, stderr=err_fh, cwd=str(REPO), env=env,
                )
                try:
                    rc = proc.wait(timeout=tpu_budget)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                    rc = None
                    tpu_error = (f"devbench exceeded {tpu_budget}s budget "
                                 "(partial sections merged)")
            dev = {}
            n_lines = 0
            for line in out_path.read_text().splitlines():
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    _deep_merge(dev, json.loads(line))
                    n_lines += 1
                except ValueError:
                    continue  # a killed process can leave a torn line
            if rc not in (0, None) and not n_lines:
                tail = (work / "devbench.err").read_text()[-500:]
                tpu_error = f"rc {rc}: {tail}"
            elif rc not in (0, None):
                tail = (work / "devbench.err").read_text()[-300:]
                tpu_error = f"rc {rc} after {n_lines} sections: {tail}"
            if dev:
                tpu_cps = dev.get("tpu_engine_contigs_per_s")
                tpu_stats = dev.get("tpu_engine_stats")
                tpu_forced_cps = dev.get("tpu_engine_forced_contigs_per_s")
                tpu_forced_stats = dev.get("tpu_engine_forced_stats")
                tpu_vs_native_inproc = dev.get("tpu_vs_native_inproc")
                tpu_kernels = dev.get("kernels")
                tpu_sections_skipped = dev.get("sections_skipped")
        except Exception as exc:  # never let the TPU section sink the bench
            tpu_error = repr(exc)

    n_records = sum(1 for _ in open(paf))
    print(json.dumps({
        "metric": "contigs_per_s",
        "value": round(native_cps, 2),
        "unit": "contigs/s",
        "vs_baseline": round(ratio, 4),
        "vs_baseline_best_of": round(native_cps / ref_cps, 4),
        # per-rep spread: one driver capture is interpretable without
        # BENCH_RESULTS context — the shared VM's CPU-steal windows show
        # up as outlier reps / a wide ratio vector, not as a silent
        # mis-ranking (round-2 verdict item 7).  Rep 0 is a labeled
        # warm-up, excluded from the median/best.
        "rep0_is_warmup": True,
        "ref_reps_s": ref_reps,
        "native_reps_s": native_reps,
        "ratio_reps": [round(x, 4) for x in ratios],
        "baseline_contigs_per_s": round(ref_cps, 2),
        "records_per_s": round(n_records / native_elapsed, 2),
        "tpu_engine_stats": tpu_stats,
        "tpu_engine_forced_stats": tpu_forced_stats,
        "tpu_kernels": tpu_kernels,
        "tpu_sections_skipped": tpu_sections_skipped,
        "tpu_error": tpu_error,
        "n_contigs": N_CONTIGS,
        "n_records": n_records,
        "threads": ncpu,
        # compact trailer: the driver records the TAIL of this line, so
        # the headline comparisons live at the END where they survive
        # truncation (round-3 verdict, housekeeping)
        "summary": {
            "native_contigs_per_s": round(native_cps, 2),
            "vs_reference_median": round(ratio, 4),
            "tpu_engine_contigs_per_s": tpu_cps,
            "tpu_engine_forced_contigs_per_s": tpu_forced_cps,
            "tpu_vs_native": round(tpu_cps / native_cps, 4)
            if tpu_cps else None,
            # same-process interleaved ratio from devbench — the
            # routing-criterion number (cross-process ratios of a ~20 ms
            # job are rep-noise-dominated)
            "tpu_vs_native_inproc": tpu_vs_native_inproc,
            "device_routed_frac": (tpu_stats or {}).get("device_routed_frac"),
            "output_identical": identical,
        },
        "output_identical": identical,
        "tpu_engine_contigs_per_s": tpu_cps,
    }))


if __name__ == "__main__":
    main()
