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

    work = pathlib.Path(tempfile.mkdtemp(prefix="alignasm_bench_"))
    paf = work / "bench.paf"
    paf.write_text(generate_paf(n_contigs=N_CONTIGS, seed=SEED,
                                max_records_per_contig=24))
    ncpu = os.cpu_count() or 1

    reps = int(os.environ.get("BENCH_REPS", "3"))

    def best_of(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- reference baseline (all cores) --------------------------------
    fast = ensure_fast_bin()
    ref_elapsed = best_of(lambda: subprocess.run(
        [str(fast), str(paf), "-t", str(ncpu)], check=True, capture_output=True))
    ref_cps = N_CONTIGS / ref_elapsed
    ref_main = (work / "bench.aln.paf").read_bytes()

    # --- native engine (same cores) ------------------------------------
    native.build()
    native_elapsed = best_of(lambda: native.run(str(paf), threads=ncpu))
    native_cps = N_CONTIGS / native_elapsed
    identical = ref_main == (work / "bench.aln.paf").read_bytes()

    # --- batched TPU engine (informational, bounded subset) -------------
    # guarded by an alarm: first-time bucket compiles through the remote
    # helper can take minutes; never let them sink the whole bench run
    import signal

    tpu_cps = None
    tpu_stats = None
    n_tpu = int(os.environ.get("BENCH_TPU_CONTIGS", "100"))
    # the first device->host transfer in a process stalls ~285 s on
    # this tunnel (see BENCH_RESULTS notes); the budget must cover it
    tpu_budget = int(os.environ.get("BENCH_TPU_BUDGET_S", "450"))

    class _Timeout(Exception):
        pass

    def _alarm(_sig, _frm):
        raise _Timeout()

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(tpu_budget if n_tpu else 0)
    try:
        from alignasm_tpu.config import DEFAULT_CONFIG
        from alignasm_tpu.io.paf import read_paf
        from alignasm_tpu.runtime.scheduler import solve_dataset_tpu

        small = work / "bench_tpu.paf"
        small.write_text(generate_paf(n_contigs=n_tpu, seed=SEED,
                                      max_records_per_contig=24))
        paths = (str(small), None)
        ds = read_paf(small)
        solve_dataset_tpu(ds, DEFAULT_CONFIG, src_paths=paths)  # warm-up
        ds = read_paf(small)
        t0 = time.perf_counter()
        solve_dataset_tpu(ds, DEFAULT_CONFIG, src_paths=paths)
        tpu_cps = round(n_tpu / (time.perf_counter() - t0), 2)
        tpu_stats = solve_dataset_tpu.last_stats
    except Exception:
        pass
    finally:
        signal.alarm(0)

    n_records = sum(1 for _ in open(paf))
    print(json.dumps({
        "metric": "contigs_per_s",
        "value": round(native_cps, 2),
        "unit": "contigs/s",
        "vs_baseline": round(native_cps / ref_cps, 4),
        "baseline_contigs_per_s": round(ref_cps, 2),
        "records_per_s": round(n_records / native_elapsed, 2),
        "output_identical": identical,
        "tpu_engine_contigs_per_s": tpu_cps,
        "tpu_engine_stats": tpu_stats,
        "n_contigs": N_CONTIGS,
        "n_records": n_records,
        "threads": ncpu,
    }))


if __name__ == "__main__":
    main()
