"""Runtime configuration.

The reference hard-codes its scoring constants at compile time
(/root/reference/src/paf_data.hpp:21-29) and its search budgets inline
(MAX_PATH_COUNT at paf_data.cpp:729, MAX_ANOM at paf_data.cpp:711).
Here every knob is a runtime field with the reference's defaults, so one
config object fully determines behavior (SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class AlignasmConfig:
    # --- scoring semiring weights (paf_data.hpp:21-29) ---
    qry_weight: int = 1
    ref_weight: int = 1
    ref_negative_penalty: int = 2
    sv_baseline: int = 1_000_000
    sv_trans_penalty: int = 2000
    sv_inv_penalty: int = 500
    sv_front_end_coefficient: int = 2

    # --- search budgets ---
    max_path_count: int = 10_000   # k-shortest walk budget (paf_data.cpp:729)
    max_anom: int = 1              # per-edge anomaly cap for Dial BFS (paf_data.cpp:711)

    # --- CLI-level flags (alignasm.cpp:28-74) ---
    alt_baseline: float = 0.5      # -b/--alt_baseline
    non_skip_linkable: bool = False  # --non_skip_linkable

    # The reference's compile-time UPGRADE_MODE (paf_data.hpp:13-18),
    # runtime-selectable here: "alt_path" (the reference's compiled-in
    # default), "single_piece" (gap filling with one covering piece,
    # paf_data.cpp:932-1486; exact engine), or "no_update".
    upgrade_mode: str = "alt_path"

    # --- TPU engine knobs (no reference analogue) ---
    # Device routing policy for --engine tpu: "auto" routes work to the
    # chip only when the measured cost model predicts a win
    # (runtime/costmodel.py — on this tunnel the Amdahl A/B says the
    # offloadable slice is below noise, so auto routes everything to
    # the fused native plane and the tpu engine can never lose to it);
    # "always" forces the bucket device pipeline (tests, fuzz
    # campaigns, kernel benchmarks); "never" forces the native plane.
    device_routing: str = "auto"
    # Contigs at or below this record count are solved by the batched
    # device path; larger ones fall back to the exact host engine.
    max_device_records: int = 512
    # Buckets whose padded vertex count fits this bound use the dense
    # (V, V) VMEM relaxation kernel (ops/dense.py); larger buckets use
    # the sparse gather/scatter kernels.
    dense_max_v: int = 256
    # Single-chip big-contig ceiling (native host plane): contigs whose
    # built DAG has at most this many VERTICES solve on device in
    # tiny-B buckets with int16 gate rows (ops/dense.py:
    # solve_slab_topo_nxt16; positions are int16-exact up to 32767).
    # 8192 keeps the densified slab at <= 268 MB of HBM.
    device_max_v: int = 8192
    # Contigs with at least this many records route to the edge-sharded
    # graph-axis solve (parallel/mesh.py:solve_contig_sharded_native)
    # when a multi-device mesh is available.  This axis exists for
    # MEMORY scale-out (the reference demands a >512 GB host for
    # karyotype inputs, README.md:25); it is not a speed path: the
    # per-sweep collectives run n_sweeps ~ n rounds on chain-shaped
    # contigs (measured: a 20.8k-record contig sweeps in ~165 s on an
    # 8-device virtual mesh vs 13 ms for the native sparse-table solve
    # — BENCH_RESULTS.md "Graph axis").  Since the sparse tables already
    # hold a 20.8k-record contig in 68 MB (~3.4 GB extrapolated at 1M
    # records), host RAM only becomes the binding constraint at inputs
    # far beyond any real assembly — hence the opt-in default.  Tests
    # and memory-bound deployments lower it explicitly.
    graph_shard_min_records: int = 1_000_000


DEFAULT_CONFIG = AlignasmConfig()
