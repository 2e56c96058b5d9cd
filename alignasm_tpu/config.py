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
    # when a multi-device mesh is available.  Round 4 DEMOTED this axis
    # to a documented experiment (default: never): the configs[4]-scale
    # input was run for real — a 1,000,996-record mega-contig solves on
    # the native sparse plane in 4-9 s / 2.13 GB peak RSS (BENCH_RESULTS
    # "BASELINE configs[4]"), so no input within orders of magnitude of
    # a real assembly is memory-bound, and the mesh sweep is depth-bound
    # (~n collective rounds: 165 s for a 20.8k-record contig vs 13 ms
    # native).  The capability stays byte-validated and reachable by
    # lowering this threshold explicitly (tests/test_device.py) — it is
    # the template for a genuinely memory-bound future regime (per-chip
    # working set O(E/devices)).
    graph_shard_min_records: int = 2**62


DEFAULT_CONFIG = AlignasmConfig()
