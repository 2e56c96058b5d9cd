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
    # graph-axis solve (parallel/mesh.py:solve_contig_sharded) when a
    # multi-device mesh is available — the 512 GB-class path.  Default
    # sits just past device_max_v: a contig of <= device_max_v records
    # is single-chip work (vertices >= records, so anything sharded
    # here could not have fit the single-chip path anyway).
    graph_shard_min_records: int = 8193


DEFAULT_CONFIG = AlignasmConfig()
