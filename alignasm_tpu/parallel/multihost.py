"""Multi-host scale-out over jax.distributed.

The reference is single-process (SURVEY.md §2.9/§5.8); here contig
batches are data-parallel across hosts: each process solves the contigs
whose index is congruent to its rank, writes a partial output set, and
rank 0 merges partials in global contig order (a shared filesystem is
assumed, as is standard for pod workloads).  Device-side collectives are
not needed for the merge — contigs share nothing — so scaling is
embarrassingly parallel and efficiency is bounded only by contig-size
skew, which the modulo interleave smooths.

Run on each host:

    python -m alignasm_tpu.parallel.multihost input.paf \
        --coordinator host0:1234 --num-processes 8 --process-id <k>

Single-process invocation (no flags) degenerates to the local pipeline.
"""

from __future__ import annotations

import argparse
import os
import sys


def shard_indices(n: int, rank: int, world: int):
    return list(range(rank, n, world))


def run_multihost(
    paf_path: str,
    coordinator: str | None = None,
    num_processes: int = 1,
    process_id: int = 0,
    threads: int = 0,
    alt_path: str | None = None,
    alt_baseline: float = 0.5,
    non_skip_linkable: bool = False,
) -> None:
    import jax

    if coordinator and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        rank = jax.process_index()
        world = jax.process_count()
    else:
        rank, world = 0, 1

    from alignasm_tpu.config import DEFAULT_CONFIG
    import dataclasses

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, alt_baseline=alt_baseline,
        non_skip_linkable=non_skip_linkable,
    )
    from alignasm_tpu.io.paf import merge_alt_paf, read_paf, write_outputs

    dataset = read_paf(paf_path)
    if alt_path and os.path.getsize(alt_path):
        merge_alt_paf(dataset, alt_path, cfg.alt_baseline)

    mine = shard_indices(len(dataset.contigs), rank, world)
    from alignasm_tpu.engine.exact import solve_contig

    results = {}
    for i in mine:
        results[i] = solve_contig(dataset.contigs[i], cfg)

    stem = os.path.abspath(paf_path)[: -len(".paf")]
    import pickle

    part = f"{stem}.part{rank}.pkl"
    with open(part, "wb") as fh:
        pickle.dump(results, fh)

    if world > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("alignasm_parts_written")

    if rank == 0:
        merged = {}
        for r in range(world):
            with open(f"{stem}.part{r}.pkl", "rb") as fh:
                merged.update(pickle.load(fh))
        n = len(dataset.contigs)
        outs = [merged[i][0] for i in range(n)]
        alts = [merged[i][1] for i in range(n)]
        maxes = [merged[i][2] for i in range(n)]
        with open(stem + ".aln.paf", "w") as fh:
            write_outputs(dataset, outs, fh)
        with open(stem + ".aln.alt.paf", "w") as fh:
            write_outputs(dataset, alts, fh)
        with open(stem + ".aln.all.paf", "w") as fh:
            write_outputs(dataset, maxes, fh, name_suffix_counts=True)
        for r in range(world):
            os.unlink(f"{stem}.part{r}.pkl")


def main() -> None:
    p = argparse.ArgumentParser("alignasm-multihost")
    p.add_argument("paf_loc")
    p.add_argument("--coordinator")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("-t", "--thread", type=int, default=0)
    p.add_argument("-a", "--alt")
    p.add_argument("-b", "--alt_baseline", type=float, default=0.5)
    p.add_argument("--non_skip_linkable", action="store_true")
    a = p.parse_args()
    run_multihost(
        a.paf_loc, a.coordinator, a.num_processes, a.process_id,
        a.thread, a.alt, a.alt_baseline, a.non_skip_linkable,
    )


if __name__ == "__main__":
    main()
    sys.exit(0)
