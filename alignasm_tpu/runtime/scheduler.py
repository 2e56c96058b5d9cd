"""Host-side contig scheduling.

The reference parallelizes with a TBB ``parallel_for`` over contigs
(alignasm.cpp:346-361); contigs share nothing, so this is task/data
parallelism.  Host equivalent: a process pool with dynamic chunking
(contig cost is heavily skewed by record count).  Device equivalent:
bucket-by-size batching feeding the TPU engine (ops/, parallel/).
"""

from __future__ import annotations

import multiprocessing as mp
import os

from alignasm_tpu.config import AlignasmConfig
from alignasm_tpu.engine.exact import solve_contig

_WORKER_CFG = None


def _init_worker(cfg):
    global _WORKER_CFG
    _WORKER_CFG = cfg


def _solve_one(args):
    idx, contig = args
    return idx, solve_contig(contig, _WORKER_CFG)


def solve_dataset_parallel(dataset, cfg: AlignasmConfig, n_workers: int):
    """Solve all contigs with a process pool; output order preserved."""
    n = len(dataset.contigs)
    n_workers = max(1, min(n_workers, os.cpu_count() or 1))
    outs = [None] * n
    alt_outs = [None] * n
    max_outs = [None] * n
    # largest contigs first for load balance
    order = sorted(range(n), key=lambda i: -len(dataset.contigs[i]))
    with mp.Pool(n_workers, initializer=_init_worker, initargs=(cfg,)) as pool:
        for idx, (o, a, m) in pool.imap_unordered(
            _solve_one, ((i, dataset.contigs[i]) for i in order), chunksize=1
        ):
            outs[idx] = o
            alt_outs[idx] = a
            max_outs[idx] = m
    return outs, alt_outs, max_outs


def solve_dataset_tpu(dataset, cfg: AlignasmConfig):
    """Batched TPU solve; contigs above the device cap fall back to the
    exact host engine.  (Device path lands with ops/ — currently routes
    everything to the host engine.)"""
    from alignasm_tpu.engine.exact import solve_dataset

    return solve_dataset(dataset, cfg)
