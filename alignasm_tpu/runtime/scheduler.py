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


def _next_pow2(x: int) -> int:
    return 1 << max(3, (x - 1).bit_length())


def solve_dataset_tpu(dataset, cfg: AlignasmConfig, batch_size: int = 64):
    """Batched device solve.

    Host builds + packs the contig DAGs, groups them into padded
    buckets (shared static shapes → bounded recompiles), runs the
    batched relaxation program per bucket, then finishes each contig on
    host.  Contigs whose outcome is walk-order-sensitive (Fallback) or
    oversized run through the exact host engine — results are always
    byte-identical to the reference.
    """
    import numpy as np

    from alignasm_tpu.engine.device import Fallback, finish_contig, pack_graph
    from alignasm_tpu.engine.exact import solve_contig
    from alignasm_tpu.engine.graph import build_graph
    from alignasm_tpu.model.records import PafOutput
    from alignasm_tpu.ops.relax import solve_graph_batch

    n = len(dataset.contigs)
    outs = [None] * n
    alt_outs = [None] * n
    max_outs = [None] * n
    stats = {"device": 0, "fallback": 0, "singleton": 0, "oversize": 0}

    packed = []  # (contig index, PackedGraph)
    for i, contig in enumerate(dataset.contigs):
        if len(contig) == 1:
            contig[0].ctg_sorted_index = 0
            outs[i] = [PafOutput.from_record(contig[0])]
            alt_outs[i] = []
            max_outs[i] = []
            stats["singleton"] += 1
            continue
        if len(contig) > cfg.max_device_records:
            outs[i], alt_outs[i], max_outs[i] = solve_contig(contig, cfg)
            stats["oversize"] += 1
            continue
        packed.append((i, pack_graph(build_graph(contig, cfg))))

    # bucket by padded shapes
    packed.sort(key=lambda t: (t[1].g.n_vertices, len(t[1].eu)))
    for lo in range(0, len(packed), batch_size):
        chunk = packed[lo:lo + batch_size]
        B = len(chunk)
        V = _next_pow2(max(pg.g.n_vertices for _i, pg in chunk))
        E = _next_pow2(max(max(len(pg.eu), 1) for _i, pg in chunk))
        # pow2-rounded so bucket shapes (and XLA compiles) stay bounded
        n_sweeps = _next_pow2(max(pg.g.n for _i, pg in chunk) + 2)

        def pad(arrs, dtype, fill):
            out = np.full((B, E), fill, dtype)
            for b, a in enumerate(arrs):
                out[b, : len(a)] = a
            return out

        eu = pad([pg.eu for _i, pg in chunk], np.int32, 0)
        ev = pad([pg.ev for _i, pg in chunk], np.int32, 0)
        es = pad([pg.es for _i, pg in chunk], np.int64, 0)
        ea = pad([pg.ea for _i, pg in chunk], np.int32, 0)
        enz = pad([pg.enz for _i, pg in chunk], np.int32, 0)
        etot = pad([pg.etot for _i, pg in chunk], np.int32, 0)
        erank = pad([pg.erank for _i, pg in chunk], np.int64, 0)
        evalid = np.zeros((B, E), bool)
        for b, (_i, pg) in enumerate(chunk):
            evalid[b, : len(pg.eu)] = True
        srcs = np.asarray([pg.g.src for _i, pg in chunk], np.int32)
        dests = np.asarray([pg.g.dest for _i, pg in chunk], np.int32)

        dev = solve_graph_batch(
            eu, ev, es, ea, enz, etot, erank, evalid, srcs, dests,
            V=V, n_sweeps=n_sweeps,
        )
        dev = {k: np.asarray(v) for k, v in dev.items()}

        for b, (i, pg) in enumerate(chunk):
            per = {k: v[b] for k, v in dev.items()}
            try:
                outs[i], alt_outs[i], max_outs[i] = finish_contig(pg, per, cfg)
                stats["device"] += 1
            except Fallback:
                outs[i], alt_outs[i], max_outs[i] = solve_contig(
                    dataset.contigs[i], cfg
                )
                stats["fallback"] += 1

    solve_dataset_tpu.last_stats = stats
    return outs, alt_outs, max_outs
