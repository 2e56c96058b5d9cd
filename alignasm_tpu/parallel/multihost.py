"""Multi-host scale-out over jax.distributed.

The reference is single-process (SURVEY.md §2.9/§5.8); here contig
batches are data-parallel across hosts: each process solves the contigs
whose index is congruent to its rank with the NATIVE C++ engine
(honoring ``-t`` threads per rank), writes its partial results as flat
int64 row arrays (npz, shared filesystem — standard for pod workloads),
and rank 0 assembles the global row set and writes the three PAFs
through the threaded native writer.  No Python objects ever cross
process boundaries.  Device-side collectives are not needed for the
merge — contigs share nothing — so scaling is embarrassingly parallel
and efficiency is bounded only by contig-size skew, which the modulo
interleave smooths.

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


def _assemble_global(parts, world):
    """Merge per-rank (counts, gsizes, main, alt, max) partials into the
    flat global row arrays + offsets for the native writer.  Rank r owns
    exactly the contigs with i % world == r, so per-contig slices come
    from the owner's contig-major arrays."""
    import numpy as np

    n = parts[0][0].shape[0]
    counts = np.zeros((n, 3), np.int64)
    for r in range(world):
        counts += parts[r][0]

    # per-rank cursors into its own arrays
    m_cur = [0] * world
    a_cur = [0] * world
    x_cur = [0] * world
    g_cur = [0] * world
    m_chunks, a_chunks, x_chunks = [], [], []
    gsizes_g = []
    for i in range(n):
        r = i % world
        cnt_r, gs_r, m_r, a_r, x_r = parts[r]
        cm, ca, cg = (int(v) for v in cnt_r[i])
        m_chunks.append(m_r[m_cur[r]:m_cur[r] + cm]); m_cur[r] += cm
        a_chunks.append(a_r[a_cur[r]:a_cur[r] + ca]); a_cur[r] += ca
        rows_in_groups = int(gs_r[g_cur[r]:g_cur[r] + cg].sum()) if cg else 0
        gsizes_g.extend(gs_r[g_cur[r]:g_cur[r] + cg].tolist())
        g_cur[r] += cg
        x_chunks.append(x_r[x_cur[r]:x_cur[r] + rows_in_groups])
        x_cur[r] += rows_in_groups

    cat = lambda chunks: (np.concatenate(chunks) if chunks
                          else np.empty((0, 6), np.int64))
    m_rows, a_rows, x_rows = cat(m_chunks), cat(a_chunks), cat(x_chunks)
    m_off = np.zeros(n + 1, np.int64)
    a_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts[:, 0], out=m_off[1:])
    np.cumsum(counts[:, 1], out=a_off[1:])
    gcnt_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts[:, 2], out=gcnt_off[1:])
    gsizes_g = np.asarray(gsizes_g, np.int64)
    x_goff = np.zeros(len(gsizes_g) + 1, np.int64)
    if len(gsizes_g):
        np.cumsum(gsizes_g, out=x_goff[1:])
    return m_rows, m_off, a_rows, a_off, x_rows, x_goff, gcnt_off


def run_multihost(
    paf_path: str,
    coordinator: str | None = None,
    num_processes: int = 1,
    process_id: int = 0,
    threads: int = 0,
    alt_path: str | None = None,
    alt_baseline: float = 0.5,
    non_skip_linkable: bool = False,
    device_runtime: bool = False,
) -> None:
    # The rank/world of THIS job come from the launcher's flags —
    # backends may renumber process_index, and the shard assignment must
    # match what the operator set.  A coordinator is only needed when
    # ranks also drive accelerators (--device-runtime wires
    # jax.distributed; its grpc handshake costs ~1.2 s of fixed latency
    # per job); the solve/merge itself is shared-filesystem.
    if num_processes > 1:
        if device_runtime:
            import jax

            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        rank, world = process_id, num_processes
    else:
        rank, world = 0, 1

    import hashlib

    import numpy as np

    from alignasm_tpu import native

    def _input_digest() -> int:
        """Cheap job identity: a partial is valid for THIS job iff it was
        produced from the same inputs, the same solver flags, and the
        same world size (the per-rank solve is deterministic, so a
        matching partial from an earlier crashed run is byte-equal to
        what this run would produce and is safe — even correct — to
        merge).  The digest covers every knob that reaches the solver
        (alt_baseline, non_skip_linkable) and the full file identity
        (size + mtime + head/tail bytes) of BOTH inputs, so a re-run
        with different flags, or against an edited same-size input,
        rejects stale partials instead of silently mixing configs."""
        h = hashlib.sha256()
        h.update(f"v2:{world}:{alt_baseline!r}:{non_skip_linkable}:".encode())

        def _file_id(path):
            st = os.stat(path)
            h.update(f"{st.st_size}:{st.st_mtime_ns}:".encode())
            with open(path, "rb") as fh:
                h.update(fh.read(1 << 16))
                if st.st_size > (1 << 16):
                    fh.seek(-(1 << 16), os.SEEK_END)
                    h.update(fh.read(1 << 16))

        _file_id(paf_path)
        if alt_path and os.path.getsize(alt_path):
            _file_id(alt_path)
        return int.from_bytes(h.digest()[:8], "big", signed=False) >> 1

    # per-rank native plane: parse + merge in C++ (graph building is
    # skipped here — max_records=0 — since the subset solve rebuilds
    # per contig anyway and non-mine graphs would be wasted work)
    exporter = native.GraphExporter(
        paf_path, alt_path=alt_path if alt_path and os.path.getsize(alt_path)
        else None,
        alt_baseline=alt_baseline, non_skip_linkable=non_skip_linkable,
        threads=threads, max_records=0,
    )
    try:
        n = len(exporter)
        digest = _input_digest()
        mine = shard_indices(n, rank, world)
        exporter.solve_subset(mine, threads=threads)
        part = exporter.fetch_results_raw()

        stem = os.path.abspath(paf_path)[: -len(".paf")]
        # atomic publish: a reader must never see a partial zip; meta
        # ties the partial to (input bytes, world, rank, contig count)
        tmp = f"{stem}.part{rank}.npz.tmp.npz"
        np.savez(tmp, counts=part[0], gsizes=part[1],
                 main=part[2], alt=part[3], max=part[4],
                 meta=np.asarray([digest, world, rank, n], np.int64))
        os.replace(tmp, f"{stem}.part{rank}.npz")

        if rank == 0:
            # file-based barrier: partials publish via atomic rename, so
            # existence == internal completeness; the meta check rejects
            # stale partials from a different input / world size and
            # keeps polling until a matching one appears
            import time

            timeout_s = float(os.environ.get("ALIGNASM_MERGE_TIMEOUT_S",
                                             "86400"))
            deadline = time.monotonic() + timeout_s
            last_note = 0.0
            parts = []
            for r in range(world):
                path_r = f"{stem}.part{r}.npz"
                # only reopen the archive when the file CHANGES: a stale
                # partial (different input/world) must not be reloaded
                # and decompressed 20x/s for up to the whole timeout
                seen_stat = None
                while True:
                    try:
                        st = os.stat(path_r)
                        cur = (st.st_mtime_ns, st.st_size, st.st_ino)
                    except FileNotFoundError:
                        cur = None
                    if cur is not None and cur != seen_stat:
                        seen_stat = cur
                        with np.load(path_r) as z:
                            meta = z["meta"] if "meta" in z.files else None
                            if meta is not None and list(meta) == [
                                    digest, world, r, n]:
                                parts.append((z["counts"], z["gsizes"],
                                              z["main"], z["alt"], z["max"]))
                                break
                    now = time.monotonic()
                    if now > deadline:
                        raise TimeoutError(
                            f"rank {r} partial never appeared/matched "
                            f"within {timeout_s:.0f}s "
                            "(ALIGNASM_MERGE_TIMEOUT_S to adjust)")
                    if now - last_note > 60:
                        last_note = now
                        print(f"waiting for rank {r} partial...",
                              file=sys.stderr)
                    time.sleep(0.05)
            flat = _assemble_global(parts, world)
            exporter.write_outputs_flat(stem, *flat, threads=threads)
            for r in range(world):
                os.unlink(f"{stem}.part{r}.npz")
    finally:
        exporter.close()


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
    p.add_argument("--device-runtime", action="store_true",
                   help="initialize jax.distributed (needed only when "
                        "ranks drive accelerator collectives)")
    a = p.parse_args()
    run_multihost(
        a.paf_loc, a.coordinator, a.num_processes, a.process_id,
        a.thread, a.alt, a.alt_baseline, a.non_skip_linkable,
        a.device_runtime,
    )


if __name__ == "__main__":
    main()
    sys.exit(0)
