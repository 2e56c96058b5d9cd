"""Per-contig checkpoint/resume.

The reference is a one-shot batch program (SURVEY.md §5.4); here outputs
are per-contig and contigs are independent, so resume is "skip contigs
already solved".  A journal file accumulates solved results keyed by a
digest of the contig's input records — re-runs after a crash (or after
appending new contigs to the input) only solve what's missing.
"""

from __future__ import annotations

import hashlib
import os
import pickle


def contig_digest(records, cfg=None) -> str:
    """Key a contig's journal entry by EVERY input that determines its
    solve and its output bytes: all record fields (qry/ref totals feed
    src/dest edge scores; mat_num/aln_len are recomputed into output
    columns; map_qul feeds the tie-break fraction) plus a canonical
    serialization of the config (scoring knobs, --non_skip_linkable,
    alt_baseline all change the graph)."""
    import dataclasses

    h = hashlib.sha256()
    if cfg is not None:
        h.update(repr(dataclasses.astuple(cfg)).encode())
    for r in records:
        h.update(
            f"{r.qry_str},{r.qry_end},{r.ref_str},{r.ref_end},{r.ref_chr},"
            f"{r.qry_total_length},{r.ref_total_length},{r.mat_num},"
            f"{r.aln_len},{r.map_qul},{int(r.aln_fwd)},{r.original_cord}".encode()
        )
        h.update(r.cs.raw.encode())
    return h.hexdigest()


class Journal:
    """Append-only journal of solved contigs."""

    def __init__(self, path: str):
        self.path = path
        self._done: dict = {}
        if os.path.exists(path):
            with open(path, "rb") as fh:
                while True:
                    try:
                        key, value = pickle.load(fh)
                    except EOFError:
                        break
                    except Exception:
                        break  # truncated tail from a crash: ignore
                    self._done[key] = value
        self._fh = open(path, "ab")

    def get(self, key: str):
        return self._done.get(key)

    def put(self, key: str, value) -> None:
        pickle.dump((key, value), self._fh)
        self._fh.flush()
        self._done[key] = value

    def close(self) -> None:
        self._fh.close()

    def __len__(self) -> int:
        return len(self._done)


def solve_dataset_resumable(dataset, cfg, journal_path: str, solve_contig=None):
    """Solve all contigs, skipping any already present in the journal.

    Returns (outs, alt_outs, max_outs, stats) where stats counts
    resumed vs solved contigs.
    """
    if solve_contig is None:
        from alignasm_tpu.engine.exact import solve_contig as solve_contig_fn
    else:
        solve_contig_fn = solve_contig

    journal = Journal(journal_path)
    outs, alt_outs, max_outs = [], [], []
    stats = {"resumed": 0, "solved": 0}
    try:
        for contig in dataset.contigs:
            key = contig_digest(contig, cfg)
            hit = journal.get(key)
            if hit is not None:
                o, a, m = hit
                stats["resumed"] += 1
            else:
                o, a, m = solve_contig_fn(contig, cfg)
                journal.put(key, (o, a, m))
                stats["solved"] += 1
            outs.append(o)
            alt_outs.append(a)
            max_outs.append(m)
    finally:
        journal.close()
    return outs, alt_outs, max_outs, stats
