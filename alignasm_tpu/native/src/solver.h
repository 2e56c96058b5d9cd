// Per-contig solver: DAG build, anomaly floor, lazy k-shortest walks,
// gap upgrade, tie sweep, alt selection.
//
// Mirrors the validated Python exact engine (alignasm_tpu/engine/
// graph.py, kshortest.py, exact.py); reference behavior documented
// there (solve_ctg_read, paf_data.cpp:223-1650).
#pragma once

#include <unordered_map>

#include "types.h"

namespace aln {

struct ContigResult {
    std::vector<OutRow> out;
    std::vector<OutRow> alt;
    std::vector<std::vector<OutRow>> max_out;
};

// records: the contig's records in input order (ctg_index == position);
// sorted_index is written back into each record.
ContigResult solve_contig(std::vector<Record> &records, const Config &cfg);

// steps 6-10 of solve_ctg_read on an already-built DAG (records'
// sorted_index set by build_graph)
struct Graph;
ContigResult solve_from_graph(const Graph &g, const Config &cfg);

// device-assisted finish for the provably order-insensitive case
// (unique best walk, no alt scan); verts = the device-chased min-walk
// vertex sequence src..dest
ContigResult finish_from_path(const Graph &g, const i32 *verts, int n,
                              const Config &cfg);

// ---- graph internals, exposed for the device-engine export ABI ------

struct Edge {
    i32 to;
    Dist w;
};

// A graph vertex is either one record (pre==cur) or a cut overlap pair.
struct Graph {
    i64 n = 0;  // record count
    std::vector<const Record *> recs;      // sorted order
    std::vector<i64> part_idx;
    std::vector<i64> parts;                // part starts + sentinel n
    std::vector<std::pair<i32, i32>> vtx;  // (pre, cur) per vertex id
    std::unordered_map<i64, i32> pair_vtx; // key i*n+j -> vertex id (i<j)
    // cut tables per vertex id (aligned with vtx)
    std::vector<i64> cut_pe_q, cut_pe_r;   // edited end of record i
    std::vector<i64> cut_st_q, cut_st_r;   // edited start of record j
    // adj MAY be oversized when the Graph is a reused scratch object
    // (build_graph_into) — always bound vertex loops by nv(), not
    // adj.size().  Freshly built graphs (build_graph) are exact-sized.
    std::vector<std::vector<Edge>> adj;
    i32 src = 0, dest = 0;

    // vertex count: src = vtx.size() and dest = src + 1 by construction
    i64 nv() const { return (i64) dest + 1; }

    i32 vid(i64 i, i64 j) const {
        if (i == j) return (i32) i;
        auto it = pair_vtx.find(i * n + j);
        return it == pair_vtx.end() ? -1 : it->second;
    }
};

Graph build_graph(std::vector<Record> &records, const Config &cfg);

// scratch-reusing form: clears and refills `g`, keeping every
// container's capacity (adj is only grown, never shrunk — the
// per-vertex edge vectors' capacity is the point of the reuse)
void build_graph_into(std::vector<Record> &records, const Config &cfg,
                      Graph &g);

}  // namespace aln
