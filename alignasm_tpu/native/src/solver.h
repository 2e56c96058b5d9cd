// Per-contig solver: DAG build, anomaly floor, lazy k-shortest walks,
// gap upgrade, tie sweep, alt selection.
//
// Mirrors the validated Python exact engine (alignasm_tpu/engine/
// graph.py, kshortest.py, exact.py); reference behavior documented
// there (solve_ctg_read, paf_data.cpp:223-1650).
#pragma once

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

}  // namespace aln
