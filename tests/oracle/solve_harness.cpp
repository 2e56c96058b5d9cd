// Debug harness: run the reference per-contig solver on records fed
// from stdin, printing the three output lists.  Lets the Python engine
// be diffed against solve_ctg_read on arbitrary (shrunken) record sets.
//
// stdin:  n
//         then per record one line:
//         ctg_index qry_total qry_str qry_end ref_total ref_str ref_end
//         ref_chr map_qul aln_fwd mat_num aln_len cs_string
//         (coords closed, ref swap already applied for reverse strand)
// stdout: sections MAIN / ALT / MAX<i>, rows "ctg_index qs qe rs re alt"
#include "paf_data.hpp"

#include <iostream>
#include <string>
#include <vector>

bool NON_SKIP_LINKABLE = false;

int main(int argc, char **argv) {
    if (argc > 1 && std::string(argv[1]) == "--non-skip-linkable")
        NON_SKIP_LINKABLE = true;
    int64_t n;
    int64_t contig_no = 0;
    while (std::cin >> n) {
        std::vector<PafReadData> recs(n);
        for (auto &r : recs) {
            int fwd;
            std::cin >> r.ctg_index >> r.qry_total_length >> r.qry_str >> r.qry_end >>
                r.ref_total_length >> r.ref_str >> r.ref_end >> r.ref_chr;
            int qul;
            std::cin >> qul >> fwd >> r.mat_num >> r.aln_len >> r.cs_string;
            r.map_qul = (uint8_t) qul;
            r.aln_fwd = fwd != 0;
            r.paf_index = 0;
            r.original_cord = {TYPE_MAIN, r.ctg_index};
            get_overlap_range(r, r.cs_string);
        }
        std::vector<PafOutputData> out, alt;
        std::vector<std::vector<PafOutputData>> max_out;
        solve_ctg_read(recs, out, alt, max_out);

        auto dump = [&](const char *name, const std::vector<PafOutputData> &rows) {
            std::cout << "ctg" << contig_no << ' ' << name << '\n';
            for (const auto &r : rows)
                std::cout << r.ctg_index << ' ' << r.edited_qry_str << ' '
                          << r.edited_qry_end << ' ' << r.edited_ref_str << ' '
                          << r.edited_ref_end << ' ' << (r.is_alt_path ? 1 : 0) << '\n';
        };
        dump("MAIN", out);
        dump("ALT", alt);
        for (size_t i = 0; i < max_out.size(); i++)
            dump(("MAX" + std::to_string(i)).c_str(), max_out[i]);
        ++contig_no;
    }
    return 0;
}
