// C ABI for the native pipeline (ctypes-friendly).
//
// aln_run_stats2(): the full reference-equivalent pipeline — read PAF
// (+ optional alt merge), solve every contig on a thread pool, write
// the three output PAFs, reporting phase timings + counters.  The
// threading model mirrors the reference's contig-level task
// parallelism (alignasm.cpp:346-361) with dynamic chunking for skewed
// contig sizes.
#include <atomic>
#include <mutex>
#include <chrono>
#include <cstring>
#include <exception>
#include <string>
#include <thread>

#include "io.h"
#include "solver.h"

// phase timings + counters reported back through aln_run_stats2
struct AlnStats {
    double read_s, solve_s, write_s;
    long long contigs, records;
};

#include "scoring_abi.h"

namespace {

void set_err(char *err, int errlen, const std::string &msg) {
    if (err && errlen > 0) {
        std::snprintf(err, (size_t) errlen, "%s", msg.c_str());
    }
}

}  // namespace

extern "C" {

int aln_run_stats2(const char *paf_path, const char *alt_path, double alt_baseline,
                   int non_skip_linkable, int threads, int lazy_walks,
                   const char *out_prefix, char *err, int errlen,
                   AlnStats *stats, const AlnScoring *scoring) {
    using clk = std::chrono::steady_clock;
    auto secs = [](clk::time_point a, clk::time_point b) {
        return std::chrono::duration<double>(b - a).count();
    };
    try {
        aln::Config cfg;
        cfg.alt_baseline = alt_baseline;
        cfg.non_skip_linkable = non_skip_linkable != 0;
        cfg.lazy_walks = lazy_walks != 0;
        aln::apply_scoring(cfg, scoring);

        int io_threads = threads > 0 ? threads : (int) std::thread::hardware_concurrency();
        int nthreads = io_threads;
        auto t0 = clk::now();

        // solve + format fused with the parse: an alt merge appends
        // records to already-parsed contigs, so with no alt file each
        // contig can be solved and its three output parts formatted by
        // the parse worker the moment its records are complete (one
        // parallel phase, no barriers); with an alt file the solve
        // waits for the merge and runs as its own parallel phase.
        // solve_s includes output formatting; write_s is flush I/O.
        std::vector<std::string> parts_out, parts_alt, parts_max;
        std::atomic<bool> failed{false};
        std::string fail_msg;
        std::mutex fail_mu;
        auto do_one = [&](aln::Dataset &dset, size_t i) {
            if (failed.load(std::memory_order_relaxed)) return;
            try {
                aln::ContigResult res = aln::solve_contig(dset.contigs[i], cfg);
                aln::format_rows_one(parts_out[i], dset, i, res.out);
                aln::format_rows_one(parts_alt[i], dset, i, res.alt);
                aln::format_max_rows_one(parts_max[i], dset, i, res.max_out);
            } catch (const std::exception &e) {
                std::lock_guard<std::mutex> lk(fail_mu);
                failed = true;
                fail_msg = std::string("contig ") + dset.ctg_names[i] + ": " + e.what();
            }
        };

        bool fused = !(alt_path && alt_path[0]);
        aln::GroupSink sink;
        sink.start = [&](aln::Dataset &, size_t n_groups) {
            parts_out.resize(n_groups);
            parts_alt.resize(n_groups);
            parts_max.resize(n_groups);
        };
        sink.group = do_one;
        aln::Dataset ds = aln::read_paf(paf_path, io_threads,
                                        fused ? &sink : nullptr);
        size_t n = ds.contigs.size();
        if (!fused) aln::merge_alt(ds, alt_path, alt_baseline);
        auto t1 = clk::now();
        double read_secs = fused ? sink.scan_s : secs(t0, t1);

        if (!fused) {
            parts_out.resize(n);
            parts_alt.resize(n);
            parts_max.resize(n);
            std::atomic<size_t> next{0};
            auto worker = [&] {
                while (true) {
                    size_t i = next.fetch_add(1);
                    if (i >= n || failed.load(std::memory_order_relaxed)) break;
                    do_one(ds, i);
                }
            };
            if (nthreads <= 1 || n <= 1) {
                worker();
            } else {
                std::vector<std::thread> pool;
                for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
                for (auto &t : pool) t.join();
            }
        }
        if (failed) { set_err(err, errlen, fail_msg); return 2; }
        auto t2 = clk::now();

        std::string prefix = out_prefix && out_prefix[0] ? out_prefix : "";
        if (prefix.empty()) {
            std::string p(paf_path);
            prefix = p.substr(0, p.size() - 4);  // strip ".paf"
        }
        aln::flush_three(prefix, parts_out, parts_alt, parts_max,
                         nthreads <= 1 ? 1 : 3);
        auto t3 = clk::now();
        if (stats) {
            long long recs = 0;
            for (const auto &c : ds.contigs) recs += (long long) c.size();
            stats->records = recs;
        }
        // teardown off the timed path: the dataset + formatted parts are
        // ~10^5 small heap blocks (multiple ms of free()); the caller
        // only needs the files, so a detached thread releases them.
        // Constraint: the library must stay loaded for the thread's
        // lifetime — fine for the ctypes embedding (never dlclosed);
        // process exit mid-free is benign (threads die with the process
        // before any unmapping)
        {
            struct Garbage {
                aln::Dataset ds;
                std::vector<std::string> a, b, c;
            };
            auto *g = new Garbage{std::move(ds), std::move(parts_out),
                                  std::move(parts_alt), std::move(parts_max)};
            std::thread([g] { delete g; }).detach();
        }
        if (stats) {
            stats->read_s = read_secs;
            stats->solve_s = secs(t0, t2) - read_secs;
            stats->write_s = secs(t2, t3);
            stats->contigs = (long long) n;
        }
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

}  // extern "C"
