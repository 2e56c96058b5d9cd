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
        auto t0 = clk::now();
        aln::Dataset ds = aln::read_paf(paf_path, io_threads);
        if (alt_path && alt_path[0]) aln::merge_alt(ds, alt_path, alt_baseline);
        auto t1 = clk::now();

        size_t n = ds.contigs.size();
        std::vector<aln::ContigResult> results(n);
        int nthreads = threads > 0 ? threads : (int) std::thread::hardware_concurrency();
        std::atomic<size_t> next{0};
        std::atomic<bool> failed{false};
        std::string fail_msg;
        std::mutex fail_mu;
        auto worker = [&] {
            while (true) {
                size_t i = next.fetch_add(1);
                if (i >= n || failed.load(std::memory_order_relaxed)) break;
                try {
                    results[i] = aln::solve_contig(ds.contigs[i], cfg);
                } catch (const std::exception &e) {
                    std::lock_guard<std::mutex> lk(fail_mu);
                    failed = true;
                    fail_msg = std::string("contig ") + ds.ctg_names[i] + ": " + e.what();
                }
            }
        };
        if (nthreads <= 1 || n <= 1) {
            worker();
        } else {
            std::vector<std::thread> pool;
            for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
            for (auto &t : pool) t.join();
        }
        if (failed) { set_err(err, errlen, fail_msg); return 2; }
        auto t2 = clk::now();

        std::string prefix = out_prefix && out_prefix[0] ? out_prefix : "";
        if (prefix.empty()) {
            std::string p(paf_path);
            prefix = p.substr(0, p.size() - 4);  // strip ".paf"
        }
        std::vector<std::vector<aln::OutRow>> outs(n), alts(n);
        std::vector<std::vector<std::vector<aln::OutRow>>> maxes(n);
        for (size_t i = 0; i < n; i++) {
            outs[i] = std::move(results[i].out);
            alts[i] = std::move(results[i].alt);
            maxes[i] = std::move(results[i].max_out);
        }
        aln::write_rows(ds, outs, prefix + ".aln.paf", io_threads);
        aln::write_rows(ds, alts, prefix + ".aln.alt.paf", io_threads);
        aln::write_max_rows(ds, maxes, prefix + ".aln.all.paf", io_threads);
        auto t3 = clk::now();
        if (stats) {
            stats->read_s = secs(t0, t1);
            stats->solve_s = secs(t1, t2);
            stats->write_s = secs(t2, t3);
            stats->contigs = (long long) n;
            long long recs = 0;
            for (const auto &c : ds.contigs) recs += (long long) c.size();
            stats->records = recs;
        }
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

}  // extern "C"
