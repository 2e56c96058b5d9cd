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
#include <cstdio>
#include <cstring>
#include <exception>
#include <fstream>
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
        aln_tune_heap();
        aln::ButlerScope butler;
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
            aln::async_teardown([g] { delete g; });
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

// ---- multihost shard engine -------------------------------------------
//
// Each rank runs aln_run_shard: a contig-group-sharded parse (the cheap
// line index scan covers the whole file; the expensive record parse +
// cs scan + solve + output formatting run only for groups with
// g % world == rank), publishing its PRE-FORMATTED output text for the
// three streams as one binary shard file (atomic rename).  Rank 0 then
// runs aln_merge_shards: an ordered interleave of the per-contig text
// slices straight into the three output PAFs — no re-parse, no row
// marshalling, no Python objects.  Shard file layout (int64 LE):
//   [magic, digest, world, rank, n_total, n_local, m_bytes, a_bytes,
//    x_bytes] + m_len[n_local] + a_len[n_local] + x_len[n_local]
//   + m blob + a blob + x blob       (local groups in ascending g)
static const long long SHARD_MAGIC = 0x414C4E534844LL;  // "ALNSHD"

int aln_run_shard(const char *paf_path, const char *alt_path,
                  double alt_baseline, int non_skip_linkable, int threads,
                  int lazy_walks, long long rank, long long world,
                  long long digest, const char *shard_path,
                  long long *n_total_out, long long *n_local_out,
                  char *err, int errlen, const AlnScoring *scoring) {
    try {
        aln_tune_heap();
        aln::ButlerScope butler;
        aln::Config cfg;
        cfg.alt_baseline = alt_baseline;
        cfg.non_skip_linkable = non_skip_linkable != 0;
        cfg.lazy_walks = lazy_walks != 0;
        aln::apply_scoring(cfg, scoring);
        int nthreads = threads > 0 ? threads
                                   : (int) std::thread::hardware_concurrency();

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
                fail_msg = std::string("contig ") + dset.ctg_names[i] + ": "
                           + e.what();
            }
        };
        bool fused = !(alt_path && alt_path[0]);
        aln::GroupSink sink;
        sink.start = [&](aln::Dataset &, size_t n_groups) {
            parts_out.resize(n_groups);
            parts_alt.resize(n_groups);
            parts_max.resize(n_groups);
        };
        sink.group = do_one;  // called only for local groups
        aln::Dataset ds = aln::read_paf(paf_path, nthreads,
                                        fused ? &sink : nullptr, rank, world);
        size_t n = ds.contigs.size();
        if (!fused) {
            aln::merge_alt(ds, alt_path, alt_baseline, rank, world);
            parts_out.resize(n);
            parts_alt.resize(n);
            parts_max.resize(n);
            std::vector<long long> mine;
            for (long long g = rank; g < (long long) n; g += world)
                mine.push_back(g);
            std::atomic<size_t> next{0};
            auto worker = [&] {
                while (true) {
                    size_t k = next.fetch_add(1);
                    if (k >= mine.size()
                        || failed.load(std::memory_order_relaxed)) break;
                    do_one(ds, (size_t) mine[k]);
                }
            };
            if (nthreads <= 1 || mine.size() <= 1) {
                worker();
            } else {
                std::vector<std::thread> pool;
                for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
                for (auto &t : pool) t.join();
            }
        }
        if (failed) { set_err(err, errlen, fail_msg); return 2; }

        // publish the shard file (write to .tmp, atomic rename)
        long long n_local = 0;
        for (long long g = rank; g < (long long) n; g += world) n_local++;
        std::vector<long long> lens;
        lens.reserve((size_t) (3 * n_local));
        long long totals[3] = {0, 0, 0};
        const std::vector<std::string> *streams[3] = {&parts_out, &parts_alt,
                                                      &parts_max};
        for (int s = 0; s < 3; s++)
            for (long long g = rank; g < (long long) n; g += world) {
                long long L = (long long) (*streams[s])[(size_t) g].size();
                lens.push_back(L);
                totals[s] += L;
            }
        std::string tmp = std::string(shard_path) + ".tmp";
        {
            std::ofstream o(tmp, std::ios::binary);
            if (!o) throw std::runtime_error("cannot write " + tmp);
            long long header[9] = {SHARD_MAGIC, digest, world, rank,
                                   (long long) n, n_local,
                                   totals[0], totals[1], totals[2]};
            o.write((const char *) header, sizeof(header));
            if (!lens.empty())
                o.write((const char *) lens.data(),
                        (std::streamsize) (lens.size() * sizeof(long long)));
            for (int s = 0; s < 3; s++)
                for (long long g = rank; g < (long long) n; g += world) {
                    const std::string &p = (*streams[s])[(size_t) g];
                    if (!p.empty())
                        o.write(p.data(), (std::streamsize) p.size());
                }
            if (!o) throw std::runtime_error("short write: " + tmp);
        }
        if (std::rename(tmp.c_str(), shard_path) != 0)
            throw std::runtime_error("cannot publish " + std::string(shard_path));
        if (n_total_out) *n_total_out = (long long) n;
        if (n_local_out) *n_local_out = n_local;
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

int aln_merge_shards(const char *out_prefix, const char *shard_prefix,
                     long long world, long long digest, int threads,
                     char *err, int errlen) {
    // ordered interleave of the per-contig text slices from every
    // rank's shard file into the three output PAFs.  Pure sequential
    // IO per stream; the three streams flush concurrently.
    try {
        struct Shard {
            std::string path;
            long long n_total = 0, n_local = 0;
            std::vector<long long> lens;        // 3 * n_local
            long long stream_off[3] = {0, 0, 0};  // absolute file offsets
        };
        std::vector<Shard> shards((size_t) world);
        for (long long r = 0; r < world; r++) {
            Shard &sh = shards[(size_t) r];
            sh.path = std::string(shard_prefix) + ".shard" + std::to_string(r)
                      + ".bin";
            std::ifstream in(sh.path, std::ios::binary);
            if (!in) throw std::runtime_error("cannot open " + sh.path);
            long long header[9];
            in.read((char *) header, sizeof(header));
            if (!in || header[0] != SHARD_MAGIC)
                throw std::runtime_error("bad shard header: " + sh.path);
            if (header[1] != digest || header[2] != world || header[3] != r)
                throw std::runtime_error("shard meta mismatch: " + sh.path);
            sh.n_total = header[4];
            sh.n_local = header[5];
            if (sh.n_total != shards[0].n_total)
                throw std::runtime_error("shard contig-count mismatch");
            sh.lens.resize((size_t) (3 * sh.n_local));
            if (!sh.lens.empty())
                in.read((char *) sh.lens.data(),
                        (std::streamsize) (sh.lens.size() * sizeof(long long)));
            if (!in) throw std::runtime_error("short shard header: " + sh.path);
            long long data0 = (long long) sizeof(long long)
                              * (9 + 3 * sh.n_local);
            sh.stream_off[0] = data0;
            sh.stream_off[1] = data0 + header[6];
            sh.stream_off[2] = data0 + header[6] + header[7];
        }
        long long n = shards.empty() ? 0 : shards[0].n_total;
        static const char *sfx[] = {".aln.paf", ".aln.alt.paf", ".aln.all.paf"};
        std::string fail[3];
        auto merge_one = [&](int s) {
            try {
                std::string out_path = std::string(out_prefix) + sfx[s];
                std::ofstream o(out_path, std::ios::binary);
                if (!o) throw std::runtime_error("cannot write " + out_path);
                std::vector<std::ifstream> ins;
                std::vector<long long> cur((size_t) world), k((size_t) world);
                for (long long r = 0; r < world; r++) {
                    ins.emplace_back(shards[(size_t) r].path, std::ios::binary);
                    if (!ins.back())
                        throw std::runtime_error("cannot open "
                                                 + shards[(size_t) r].path);
                    cur[(size_t) r] = shards[(size_t) r].stream_off[s];
                }
                std::vector<char> buf(1 << 20);
                for (long long g = 0; g < n; g++) {
                    size_t r = (size_t) (g % world);
                    Shard &sh = shards[r];
                    long long L = sh.lens[(size_t) (s * sh.n_local + k[r])];
                    k[r]++;
                    if (L) {
                        ins[r].seekg(cur[r]);
                        long long left = L;
                        while (left > 0) {
                            long long take = std::min(
                                left, (long long) buf.size());
                            ins[r].read(buf.data(), (std::streamsize) take);
                            if (!ins[r])
                                throw std::runtime_error("short shard read: "
                                                         + sh.path);
                            o.write(buf.data(), (std::streamsize) take);
                            left -= take;
                        }
                        cur[r] += L;
                    }
                }
                if (!o) throw std::runtime_error("short write");
            } catch (const std::exception &e) {
                fail[s] = e.what();
            }
        };
        if (threads == 1) {
            for (int s = 0; s < 3; s++) merge_one(s);
        } else {
            std::vector<std::thread> pool;
            for (int s = 0; s < 3; s++) pool.emplace_back(merge_one, s);
            for (auto &t : pool) t.join();
        }
        for (int s = 0; s < 3; s++)
            if (!fail[s].empty()) throw std::runtime_error(fail[s]);
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

}  // extern "C"
