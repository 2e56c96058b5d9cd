#include "io.h"

#include <atomic>
#include <cerrno>
#include <charconv>
#include <cstring>
#include <mutex>
#include <thread>
#include <cstdio>
#include <fstream>
#include <stdexcept>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include "cs.h"
#include "solver.h"

namespace aln {

namespace {

std::string slurp(const std::string &path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) throw std::runtime_error("cannot open " + path);
    std::string buf;
    in.seekg(0, std::ios::end);
    size_t n = (size_t) in.tellg();
    in.seekg(0);
    // populate before the zero-fill/read touch the pages one fault at a
    // time (kernel copy_to_user pays the same per-page hypervisor tax)
    buf.reserve(n);
    populate_range(buf.data(), n);
    buf.resize(n);
    in.read(buf.data(), (std::streamsize) buf.size());
    return buf;
}

i64 to_i64(std::string_view sv) {
    i64 v = 0;
    auto r = std::from_chars(sv.data(), sv.data() + sv.size(), v);
    if (r.ec != std::errc{}) throw std::runtime_error("bad integer field");
    return v;
}

double to_f64(std::string_view sv) { return std::stod(std::string(sv)); }

// split one line into tab fields (no copies).  One byte loop instead
// of a memchr call per field: PAF fields average ~10 bytes, where the
// per-call overhead of 14 memchrs dominates the scan itself
void split_fields(std::string_view line, std::vector<std::string_view> &out) {
    out.clear();
    const char *p = line.data(), *e = p + line.size(), *s = p;
    for (; p < e; ++p)
        if (*p == '\t') {
            out.emplace_back(s, (size_t) (p - s));
            s = p + 1;
        }
    out.emplace_back(s, (size_t) (e - s));
}

std::string_view find_cs(const std::vector<std::string_view> &f) {
    for (size_t i = 12; i < f.size(); i++)
        if (f[i].substr(0, 5) == "cs:Z:") return f[i];
    return {};
}

// per-worker chromosome-id cache: refs cluster by chromosome, so
// nearly every lookup repeats the previous line's name.  Owned by the
// parse worker (NOT thread_local: the main thread parses too and a
// persistent view would dangle into a freed previous dataset buffer).
struct ChrCache {
    std::string_view name;
    i32 id = -1;
};

Record parse_record(const std::vector<std::string_view> &f, Dataset &ds,
                    RunArena &arena, ChrCache &cc, i64 qry_offset = 0) {
    // the line scans validate only the leading fields; a tab-separated
    // row with 6-11 fields must be a clean error, not UB on f[11]
    if (f.size() < 12)
        throw std::runtime_error("short PAF row: " +
                                 std::to_string(f.size()) +
                                 " fields (need >= 12)");
    Record r;
    r.qry_total = to_i64(f[1]);
    r.qry_str = to_i64(f[2]) + qry_offset;
    r.qry_end = to_i64(f[3]) + qry_offset - 1;  // half-open -> closed
    if (r.qry_str > r.qry_end) throw std::runtime_error("qry start > end");
    r.ref_total = to_i64(f[6]);
    r.ref_str = to_i64(f[7]);
    r.ref_end = to_i64(f[8]) - 1;
    if (r.ref_str > r.ref_end) throw std::runtime_error("ref start > end");
    if (cc.id >= 0 && f[5] == cc.name) {
        r.ref_chr = cc.id;
    } else {
        auto it = ds.chr_ids.find(f[5]);  // heterogeneous: no key alloc
        if (it == ds.chr_ids.end()) {
            std::string ref_chr(f[5]);
            it = ds.chr_ids.emplace(ref_chr, (i32) ds.chr_names.size()).first;
            ds.chr_names.push_back(ref_chr);
        }
        r.ref_chr = it->second;
        cc.name = f[5];
        cc.id = it->second;
    }
    r.fwd = f[4][0] == '+';
    if (!r.fwd) std::swap(r.ref_str, r.ref_end);
    r.map_qul = (uint8_t) to_i64(f[11]);
    r.mat_num = (i32) to_i64(f[9]);
    r.aln_len = (i32) to_i64(f[10]);
    r.cs = find_cs(f);
    if (r.cs.empty()) throw std::runtime_error("missing cs:Z tag");
    build_runs(r, arena);
    return r;
}

template <typename F>
void for_lines(std::string_view buf, F fn) {
    size_t start = 0;
    while (start < buf.size()) {
        size_t pos = buf.find('\n', start);
        if (pos == std::string_view::npos) pos = buf.size();
        std::string_view line = buf.substr(start, pos - start);
        if (!line.empty() && line.back() == '\r') line.remove_suffix(1);
        if (!line.empty()) fn(line);
        start = pos + 1;
    }
}

}  // namespace

Dataset read_paf(const std::string &path, int threads, GroupSink *sink,
                 i64 rank, i64 world) {
    auto prof_t0 = std::chrono::steady_clock::now();
    auto prof = [&](const char *tag) {
        if (!getenv("ALN_READ_PROF")) return;
        auto now = std::chrono::steady_clock::now();
        fprintf(stderr, "read_paf %s %.2f ms\n", tag,
                std::chrono::duration<double, std::milli>(now - prof_t0).count());
        prof_t0 = now;
    };
    auto scan_t0 = std::chrono::steady_clock::now();
    Dataset ds;
    ds.buffer = slurp(path);
    prof("slurp");
    int nt = std::max(1, threads);

    // pass 0 (parallel): chunk the buffer at line boundaries; per chunk
    // collect line spans plus each line's query-name (field 0) and
    // ref-chromosome (field 5) views, so the serial interning pass below
    // touches no raw bytes.  (This scan was the dominant serial cost of
    // read_paf at bench scale.)
    struct Scanned {
        std::vector<std::string_view> lines, qrys, chrs;
        std::string fail;
    };
    std::string_view buf(ds.buffer);
    size_t n_chunks = (size_t) nt;
    if (buf.size() < (size_t) (64 << 10)) n_chunks = 1;
    std::vector<Scanned> chunks(n_chunks);
    {
        std::vector<size_t> bounds(n_chunks + 1, buf.size());
        bounds[0] = 0;
        for (size_t c = 1; c < n_chunks; c++) {
            size_t pos = buf.size() / n_chunks * c;
            pos = buf.find('\n', pos);
            bounds[c] = pos == std::string_view::npos ? buf.size() : pos + 1;
        }
        auto scan_chunk = [&](size_t c) {
            Scanned &sc = chunks[c];
            size_t approx = (bounds[c + 1] - bounds[c]) / 64 + 16;
            sc.lines.reserve(approx);
            sc.qrys.reserve(approx);
            sc.chrs.reserve(approx);
            size_t start = bounds[c];
            while (start < bounds[c + 1]) {
                size_t pos = buf.find('\n', start);
                if (pos == std::string_view::npos) pos = buf.size();
                std::string_view line = buf.substr(start, pos - start);
                start = pos + 1;
                if (!line.empty() && line.back() == '\r')
                    line.remove_suffix(1);
                if (line.empty()) continue;
                size_t q_end = line.find('\t');
                if (q_end == std::string_view::npos) {
                    sc.fail = "short PAF row";
                    return;
                }
                // scan to field 5 (ref chr) cheaply
                size_t fpos = q_end + 1;
                for (int k = 0; k < 4; k++) {
                    fpos = line.find('\t', fpos);
                    if (fpos == std::string_view::npos) {
                        sc.fail = "short PAF row";
                        return;
                    }
                    fpos++;
                }
                size_t fend = line.find('\t', fpos);
                sc.lines.push_back(line);
                sc.qrys.push_back(line.substr(0, q_end));
                sc.chrs.push_back(line.substr(fpos, fend - fpos));
            }
        };
        if (n_chunks == 1) {
            scan_chunk(0);
        } else {
            std::vector<std::thread> pool;
            for (size_t c = 0; c < n_chunks; c++)
                pool.emplace_back(scan_chunk, c);
            for (auto &th : pool) th.join();
        }
        for (auto &sc : chunks)
            if (!sc.fail.empty()) throw std::runtime_error(sc.fail);
    }
    size_t n_lines = 0;
    for (auto &sc : chunks) n_lines += sc.lines.size();
    if (n_lines == 0) throw std::runtime_error("empty PAF input");
    prof("pass0_scan");
    std::vector<std::string_view> lines, qry_names;
    lines.reserve(n_lines);
    qry_names.reserve(n_lines);
    for (auto &sc : chunks) {
        lines.insert(lines.end(), sc.lines.begin(), sc.lines.end());
        qry_names.insert(qry_names.end(), sc.qrys.begin(), sc.qrys.end());
    }

    // pass 1 (serial): chromosome interning in first-appearance order
    // (ids must match the reference's) over the pre-extracted views.
    // Names repeat run-length-wise (refs cluster by chromosome), so a
    // last-seen cache skips nearly every hash lookup, and the
    // heterogeneous map skips the key alloc on the rest.
    {
        std::string_view last_chr;
        for (auto &sc : chunks) {
            for (std::string_view name : sc.chrs) {
                if (name != last_chr) {
                    last_chr = name;
                    if (!ds.chr_ids.count(name)) {
                        ds.chr_ids.emplace(std::string(name),
                                           (i32) ds.chr_names.size());
                        ds.chr_names.emplace_back(name);
                    }
                }
            }
        }
    }

    prof("pass1_intern_concat");

    // pass 2+3 fused: group boundaries come straight from the qry-name
    // views (serial view compares), per-contig vectors get their final
    // sizes, and the parallel parse writes each record directly into
    // its contig slot — no intermediate record array, no second pass of
    // 10^4-10^6 Record moves.
    std::vector<size_t> starts;  // group g spans [starts[g], starts[g+1])
    starts.push_back(0);
    for (size_t i = 1; i < n_lines; i++)
        if (qry_names[i] != qry_names[i - 1]) starts.push_back(i);
    starts.push_back(n_lines);
    size_t n_groups = starts.size() - 1;
    ds.contigs.resize(n_groups);
    ds.ctg_names.resize(n_groups);
    // map entries keep reference semantics: last same-named group wins
    for (size_t g = 0; g < n_groups; g++) {
        std::string_view name = qry_names[starts[g]];
        ds.ctg_names[g] = std::string(name);
        auto it = ds.paf_map.find(name);
        if (it != ds.paf_map.end()) it->second = (i32) g;
        else ds.paf_map.emplace(std::string(name), (i32) g);
    }
    // contiguous record-balanced shard ranges: rank r owns the groups
    // whose cumulative line count spans (r/world, (r+1)/world] of the
    // file — deterministic on every rank from the shared index scan.
    // Contiguity (vs the old g % world round-robin) makes the merge a
    // pure blob concatenation and lets rank 0 stream its own slice
    // straight into the output files.
    ds.shard_lo = 0;
    ds.shard_hi = (i64) n_groups;
    if (world > 1) {
        i64 total = (i64) n_lines, cum = 0;
        size_t g = 0;
        for (i64 r = 0; r <= rank; r++) {
            if (r == rank) ds.shard_lo = (i64) g;
            i64 target = total * (r + 1) / world;
            while (g < n_groups && cum < target) {
                cum += (i64) (starts[g + 1] - starts[g]);
                g++;
            }
            if (r == rank) ds.shard_hi = (i64) g;
        }
    }
    if (sink) {
        if (sink->start) sink->start(ds, n_groups);
        sink->scan_s = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - scan_t0).count();
    }
    // sharded parse: only groups owned by this rank get their records
    // parsed (cord_row stays the GLOBAL line index, so xi:Z provenance
    // tags are identical to a full parse)
    auto owned = [&](size_t g) {
        return world <= 1
               || ((i64) g >= ds.shard_lo && (i64) g < ds.shard_hi);
    };
    auto parse_lines = [&](size_t g, size_t lo, size_t hi,
                           std::vector<std::string_view> &f,
                           RunArena &arena, ChrCache &cc) {
        auto &ctg = ds.contigs[g];
        size_t base = starts[g];
        SolveProfScope ps(6);
        for (size_t i = lo; i < hi; i++) {
            split_fields(lines[i], f);
            Record &r = ctg[i - base];
            r = parse_record(f, ds, arena, cc);
            r.cord_type = 0;
            r.cord_row = (i32) i;
            r.ctg_index = (i32) (i - base);
        }
    };
    auto parse_group = [&](size_t g, std::vector<std::string_view> &f,
                           RunArena &arena, ChrCache &cc) {
        if (!owned(g)) return;
        ds.contigs[g].resize(starts[g + 1] - starts[g]);
        parse_lines(g, starts[g], starts[g + 1], f, arena, cc);
        if (sink && sink->group) sink->group(ds, g);
    };
    // one run arena per worker, registered BEFORE the pool spawns (the
    // registry vector must not reallocate under concurrent use)
    size_t arena_base = ds.run_arenas.size();
    int n_arenas = (nt == 1 || n_lines < 256) ? 1 : nt;
    for (int t = 0; t < n_arenas; t++)
        ds.run_arenas.emplace_back(std::make_unique<RunArena>());
    if (nt == 1 || n_lines < 256) {
        std::vector<std::string_view> f;
        ChrCache cc;
        for (size_t g = 0; g < n_groups; g++)
            parse_group(g, f, *ds.run_arenas[arena_base], cc);
    } else {
        // BIG groups (a single mega-contig can be most of the file)
        // parse cooperatively first: their record parse is
        // embarrassingly parallel — records are independent, the
        // contig vector is pre-sized, and the chromosome map is fully
        // interned by pass 1, so parse_record's map path is read-only
        // here.  Their solve+format sink then fires in the per-group
        // pass below on one worker while other groups proceed.
        constexpr size_t kBigGroup = 1 << 15;
        struct Chunk { size_t g, lo, hi; };
        std::vector<Chunk> big;
        for (size_t g = 0; g < n_groups; g++) {
            size_t sz = starts[g + 1] - starts[g];
            if (sz < kBigGroup || !owned(g)) continue;
            ds.contigs[g].resize(sz);
            size_t step = std::max(kBigGroup / 2, sz / (size_t) (4 * nt));
            for (size_t lo = starts[g]; lo < starts[g + 1]; lo += step)
                big.push_back({g, lo, std::min(lo + step, starts[g + 1])});
        }
        std::vector<std::string> fails(nt);
        auto run_phase = [&](auto &&body) {
            std::vector<std::thread> pool;
            for (int t = 0; t < nt; t++) {
                pool.emplace_back([&, t] {
                    std::vector<std::string_view> f;
                    ChrCache cc;
                    RunArena &arena = *ds.run_arenas[arena_base + t];
                    try {
                        body(f, arena, cc);
                    } catch (const std::exception &e) {
                        if (fails[t].empty()) fails[t] = e.what();
                    }
                });
            }
            for (auto &th : pool) th.join();
        };
        if (!big.empty()) {
            std::atomic<size_t> next_c{0};
            run_phase([&](std::vector<std::string_view> &f, RunArena &arena,
                          ChrCache &cc) {
                while (true) {
                    size_t c = next_c.fetch_add(1);
                    if (c >= big.size()) break;
                    parse_lines(big[c].g, big[c].lo, big[c].hi, f, arena, cc);
                }
            });
            // a failed chunk leaves its group partially parsed — the
            // sink pass below must not solve garbage records
            for (auto &msg : fails)
                if (!msg.empty()) throw std::runtime_error(msg);
        }
        std::atomic<size_t> next_g{0};
        run_phase([&](std::vector<std::string_view> &f, RunArena &arena,
                      ChrCache &cc) {
            while (true) {
                size_t g = next_g.fetch_add(1);
                if (g >= n_groups) break;
                if (starts[g + 1] - starts[g] >= kBigGroup) {
                    // records already parsed in the big pass: sink only
                    if (owned(g) && sink && sink->group) sink->group(ds, g);
                    continue;
                }
                parse_group(g, f, arena, cc);
            }
        });
        for (auto &msg : fails)
            if (!msg.empty()) throw std::runtime_error(msg);
    }
    prof("pass23_parse_group");
    return ds;
}

Mapped::~Mapped() {
    if (p) munmap((void *) p, n);
}

namespace {

// zero-copy input for the sharded parse: mmap shares page-cache pages
// across ranks instead of each rank read()-copying the whole file
std::string_view map_file(const std::string &path, Dataset &ds) {
    int fd = ::open(path.c_str(), O_RDONLY);
    if (fd >= 0) {
        struct stat st;
        if (fstat(fd, &st) == 0 && st.st_size > 0) {
            void *p = mmap(nullptr, (size_t) st.st_size, PROT_READ,
                           MAP_SHARED, fd, 0);
            ::close(fd);
            if (p != MAP_FAILED) {
                auto m = std::make_unique<Mapped>();
                m->p = (const char *) p;
                m->n = (size_t) st.st_size;
                ds.mapped = std::move(m);
                return {ds.mapped->p, ds.mapped->n};
            }
        } else {
            ::close(fd);
        }
    }
    ds.buffer = slurp(path);  // fallback
    return ds.buffer;
}

// non-empty logical lines in buf[lo, hi) — the unit cord_row counts
// (pass0 skips empty lines; a lone "\r" is empty after stripping)
i64 count_nonempty_lines(std::string_view buf, size_t lo, size_t hi) {
    i64 cnt = 0;
    size_t start = lo;
    while (start < hi) {
        const char *nl = (const char *) memchr(buf.data() + start, '\n',
                                               hi - start);
        size_t end = nl ? (size_t) (nl - buf.data()) : hi;
        size_t len = end - start;
        if (len > 1 || (len == 1 && buf[start] != '\r')) cnt++;
        start = end + 1;
    }
    return cnt;
}

std::string_view line_at(std::string_view buf, size_t s) {
    size_t e = buf.find('\n', s);
    if (e == std::string_view::npos) e = buf.size();
    std::string_view ln = buf.substr(s, e - s);
    if (!ln.empty() && ln.back() == '\r') ln.remove_suffix(1);
    return ln;
}

std::string_view qry_of(std::string_view line) {
    size_t t = line.find('\t');
    return t == std::string_view::npos ? line : line.substr(0, t);
}

// first contig-group start at/after byte cutoff — a group start is a
// non-empty line whose query name differs from the previous non-empty
// line's.  Derived from local bytes only, and identically by every
// rank that evaluates the same cutoff.
size_t group_start_at_or_after(std::string_view buf, size_t cutoff) {
    size_t S = buf.size();
    if (cutoff == 0) return 0;
    if (cutoff >= S) return S;
    // first line start >= cutoff
    size_t s = buf.find('\n', cutoff - 1);
    if (s == std::string_view::npos) return S;
    s++;
    auto next_nonempty = [&](size_t p) {
        while (p < S && line_at(buf, p).empty()) {
            size_t e = buf.find('\n', p);
            if (e == std::string_view::npos) return S;
            p = e + 1;
        }
        return p;
    };
    s = next_nonempty(s);
    if (s >= S) return S;
    // previous non-empty line before s
    size_t t = s;
    std::string_view prev_name;
    bool have_prev = false;
    while (t > 0) {
        size_t ls = 0;
        if (t >= 2) {  // t-2 would wrap below (rfind(npos) = whole buf)
            ls = buf.rfind('\n', t - 2);
            ls = ls == std::string_view::npos ? 0 : ls + 1;
        }
        std::string_view ln = line_at(buf, ls);
        if (!ln.empty()) {
            prev_name = qry_of(ln);
            have_prev = true;
            break;
        }
        if (ls == 0) break;
        t = ls;
    }
    if (!have_prev) return s;  // s is the file's first non-empty line
    while (s < S) {
        std::string_view ln = line_at(buf, s);
        std::string_view name = qry_of(ln);
        if (name != prev_name) return s;
        prev_name = name;
        size_t e = buf.find('\n', s);
        if (e == std::string_view::npos) return S;
        s = next_nonempty(e + 1);
    }
    return S;
}

}  // namespace

Dataset read_paf_range(const std::string &path, int threads,
                       GroupSink *sink, i64 rank, i64 world,
                       i64 *n_lines_out) {
    auto scan_t0 = std::chrono::steady_clock::now();
    Dataset ds;
    std::string_view buf = map_file(path, ds);
    size_t S = buf.size();
    if (S == 0) throw std::runtime_error("empty PAF input");
    // Rank 0 additionally streams its own slice straight into the
    // outputs (direct flush) and appends every later shard after the
    // barrier — measured ~5 % of its wall at 50k-100k scale — so its
    // byte share is biased down by that duty and all ranks finish
    // together.  The cut formula is a pure function of (S, rank,
    // world) with IEEE-deterministic arithmetic, so every rank derives
    // identical boundaries.
    // expert knob; MUST match across ranks — the launcher folds it
    // into the job digest (multihost._input_digest) so a mismatch
    // rejects shards instead of silently mis-splitting groups
    double kR0Weight = 0.95;
    if (const char *w = std::getenv("ALN_SHARD_R0W")) {
        // strict decimal form (digits, at most one dot) so the Python
        // launcher's digest replica (multihost._effective_r0w) parses
        // the EFFECTIVE value identically — out-of-form or
        // out-of-range input falls to the default on both sides
        // instead of stranding the merge on a digest mismatch
        bool okf = false;
        int dots = 0;
        for (const char *p = w; *p; p++) {
            if (*p == '.') {
                if (++dots > 1) { okf = false; break; }
            } else if (*p >= '0' && *p <= '9') {
                okf = true;
            } else {
                okf = false;
                break;
            }
        }
        double v = okf ? std::atof(w) : -1.0;
        if (v > 0.1 && v <= 1.5) kR0Weight = v;
    }
    const double total_w = kR0Weight + (double) (world - 1);
    auto cut = [&](i64 r) {  // first byte of rank r's slice
        double c = (kR0Weight + (double) (r - 1)) / total_w;
        return group_start_at_or_after(buf, (size_t) ((double) S * c));
    };
    size_t lo = rank == 0 ? 0 : cut(rank);
    size_t hi = rank == world - 1 ? S : cut(rank + 1);
    // global provenance + the cross-rank consistency token
    i64 row0 = count_nonempty_lines(buf, 0, lo);
    i64 tail = count_nonempty_lines(buf, hi, S);
    int nt = std::max(1, threads);

    // field-scan ONLY [lo, hi): line spans + qry-name + ref-chr views
    struct Scanned {
        std::vector<std::string_view> lines, qrys, chrs;
        std::string fail;
    };
    size_t n_chunks = (size_t) nt;
    if (hi - lo < (size_t) (64 << 10)) n_chunks = 1;
    std::vector<Scanned> chunks(n_chunks);
    {
        std::vector<size_t> bounds(n_chunks + 1, hi);
        bounds[0] = lo;
        for (size_t c = 1; c < n_chunks; c++) {
            size_t pos = lo + (hi - lo) / n_chunks * c;
            pos = buf.find('\n', pos);
            bounds[c] = (pos == std::string_view::npos || pos >= hi)
                ? hi : pos + 1;
        }
        auto scan_chunk = [&](size_t c) {
            Scanned &sc = chunks[c];
            size_t approx = (bounds[c + 1] - bounds[c]) / 64 + 16;
            sc.lines.reserve(approx);
            sc.qrys.reserve(approx);
            sc.chrs.reserve(approx);
            size_t start = bounds[c];
            while (start < bounds[c + 1]) {
                size_t pos = buf.find('\n', start);
                if (pos == std::string_view::npos) pos = buf.size();
                std::string_view line = buf.substr(start, pos - start);
                start = pos + 1;
                if (!line.empty() && line.back() == '\r')
                    line.remove_suffix(1);
                if (line.empty()) continue;
                size_t q_end = line.find('\t');
                if (q_end == std::string_view::npos) {
                    sc.fail = "short PAF row";
                    return;
                }
                size_t fpos = q_end + 1;
                for (int k = 0; k < 4; k++) {
                    fpos = line.find('\t', fpos);
                    if (fpos == std::string_view::npos) {
                        sc.fail = "short PAF row";
                        return;
                    }
                    fpos++;
                }
                size_t fend = line.find('\t', fpos);
                sc.lines.push_back(line);
                sc.qrys.push_back(line.substr(0, q_end));
                sc.chrs.push_back(line.substr(fpos, fend - fpos));
            }
        };
        if (n_chunks == 1) {
            scan_chunk(0);
        } else {
            std::vector<std::thread> pool;
            for (size_t c = 0; c < n_chunks; c++)
                pool.emplace_back(scan_chunk, c);
            for (auto &th : pool) th.join();
        }
        for (auto &sc : chunks)
            if (!sc.fail.empty()) throw std::runtime_error(sc.fail);
    }
    size_t n_lines = 0;
    for (auto &sc : chunks) n_lines += sc.lines.size();
    if (n_lines_out) *n_lines_out = row0 + (i64) n_lines + tail;
    std::vector<std::string_view> lines, qry_names;
    lines.reserve(n_lines);
    qry_names.reserve(n_lines);
    for (auto &sc : chunks) {
        lines.insert(lines.end(), sc.lines.begin(), sc.lines.end());
        qry_names.insert(qry_names.end(), sc.qrys.begin(), sc.qrys.end());
    }
    // LOCAL chromosome interning (first appearance within the range —
    // byte-safe: ids are equality-compared and resolved to names only)
    {
        std::string_view last_chr;
        for (auto &sc : chunks) {
            for (std::string_view name : sc.chrs) {
                if (name != last_chr) {
                    last_chr = name;
                    if (!ds.chr_ids.count(name)) {
                        ds.chr_ids.emplace(std::string(name),
                                           (i32) ds.chr_names.size());
                        ds.chr_names.emplace_back(name);
                    }
                }
            }
        }
    }
    // local group boundaries + the local-index dataset contract
    std::vector<size_t> starts;
    starts.push_back(0);
    for (size_t i = 1; i < n_lines; i++)
        if (qry_names[i] != qry_names[i - 1]) starts.push_back(i);
    if (n_lines == 0) starts.clear();
    starts.push_back(n_lines);
    size_t n_groups = starts.empty() ? 0 : starts.size() - 1;
    ds.contigs.resize(n_groups);
    ds.ctg_names.resize(n_groups);
    for (size_t g = 0; g < n_groups; g++) {
        std::string_view name = qry_names[starts[g]];
        ds.ctg_names[g] = std::string(name);
        auto it = ds.paf_map.find(name);
        if (it != ds.paf_map.end()) it->second = (i32) g;
        else ds.paf_map.emplace(std::string(name), (i32) g);
    }
    ds.shard_lo = 0;
    ds.shard_hi = (i64) n_groups;
    if (sink) {
        if (sink->start) sink->start(ds, n_groups);
        sink->scan_s = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - scan_t0).count();
    }
    auto parse_group = [&](size_t g, std::vector<std::string_view> &f,
                           RunArena &arena, ChrCache &cc) {
        auto &ctg = ds.contigs[g];
        size_t glo = starts[g], ghi = starts[g + 1];
        ctg.resize(ghi - glo);
        for (size_t i = glo; i < ghi; i++) {
            split_fields(lines[i], f);
            Record &r = ctg[i - glo];
            r = parse_record(f, ds, arena, cc);
            r.cord_type = 0;
            r.cord_row = (i32) (row0 + (i64) i);  // GLOBAL provenance
            r.ctg_index = (i32) (i - glo);
        }
        if (sink && sink->group) sink->group(ds, g);
    };
    size_t arena_base = ds.run_arenas.size();
    int n_arenas = (nt == 1 || n_lines < 256) ? 1 : nt;
    for (int t = 0; t < n_arenas; t++)
        ds.run_arenas.emplace_back(std::make_unique<RunArena>());
    if (nt == 1 || n_lines < 256) {
        std::vector<std::string_view> f;
        ChrCache cc;
        for (size_t g = 0; g < n_groups; g++)
            parse_group(g, f, *ds.run_arenas[arena_base], cc);
    } else {
        std::atomic<size_t> next_g{0};
        std::vector<std::string> fails(nt);
        std::vector<std::thread> pool;
        for (int t = 0; t < nt; t++) {
            pool.emplace_back([&, t] {
                std::vector<std::string_view> f;
                ChrCache cc;
                RunArena &arena = *ds.run_arenas[arena_base + t];
                try {
                    while (true) {
                        size_t g = next_g.fetch_add(1);
                        if (g >= n_groups) break;
                        parse_group(g, f, arena, cc);
                    }
                } catch (const std::exception &e) {
                    fails[t] = e.what();
                }
            });
        }
        for (auto &th : pool) th.join();
        for (auto &msg : fails)
            if (!msg.empty()) throw std::runtime_error(msg);
    }
    return ds;
}

void merge_alt(Dataset &ds, const std::string &alt_path, double alt_baseline,
               i64 rank, i64 world) {
    ds.alt_buffer = slurp(alt_path);
    if (ds.alt_buffer.empty()) return;
    ds.run_arenas.emplace_back(std::make_unique<RunArena>());
    RunArena &arena = *ds.run_arenas.back();
    ChrCache alt_cc;

    std::string tar_name;
    i64 tar_off = -1;
    bool tar_flag = false, tar_init = false, tar_local = true;
    double tar_ratio = 0;
    Record ratio_max;
    bool have_ratio_max = false;

    auto flush = [&]() {
        if (!tar_init || tar_flag || !tar_local) return;
        // all-zero-ratio group: the reference appends a garbage
        // default-constructed record (alignasm.cpp:242-252); deliberate
        // deviation — reject, matching io/paf.py (COMPONENTS.md).
        if (!have_ratio_max)
            throw std::runtime_error(
                "alt group has no record with positive aln_len/qry_total");
        auto &target = ds.contigs[ds.paf_map.at(tar_name)];
        ratio_max.ctg_index = (i32) target.size();
        target.push_back(ratio_max);
    };

    std::vector<std::string_view> f;
    i32 row = 0;
    for_lines(ds.alt_buffer, [&](std::string_view line) {
        split_fields(line, f);
        std::string qry(f[0]);
        size_t colon = qry.find(':');
        if (colon == std::string::npos)
            throw std::runtime_error("invalid alt query name");
        std::string real = qry.substr(0, colon);
        size_t dash = qry.find('-', colon + 1);
        if (dash == std::string::npos) dash = qry.size();
        i64 off = to_i64(std::string_view(qry).substr(colon + 1, dash - colon - 1)) - 1;

        // target contig = the global paf_map winner; under a sharded
        // parse, non-local targets skip record parsing entirely (their
        // group transitions still drive the flush state machine and
        // the global alt row counter, so local contigs see byte-
        // identical merges)
        i64 tgt = (i64) ds.paf_map.at(real);
        bool local = world <= 1
                     || (tgt >= ds.shard_lo && tgt < ds.shard_hi);
        i32 this_row = row++;

        if (!tar_init || tar_off != off || tar_name != real) {
            flush();
            tar_init = true;
            tar_flag = false;
            tar_ratio = 0;
            tar_off = off;
            tar_name = real;
            tar_local = local;
            have_ratio_max = false;
        }
        if (!local) return;

        const auto &last = ds.contigs[tgt].back();
        Record r = parse_record(f, ds, arena, alt_cc, off);
        r.qry_total = last.qry_total;
        r.cord_type = 1;
        r.cord_row = this_row;

        double ratio = to_f64(f[10]) / to_f64(f[1]);
        if (ratio > tar_ratio) {
            tar_ratio = ratio;
            ratio_max = r;
            have_ratio_max = true;
        }
        if (ratio > alt_baseline) {
            auto &target = ds.contigs[tgt];
            r.ctg_index = (i32) target.size();
            target.push_back(std::move(r));
            tar_flag = true;
        }
    });
    flush();
}

namespace {

void append_i64(std::string &out, i64 v) {
    char buf[24];
    auto r = std::to_chars(buf, buf + sizeof(buf), v);
    out.append(buf, r.ptr);
}

void write_one(std::string &out, const Dataset &ds, const std::string &name,
               const std::vector<Record> &ctg, const OutRow &row) {
    const Record &rec = ctg[row.ctg_index];
    static thread_local std::string cs_scratch;
    i32 mat_num, aln_len;
    std::string_view cs = clip_cs_view(rec, row.qs, row.qe, row.rs, row.re,
                                       cs_scratch, mat_num, aln_len);
    out += name;
    out += '\t'; append_i64(out, rec.qry_total);
    out += '\t'; append_i64(out, row.qs);
    out += '\t'; append_i64(out, row.qe + 1);
    out += '\t'; out += rec.fwd ? '+' : '-';
    out += '\t'; out += ds.chr_names[rec.ref_chr];
    out += '\t'; append_i64(out, rec.ref_total);
    out += '\t'; append_i64(out, rec.fwd ? row.rs : row.re);
    out += '\t'; append_i64(out, (rec.fwd ? row.re : row.rs) + 1);
    out += '\t'; append_i64(out, mat_num);
    out += '\t'; append_i64(out, aln_len);
    out += '\t'; append_i64(out, rec.map_qul);
    out += '\t'; out += row.alt_flag ? "tp:A:S" : "tp:A:P";
    out += '\t'; out += "xi:Z:";
    out += rec.cord_type == 0 ? "P_" : "A_";
    append_i64(out, rec.cord_row);
    out += '\t'; out += cs;
    out += '\n';
}

void flush_file(const std::string &path, const std::string &content) {
    std::ofstream o(path, std::ios::binary);
    if (!o) throw std::runtime_error("cannot write " + path);
    o.write(content.data(), (std::streamsize) content.size());
}

// stream many part strings to the file WITHOUT concatenating them into
// one giant buffer first: this process's large fresh allocations fault
// through the TPU tunnel's page-tracking layer at ~9 MB/s (a 109 MB
// concat measured 12 s against a 0.05 s plain memcpy), so never
// materialize the total
void flush_parts(const std::string &path,
                 const std::vector<std::string> &parts) {
    int fd = ::open(path.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) throw std::runtime_error("cannot write " + path);
    try {
        write_parts_fd(fd, parts, 0, (i64) parts.size());
    } catch (...) {
        ::close(fd);
        throw;
    }
    if (::close(fd) != 0) throw std::runtime_error("close failed: " + path);
}

}  // namespace

void write_parts_fd(int fd, const std::vector<std::string> &parts,
                    i64 lo, i64 hi) {
    // staging buffer: 10^5 tiny ofstream writes cost ~40-80 ms at 50k
    // contigs; batching into 4 MB write() calls is memcpy-bound
    static thread_local std::vector<char> buf;
    buf.resize(4 << 20);
    size_t fill = 0;
    auto flush_raw = [&](const char *p, size_t n) {
        while (n > 0) {
            ssize_t w = ::write(fd, p, n);
            if (w < 0 && errno == EINTR) continue;  // signal mid-write
            if (w <= 0)
                throw std::runtime_error(
                    std::string("short write: ") +
                    (w < 0 ? strerror(errno) : "write returned 0"));
            p += (size_t) w;
            n -= (size_t) w;
        }
    };
    auto flush = [&] {
        if (fill) flush_raw(buf.data(), fill);
        fill = 0;
    };
    for (i64 g = lo; g < hi; g++) {
        const std::string &p = parts[(size_t) g];
        if (p.empty()) continue;
        if (p.size() >= buf.size()) {
            flush();
            flush_raw(p.data(), p.size());
            continue;
        }
        if (fill + p.size() > buf.size()) flush();
        memcpy(buf.data() + fill, p.data(), p.size());
        fill += p.size();
    }
    flush();
}

void format_rows_one(std::string &out, const Dataset &ds, size_t i,
                     const std::vector<OutRow> &rows) {
    for (const auto &row : rows)
        write_one(out, ds, ds.ctg_names[i], ds.contigs[i], row);
}

void format_rows_parallel(std::string &out, const Dataset &ds, size_t i,
                          const std::vector<OutRow> &rows, int threads) {
    // big-contig formatting: a mega-contig's rows are formatted inside
    // ONE sink call while the pool's other workers sit idle at the end
    // of the parse — chunk the rows, format each chunk into its own
    // string on a helper thread (rows are independent; write_one's
    // scratch is thread_local), splice in order
    size_t n = rows.size();
    int want = std::min<int>(threads, (int) ((n + 16383) / 16384));
    if (want <= 1) {
        format_rows_one(out, ds, i, rows);
        return;
    }
    // acquire helper slots from the SHARED process-wide solver budget
    // (one counter also backing the intra-contig build helpers, so the
    // two cannot jointly oversubscribe; it runs INSIDE the solve
    // workers, so several >=16k-row contigs finishing together could
    // otherwise transiently spawn ~threads^2 formatter threads).
    // Whatever is unavailable just shrinks the fan-out — the spliced
    // bytes are order-identical at any chunk count
    int helpers = acquire_solver_helpers(want - 1);
    if (helpers == 0) {
        format_rows_one(out, ds, i, rows);
        return;
    }
    int nc = helpers + 1;
    std::vector<std::string> parts((size_t) nc);
    std::vector<std::thread> pool;
    size_t step = (n + (size_t) nc - 1) / (size_t) nc;
    auto fmt_chunk = [&](int c) {
        size_t lo = (size_t) c * step, hi = std::min(n, lo + step);
        std::string &o = parts[(size_t) c];
        o.reserve((hi - lo) * 160);
        for (size_t k = lo; k < hi; k++)
            write_one(o, ds, ds.ctg_names[i], ds.contigs[i], rows[k]);
    };
    for (int c = 1; c < nc; c++)
        pool.emplace_back([&, c] { fmt_chunk(c); });
    fmt_chunk(0);
    for (auto &t : pool) t.join();
    release_solver_helpers(helpers);
    size_t total = out.size();
    for (auto &p2 : parts) total += p2.size();
    out.reserve(total);
    for (auto &p2 : parts) out += p2;
}

void format_max_rows_one(std::string &out, const Dataset &ds, size_t i,
                         const std::vector<std::vector<OutRow>> &groups) {
    i32 cnt = 0;
    for (const auto &group : groups) {
        ++cnt;
        std::string name = ds.ctg_names[i] + "." + std::to_string(cnt);
        for (const auto &row : group)
            write_one(out, ds, name, ds.contigs[i], row);
    }
}

void flush_parts_file(const std::string &path,
                      const std::vector<std::string> &parts) {
    flush_parts(path, parts);
}

void flush_three(const std::string &prefix,
                 const std::vector<std::string> &out,
                 const std::vector<std::string> &alt,
                 const std::vector<std::string> &max, int threads) {
    static const char *sfx[] = {".aln.paf", ".aln.alt.paf", ".aln.all.paf"};
    const std::vector<std::string> *parts[] = {&out, &alt, &max};
    std::string fail[3];
    auto flush_one = [&](int w) {
        try {
            flush_parts(prefix + sfx[w], *parts[w]);
        } catch (const std::exception &e) {
            fail[w] = e.what();
        }
    };
    if (threads == 1) {
        for (int w = 0; w < 3; w++) flush_one(w);
    } else {
        std::vector<std::thread> pool;
        for (int w = 0; w < 3; w++) pool.emplace_back(flush_one, w);
        for (auto &t : pool) t.join();
    }
    for (int w = 0; w < 3; w++)
        if (!fail[w].empty()) throw std::runtime_error(fail[w]);
}

void write_rows(const Dataset &ds, const std::vector<std::vector<OutRow>> &rows,
                const std::string &path, int threads) {
    // threads == 0 means "auto", like run_pool: the exporter's
    // write_results passed 0 and silently formatted ~800k rows on ONE
    // thread (a 50k-contig corpus spent 10-50 s here vs 0.5 s threaded).
    // hardware_concurrency() may itself return 0 — clamp to 1 so the
    // parallel branch can never spawn zero workers.
    int nt = std::max(
        1, threads > 0 ? threads : (int) std::thread::hardware_concurrency());
    if (nt == 1 || rows.size() < 64) {
        std::string out;
        out.reserve(1 << 20);
        for (size_t i = 0; i < rows.size(); i++)
            format_rows_one(out, ds, i, rows[i]);
        flush_file(path, out);
        return;
    }
    // format per contig in parallel, concatenate in order
    std::vector<std::string> parts(rows.size());
    std::atomic<size_t> next{0};
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) {
        pool.emplace_back([&] {
            while (true) {
                size_t i = next.fetch_add(1);
                if (i >= rows.size()) break;
                format_rows_one(parts[i], ds, i, rows[i]);
            }
        });
    }
    for (auto &th : pool) th.join();
    flush_parts(path, parts);
}

void write_max_rows(const Dataset &ds,
                    const std::vector<std::vector<std::vector<OutRow>>> &rows,
                    const std::string &path, int threads) {
    // same shape as write_rows: per-contig parallel formatting (the
    // ".N" name suffix counts are contig-local) + streamed flush, so
    // .all-heavy corpora don't reintroduce the serial-format and
    // giant-concat cliffs fixed there
    auto fmt_one = [&](std::string &out, size_t i) {
        format_max_rows_one(out, ds, i, rows[i]);
    };
    int nt = std::max(
        1, threads > 0 ? threads : (int) std::thread::hardware_concurrency());
    if (nt == 1 || rows.size() < 64) {
        std::string out;
        out.reserve(1 << 20);
        for (size_t i = 0; i < rows.size(); i++) fmt_one(out, i);
        flush_file(path, out);
        return;
    }
    std::vector<std::string> parts(rows.size());
    std::atomic<size_t> next{0};
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) {
        pool.emplace_back([&] {
            while (true) {
                size_t i = next.fetch_add(1);
                if (i >= rows.size()) break;
                fmt_one(parts[i], i);
            }
        });
    }
    for (auto &th : pool) th.join();
    flush_parts(path, parts);
}

namespace {
// leaked on purpose: a static-duration vector holding joinable threads
// would std::terminate in its destructor at process exit if a teardown
// were still running — a heap registry with no destructor makes exit
// mid-free benign (threads die with the process)
std::mutex &td_mu() {
    static std::mutex m;
    return m;
}
std::vector<std::thread> &td_reg() {
    static auto *v = new std::vector<std::thread>();
    return *v;
}
}  // namespace

void async_teardown(std::function<void()> fn) {
    std::lock_guard<std::mutex> lk(td_mu());
    td_reg().emplace_back(std::move(fn));
}

}  // namespace aln

extern "C" void aln_drain_teardowns(void) {
    std::vector<std::thread> local;
    {
        std::lock_guard<std::mutex> lk(aln::td_mu());
        local.swap(aln::td_reg());
    }
    for (auto &t : local) t.join();
}
