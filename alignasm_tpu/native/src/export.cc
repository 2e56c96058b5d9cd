// Device-engine export ABI: the C++ host plane parses the PAF, builds
// every contig DAG (threaded), and hands packed struct-of-arrays graphs
// to Python, which runs the batched TPU kernels and the host finish.
// This keeps the runtime around the TPU compute path native — the
// Python layer only orchestrates device calls.
//
// Arrival ranks reproduce the reference's reversed-relaxation order
// (see alignasm_tpu/engine/device.py:pack_graph): for forward edge
// (u -> v), rank = kahn_pos_of_v_in_rev_topo << 26 | index_within_
// rev_adjacency, unique per edge.
#include <algorithm>
#include <atomic>
#include <malloc.h>
#include <cstring>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
#include <thread>

#include "io.h"
#include "scoring_abi.h"
#include "solver.h"

namespace {

struct PackedContig {
    aln::Graph graph;
    std::vector<int64_t> erank;
    // reverse-topo Kahn position per vertex (sinks first); the wire
    // relabels vertex v to padded position V-1-kahn[v], so every edge
    // goes low->high and the device can solve in ONE reverse-topo scan
    // (ops/dense.py:dense_solve_wire_topo) instead of n_sweeps full
    // relaxation sweeps
    std::vector<int32_t> kahn;
    bool built = false;
    std::string error;
};

struct ExportCtx {
    // first member: the page butler stays active for the context's whole
    // life (parse/build at open, wire exports, finishes) and stops when
    // the async teardown destroys the context
    aln::ButlerScope butler;
    aln::Dataset ds;
    aln::Config cfg;
    std::vector<PackedContig> packed;
    // bulk device-finish result store (aln_finish_bulk / aln_solve_remaining)
    std::vector<aln::ContigResult> results;
    std::vector<char> done;
    // pre-formatted output parts per contig: the finish workers format
    // rows the moment a contig's result lands (overlapping the device
    // sync of later buckets), so aln_write_results is flush-only
    std::vector<std::string> pout, palt, pmax;
    std::vector<char> formatted;
};

void ensure_results(ExportCtx &ctx) {
    if (ctx.results.size() != ctx.ds.contigs.size()) {
        size_t n = ctx.ds.contigs.size();
        ctx.results.resize(n);
        ctx.done.assign(n, 0);
        ctx.pout.resize(n);
        ctx.palt.resize(n);
        ctx.pmax.resize(n);
        ctx.formatted.assign(n, 0);
    }
}

void format_result(ExportCtx &ctx, long long i) {
    const auto &r = ctx.results[i];
    ctx.pout[i].clear();
    ctx.palt[i].clear();
    ctx.pmax[i].clear();
    aln::format_rows_one(ctx.pout[i], ctx.ds, (size_t) i, r.out);
    aln::format_rows_one(ctx.palt[i], ctx.ds, (size_t) i, r.alt);
    aln::format_max_rows_one(ctx.pmax[i], ctx.ds, (size_t) i, r.max_out);
    ctx.formatted[i] = 1;
}

void run_pool(int threads, long long n, const std::function<void(long long)> &body,
              std::string &err) {
    std::atomic<long long> next{0};
    std::mutex errm;
    auto worker = [&] {
        while (true) {
            long long i = next.fetch_add(1);
            if (i >= n) break;
            try {
                body(i);
            } catch (const std::exception &e) {
                std::lock_guard<std::mutex> lk(errm);
                if (err.empty()) err = e.what();
            }
        }
    };
    int nt = threads > 0 ? threads : (int) std::thread::hardware_concurrency();
    aln::set_solver_helper_cap(nt - 1);
    if (nt <= 1 || n <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nt; t++) pool.emplace_back(worker);
        for (auto &t : pool) t.join();
    }
}

void compute_ranks(PackedContig &pc) {
    const aln::Graph &g = pc.graph;
    int64_t V = (int64_t) g.adj.size();
    // g_rev in CSR form (in-degree in g_rev equals forward out-degree):
    // a flat counting-sort layout instead of vector<vector> — the
    // per-contig allocation churn of the nested form was a measurable
    // slice of the 100k-corpus pack phase.  Scratch is thread_local so
    // the build pool reuses it across contigs.
    static thread_local std::vector<int32_t> indeg, roff, radj, q;
    indeg.assign((size_t) V, 0);
    roff.assign((size_t) V + 1, 0);
    int64_t E = 0;
    for (int64_t u = 0; u < V; u++) {
        indeg[u] = (int32_t) g.adj[u].size();
        E += (int64_t) g.adj[u].size();
        for (const auto &e : g.adj[u]) roff[(size_t) e.to + 1]++;
    }
    for (int64_t v = 0; v < V; v++) roff[v + 1] += roff[v];
    radj.resize((size_t) E);
    {
        static thread_local std::vector<int32_t> cur;
        cur.assign(roff.begin(), roff.end() - 1);
        for (int64_t u = 0; u < V; u++)
            for (const auto &e : g.adj[u])
                radj[(size_t) cur[e.to]++] = (int32_t) u;
    }
    // FIFO Kahn queue as a flat vector (head index), index-ordered
    // seeding.  Seeding/queue order must stay EXACTLY this — erank
    // reproduces the reference's reversed-relaxation arrival order
    // from it, and the wire's topo relabeling comes from kahn.
    q.clear();
    for (int64_t u = 0; u < V; u++)
        if (!indeg[u]) q.push_back((int32_t) u);
    pc.kahn.assign((size_t) V, 0);
    auto &kahn = pc.kahn;
    int32_t pos = 0;
    for (size_t head = 0; head < q.size(); head++) {
        int32_t x = q[head];
        kahn[x] = pos++;
        for (int32_t k = roff[x]; k < roff[(size_t) x + 1]; k++)
            if (--indeg[radj[(size_t) k]] == 0) q.push_back(radj[(size_t) k]);
    }
}

void compute_erank(PackedContig &pc) {
    // per-edge reversed-relaxation arrival rank, u-major — consumed
    // only by aln_export_edges (the mesh graph axis) and the legacy
    // sparse kernels, so it is computed lazily there rather than in
    // the hot build path
    if (!pc.erank.empty()) return;
    const aln::Graph &g = pc.graph;
    int64_t V = (int64_t) g.adj.size();
    std::vector<int32_t> rev_idx((size_t) V, 0);
    pc.erank.clear();
    for (int64_t u = 0; u < V; u++)
        for (const auto &e : g.adj[u])
            pc.erank.push_back(((int64_t) pc.kahn[e.to] << 26)
                               | rev_idx[e.to]++);
}

void set_err(char *err, int errlen, const std::string &msg) {
    if (err && errlen > 0) std::snprintf(err, (size_t) errlen, "%s", msg.c_str());
}

}  // namespace

extern "C" {

void *aln_open2(const char *paf_path, const char *alt_path, double alt_baseline,
                int non_skip_linkable, int threads, long long max_records,
                char *err, int errlen, const AlnScoring *scoring) {
    try {
        aln_tune_heap();
        auto ctx = std::make_unique<ExportCtx>();
        ctx->cfg.alt_baseline = alt_baseline;
        ctx->cfg.non_skip_linkable = non_skip_linkable != 0;
        aln::apply_scoring(ctx->cfg, scoring);
        int nt = threads > 0 ? threads : (int) std::thread::hardware_concurrency();
        aln::set_solver_helper_cap(nt - 1);
        ExportCtx *c = ctx.get();
        auto build_one = [c, max_records](aln::Dataset &ds, size_t i) {
            auto &contig = ds.contigs[i];
            if ((long long) contig.size() < 2 ||
                (long long) contig.size() > max_records)
                return;
            auto &pc = c->packed[i];
            try {
                pc.graph = aln::build_graph(contig, c->cfg);
                compute_ranks(pc);
                pc.built = true;
            } catch (const std::exception &e) {
                pc.error = e.what();
            }
        };
        if (!(alt_path && alt_path[0])) {
            // no alt merge: build each contig's DAG from the parse
            // worker the moment its records are complete — parse and
            // graph build are one parallel phase (cf. api.cc)
            aln::GroupSink sink;
            sink.start = [c](aln::Dataset &, size_t n_groups) {
                c->packed.resize(n_groups);
            };
            sink.group = build_one;
            ctx->ds = aln::read_paf(paf_path, nt, &sink);
        } else {
            // the alt merge appends records to parsed contigs, so the
            // build must wait for it
            ctx->ds = aln::read_paf(paf_path, nt);
            aln::merge_alt(ctx->ds, alt_path, alt_baseline);
            size_t n = ctx->ds.contigs.size();
            ctx->packed.resize(n);
            std::atomic<size_t> next{0};
            auto worker = [&] {
                while (true) {
                    size_t i = next.fetch_add(1);
                    if (i >= n) break;
                    build_one(ctx->ds, i);
                }
            };
            if (nt <= 1 || n <= 1) {
                worker();
            } else {
                std::vector<std::thread> pool;
                for (int t = 0; t < nt; t++) pool.emplace_back(worker);
                for (auto &t : pool) t.join();
            }
        }
        return ctx.release();
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return nullptr;
    }
}

void aln_close(void *h) {
    // teardown off the caller's path: the context holds the parsed
    // dataset + every built graph + formatted parts (~10^5-10^6 small
    // heap blocks; ~0.4 s of free() at 50k contigs, measured inside
    // the round-3 scale runs) — the caller only needs the outputs, so
    // a background thread releases the memory (joinable via
    // aln_drain_teardowns so bench reps don't inherit the churn).
    // The library stays loaded for the thread's lifetime (ctypes never
    // dlcloses), and process exit mid-free is benign.
    auto *ctx = (ExportCtx *) h;
    aln::async_teardown([ctx] { delete ctx; });
}

long long aln_num_contigs(void *h) {
    return (long long) ((ExportCtx *) h)->ds.contigs.size();
}

}  // extern "C"

extern "C" {

static void fill_rows(const std::vector<aln::OutRow> &rows, int64_t *buf) {
    for (size_t k = 0; k < rows.size(); k++) {
        const auto &r = rows[k];
        buf[k * 6 + 0] = r.ctg_index;
        buf[k * 6 + 1] = r.qs;
        buf[k * 6 + 2] = r.qe;
        buf[k * 6 + 3] = r.rs;
        buf[k * 6 + 4] = r.re;
        buf[k * 6 + 5] = r.alt_flag ? 1 : 0;
    }
}

// ---- bulk device-engine ABI ----------------------------------------
// One call each for metadata, dense packing, device finish, stragglers,
// and result IO — the Python layer holds NO per-contig loops on the
// production path (the round-1 bottleneck: ~1 ms of Python per contig).

int aln_meta_bulk(void *h, int64_t *meta) {
    // rows: (n, 8) i64 [built, n_records, n_vertices, n_edges, src,
    // dest, score_bound, 0]; score_bound = sum over u of its max
    // outgoing edge score-sum — an upper bound on any path sum, the
    // int32-kernel eligibility test.
    auto &ctx = *(ExportCtx *) h;
    size_t n = ctx.ds.contigs.size();
    for (size_t i = 0; i < n; i++) {
        int64_t *m = meta + i * 8;
        const auto &pc = ctx.packed[i];
        m[0] = pc.built ? 1 : 0;
        m[1] = (int64_t) ctx.ds.contigs[i].size();
        m[2] = m[3] = m[4] = m[5] = m[6] = m[7] = 0;
        if (!pc.built) continue;
        const auto &g = pc.graph;
        int64_t ne = 0, bound = 0;
        for (const auto &a : g.adj) {
            ne += (int64_t) a.size();
            int64_t mx = 0;
            for (const auto &e : a) mx = std::max(mx, e.w.sum());
            bound += mx;
        }
        m[2] = (int64_t) g.adj.size();
        m[3] = ne;
        m[4] = g.src;
        m[5] = g.dest;
        m[6] = bound;
    }
    return 0;
}

int aln_export_wire(void *h, const int64_t *idx, long long n_idx, long long V,
                    long long W, int32_t *wire, int8_t *status, int threads) {
    // Sparse wire format (ops/dense.py:dense_solve_wire_topo): per
    // contig a (2, W) int32 slab of (flat cell index pos(u)*V+pos(v),
    // score|anom<<28) pairs, one (V*V, pos(dest)) entry, one
    // (V*V+1, pos(src)) entry, and padding pointing at the trash cell
    // V*(V+1).  Vertices are RELABELED to pos(v) = V-1-kahn[v] — a
    // topological order (every edge goes low->high, unused padding
    // rows sit at the front) — so the device solves all suffix DPs in
    // one V-step reverse scan instead of n_sweeps O(V^2) sweeps.  The
    // wire is ~16x smaller than the dense matrices; the device
    // densifies with one batched scatter.
    // status[b]: 1 = duplicate (u, v) cell, 2 = not built, 3 = V/W
    // overflow, 4 = score/anomaly outside the packed envelope — caller
    // routes those contigs to the native solver instead.
    auto &ctx = *(ExportCtx *) h;
    const int32_t TRASH = (int32_t) (V * (V + 1));
    std::string err;
    run_pool(threads, n_idx, [&](long long b) {
        const auto &pc = ctx.packed[idx[b]];
        int32_t *ib = wire + b * 2 * W;
        int32_t *vb = ib + W;
        std::fill(ib, ib + W, TRASH);
        std::fill(vb, vb + W, 0);
        status[b] = pc.built ? 0 : 2;
        if (!pc.built) return;
        const auto &g = pc.graph;
        long long n_e = 0;
        for (const auto &a : g.adj) n_e += (long long) a.size();
        if ((long long) g.adj.size() > V || n_e + 2 > W) {
            status[b] = 3;
            return;
        }
        // thread-local dup detector, cleared cell-by-cell afterwards (a
        // fresh V*V memset per contig would dominate the pack phase)
        static thread_local std::vector<char> seen;
        if ((long long) seen.size() < V * V) seen.assign((size_t) (V * V), 0);
        const auto &kahn = pc.kahn;
        auto pos = [&](long long v) { return V - 1 - (long long) kahn[v]; };
        long long k = 0;
        for (size_t u = 0; u < g.adj.size() && !status[b]; u++) {
            for (const auto &e : g.adj[u]) {
                int64_t s = e.w.sum();
                int64_t a = e.w.a;
                if (s < 0 || s >= (1 << 28) || a < 0 || a > 3) {
                    status[b] = 4;
                    break;
                }
                long long cell = pos((long long) u) * V + pos(e.to);
                if (seen[cell]) {
                    status[b] = 1;
                    break;
                }
                seen[cell] = 1;
                ib[k] = (int32_t) cell;
                vb[k] = (int32_t) (s | (a << 28));
                k++;
            }
        }
        for (long long j = 0; j < k; j++) seen[ib[j]] = 0;
        if (status[b]) return;
        ib[k] = (int32_t) (V * V);  // the dest cell (row V, col 0)
        vb[k] = (int32_t) pos(g.dest);
        ib[k + 1] = (int32_t) (V * V + 1);  // the src cell (row V, col 1)
        vb[k + 1] = (int32_t) pos(g.src);
    }, err);
    return err.empty() ? 0 : 1;
}

int aln_export_wire_ragged(void *h, const int64_t *idx, long long n_idx,
                           long long V, const int64_t *offs, long long capN,
                           long long trash, int32_t *wire, int8_t *status,
                           int threads) {
    // RAGGED wire (ops/dense.py:_densify_wire_ragged): ONE (2, capN)
    // int32 stream for the whole bucket — row 0 global flat indices
    // b * V*(V+1) + pos(u)*V + pos(v) (same per-contig cell layout as
    // aln_export_wire), row 1 packed score|anom<<28 values.  Contig b
    // owns span [offs[b], offs[b+1]) = its edge count + 2 (dest, src
    // entries); no per-contig W padding, so the transport carries only
    // real entries (~2-3x fewer H2D bytes than the (B, 2, W) form at
    // 50k-contig scale, where the wire dominates device-engine sync).
    // ``trash`` is the caller's scatter sink (padB * V*(V+1)); bad
    // contigs (same status codes as aln_export_wire) get their span
    // trash-filled except dest/src entries pointing at vertex 0 (an
    // empty well-formed slab) and are filtered out by the caller
    // before the finish.
    auto &ctx = *(ExportCtx *) h;
    const long long M = V * (V + 1);
    std::string err;
    run_pool(threads, n_idx, [&](long long b) {
        const long long lo = offs[b], hi = offs[b + 1];
        int32_t *ib = wire + lo;
        int32_t *vb = wire + capN + lo;
        const long long span = hi - lo;
        auto fail = [&](int8_t code) {
            status[b] = code;
            std::fill(ib, ib + span, (int32_t) trash);
            std::fill(vb, vb + span, 0);
            if (span >= 2) {
                ib[0] = (int32_t) (b * M + V * V);      // dest -> vertex 0
                ib[1] = (int32_t) (b * M + V * V + 1);  // src  -> vertex 0
            }
        };
        status[b] = 0;
        const auto &pc = ctx.packed[idx[b]];
        if (!pc.built) return fail(2);
        const auto &g = pc.graph;
        long long n_e = 0;
        for (const auto &a : g.adj) n_e += (long long) a.size();
        if ((long long) g.adj.size() > V || n_e + 2 != span) return fail(3);
        static thread_local std::vector<char> seen;
        if ((long long) seen.size() < V * V) seen.assign((size_t) (V * V), 0);
        const auto &kahn = pc.kahn;
        auto pos = [&](long long v) { return V - 1 - (long long) kahn[v]; };
        const long long base = b * M;
        long long k = 0;
        int8_t bad = 0;
        static thread_local std::vector<std::pair<int32_t, int32_t>> cells;
        cells.clear();
        for (size_t u = 0; u < g.adj.size() && !bad; u++) {
            for (const auto &e : g.adj[u]) {
                int64_t s = e.w.sum();
                int64_t a = e.w.a;
                if (s < 0 || s >= (1 << 28) || a < 0 || a > 3) {
                    bad = 4;
                    break;
                }
                long long cell = pos((long long) u) * V + pos(e.to);
                if (seen[cell]) {
                    bad = 1;
                    break;
                }
                seen[cell] = 1;
                cells.emplace_back((int32_t) cell, (int32_t) (s | (a << 28)));
                k++;
            }
        }
        for (const auto &cv : cells) seen[cv.first] = 0;
        if (bad) return fail(bad);
        // ascending cells per contig: scatter order is irrelevant to
        // the densify, and sorted cells make the 16-bit transport's
        // per-entry deltas non-negative and < V*(V+1)
        std::sort(cells.begin(), cells.end());
        for (long long j = 0; j < k; j++) {
            ib[j] = (int32_t) (base + cells[(size_t) j].first);
            vb[j] = cells[(size_t) j].second;
        }
        ib[k] = (int32_t) (base + V * V);
        vb[k] = (int32_t) pos(g.dest);
        ib[k + 1] = (int32_t) (base + V * V + 1);
        vb[k + 1] = (int32_t) pos(g.src);
    }, err);
    return err.empty() ? 0 : 1;
}

long long aln_export_wire16(void *h, const int64_t *idx, long long n_idx,
                            long long V, const int64_t *offs, long long capN,
                            long long trash, uint16_t *deltas, uint16_t *vidx,
                            int32_t *table, long long table_cap,
                            int8_t *status, int threads) {
    // 16-bit transport — HALF the H2D bytes of the i32 ragged wire,
    // exactly when the wire dominates device-engine sync (50k-100k
    // contig corpora): sorted per-contig cells delta-encode into u16
    // (every step < V*(V+1) <= 65280 for V <= 255; measured p99 delta
    // 3k at bench scale) and the heavily repeated packed score|anom
    // values dictionary-encode into a u16 table index (measured 3.5 %
    // unique at 20k contigs).  Layout consumed by ops/dense.py:
    // _densify_wire16 — absolute cell i = cumsum(deltas)[i], value i =
    // table[vidx[i]]; entries [n_real, capN) are the caller's to
    // zero-fill (a zero delta repeats the last cell with the same
    // value: a benign duplicate scatter).  Rejected contigs encode
    // inline as dest/src seeds at vertex 0 + zero-delta filler, so a
    // few bad contigs never cost the bucket its 16-bit path.
    // Returns n_table (> 0) on success; -1 = encoding unsound for this
    // bucket (value table would exceed table_cap/65536, or a delta
    // fell outside u16) — the caller falls back to the i32 wire.
    auto &ctx = *(ExportCtx *) h;
    const long long M = V * (V + 1);
    if (M > 65535 || V > 255) return -1;
    const long long n_real = offs[n_idx];
    if (n_real > capN) return -1;
    // pass 1: the sorted i32 ragged wire into scratch (threaded)
    std::vector<int32_t> scratch((size_t) (2 * capN));
    int rc = aln_export_wire_ragged(h, idx, n_idx, V, offs, capN, trash,
                                    scratch.data(), status, threads);
    (void) ctx;
    if (rc != 0) return -2;
    // rejected contigs: rewrite their spans as dest/src-at-vertex-0
    // seeds + zero-delta filler pointing at the src cell (all deltas
    // stay in range: span start jumps at most M - 1 from the previous
    // contig's src cell)
    for (long long b = 0; b < n_idx; b++) {
        if (!status[b]) continue;
        const long long lo = offs[b], hi = offs[b + 1];
        int32_t *ib = scratch.data() + lo;
        int32_t *vb = scratch.data() + capN + lo;
        const int32_t dcell = (int32_t) (b * M + V * V);
        for (long long j = 0; j < hi - lo; j++) {
            ib[j] = j == 0 ? dcell : dcell + 1;
            vb[j] = 0;
        }
    }
    // pass 2: delta + dictionary encode (serial; ~10 ns/entry)
    const long long tcap = std::min<long long>(table_cap, 65536);
    // open-addressed value -> slot map (capacity 2x tcap, pow2)
    long long hcap = 1;
    while (hcap < 2 * tcap) hcap <<= 1;
    std::vector<int64_t> hkey((size_t) hcap, -1);
    std::vector<int32_t> hslot((size_t) hcap);
    long long n_table = 0;
    int64_t prev = 0;
    const int32_t *ib = scratch.data();
    const int32_t *vb = scratch.data() + capN;
    for (long long i = 0; i < n_real; i++) {
        int64_t d = (int64_t) ib[i] - prev;
        if (d < 0 || d > 65535) return -1;
        deltas[i] = (uint16_t) d;
        prev = ib[i];
        const int32_t v = vb[i];
        uint64_t hsh = ((uint64_t) (uint32_t) v) * 0x9E3779B97F4A7C15ull;
        long long p = (long long) (hsh >> 1) & (hcap - 1);
        while (true) {
            if (hkey[p] < 0) {
                if (n_table >= tcap) return -1;
                hkey[p] = v;
                hslot[p] = (int32_t) n_table;
                table[n_table++] = v;
                vidx[i] = (uint16_t) hslot[p];
                break;
            }
            if (hkey[p] == v) {
                vidx[i] = (uint16_t) hslot[p];
                break;
            }
            p = (p + 1) & (hcap - 1);
        }
    }
    return n_table;
}

int aln_finish_bulk(void *h, const int64_t *idx, long long n_idx,
                    const int16_t *dp, long long V, int lazy_walks,
                    int threads, long long *n_fast, long long *n_fallback,
                    char *err, int errlen) {
    // dp rows: (n_idx, V + 5) int16 [nxt (V, dest-encoded), floor_a@src,
    // cnt_tot@src, cnt_min@src, d_a@src, src] from
    // ops/dense.py:dense_solve_wire_topo_nxt — the row carries the
    // per-vertex lowest-index achieving SUCCESSOR (strictly increasing
    // in topo numbering); the min-walk path (unique whenever
    // cnt_min == 1, the only case the fast finish accepts) is chased
    // from src HERE — a host chase is nanoseconds, while chasing on
    // device was a second V-step sequential scan (~40% of the launch).
    // Entries are wire TOPO positions (pos(v) = V-1-kahn[v]; see
    // aln_export_wire), un-permuted here.  Non-order-insensitive
    // contigs get the full native solve on the already-built graph.
    auto &ctx = *(ExportCtx *) h;
    ensure_results(ctx);
    std::atomic<long long> fast{0}, fb{0};
    aln::Config cfg = ctx.cfg;
    cfg.lazy_walks = lazy_walks != 0;
    std::string werr;
    run_pool(threads, n_idx, [&](long long b) {
        long long i = idx[b];
        const auto &pc = ctx.packed[i];
        const int16_t *row = dp + b * (V + 5);
        int32_t fl = row[V], ct = row[V + 1], cm = row[V + 2];
        int32_t da_src = row[V + 3];
        aln::i32 src = pc.graph.src;
        long long nv = (long long) pc.graph.adj.size();
        auto pos = [&](long long v) { return V - 1 - (long long) pc.kahn[v]; };
        if (row[V + 4] != (int16_t) pos(src))
            throw std::runtime_error("device result row src mismatch");
        // clamps (ops/dense.py:I16_INF) only hit when src cannot reach
        // dest, which forces cm == 0 -> the fallback branch, so the
        // fast-path guard below only ever sees exact finite values
        if (cm == 1 && !(ct >= 2 && da_src != fl)) {
            static thread_local std::vector<int32_t> inv;
            inv.assign((size_t) V, -1);
            for (long long v = 0; v < nv; v++) inv[pos(v)] = (int32_t) v;
            static thread_local std::vector<aln::i32> verts;
            verts.clear();
            const long long dpos = pos(pc.graph.dest);
            long long cur = pos(src);
            for (long long k = 0; k < V; k++) {
                if (cur < 0 || cur >= V || inv[cur] < 0)
                    throw std::runtime_error("device nxt entry out of range");
                verts.push_back(inv[cur]);
                if (cur == dpos) break;
                long long nx = row[cur];
                if (nx <= cur)  // achieving successors strictly increase
                    throw std::runtime_error("device nxt chain not increasing");
                cur = nx;
            }
            if (verts.front() != src || verts.back() != pc.graph.dest)
                throw std::runtime_error("device path endpoints mismatch");
            ctx.results[i] = aln::finish_from_path(pc.graph, verts.data(),
                                                   (int) verts.size(), cfg);
            fast.fetch_add(1);
        } else {
            ctx.results[i] = aln::solve_from_graph(pc.graph, cfg);
            fb.fetch_add(1);
        }
        format_result(ctx, i);
        ctx.done[i] = 1;
    }, werr);
    *n_fast = fast.load();
    *n_fallback = fb.load();
    if (!werr.empty()) {
        set_err(err, errlen, werr);
        return 1;
    }
    return 0;
}

}  // extern "C" (templates cannot carry C linkage)

// shared body for the gate-row finishes: dp rows are
// (n_idx, V + 2) [nxt (V, dest-encoded), fast, src] — uint8 for
// V <= 256 (aln_finish_bulk8) and int16 for V <= 32767
// (aln_finish_bulk16, the single-chip big-contig path).  The device
// evaluated the order-insensitivity gate ITSELF in exact int32
//   fast = cnt_min == 1 && !(cnt_tot >= 2 && d_a != floor_a)
// (the same predicate the V+5 int16 row's host gate applies), so the
// host consumes only the achieving-successor array + one flag and
// chases the min-walk path from src here; nxt entries are wire TOPO
// positions, un-permuted here.
template <typename RowT>
static int finish_bulk_gate(void *h, const int64_t *idx, long long n_idx,
                            const RowT *dp, long long V, int lazy_walks,
                            int threads, long long *n_fast,
                            long long *n_fallback, char *err, int errlen) {
    auto &ctx = *(ExportCtx *) h;
    ensure_results(ctx);
    std::atomic<long long> fast{0}, fb{0};
    aln::Config cfg = ctx.cfg;
    cfg.lazy_walks = lazy_walks != 0;
    std::string werr;
    run_pool(threads, n_idx, [&](long long b) {
        long long i = idx[b];
        const auto &pc = ctx.packed[i];
        const RowT *row = dp + b * (V + 2);
        aln::i32 src = pc.graph.src;
        long long nv = (long long) pc.graph.adj.size();
        auto pos = [&](long long v) { return V - 1 - (long long) pc.kahn[v]; };
        if (row[V + 1] != (RowT) pos(src))
            throw std::runtime_error("device result row src mismatch");
        if (row[V]) {
            static thread_local std::vector<int32_t> inv;
            inv.assign((size_t) V, -1);
            for (long long v = 0; v < nv; v++) inv[pos(v)] = (int32_t) v;
            static thread_local std::vector<aln::i32> verts;
            verts.clear();
            const long long dpos = pos(pc.graph.dest);
            long long cur = pos(src);
            for (long long k = 0; k < V; k++) {
                if (cur < 0 || cur >= V || inv[cur] < 0)
                    throw std::runtime_error("device nxt entry out of range");
                verts.push_back(inv[cur]);
                if (cur == dpos) break;
                long long nx = row[cur];
                if (nx <= cur)  // achieving successors strictly increase
                    throw std::runtime_error("device nxt chain not increasing");
                cur = nx;
            }
            if (verts.front() != src || verts.back() != pc.graph.dest)
                throw std::runtime_error("device path endpoints mismatch");
            ctx.results[i] = aln::finish_from_path(pc.graph, verts.data(),
                                                   (int) verts.size(), cfg);
            fast.fetch_add(1);
        } else {
            ctx.results[i] = aln::solve_from_graph(pc.graph, cfg);
            fb.fetch_add(1);
        }
        format_result(ctx, i);
        ctx.done[i] = 1;
    }, werr);
    *n_fast = fast.load();
    *n_fallback = fb.load();
    if (!werr.empty()) {
        set_err(err, errlen, werr);
        return 1;
    }
    return 0;
}

extern "C" {

int aln_finish_bulk8(void *h, const int64_t *idx, long long n_idx,
                     const uint8_t *dp, long long V, int lazy_walks,
                     int threads, long long *n_fast, long long *n_fallback,
                     char *err, int errlen) {
    return finish_bulk_gate(h, idx, n_idx, dp, V, lazy_walks, threads,
                            n_fast, n_fallback, err, errlen);
}

int aln_finish_bulk16(void *h, const int64_t *idx, long long n_idx,
                      const int16_t *dp, long long V, int lazy_walks,
                      int threads, long long *n_fast, long long *n_fallback,
                      char *err, int errlen) {
    return finish_bulk_gate(h, idx, n_idx, dp, V, lazy_walks, threads,
                            n_fast, n_fallback, err, errlen);
}

int aln_solve_remaining(void *h, int lazy_walks, int threads,
                        long long *n_solved, char *err, int errlen) {
    // full native solve for every contig without a stored result:
    // singletons, oversize, dense-ineligible, export rejects
    auto &ctx = *(ExportCtx *) h;
    ensure_results(ctx);
    std::vector<long long> todo;
    for (size_t i = 0; i < ctx.done.size(); i++)
        if (!ctx.done[i]) todo.push_back((long long) i);
    aln::Config cfg = ctx.cfg;
    cfg.lazy_walks = lazy_walks != 0;
    std::string werr;
    run_pool(threads, (long long) todo.size(), [&](long long k) {
        long long i = todo[k];
        if (ctx.packed[i].built)
            ctx.results[i] = aln::solve_from_graph(ctx.packed[i].graph, cfg);
        else
            ctx.results[i] = aln::solve_contig(ctx.ds.contigs[i], cfg);
        format_result(ctx, i);
        ctx.done[i] = 1;
    }, werr);
    *n_solved = (long long) todo.size();
    if (!werr.empty()) {
        set_err(err, errlen, werr);
        return 1;
    }
    return 0;
}

int aln_solve_subset(void *h, const int64_t *idx, long long n_idx,
                     int lazy_walks, int threads, int format_out,
                     char *err, int errlen) {
    // full native solve for an explicit contig subset (multihost: each
    // rank solves the contigs congruent to its rank; the device
    // engine's non-device set solved on the overlap thread).
    // format_out != 0 pre-formats output parts inline (write_results
    // stays flush-only); rows-only consumers (multihost, resume) pass
    // 0 to skip the formatting cost — a re-solve must then invalidate
    // any previously formatted parts or write_results would flush
    // output stale against the stored result.
    auto &ctx = *(ExportCtx *) h;
    ensure_results(ctx);
    aln::Config cfg = ctx.cfg;
    cfg.lazy_walks = lazy_walks != 0;
    std::string werr;
    run_pool(threads, n_idx, [&](long long k) {
        long long i = idx[k];
        if (ctx.packed[i].built)
            ctx.results[i] = aln::solve_from_graph(ctx.packed[i].graph, cfg);
        else
            ctx.results[i] = aln::solve_contig(ctx.ds.contigs[i], cfg);
        if (format_out)
            format_result(ctx, i);
        else
            ctx.formatted[i] = 0;
        ctx.done[i] = 1;
    }, werr);
    if (!werr.empty()) {
        set_err(err, errlen, werr);
        return 1;
    }
    return 0;
}

int aln_prepare_results(void *h) {
    // pre-size the result store so concurrent finish/solve calls (the
    // device engine overlaps its non-device native solves with the
    // tunnel sync on a host thread) never race ensure_results' lazy
    // resize — after this call ensure_results is a no-op size check
    ensure_results(*(ExportCtx *) h);
    return 0;
}

int aln_build_graph_one(void *h, long long i, char *err, int errlen) {
    // build contig i's DAG on demand — the graph-axis (mesh-sharded)
    // path's contigs exceed the exporter's max_records build gate, and
    // building EVERY giant eagerly would waste the common case.  The
    // native build uses the same sparse cut tables as the solver (a
    // 20k-record contig builds in ~140 ms / 68 MB — the host side of
    // the >512 GB answer).  No-op when already built.
    auto &ctx = *(ExportCtx *) h;
    try {
        if (i < 0 || (size_t) i >= ctx.ds.contigs.size())
            throw std::runtime_error("build_graph_one: index out of range");
        auto &pc = ctx.packed[i];
        if (pc.built) return 0;
        if (!pc.error.empty()) throw std::runtime_error(pc.error);
        if (ctx.ds.contigs[i].size() < 2)
            throw std::runtime_error("build_graph_one: singleton contig");
        pc.graph = aln::build_graph(ctx.ds.contigs[i], ctx.cfg);
        compute_ranks(pc);
        pc.built = true;
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

int aln_edge_meta(void *h, long long i, int64_t *out6) {
    // [built, V, E, src, dest, n_records] for one contig's built DAG
    auto &ctx = *(ExportCtx *) h;
    const auto &pc = ctx.packed[i];
    out6[0] = pc.built ? 1 : 0;
    if (!pc.built) { std::fill(out6 + 1, out6 + 6, 0); return 0; }
    const auto &g = pc.graph;
    long long n_e = 0;
    for (const auto &a : g.adj) n_e += (long long) a.size();
    out6[1] = (int64_t) g.adj.size();
    out6[2] = n_e;
    out6[3] = g.src;
    out6[4] = g.dest;
    out6[5] = g.n;
    return 0;
}

int aln_export_edges(void *h, long long i, int32_t *eu, int32_t *ev,
                     int64_t *es, int32_t *ea, int32_t *enz, int32_t *etot,
                     int64_t *erank) {
    // u-major full-semiring edge arrays for the mesh-sharded relaxation
    // (parallel/mesh.py:make_edge_sharded_sp): es = q + r score sum,
    // ea/enz/etot the anomaly and mapq-fraction components, erank the
    // reversed-relaxation arrival rank (same layout as the Python
    // pack_graph, engine/device.py:48).
    auto &ctx = *(ExportCtx *) h;
    auto &pc = ctx.packed[i];
    if (!pc.built) return 1;
    compute_erank(pc);  // lazy: only the mesh path pays for it
    long long k = 0;
    for (size_t u = 0; u < pc.graph.adj.size(); u++)
        for (const auto &e : pc.graph.adj[u]) {
            eu[k] = (int32_t) u;
            ev[k] = (int32_t) e.to;
            es[k] = e.w.sum();
            ea[k] = (int32_t) e.w.a;
            enz[k] = (int32_t) e.w.nz;
            etot[k] = (int32_t) e.w.tot;
            erank[k] = pc.erank[(size_t) k];
            k++;
        }
    return 0;
}

int aln_finish_sharded(void *h, long long i, const int64_t *d_s,
                       const int64_t *d_a, long long V, int lazy_walks,
                       long long *was_fast, char *err, int errlen) {
    // finish one mesh-sharded contig from its device-computed
    // (d_s, d_a) suffix distances: the anomaly floor and both walk
    // counts are one cheap O(V + E) reverse-topo pass here (the
    // relaxation's O(E * sweeps) and its memory are what the mesh
    // distributed); then the same order-insensitivity gate as the
    // bucket finishes decides device-assisted fast path vs full native
    // solve.  Stores the result + formatted parts (write_results stays
    // flush-only).
    auto &ctx = *(ExportCtx *) h;
    try {
        ensure_results(ctx);
        const auto &pc = ctx.packed[i];
        if (!pc.built) throw std::runtime_error("finish_sharded: not built");
        const auto &g = pc.graph;
        const long long nv = (long long) g.adj.size();
        if (V != nv) throw std::runtime_error("finish_sharded: V mismatch");
        const int64_t INF = (int64_t) 1 << 62;
        const int64_t SAT = 10'001;
        std::vector<int64_t> fa((size_t) nv, INF), ct((size_t) nv, 0),
            cm((size_t) nv, 0);
        fa[g.dest] = 0;
        ct[g.dest] = 1;
        cm[g.dest] = 1;
        // kahn order (Kahn over the reversed graph) lists forward sinks
        // first: every successor is final before its predecessor runs
        std::vector<int32_t> order((size_t) nv);
        for (long long v = 0; v < nv; v++) order[pc.kahn[v]] = (int32_t) v;
        for (long long p = 0; p < nv; p++) {
            int32_t u = order[p];
            if (u == g.dest) continue;
            for (const auto &e : g.adj[u]) {
                if (fa[e.to] < INF)
                    fa[u] = std::min(fa[u], fa[e.to] + e.w.a);
                if (ct[e.to])
                    ct[u] = std::min(ct[u] + ct[e.to], SAT);
                if (cm[e.to] && d_s[e.to] < INF
                    && d_s[e.to] + e.w.sum() == d_s[u]
                    && d_a[e.to] + e.w.a == d_a[u])
                    cm[u] = std::min(cm[u] + cm[e.to], SAT);
            }
        }
        aln::Config cfg = ctx.cfg;
        cfg.lazy_walks = lazy_walks != 0;
        const aln::i32 src = g.src;
        bool fast = cm[src] == 1
                    && !(ct[src] >= 2 && d_a[src] != fa[src]);
        if (fast) {
            // cnt_min == 1 => exactly one achieving edge at every
            // vertex on the min walk (an achieving edge's target has
            // cnt_min >= 1), so a first-match chase is deterministic
            std::vector<aln::i32> verts;
            aln::i32 cur = src;
            verts.push_back(cur);
            while (cur != g.dest) {
                aln::i32 nxt = -1;
                for (const auto &e : g.adj[cur]) {
                    if (cm[e.to] && d_s[e.to] < INF
                        && d_s[e.to] + e.w.sum() == d_s[cur]
                        && d_a[e.to] + e.w.a == d_a[cur]) {
                        nxt = e.to;
                        break;
                    }
                }
                if (nxt < 0)
                    throw std::runtime_error(
                        "finish_sharded: achieving chain broken");
                verts.push_back(nxt);
                cur = nxt;
                if ((long long) verts.size() > nv)
                    throw std::runtime_error(
                        "finish_sharded: chain longer than V");
            }
            ctx.results[i] = aln::finish_from_path(g, verts.data(),
                                                   (int) verts.size(), cfg);
        } else {
            ctx.results[i] = aln::solve_from_graph(g, cfg);
        }
        format_result(ctx, i);
        ctx.done[i] = 1;
        if (was_fast) *was_fast = fast ? 1 : 0;
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

int aln_store_rows(void *h, long long contig_idx, const int64_t *rows,
                   long long n_out, long long n_alt, const int64_t *gsizes,
                   long long n_groups, char *err, int errlen) {
    // store externally-computed results for ONE contig (e.g. the mesh
    // edge-sharded Python solve of a 512 GB-class contig) so
    // write_results serializes them and solve_remaining skips the
    // contig — the rest of the dataset keeps the native plane.
    // rows: 6 x i64 [ctg_index, qs, qe, rs, re, alt] — n_out main
    // rows, then n_alt alt rows, then sum(gsizes) max-group rows.
    auto &ctx = *(ExportCtx *) h;
    try {
        ensure_results(ctx);
        if (contig_idx < 0 || (size_t) contig_idx >= ctx.results.size())
            throw std::runtime_error("store_rows: contig index out of range");
        auto unpack = [&](long long lo, long long hi) {
            std::vector<aln::OutRow> out;
            out.reserve((size_t) (hi - lo));
            for (long long k = lo; k < hi; k++) {
                const int64_t *r = rows + k * 6;
                out.push_back({(aln::i32) r[0], r[1], r[2], r[3], r[4],
                               r[5] != 0});
            }
            return out;
        };
        auto &res = ctx.results[contig_idx];
        res.out = unpack(0, n_out);
        res.alt = unpack(n_out, n_out + n_alt);
        res.max_out.clear();
        long long x = n_out + n_alt;
        for (long long g = 0; g < n_groups; g++) {
            res.max_out.push_back(unpack(x, x + gsizes[g]));
            x += gsizes[g];
        }
        format_result(ctx, contig_idx);
        ctx.done[contig_idx] = 1;
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

int aln_write_results(void *h, const char *out_prefix, int threads,
                      char *err, int errlen) {
    // the finish workers already formatted each contig's output parts;
    // format any stragglers (e.g. results stored through paths that
    // skip formatting), then the write is just three ordered flushes
    auto &ctx = *(ExportCtx *) h;
    try {
        ensure_results(ctx);
        size_t n = ctx.ds.contigs.size();
        std::vector<long long> todo;
        for (size_t i = 0; i < n; i++)
            if (ctx.done[i] && !ctx.formatted[i]) todo.push_back((long long) i);
        std::string werr;
        run_pool(threads, (long long) todo.size(),
                 [&](long long k) { format_result(ctx, todo[k]); }, werr);
        if (!werr.empty()) throw std::runtime_error(werr);
        std::string prefix(out_prefix);
        aln::flush_three(prefix, ctx.pout, ctx.palt, ctx.pmax,
                         threads == 1 ? 1 : 3);
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

long long aln_results_counts(void *h, int64_t *counts) {
    // counts rows: (n, 3) i64 [out_rows, alt_rows, max_groups];
    // returns the total number of max groups
    auto &ctx = *(ExportCtx *) h;
    ensure_results(ctx);
    long long total_groups = 0;
    for (size_t i = 0; i < ctx.results.size(); i++) {
        const auto &r = ctx.results[i];
        counts[i * 3 + 0] = (int64_t) r.out.size();
        counts[i * 3 + 1] = (int64_t) r.alt.size();
        counts[i * 3 + 2] = (int64_t) r.max_out.size();
        total_groups += (long long) r.max_out.size();
    }
    return total_groups;
}

int aln_results_group_sizes(void *h, int64_t *gsizes) {
    auto &ctx = *(ExportCtx *) h;
    long long g = 0;
    for (const auto &r : ctx.results)
        for (const auto &grp : r.max_out) gsizes[g++] = (int64_t) grp.size();
    return 0;
}

int aln_results_fill(void *h, int64_t *main_rows, int64_t *alt_rows,
                     int64_t *max_rows) {
    auto &ctx = *(ExportCtx *) h;
    long long m = 0, a = 0, x = 0;
    for (const auto &r : ctx.results) {
        fill_rows(r.out, main_rows + m * 6);
        m += (long long) r.out.size();
        fill_rows(r.alt, alt_rows + a * 6);
        a += (long long) r.alt.size();
        for (const auto &grp : r.max_out) {
            fill_rows(grp, max_rows + x * 6);
            x += (long long) grp.size();
        }
    }
    return 0;
}

// subset variants: only the given contig indices — chunked consumers
// (resume) must not pay an all-contigs scan per chunk
long long aln_results_counts_subset(void *h, const int64_t *idx,
                                    long long n_idx, int64_t *counts) {
    auto &ctx = *(ExportCtx *) h;
    ensure_results(ctx);
    long long total_groups = 0;
    for (long long k = 0; k < n_idx; k++) {
        const auto &r = ctx.results[idx[k]];
        counts[k * 3 + 0] = (int64_t) r.out.size();
        counts[k * 3 + 1] = (int64_t) r.alt.size();
        counts[k * 3 + 2] = (int64_t) r.max_out.size();
        total_groups += (long long) r.max_out.size();
    }
    return total_groups;
}

int aln_results_group_sizes_subset(void *h, const int64_t *idx,
                                   long long n_idx, int64_t *gsizes) {
    auto &ctx = *(ExportCtx *) h;
    long long g = 0;
    for (long long k = 0; k < n_idx; k++)
        for (const auto &grp : ctx.results[idx[k]].max_out)
            gsizes[g++] = (int64_t) grp.size();
    return 0;
}

int aln_results_fill_subset(void *h, const int64_t *idx, long long n_idx,
                            int64_t *gsizes, int64_t *main_rows,
                            int64_t *alt_rows, int64_t *max_rows) {
    auto &ctx = *(ExportCtx *) h;
    long long m = 0, a = 0, x = 0, g = 0;
    for (long long k = 0; k < n_idx; k++) {
        const auto &r = ctx.results[idx[k]];
        fill_rows(r.out, main_rows + m * 6);
        m += (long long) r.out.size();
        fill_rows(r.alt, alt_rows + a * 6);
        a += (long long) r.alt.size();
        for (const auto &grp : r.max_out) {
            gsizes[g++] = (int64_t) grp.size();
            fill_rows(grp, max_rows + x * 6);
            x += (long long) grp.size();
        }
    }
    return 0;
}

}  // extern "C"

// ---- native output writing for externally-computed rows ---------------
// rows: flat [ctg_index, qs, qe, rs, re, alt] i64 per row;
// offsets: per-contig row starts into `rows` (n_contigs + 1 entries).
// max mode adds group offsets: per contig, groups partition its rows.

extern "C" {

int aln_write_outputs(void *h, const char *out_prefix,
                      const int64_t *main_rows, const int64_t *main_off,
                      const int64_t *alt_rows, const int64_t *alt_off,
                      const int64_t *max_rows, const int64_t *max_goff,
                      const int64_t *max_gcnt_off, int threads,
                      char *err, int errlen) {
    auto &ctx = *(ExportCtx *) h;
    try {
        size_t n = ctx.ds.contigs.size();
        auto unpack = [](const int64_t *rows, int64_t lo, int64_t hi) {
            std::vector<aln::OutRow> out;
            out.reserve((size_t) (hi - lo));
            for (int64_t k = lo; k < hi; k++) {
                const int64_t *r = rows + k * 6;
                out.push_back({(aln::i32) r[0], r[1], r[2], r[3], r[4], r[5] != 0});
            }
            return out;
        };
        std::vector<std::vector<aln::OutRow>> mains(n), alts(n);
        std::vector<std::vector<std::vector<aln::OutRow>>> maxes(n);
        for (size_t i = 0; i < n; i++) {
            mains[i] = unpack(main_rows, main_off[i], main_off[i + 1]);
            alts[i] = unpack(alt_rows, alt_off[i], alt_off[i + 1]);
            // groups of contig i: indices [max_gcnt_off[i], max_gcnt_off[i+1])
            for (int64_t gi = max_gcnt_off[i]; gi < max_gcnt_off[i + 1]; gi++)
                maxes[i].push_back(unpack(max_rows, max_goff[gi], max_goff[gi + 1]));
        }
        std::string prefix(out_prefix);
        aln::write_rows(ctx.ds, mains, prefix + ".aln.paf", threads);
        aln::write_rows(ctx.ds, alts, prefix + ".aln.alt.paf", threads);
        aln::write_max_rows(ctx.ds, maxes, prefix + ".aln.all.paf", threads);
        return 0;
    } catch (const std::exception &e) {
        set_err(err, errlen, e.what());
        return 1;
    }
}

}  // extern "C"
