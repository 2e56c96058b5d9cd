#include "io.h"

#include <atomic>
#include <charconv>
#include <thread>
#include <cstdio>
#include <fstream>
#include <stdexcept>

#include "cs.h"

namespace aln {

namespace {

std::string slurp(const std::string &path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) throw std::runtime_error("cannot open " + path);
    std::string buf;
    in.seekg(0, std::ios::end);
    buf.resize((size_t) in.tellg());
    in.seekg(0);
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

// split one line into tab fields (no copies)
void split_fields(std::string_view line, std::vector<std::string_view> &out) {
    out.clear();
    size_t start = 0;
    while (true) {
        size_t pos = line.find('\t', start);
        if (pos == std::string_view::npos) {
            out.push_back(line.substr(start));
            return;
        }
        out.push_back(line.substr(start, pos - start));
        start = pos + 1;
    }
}

std::string_view find_cs(const std::vector<std::string_view> &f) {
    for (size_t i = 12; i < f.size(); i++)
        if (f[i].substr(0, 5) == "cs:Z:") return f[i];
    return {};
}

Record parse_record(const std::vector<std::string_view> &f, Dataset &ds,
                    i64 qry_offset = 0) {
    Record r;
    r.qry_total = to_i64(f[1]);
    r.qry_str = to_i64(f[2]) + qry_offset;
    r.qry_end = to_i64(f[3]) + qry_offset - 1;  // half-open -> closed
    if (r.qry_str > r.qry_end) throw std::runtime_error("qry start > end");
    r.ref_total = to_i64(f[6]);
    r.ref_str = to_i64(f[7]);
    r.ref_end = to_i64(f[8]) - 1;
    if (r.ref_str > r.ref_end) throw std::runtime_error("ref start > end");
    auto it = ds.chr_ids.find(f[5]);  // heterogeneous: no key alloc
    if (it == ds.chr_ids.end()) {
        std::string ref_chr(f[5]);
        it = ds.chr_ids.emplace(ref_chr, (i32) ds.chr_names.size()).first;
        ds.chr_names.push_back(ref_chr);
    }
    r.ref_chr = it->second;
    r.fwd = f[4][0] == '+';
    if (!r.fwd) std::swap(r.ref_str, r.ref_end);
    r.map_qul = (uint8_t) to_i64(f[11]);
    r.mat_num = (i32) to_i64(f[9]);
    r.aln_len = (i32) to_i64(f[10]);
    r.cs = find_cs(f);
    if (r.cs.empty()) throw std::runtime_error("missing cs:Z tag");
    build_runs(r);
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

Dataset read_paf(const std::string &path, int threads) {
    Dataset ds;
    ds.buffer = slurp(path);

    // pass 1 (serial): line spans + chromosome interning in
    // first-appearance order (ids must match the reference's); also
    // capture each line's query-name span so pass 3 need not rescan.
    // Names repeat run-length-wise (rows are grouped by contig, refs
    // cluster by chromosome), so a last-seen cache skips nearly every
    // hash lookup, and the heterogeneous map skips the key alloc on
    // the rest.
    std::vector<std::string_view> lines;
    for_lines(ds.buffer, [&](std::string_view line) { lines.push_back(line); });
    if (lines.empty()) throw std::runtime_error("empty PAF input");
    std::vector<std::string_view> qry_names(lines.size());
    {
        std::string_view last_chr;
        for (size_t i = 0; i < lines.size(); i++) {
            std::string_view line = lines[i];
            size_t q_end = line.find('\t');
            if (q_end == std::string_view::npos)
                throw std::runtime_error("short PAF row");
            qry_names[i] = line.substr(0, q_end);
            // scan to field 5 (ref chr) cheaply
            size_t pos = q_end + 1;
            for (int k = 0; k < 4; k++) {
                pos = line.find('\t', pos);
                if (pos == std::string_view::npos)
                    throw std::runtime_error("short PAF row");
                pos++;
            }
            size_t end = line.find('\t', pos);
            std::string_view name = line.substr(pos, end - pos);
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

    // pass 2 (parallel): full record parse per line
    std::vector<Record> recs(lines.size());
    auto parse_range = [&](size_t lo, size_t hi, std::string *fail) {
        std::vector<std::string_view> f;
        try {
            for (size_t i = lo; i < hi; i++) {
                split_fields(lines[i], f);
                recs[i] = parse_record(f, ds);
                recs[i].cord_type = 0;
                recs[i].cord_row = (i32) i;
            }
        } catch (const std::exception &e) {
            *fail = e.what();
        }
    };
    int nt = std::max(1, threads);
    if (nt == 1 || lines.size() < 256) {
        std::string fail;
        parse_range(0, lines.size(), &fail);
        if (!fail.empty()) throw std::runtime_error(fail);
    } else {
        std::vector<std::thread> pool;
        std::vector<std::string> fails(nt);
        size_t chunk = (lines.size() + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            size_t lo = t * chunk, hi = std::min(lines.size(), lo + chunk);
            if (lo >= hi) break;
            pool.emplace_back(parse_range, lo, hi, &fails[t]);
        }
        for (auto &th : pool) th.join();
        for (auto &msg : fails)
            if (!msg.empty()) throw std::runtime_error(msg);
    }

    // pass 3 (serial): group into contigs on query-name change; the
    // name spans were captured in pass 1, the map entry (reference
    // semantics: last same-named group wins) is written once per group
    std::string_view cur_name = qry_names[0];
    i32 paf_index = 0;
    std::vector<Record> cur;
    auto open_group = [&](std::string_view name) {
        auto it = ds.paf_map.find(name);
        if (it != ds.paf_map.end()) it->second = paf_index;
        else ds.paf_map.emplace(std::string(name), paf_index);
    };
    open_group(cur_name);
    for (size_t i = 0; i < lines.size(); i++) {
        std::string_view qry = qry_names[i];
        if (qry != cur_name) {
            ds.contigs.push_back(std::move(cur));
            ds.ctg_names.emplace_back(cur_name);
            cur = {};
            cur_name = qry;
            paf_index++;
            open_group(cur_name);
        }
        recs[i].ctg_index = (i32) cur.size();
        cur.push_back(std::move(recs[i]));
    }
    ds.contigs.push_back(std::move(cur));
    ds.ctg_names.emplace_back(cur_name);
    return ds;
}

void merge_alt(Dataset &ds, const std::string &alt_path, double alt_baseline) {
    ds.alt_buffer = slurp(alt_path);
    if (ds.alt_buffer.empty()) return;

    std::string tar_name;
    i64 tar_off = -1;
    bool tar_flag = false, tar_init = false;
    double tar_ratio = 0;
    Record ratio_max;
    bool have_ratio_max = false;

    auto flush = [&]() {
        if (!tar_init || tar_flag) return;
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

        const auto &last = ds.contigs[ds.paf_map.at(real)].back();
        Record r = parse_record(f, ds, off);
        r.qry_total = last.qry_total;
        r.cord_type = 1;
        r.cord_row = row++;

        if (!tar_init || tar_off != off || tar_name != real) {
            flush();
            tar_init = true;
            tar_flag = false;
            tar_ratio = 0;
            tar_off = off;
            tar_name = real;
            have_ratio_max = false;
        }
        double ratio = to_f64(f[10]) / to_f64(f[1]);
        if (ratio > tar_ratio) {
            tar_ratio = ratio;
            ratio_max = r;
            have_ratio_max = true;
        }
        if (ratio > alt_baseline) {
            auto &target = ds.contigs[ds.paf_map.at(real)];
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
    Clip clip = clip_cs(rec, row.qs, row.qe, row.rs, row.re);
    out += name;
    out += '\t'; append_i64(out, rec.qry_total);
    out += '\t'; append_i64(out, row.qs);
    out += '\t'; append_i64(out, row.qe + 1);
    out += '\t'; out += rec.fwd ? '+' : '-';
    out += '\t'; out += ds.chr_names[rec.ref_chr];
    out += '\t'; append_i64(out, rec.ref_total);
    out += '\t'; append_i64(out, rec.fwd ? row.rs : row.re);
    out += '\t'; append_i64(out, (rec.fwd ? row.re : row.rs) + 1);
    out += '\t'; append_i64(out, clip.mat_num);
    out += '\t'; append_i64(out, clip.aln_len);
    out += '\t'; append_i64(out, rec.map_qul);
    out += '\t'; out += row.alt_flag ? "tp:A:S" : "tp:A:P";
    out += '\t'; out += "xi:Z:";
    out += rec.cord_type == 0 ? "P_" : "A_";
    append_i64(out, rec.cord_row);
    out += '\t'; out += clip.cs;
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
    std::ofstream o(path, std::ios::binary);
    if (!o) throw std::runtime_error("cannot write " + path);
    for (const auto &p : parts)
        if (!p.empty()) o.write(p.data(), (std::streamsize) p.size());
}

}  // namespace

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
            for (const auto &row : rows[i])
                write_one(out, ds, ds.ctg_names[i], ds.contigs[i], row);
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
                for (const auto &row : rows[i])
                    write_one(parts[i], ds, ds.ctg_names[i], ds.contigs[i], row);
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
        i32 cnt = 0;
        for (const auto &group : rows[i]) {
            ++cnt;
            std::string name = ds.ctg_names[i] + "." + std::to_string(cnt);
            for (const auto &row : group)
                write_one(out, ds, name, ds.contigs[i], row);
        }
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

}  // namespace aln
