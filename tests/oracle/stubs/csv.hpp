// Minimal stand-in for vinniefalco/csv-parser's csv.hpp, covering only the
// API surface the reference binary uses (tab-delimited, headerless,
// variable-column reads + a TSV writer).  Written from scratch for the
// oracle build; not a copy of the upstream library.
#ifndef ORACLE_STUB_CSV_HPP
#define ORACLE_STUB_CSV_HPP

#include <charconv>
#include <cstdint>
#include <fstream>
#include <stdexcept>
#include <string>
#include <string_view>
#include <vector>

namespace csv {

enum class VariableColumnPolicy { THROW, IGNORE_ROW, KEEP };

class CSVFormat {
public:
    CSVFormat &delimiter(char d) { delim_ = d; return *this; }
    CSVFormat &variable_columns(bool) { return *this; }
    CSVFormat &variable_columns(VariableColumnPolicy) { return *this; }
    CSVFormat &no_header() { return *this; }
    char delim_ = ',';
};

class CSVField {
public:
    explicit CSVField(std::string_view sv) : sv_(sv) {}
    template <typename T> T get() const;
private:
    std::string_view sv_;
};

template <> inline std::string CSVField::get<std::string>() const { return std::string(sv_); }
template <> inline std::string_view CSVField::get<std::string_view>() const { return sv_; }
template <> inline double CSVField::get<double>() const { return std::stod(std::string(sv_)); }
template <typename T> inline T CSVField::get() const {
    long long v = 0;
    auto res = std::from_chars(sv_.data(), sv_.data() + sv_.size(), v);
    if (res.ec != std::errc{}) throw std::runtime_error("bad integer field");
    return static_cast<T>(v);
}

class CSVRow {
public:
    void reset(std::string line, char delim) {
        line_ = std::move(line);
        fields_.clear();
        size_t start = 0;
        while (true) {
            size_t pos = line_.find(delim, start);
            if (pos == std::string::npos) {
                fields_.emplace_back(start, line_.size() - start);
                break;
            }
            fields_.emplace_back(start, pos - start);
            start = pos + 1;
        }
    }
    size_t size() const { return fields_.size(); }
    CSVField operator[](size_t i) const {
        auto [off, len] = fields_[i];
        return CSVField(std::string_view(line_).substr(off, len));
    }
private:
    std::string line_;
    std::vector<std::pair<size_t, size_t>> fields_;
};

class CSVReader {
public:
    CSVReader(const std::string &filename, const CSVFormat &fmt)
        : in_(filename), delim_(fmt.delim_) {
        if (!in_) throw std::runtime_error("cannot open " + filename);
    }

    class iterator {
    public:
        iterator(CSVReader *r, bool end) : r_(r), end_(end) { if (!end_) advance(); }
        CSVRow &operator*() { return row_; }
        iterator &operator++() { advance(); return *this; }
        bool operator!=(const iterator &o) const { return end_ != o.end_; }
    private:
        void advance() {
            std::string line;
            while (std::getline(r_->in_, line)) {
                if (!line.empty() && line.back() == '\r') line.pop_back();
                if (line.empty()) continue;
                row_.reset(std::move(line), r_->delim_);
                return;
            }
            end_ = true;
        }
        CSVReader *r_;
        bool end_;
        CSVRow row_;
    };

    iterator begin() { return iterator(this, false); }
    iterator end() { return iterator(this, true); }

private:
    std::ifstream in_;
    char delim_;
    friend class iterator;
};

template <typename Stream, char Delim>
class DelimWriter {
public:
    explicit DelimWriter(Stream &out) : out_(out) {}
    DelimWriter &operator<<(const std::vector<std::string> &row) {
        bool first = true;
        for (const auto &f : row) {
            if (!first) out_ << Delim;
            first = false;
            out_ << f;
        }
        out_ << '\n';
        return *this;
    }
private:
    Stream &out_;
};

template <typename Stream>
DelimWriter<Stream, '\t'> make_tsv_writer(Stream &out) {
    return DelimWriter<Stream, '\t'>(out);
}

}  // namespace csv

#endif
