// Minimal stand-in for p-ranav/argparse covering only the flags the
// reference binary declares (alignasm.cpp:30-57).  Not a copy of upstream.
#ifndef ORACLE_STUB_ARGPARSE_HPP
#define ORACLE_STUB_ARGPARSE_HPP

#include <map>
#include <ostream>
#include <stdexcept>
#include <string>
#include <vector>

namespace argparse {

class Argument {
public:
    Argument &help(const std::string &) { return *this; }
    Argument &required() { required_ = true; return *this; }
    Argument &nargs(int) { return *this; }
    template <typename T> Argument &default_value(T v) {
        if constexpr (std::is_same_v<T, int>) int_ = v;
        else if constexpr (std::is_same_v<T, double>) dbl_ = v;
        else if constexpr (std::is_same_v<T, bool>) bool_ = v;
        has_default_ = true;
        return *this;
    }
    template <char C, typename T> Argument &scan() { return *this; }
    Argument &metavar(const std::string &) { return *this; }
    Argument &implicit_value(bool v) { implicit_ = v; flag_ = true; return *this; }

    bool required_ = false;
    bool has_default_ = false;
    bool flag_ = false;
    bool implicit_ = true;
    bool used_ = false;
    int int_ = 0;
    double dbl_ = 0.0;
    bool bool_ = false;
    std::string str_;
};

class ArgumentParser {
public:
    ArgumentParser(std::string name, std::string version) : name_(std::move(name)) {}

    Argument &add_argument(const std::string &name) {
        order_.push_back(name);
        return args_[name];
    }
    Argument &add_argument(const std::string &s, const std::string &l) {
        order_.push_back(l);
        alias_[s] = l;
        return args_[l];
    }

    void parse_args(int argc, char **argv) {
        std::vector<std::string> positional_names;
        for (const auto &n : order_)
            if (n[0] != '-') positional_names.push_back(n);
        size_t pos_i = 0;
        for (int i = 1; i < argc; ++i) {
            std::string tok = argv[i];
            if (!tok.empty() && tok[0] == '-' && tok.size() > 1 && !isdigit(tok[1])) {
                auto it = alias_.find(tok);
                std::string key = it != alias_.end() ? it->second : tok;
                auto ait = args_.find(key);
                if (ait == args_.end()) throw std::runtime_error("unknown flag " + tok);
                Argument &a = ait->second;
                a.used_ = true;
                if (a.flag_) {
                    a.bool_ = a.implicit_;
                } else {
                    if (i + 1 >= argc) throw std::runtime_error("missing value for " + tok);
                    a.str_ = argv[++i];
                    try { a.int_ = std::stoi(a.str_); } catch (...) {}
                    try { a.dbl_ = std::stod(a.str_); } catch (...) {}
                }
            } else {
                if (pos_i >= positional_names.size())
                    throw std::runtime_error("unexpected positional " + tok);
                Argument &a = args_[positional_names[pos_i++]];
                a.used_ = true;
                a.str_ = tok;
            }
        }
        for (const auto &n : order_) {
            const Argument &a = args_.at(n);
            if (a.required_ && !a.used_) throw std::runtime_error("missing required " + n);
        }
    }

    template <typename T> T get(const std::string &name) const {
        auto it = alias_.find(name);
        const Argument &a = args_.at(it != alias_.end() ? it->second : name);
        if constexpr (std::is_same_v<T, std::string>) return a.str_;
        else if constexpr (std::is_same_v<T, int>) return a.used_ ? a.int_ : a.int_;
        else if constexpr (std::is_same_v<T, double>) return a.dbl_;
        else if constexpr (std::is_same_v<T, bool>) return a.bool_;
    }

    bool is_used(const std::string &name) const {
        auto it = alias_.find(name);
        return args_.at(it != alias_.end() ? it->second : name).used_;
    }

    friend std::ostream &operator<<(std::ostream &os, const ArgumentParser &p) {
        os << "usage: " << p.name_ << " <PAF_LOC> [-t N] [-a ALT] [-b B] [--non_skip_linkable]\n";
        return os;
    }

private:
    std::string name_;
    std::map<std::string, Argument> args_;
    std::map<std::string, std::string> alias_;
    std::vector<std::string> order_;
};

}  // namespace argparse

#endif
