// No-op stand-in for p-ranav/indicators: keeps the oracle binary quiet.
#ifndef ORACLE_STUB_INDICATORS_HPP
#define ORACLE_STUB_INDICATORS_HPP

#include <cstddef>
#include <string>

namespace indicators {

namespace option {
struct BarWidth { explicit BarWidth(std::size_t) {} };
struct MaxProgress { explicit MaxProgress(std::size_t) {} };
struct PrefixText { explicit PrefixText(std::string) {} };
struct PostfixText { explicit PostfixText(std::string) {} };
}  // namespace option

class ProgressBar {
public:
    template <typename... Opts> explicit ProgressBar(Opts &&...) {}
    template <typename Opt> void set_option(Opt &&) {}
    void tick() {}
};

inline void show_console_cursor(bool) {}

}  // namespace indicators

#endif
