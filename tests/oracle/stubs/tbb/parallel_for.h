// std::thread-backed stand-in for the TBB subset the reference uses
// (task_arena + parallel_for over a blocked_range, alignasm.cpp:346-361).
// Gives honest multicore reference baselines without vcpkg.
#ifndef ORACLE_STUB_TBB_PARALLEL_FOR_H
#define ORACLE_STUB_TBB_PARALLEL_FOR_H

#include <algorithm>
#include <atomic>
#include <cstddef>
#include <thread>
#include <vector>

namespace tbb {

template <typename Index>
class blocked_range {
public:
    blocked_range(Index b, Index e) : begin_(b), end_(e) {}
    Index begin() const { return begin_; }
    Index end() const { return end_; }
private:
    Index begin_, end_;
};

namespace detail {
inline int &arena_threads() {
    static thread_local int n = 1;
    return n;
}
}  // namespace detail

template <typename Index, typename Body>
void parallel_for(const blocked_range<Index> &range, const Body &body) {
    const int nthreads = std::max(1, detail::arena_threads());
    const Index total = range.end() - range.begin();
    if (nthreads == 1 || total <= 1) {
        body(range);
        return;
    }
    // dynamic chunking for load balance: contig sizes are highly skewed
    std::atomic<Index> next{range.begin()};
    std::vector<std::thread> workers;
    workers.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) {
        workers.emplace_back([&] {
            while (true) {
                Index i = next.fetch_add(1);
                if (i >= range.end()) break;
                body(blocked_range<Index>(i, i + 1));
            }
        });
    }
    for (auto &w : workers) w.join();
}

class task_arena {
public:
    explicit task_arena(int n) : n_(n) {}
    template <typename F> void execute(const F &f) {
        detail::arena_threads() = n_;
        f();
        detail::arena_threads() = 1;
    }
private:
    int n_;
};

}  // namespace tbb

#endif
