// Debug harness: runs the reference k-shortest-walks solver on a graph
// dump (built by the Python engine) so enumeration order can be compared
// element-by-element.  Input on stdin:
//   n src dest k
//   u v qry ref anom nz tot        (one line per edge, insertion order)
// Output: one line per emitted walk: "idx qry ref anom nz tot | path"
#include "paf_data.hpp"
#include "graph_operations.hpp"
#include "k_shortest_walks.hpp"

#include <iostream>

bool NON_SKIP_LINKABLE = false;
thread_local PafDistanceCompareMode PafDistance::cmp_mode =
    PafDistanceCompareMode::CALC_SUM_MODE;

int main() {
    int64_t n, src, dest, k, m;
    while (std::cin >> n >> src >> dest >> k >> m) {
        Graph<PafDistance> g(n);
        int64_t u, v, q, r, a, nz, tot;
        for (int64_t e = 0; e < m; e++) {
            std::cin >> u >> v >> q >> r >> a >> nz >> tot;
            add_edge(g, u, v, PafDistance(true, q, r, a, nz, tot));
        }
        kShortestWalksSolver solver(g, PafDistance::max(), PafDistance(true), true, false);
        auto dists = solver.k_shortest_walks(src, dest, k);
        for (int64_t i = 0; i < (int64_t) dists.size(); i++) {
            const auto &d = dists[i];
            std::cout << i << ' ' << d.qry_score << ' ' << d.ref_score << ' ' << d.anom
                      << ' ' << d.qul_nonzero << ' ' << d.qul_total << " |";
            for (auto &[x, y, w] : solver.kth_shortest_walk_recover(src, dest, i, false)) {
                std::cout << ' ' << x << "->" << y;
            }
            std::cout << '\n';
        }
        std::cout << "END\n";
    }
    return 0;
}
