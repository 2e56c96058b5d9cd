// Harness: drives the reference's PQVec (std::priority_queue subclass)
// with a push/pop script and dumps the RAW heap array after every op,
// so the Python replica (alignasm_tpu/engine/pqvec.py) can be checked
// for exact libstdc++ array layout (the single-piece candidate loops
// iterate the raw array, so layout is behavior).
//
// stdin:  lines "P <a> <b>" (push pair) or "O" (pop); "E" ends a case.
// stdout: after each op, one line "<n> a0 b0 a1 b1 ...".
#include "priority_queue_vector.hpp"

#include <cstdint>
#include <iostream>
#include <string>

int main() {
    PQVec<std::pair<int64_t, int64_t>, std::vector<std::pair<int64_t, int64_t>>,
          std::greater<>> pq;
    std::string op;
    while (std::cin >> op) {
        if (op == "P") {
            int64_t a, b;
            std::cin >> a >> b;
            pq.emplace(a, b);
        } else if (op == "O") {
            pq.pop();
        } else if (op == "E") {
            std::cout << "END\n";
            pq = {};
            continue;
        }
        const auto &v = pq.getVector();
        std::cout << v.size();
        for (const auto &[a, b] : v) std::cout << ' ' << a << ' ' << b;
        std::cout << '\n';
    }
    return 0;
}
