// Prints the exact element order std::sort produces for (a,b,tag) rows
// compared by (a,b) only — validates the Python introsort replica.
// stdin: n, then n lines "a b tag". stdout: tags in sorted order.
#include <algorithm>
#include <iostream>
#include <vector>

struct Row {
    long a, b, tag;
    bool operator<(const Row &o) const {
        if (a != o.a) return a < o.a;
        return b < o.b;
    }
};

int main() {
    size_t n;
    std::cin >> n;
    std::vector<Row> v(n);
    for (auto &r : v) std::cin >> r.a >> r.b >> r.tag;
    std::sort(v.begin(), v.end());
    for (auto &r : v) std::cout << r.tag << ' ';
    std::cout << '\n';
}
