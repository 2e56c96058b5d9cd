// Oracle-build stand-in: map semantics are all the reference uses
// (lookup/insert; no ordered iteration), so std::unordered_map suffices.
#ifndef ORACLE_STUB_UNORDERED_DENSE_H
#define ORACLE_STUB_UNORDERED_DENSE_H

#include <unordered_map>

namespace ankerl::unordered_dense {
template <typename K, typename V>
using map = std::unordered_map<K, V>;
}

#endif
