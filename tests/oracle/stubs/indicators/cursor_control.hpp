#ifndef ORACLE_STUB_INDICATORS_CURSOR_HPP
#define ORACLE_STUB_INDICATORS_CURSOR_HPP
#include "progress_bar.hpp"
#endif
