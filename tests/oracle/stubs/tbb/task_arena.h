#ifndef ORACLE_STUB_TBB_TASK_ARENA_H
#define ORACLE_STUB_TBB_TASK_ARENA_H
#include "parallel_for.h"
#endif
