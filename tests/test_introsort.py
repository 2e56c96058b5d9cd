"""introsort replica vs the real libstdc++ std::sort, element-for-element
(tags distinguish equal-key elements — SURVEY hard part 1)."""

import pathlib
import random
import subprocess

import pytest

HARNESS_SRC = pathlib.Path(__file__).parent / "oracle" / "sort_harness.cpp"
HARNESS_BIN = pathlib.Path(__file__).parent / "oracle" / "bin" / "sort_harness"


@pytest.fixture(scope="module")
def sort_harness(oracle_bin):
    if not HARNESS_BIN.exists():
        HARNESS_BIN.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["g++", "-std=c++20", "-O2", str(HARNESS_SRC), "-o", str(HARNESS_BIN)],
            check=True, capture_output=True,
        )
    return HARNESS_BIN


def _cxx_sort(harness, rows):
    inp = f"{len(rows)}\n" + "\n".join(f"{a} {b} {t}" for a, b, t in rows)
    out = subprocess.run([str(harness)], input=inp, capture_output=True,
                         text=True, check=True)
    return [int(t) for t in out.stdout.split()]


@pytest.mark.parametrize("seed", range(5))
def test_matches_std_sort_element_movement(sort_harness, seed):
    from alignasm_tpu.engine.introsort import libstdcxx_sort

    rng = random.Random(seed)
    for n in (2, 16, 17, 40, 257):
        rows = [(rng.randrange(0, max(2, n // 3)), rng.randrange(0, 2), i)
                for i in range(n)]
        want = _cxx_sort(sort_harness, rows)
        mine = list(rows)
        libstdcxx_sort(mine, lambda x, y: (x[0], x[1]) < (y[0], y[1]))
        assert [t for _a, _b, t in mine] == want, f"n={n}"


def test_adversarial_patterns(sort_harness):
    from alignasm_tpu.engine.introsort import libstdcxx_sort

    for rows in (
        [(i, 0, i) for i in range(100)],            # sorted
        [(100 - i, 0, i) for i in range(100)],      # reversed
        [(0, 0, i) for i in range(100)],            # all equal
        [(min(i, 100 - i), 0, i) for i in range(101)],  # organ pipe
    ):
        want = _cxx_sort(sort_harness, rows)
        mine = list(rows)
        libstdcxx_sort(mine, lambda x, y: (x[0], x[1]) < (y[0], y[1]))
        assert [t for _a, _b, t in mine] == want
