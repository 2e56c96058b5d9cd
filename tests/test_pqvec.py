"""PQVec heap-layout replication vs the reference's std::priority_queue
(tests/oracle/pqvec_harness) — the single-piece candidate loops iterate
the RAW heap array, so the array layout is behavior."""

import pathlib
import random
import subprocess

import pytest

HARNESS = pathlib.Path(__file__).parent / "oracle" / "bin" / "pqvec_harness"


@pytest.fixture(scope="module")
def harness(oracle_bin):
    if not HARNESS.exists():
        subprocess.run(
            ["make", "-C", str(HARNESS.parent.parent), "bin/pqvec_harness"],
            check=True, capture_output=True,
        )
    return HARNESS


@pytest.mark.parametrize("seed", range(6))
def test_heap_array_layout_matches_libstdcxx(harness, seed):
    from alignasm_tpu.engine.pqvec import PQVec

    rng = random.Random(seed)
    script = []
    ops = []
    size = 0
    for _ in range(rng.randrange(30, 120)):
        if size and rng.random() < 0.35:
            script.append("O")
            ops.append(("O",))
            size -= 1
        else:
            a, b = rng.randrange(0, 20), rng.randrange(0, 1000)
            script.append(f"P {a} {b}")
            ops.append(("P", a, b))
            size += 1
    ref_lines = subprocess.run(
        [str(harness)], input="\n".join(script) + "\nE\n",
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()

    pq = PQVec()
    for step, op in enumerate(ops):
        if op[0] == "P":
            pq.push((op[1], op[2]))
        else:
            pq.pop()
        got = [str(len(pq.c))] + [str(x) for ab in pq.c for x in ab]
        assert " ".join(got) == ref_lines[step], f"step {step}: {ops[:step+1]}"
