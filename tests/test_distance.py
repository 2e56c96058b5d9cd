"""PafDistance semiring unit tests (model/distance.py) — the ordering
rules everything downstream stands on (paf_data.hpp:115-189)."""

from fractions import Fraction

from alignasm_tpu.model import distance as D


def test_calc_sum_orders_by_sum_then_anom_then_fraction():
    a = (5, 5, 0, 1, 2)   # sum 10, frac 1/2
    b = (3, 7, 0, 1, 2)   # sum 10 — tie
    c = (3, 7, 1, 1, 2)   # worse anom
    d = (5, 5, 0, 1, 4)   # worse fraction (1/4)
    assert not D.less(a, b, D.CALC_SUM) and not D.less(b, a, D.CALC_SUM)
    assert D.less(a, c, D.CALC_SUM)
    assert D.less(a, d, D.CALC_SUM)
    assert D.less((4, 5, 9, 0, 1), (5, 5, 0, 1, 1), D.CALC_SUM)  # sum wins


def test_qry_mode_orders_lexicographically():
    assert D.less((1, 99, 9, 0, 1), (2, 0, 0, 1, 1), D.QRY_SCORE)
    assert D.less((1, 5, 0, 0, 1), (1, 6, 0, 0, 1), D.QRY_SCORE)


def test_equality_cross_multiplies_fractions():
    # 1/2 == 2/4 as distances even though the components differ
    assert D.eq((1, 1, 0, 1, 2), (1, 1, 0, 2, 4))
    assert not D.eq((1, 1, 0, 1, 2), (1, 1, 0, 1, 3))
    # zero denominators behave as 1 (reference: tot ? tot : 1)
    assert D.eq((0, 0, 0, 0, 0), (0, 0, 0, 0, 5))


def test_max_sentinel_sorts_last():
    real = (10**9, 10**9, 99, 0, 1)
    assert D.less(real, D.MAX_DIST, D.CALC_SUM)
    assert not D.less(D.MAX_DIST, real, D.CALC_SUM)
    assert D.key(D.MAX_DIST, D.CALC_SUM) > D.key(real, D.CALC_SUM)


def test_key_matches_less_exactly():
    import itertools
    import random

    rng = random.Random(0)
    pool = [
        (rng.randrange(0, 5), rng.randrange(0, 5), rng.randrange(0, 3),
         rng.randrange(0, 3), rng.randrange(0, 4))
        for _ in range(40)
    ]
    for mode in (D.CALC_SUM, D.QRY_SCORE):
        for a, b in itertools.combinations(pool, 2):
            assert (D.key(a, mode) < D.key(b, mode)) == D.less(a, b, mode)


def test_add_sub_componentwise():
    a, b = (1, 2, 3, 4, 5), (5, 4, 3, 2, 1)
    assert D.add(a, b) == (6, 6, 6, 6, 6)
    assert D.sub(D.add(a, b), b) == a


def test_qul_key_is_exact_fraction():
    assert D._qul_key((0, 0, 0, 1, 3)) == Fraction(-1, 3)
    assert D._qul_key((0, 0, 0, 0, 0)) == Fraction(0, 1)
