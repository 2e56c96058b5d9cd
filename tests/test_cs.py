"""cs:Z: tag machinery unit tests (parse / overlap ranges / clip)."""

import numpy as np
import pytest

from alignasm_tpu.io.cs import (
    CsError, OP_DEL, OP_INS, OP_MATCH, OP_SUB, clip_cs, overlap_ranges, parse_cs,
)


def test_parse_basic():
    ops = parse_cs("cs:Z::10*ac+ggt-tt:5")
    assert list(ops.op) == [OP_MATCH, OP_SUB, OP_INS, OP_DEL, OP_MATCH]
    assert list(ops.length) == [10, 1, 3, 2, 5]
    assert ops.raw[ops.span_start[2]:ops.span_end[2]] == "+ggt"


@pytest.mark.parametrize("bad", ["cs:Z::0", "cs:Z:*a", "cs:Z:+", "cs:Z:-", "cs:Z::5x", "x", "cs:Z::-3"])
def test_parse_rejects_malformed(bad):
    with pytest.raises(CsError):
        parse_cs(bad)


def test_overlap_ranges_fwd():
    ops = parse_cs("cs:Z::10*ac:5+ggg:3-tt:2")
    q, r = overlap_ranges(ops, True, 100, 123, 1000, 1022)
    assert q.tolist() == [[100, 109], [111, 115], [119, 121], [122, 123]]
    assert r.tolist() == [[1000, 1009], [1011, 1015], [1016, 1018], [1021, 1022]]


def test_overlap_ranges_rev():
    # reverse strand: ops iterate reversed, ref steps -1 from ref_str (the larger)
    ops = parse_cs("cs:Z::5-tt:3")
    # query-oriented order: (:3), (-tt), (:5); qry 8 bases, ref 10 bases
    q, r = overlap_ranges(ops, False, 50, 57, 1009, 1000)
    assert q.tolist() == [[50, 52], [53, 57]]
    assert r.tolist() == [[1009, 1007], [1004, 1000]]


def test_overlap_ranges_validates_consumption():
    ops = parse_cs("cs:Z::10")
    with pytest.raises(CsError):
        overlap_ranges(ops, True, 0, 8, 0, 9)  # qry length mismatch


def test_clip_uncut_passthrough():
    ops = parse_cs("cs:Z::10*ac:5")
    res = clip_cs(ops, True, 0, 15, 15, 16, 0, 15, 0, 15)
    assert not res.is_cut and res.cs_string == ops.raw


def test_clip_trims_match_runs():
    ops = parse_cs("cs:Z::10*ac:5")
    # keep query [3, 12] -> :7 *ac :2 ; ref same span
    res = clip_cs(ops, True, 0, 15, 15, 16, 3, 12, 3, 12)
    assert res.is_cut
    assert res.cs_string == "cs:Z::7*ac:2"
    assert res.mat_num == 9 and res.aln_len == 10


def test_clip_drops_boundary_deletion():
    # deletion exactly at the left cut is dropped (kept only if eqs < q)
    ops = parse_cs("cs:Z::5-ttt:5")
    res = clip_cs(ops, True, 0, 9, 10, 13, 5, 9, 1008, 1012)
    assert res.cs_string == "cs:Z::5"
    res2 = clip_cs(ops, True, 0, 9, 10, 13, 4, 9, 1004, 1012)
    assert res2.cs_string == "cs:Z::1-ttt:5"


def test_clip_insertion_inside_raises():
    ops = parse_cs("cs:Z::5+aaaa:5")
    with pytest.raises(CsError, match="insertion"):
        clip_cs(ops, True, 0, 13, 10, 14, 0, 6, 0, 9)


def test_clip_rev_strand_order():
    # rev strand: retained ops re-reverse into file order
    ops = parse_cs("cs:Z::4-gg:6")
    # query-oriented: (:6)(−gg)(:4); qry [0,9], ref closed [1011, 1000]
    res = clip_cs(ops, False, 0, 9, 10, 12, 2, 9, 1011, 1002)
    assert res.cs_string == "cs:Z::4-gg:4"
    assert res.mat_num == 8 and res.aln_len == 10
