"""Comparator rule-matrix tests (cseq_comparator_test.cpp analogue)."""

import numpy as np
import pytest

from sina_tpu.comparator import (
    Comparator,
    jukes_cantor,
    IUPAC_OPTIMISTIC, IUPAC_PESSIMISTIC, IUPAC_EXACT,
    COVER_ABS, COVER_QUERY, COVER_TARGET, COVER_OVERLAP, COVER_ALL,
    COVER_AVERAGE, COVER_MIN, COVER_MAX, COVER_NOGAP,
    DIST_JC,
)
from sina_tpu.sequence import Sequence


A = Sequence.from_string("a", "--AGCU-AGG--")
B = Sequence.from_string("b", "-CAGUU--GGA-")
# columns:  a: A2 G3 C4 U5 A7 G8 G9
#           b: C1 A2 G3 U4 U5 G8 G9 A10
# common: 2(AA match) 3(GG) 4(C/U mm) 5(UU) 8(GG) 9(GG) -> 5 match 1 mm
# only_a: 7 (inside b span)      only_b: 4? no: b at 4 is U vs a C ->
#   common.  b-only: none inside a span... b1 (before a start) and
#   a10 after a end -> overhangs


def counts():
    return Comparator().counts(A, B)


def test_counts():
    m = counts()
    assert m["match"] == 5
    assert m["mismatch"] == 1
    assert m["only_a"] == 1          # a7 inside b's span
    assert m["only_b"] == 0
    assert m["only_b_overhang"] == 2  # b1, b10


def test_cover_rules():
    mm = 6  # match+mismatch
    vals = {
        COVER_ABS: 5 / 1,
        COVER_QUERY: 5 / (mm + 1),
        COVER_TARGET: 5 / (mm + 0 + 2),
        COVER_OVERLAP: 5 / (mm + 1 + 0),
        COVER_ALL: 5 / (mm + 1 + 0 + 0 + 2),
        COVER_AVERAGE: 5 / (mm + (1 + 2) // 2),
        COVER_MIN: 5 / (mm + min(1, 2)),
        COVER_MAX: 5 / (mm + max(1, 2)),
        COVER_NOGAP: 5 / mm,
    }
    for rule, expect in vals.items():
        c = Comparator(IUPAC_OPTIMISTIC, "none", rule, False)
        assert c(A, B) == pytest.approx(expect), rule


def test_iupac_rules():
    x = Sequence.from_string("x", "ARN")
    y = Sequence.from_string("y", "AAA")
    opt = Comparator(IUPAC_OPTIMISTIC, "none", COVER_QUERY, False)
    pes = Comparator(IUPAC_PESSIMISTIC, "none", COVER_QUERY, False)
    exa = Comparator(IUPAC_EXACT, "none", COVER_QUERY, False)
    assert opt(x, y) == pytest.approx(1.0)      # all could match
    assert pes(x, y) == pytest.approx(1 / 3)    # only unambig A
    assert exa(x, y) == pytest.approx(1 / 3)    # codes equal only at 0


def test_jc_correction():
    c = Comparator(IUPAC_OPTIMISTIC, DIST_JC, COVER_QUERY, False)
    raw = Comparator(IUPAC_OPTIMISTIC, "none", COVER_QUERY, False)
    assert c(A, B) == pytest.approx(jukes_cantor(raw(A, B)))


def test_filter_lowercase():
    x = Sequence.from_string("x", "AGcU")
    y = Sequence.from_string("y", "AGAU")
    nofilter = Comparator(IUPAC_OPTIMISTIC, "none", COVER_QUERY, False)
    filt = Comparator(IUPAC_OPTIMISTIC, "none", COVER_QUERY, True)
    assert nofilter(x, y) == pytest.approx(3 / 4)
    # lowercase c dropped from x -> y's A at that column becomes
    # only_b, which COVER_QUERY ignores
    assert filt(x, y) == pytest.approx(3 / 3)
