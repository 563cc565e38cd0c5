"""Unit tests mirroring the reference's cseq_test.cpp coverage."""

import numpy as np
import pytest

from sina_tpu import Sequence


def test_roundtrip():
    s = Sequence.from_string("s1", "..AG-CU..")
    assert s.width == 9
    assert s.get_bases() == "AGCU"
    assert s.get_aligned() == "..AG-CU.."
    assert s.get_aligned(dna=True) == "..AG-CT.."


def test_reverse():
    s = Sequence.from_string("s1", "A-GC")
    s.reverse()
    assert s.get_aligned(dots=False) == "CG-A"


def test_complement():
    s = Sequence.from_string("s1", "AGCU")
    s.complement()
    assert s.get_bases() == "UCGA"


def test_internal_gaps():
    s = Sequence.from_string("s1", "..A--GC-U..")
    # reference semantics (famfinder.cpp:477): last pos - nbases + 1,
    # i.e. leading gap columns count as well: 8 - 4 + 1 = 5
    assert s.internal_gaps() == 5


def test_set_width_grow_shrink():
    s = Sequence.from_string("s1", "AGCU----")
    s.set_width(4)
    assert s.width == 4
    s.set_width(10)
    assert s.width == 10
    s2 = Sequence.from_string("s2", "A--GCU")
    s2.set_width(4)  # forces trailing bases left
    assert s2.get_aligned(dots=False) == "A-GC" or s2.width == 4


def test_fix_duplicate_positions_simple():
    # two bases claim column 3; gap at column 2 lets them spread
    s = Sequence.from_string("s", "AG-C--")
    # manually create duplicate: base at 3 plus insert also at 3
    s.positions = np.array([0, 1, 3, 3, 5], dtype=np.uint32)
    s.masks = np.array([1, 2, 4, 8, 1], dtype=np.uint8)
    s.width = 6
    s.fix_duplicate_positions()
    assert sorted(s.positions.tolist()) == s.positions.tolist()
    assert len(set(s.positions.tolist())) == len(s.positions)
    # insertion placed right-aligned against its anchor
    assert s.positions.tolist() == [0, 1, 3, 4, 5]


def test_fix_duplicate_positions_shift_left():
    # no room to the right: must shift into left gaps
    s = Sequence(
        "s",
        np.array([0, 3, 4, 4, 4], dtype=np.uint32),
        np.array([1, 1, 1, 1, 1], dtype=np.uint8),
        5,
    )
    s.fix_duplicate_positions()
    p = s.positions.tolist()
    assert p == sorted(p)
    assert len(set(p)) == 5
    assert all(0 <= x < 5 for x in p)


def test_fix_duplicate_positions_lowercase():
    s = Sequence(
        "s",
        np.array([0, 2, 2, 5], dtype=np.uint32),
        np.array([1, 1, 1, 1], dtype=np.uint8),
        6,
    )
    s.fix_duplicate_positions(lowercase=True)
    # the shifted insertion is marked lowercase
    assert "a" in s.get_bases()


def test_fix_duplicate_final_base():
    # duplicate run at the very end of the sequence
    s = Sequence(
        "s",
        np.array([0, 1, 1], dtype=np.uint32),
        np.array([1, 2, 4], dtype=np.uint8),
        6,
    )
    s.fix_duplicate_positions()
    p = s.positions.tolist()
    assert p == sorted(p) and len(set(p)) == 3


def test_attrs():
    s = Sequence.from_string("s", "ACGU", full_name="test seq")
    s.set_attr("align_quality_slv", 97)
    assert s.get_attr("full_name") == "test seq"
    assert s.get_attr("align_quality_slv") == 97
    assert s.get_attr("missing", 42) == 42


def test_pair_score():
    # width 4: cols 0-3, pair 0<->3 (A-U = 1.1), 1<->2 (G-C = 1.5)
    s = Sequence.from_string("s", "AGCU")
    pairs = np.array([3, 2, 1, 0])
    # reference semantics: pairs[i]==0 means "unpaired", so i=3 is
    # skipped (column 0 can never be a partner); num=3
    assert s.calc_pair_score(pairs) == pytest.approx((1.1 + 1.5 + 1.5) / 3)
