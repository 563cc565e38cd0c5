"""--insertion=forbid (aspace-aware bounded insertions) tests."""

import numpy as np
import pytest

from sina_tpu.align import AlignerConfig, align_sequence
from sina_tpu.sequence import Sequence


def fam(*seqs):
    return [(1.0, s) for s in seqs]


def test_forbid_blocks_unaccommodatable_insertion():
    """With no free gap columns, forbid mode must not place an
    insertion inside the reference span (mesh.h:403-437)."""
    refs = [
        Sequence.from_string("r1", "AGACGUCA"),
        Sequence.from_string("r2", "AGACGUCA"),
    ]
    q = Sequence.from_string("q", "AGACUGUCA")  # extra U, no room
    shift = align_sequence(
        q, fam(*refs),
        AlignerConfig(realign=True, insertion="shift",
                      engine="profile"),
    )
    forbid = align_sequence(
        q, fam(*refs),
        AlignerConfig(realign=True, insertion="forbid",
                      engine="profile"),
    )
    assert shift is not None and forbid is not None
    assert shift.get_bases() == "AGACUGUCA"
    # shift mode squeezes the base in via NAST shifting; forbid mode
    # must find another explanation (mismatch path / overhang)
    assert forbid.get_bases() == "AGACUGUCA"
    # in forbid mode no alignment column may be created by shifting:
    # positions must fit in the reference width with the insertion
    # explained differently (e.g. end overhang clamped)
    assert forbid.width == 8


def test_forbid_allows_insertion_with_room():
    refs = [
        Sequence.from_string("r1", "AGA--CGUCA"),
        Sequence.from_string("r2", "AGA--CGUCA"),
    ]
    q = Sequence.from_string("q", "AGAUCGUCA")
    out = align_sequence(
        q, fam(*refs),
        AlignerConfig(realign=True, insertion="forbid",
                      engine="profile"),
    )
    assert out is not None
    assert out.get_bases() == "AGAUCGUCA"
    # the free columns 3-4 accommodate the insertion
    assert out.get_aligned(dots=False) == "AGA-UCGUCA"


def test_forbid_accuracy_close_to_shift():
    from sina_tpu import testing
    from sina_tpu.comparator import Comparator, IUPAC_EXACT, COVER_QUERY

    db = testing.make_reference(n_seqs=60, n_core=300, width=500, seed=13)
    queries = testing.make_queries(db, n=5, seed=8, branch_len=0.4)
    cmp_exact = Comparator(IUPAC_EXACT, "none", COVER_QUERY, False)
    for true_q in queries:
        q = testing.unaligned_copy(true_q)
        pid = db.index_of(true_q.get_attr("parent"))
        fam_seqs = [db.sequences[(pid + k) % len(db)] for k in range(12)]
        out = align_sequence(
            q, fam(*fam_seqs),
            AlignerConfig(realign=True, insertion="forbid",
                          engine="profile"),
        )
        assert out is not None
        assert out.get_bases().upper() == true_q.get_bases().upper()
        assert cmp_exact(true_q, out) > 0.8


def test_forbid_graph_engine():
    refs = [
        Sequence.from_string("r1", "AGA--CGUCA"),
        Sequence.from_string("r2", "AGA--CGUCA"),
    ]
    q = Sequence.from_string("q", "AGAUCGUCA")
    out = align_sequence(
        q, fam(*refs),
        AlignerConfig(realign=True, insertion="forbid",
                      engine="graph"),
    )
    assert out is not None
    assert out.get_aligned(dots=False) == "AGA-UCGUCA"

    # no room: graph forbid must still align all bases
    refs2 = [
        Sequence.from_string("r1", "AGACGUCA"),
        Sequence.from_string("r2", "AGACGUCA"),
    ]
    q2 = Sequence.from_string("q", "AGACUGUCA")
    out2 = align_sequence(
        q2, fam(*refs2),
        AlignerConfig(realign=True, insertion="forbid",
                      engine="graph"),
    )
    assert out2 is not None
    assert out2.get_bases() == "AGACUGUCA"
