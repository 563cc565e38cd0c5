"""Alignment DP + traceback tests (align.test / accuracy analogues)."""

import numpy as np
import pytest

from sina_tpu import testing
from sina_tpu.align import (
    AlignerConfig,
    align_sequence,
    OVERHANG_EDGE,
    OVERHANG_REMOVE,
    LOWERCASE_UNALIGNED,
)
from sina_tpu.comparator import Comparator, IUPAC_EXACT, COVER_QUERY
from sina_tpu.ops.graph import build_graph
from sina_tpu.sequence import Sequence
from sina_tpu.testing import unaligned_copy


def fam(*seqs):
    return [(1.0, s) for s in seqs]


def test_graph_build():
    a = Sequence.from_string("a", "AG-CU")
    b = Sequence.from_string("b", "AGGC-")
    g = build_graph([a, b])
    # columns: 0:A(2) 1:G(2) 2:G(1) 3:C(2) 4:U(1) -> 5 nodes
    assert g.n_nodes == 5
    assert g.pos.tolist() == [0, 1, 2, 3, 4]
    # node A at col0 shared -> weight 1/2 + 1*2/2 = 1.5
    assert g.weight[0] == pytest.approx(1.5)
    assert g.weight[2] == pytest.approx(1.0)  # G col2 only in b
    assert g.is_start.tolist() == [True, False, False, False, False]
    assert g.is_end.tolist() == [False, False, False, False, True]


def test_align_identical_copies_alignment():
    ref = Sequence.from_string("r1", "..AG-CU-A..")
    q = Sequence.from_string("q", "AGCUA")
    out = align_sequence(q, fam(ref))
    assert out is not None
    assert out.positions.tolist() == ref.positions.tolist()
    assert out.get_attr("align_quality_slv") == 100


def test_align_superstring_copies_subalignment():
    ref = Sequence.from_string("r1", "AG-CU-AG")
    q = Sequence.from_string("q", "CUA")
    out = align_sequence(q, fam(ref))
    assert out is not None
    assert out.get_aligned(dots=False) == "---CU-A-"


def test_dp_recovers_reference_like_alignment():
    """DP path: a query one substitution away from r1 must adopt r1's
    column layout with the substituted base in place."""
    refs = [
        Sequence.from_string("r1", "..AG-CUGA-UC.."),
        Sequence.from_string("r2", "..AGGC-GAAUC.."),
    ]
    q = Sequence.from_string("q", "AGCUGGUC")  # A->G at r1 col 8
    out = align_sequence(q, fam(*refs), AlignerConfig(engine="graph"))
    assert out is not None
    assert out.get_aligned(dots=False) == "--AG-CUGG-UC--"


def test_align_deletion():
    refs = [Sequence.from_string("r1", "AGACGUCA")]
    q = Sequence.from_string("q", "AGACUCA")  # G at col 5 missing
    cfg = AlignerConfig(realign=True, engine="graph")
    out = align_sequence(q, fam(*refs), cfg)
    assert out.get_aligned(dots=False) == "AGAC-UCA"


def test_align_insertion_shifted():
    # reference alignment has a gap column the insertion can use
    refs = [
        Sequence.from_string("r1", "AGA-CGUCA"),
        Sequence.from_string("r2", "AGA-CGUCA"),
    ]
    q = Sequence.from_string("q", "AGAUCGUCA")  # extra U
    cfg = AlignerConfig(realign=True, engine="graph")
    out = align_sequence(q, fam(*refs), cfg)
    assert out.get_bases() == "AGAUCGUCA"
    assert out.get_aligned(dots=False) == "AGAUCGUCA"


def test_align_overhang_attach_and_edge():
    refs = [Sequence.from_string("r1", "--AGCU--")]
    # query with 2 extra bases on each side
    q = Sequence.from_string("q", "GGAGCUCC")
    cfg = AlignerConfig(realign=True, engine="graph")
    out = align_sequence(q, fam(*refs), cfg)
    assert out.get_bases() == "GGAGCUCC"
    assert out.get_aligned(dots=False) == "GGAGCUCC"
    assert out.get_attr("align_cutoff_head_slv") == 2
    assert out.get_attr("align_cutoff_tail_slv") == 2

    cfg2 = AlignerConfig(realign=True, overhang=OVERHANG_REMOVE, engine="graph")
    out2 = align_sequence(q, fam(*refs), cfg2)
    assert out2.get_bases() == "AGCU"


def test_align_lowercase_unaligned():
    refs = [Sequence.from_string("r1", "--AGCU--")]
    q = Sequence.from_string("q", "GGAGCUCC")
    cfg = AlignerConfig(
        realign=True, lowercase=LOWERCASE_UNALIGNED, engine="graph"
    )
    out = align_sequence(q, fam(*refs), cfg)
    assert out.get_bases() == "ggAGCUcc"


def test_accuracy_on_synthetic_db():
    """Realign evolved queries against the synthetic reference; exact
    per-column identity with the true alignment must be high (the
    analogue of tests/accuracy_kmer.test avg_sps)."""
    db = testing.make_reference(n_seqs=80, n_core=400, width=700, seed=11)
    queries = testing.make_queries(db, n=8, seed=5, branch_len=0.5)
    cmp_exact = Comparator(IUPAC_EXACT, "none", COVER_QUERY, False)
    cfg = AlignerConfig(realign=True, engine="graph")
    sps = []
    for true_q in queries:
        q = unaligned_copy(true_q)
        # family: 10 nearest by true parent proximity - just take
        # parent + some random refs to exercise a real graph
        pid = db.index_of(true_q.get_attr("parent"))
        fam_seqs = [db.sequences[pid]] + [
            db.sequences[(pid + k) % len(db)] for k in range(1, 10)
        ]
        out = align_sequence(q, fam(*fam_seqs), cfg)
        assert out is not None
        assert out.get_bases().upper() == true_q.get_bases().upper()
        sps.append(cmp_exact(true_q, out))
    assert np.mean(sps) > 0.95, f"avg_sps {np.mean(sps)} too low"


def test_host_traceback_matches_device():
    """The python traceback (oracle) and the on-device walker must
    produce identical alignments."""
    from sina_tpu.align import align_sequence_host_traceback

    db = testing.make_reference(n_seqs=60, n_core=300, width=500, seed=23)
    queries = testing.make_queries(db, n=5, seed=9, branch_len=0.6)
    cfg = AlignerConfig(realign=True, engine="graph")
    for true_q in queries:
        q = unaligned_copy(true_q)
        pid = db.index_of(true_q.get_attr("parent"))
        fam_seqs = [db.sequences[(pid + k) % len(db)] for k in range(8)]
        dev = align_sequence(q, fam(*fam_seqs), cfg)
        host = align_sequence_host_traceback(q, fam(*fam_seqs), cfg)
        assert dev is not None and host is not None
        assert dev.positions.tolist() == host.positions.tolist()
        assert dev.masks.tolist() == host.masks.tolist()


def test_batch_family_dedup_matches_individual():
    """A batch where many queries share the same family object list
    must produce exactly the results of per-query alignment (the
    dedup'd unique-profile transfer is behaviour-neutral)."""
    from sina_tpu.align import align_batch

    db = testing.make_reference(
        n_seqs=24, n_core=300, width=600, seed=11
    )
    shared_a = [(1.0, s) for s in db.sequences[:8]]
    shared_b = [(1.0, s) for s in db.sequences[8:16]]
    queries = [
        unaligned_copy(q)
        for q in testing.make_queries(db, n=6, seed=3, branch_len=0.7)
    ]
    fams = [
        list(shared_a), list(shared_b), list(shared_a),
        list(shared_a), list(shared_b), list(shared_a),
    ]
    batch = align_batch(queries, [list(f) for f in fams])
    for q, f, got in zip(queries, fams, batch):
        want = align_sequence(q, list(f))
        assert got is not None and want is not None
        assert got.positions.tolist() == want.positions.tolist()
        assert got.get_attr("align_quality_slv") == want.get_attr(
            "align_quality_slv"
        )


def test_batch_family_dedup_forbid_mode():
    from sina_tpu.align import align_batch, INSERTION_FORBID

    db = testing.make_reference(
        n_seqs=16, n_core=300, width=600, seed=12
    )
    shared = [(1.0, s) for s in db.sequences[:8]]
    cfg = AlignerConfig(insertion=INSERTION_FORBID)
    queries = [
        unaligned_copy(q)
        for q in testing.make_queries(db, n=4, seed=5, branch_len=0.7)
    ]
    batch = align_batch(
        queries, [list(shared) for _ in queries], cfg
    )
    for q, got in zip(queries, batch):
        want = align_sequence(q, list(shared), cfg)
        assert got is not None and want is not None
        assert got.positions.tolist() == want.positions.tolist()
