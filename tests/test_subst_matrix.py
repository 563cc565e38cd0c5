"""Experimental substitution-matrix scoring scheme
(--use-subst-matrix; scoring_schemes.h:244-311).

The reference's own matrix generator is disabled upstream
(alignment_stats.cpp:139-160 `#if 0` — it returns an uninitialized
matrix), so these tests validate the documented log-odds formula and
that the scheme aligns correctly end to end.
"""

import numpy as np
import pytest

from sina_tpu import testing
from sina_tpu.align import AlignerConfig, align_sequence
from sina_tpu.stats import family_base_freqs, subst_matrix
from sina_tpu.sequence import Sequence


def test_subst_matrix_formula():
    f = np.full(4, 0.25)
    m = subst_matrix(f, identity=0.9)
    # diagonal: -log((0.9/4) / (0.25*0.25))
    assert m[0, 0] == pytest.approx(-np.log(0.225 / 0.0625), rel=1e-5)
    # off-diagonal: -log(((0.1)/12) / 0.0625)
    assert m[0, 1] == pytest.approx(
        -np.log((0.1 / 12) / 0.0625), rel=1e-5
    )
    # matches must be rewarded (negative cost) vs mismatches
    assert (np.diag(m) < m[~np.eye(4, dtype=bool)].min()).all()


def test_family_base_freqs():
    a = Sequence.from_string("a", "AAGG")
    b = Sequence.from_string("b", "AARR")  # R = A|G split half/half
    f = family_base_freqs([a, b])
    assert f.sum() == pytest.approx(1.0)
    assert f[0] == pytest.approx(5.0 / 8.0)  # A: 2 + 2 + 2*0.5
    assert f[1] == pytest.approx(3.0 / 8.0)  # G
    assert f[2] == 0 and f[3] == 0


def test_subst_matrix_alignment_end_to_end():
    db = testing.make_reference(n_seqs=60, n_core=300, width=500, seed=9)
    queries = testing.make_queries(db, n=3, seed=4, branch_len=0.4)
    cfg = AlignerConfig(realign=True, use_subst_matrix=True)
    assert cfg.resolved_engine() == "graph"
    for true_q in queries:
        q = testing.unaligned_copy(true_q)
        pid = db.index_of(true_q.get_attr("parent"))
        fam = [
            (0.9, db.sequences[(pid + k) % len(db)]) for k in range(8)
        ]
        out = align_sequence(q, fam, cfg)
        assert out is not None
        assert out.get_bases().upper() == true_q.get_bases().upper()
        # alignment must land close to the true column placement
        from sina_tpu.comparator import (
            Comparator, IUPAC_EXACT, COVER_QUERY,
        )

        cmp_exact = Comparator(IUPAC_EXACT, "none", COVER_QUERY, False)
        assert cmp_exact(true_q, out) > 0.8
        assert "using dist:" in out.get_attr("align_log_slv", "")


def test_fs_no_graph_ignores_matrix():
    cfg = AlignerConfig(fs_no_graph=True, use_subst_matrix=True)
    assert cfg.resolved_engine() == "profile"
