"""Vectorised many-vs-one comparator must match the pairwise one."""

import numpy as np
import pytest

from sina_tpu import testing
from sina_tpu.comparator import (
    Comparator,
    IUPAC_OPTIMISTIC, IUPAC_EXACT,
    COVER_QUERY, COVER_OVERLAP, COVER_TARGET, COVER_NOGAP,
    DIST_JC,
)


@pytest.mark.parametrize(
    "iupac,cover,dist,filter_lc",
    [
        (IUPAC_OPTIMISTIC, COVER_QUERY, "none", False),
        (IUPAC_EXACT, COVER_OVERLAP, "none", False),
        (IUPAC_OPTIMISTIC, COVER_TARGET, DIST_JC, False),
        (IUPAC_OPTIMISTIC, COVER_NOGAP, "none", True),
    ],
)
def test_score_many_matches_pairwise(iupac, cover, dist, filter_lc):
    db = testing.make_reference(n_seqs=40, n_core=200, width=400, seed=17)
    offsets, flat_pos, flat_masks = db.packed_arrays()
    q = testing.make_queries(db, n=1, seed=3)[0]
    cmp = Comparator(iupac, dist, cover, filter_lc)
    ids = np.arange(len(db))
    many = cmp.score_many(
        q, flat_pos, flat_masks, offsets, ids, db.width
    )
    for i in range(len(db)):
        expect = cmp(q, db.sequences[i])
        if np.isnan(expect):
            # JC of identity > 3/4 is NaN in both implementations
            # (and in the reference's log of a negative argument)
            assert np.isnan(many[i]), i
        else:
            assert many[i] == pytest.approx(expect, abs=1e-9), i


def test_native_and_python_paths_agree(monkeypatch):
    """Force the python fallback and compare against the native
    path (and cover the pessimistic rule + min/max/average/all/abs
    cover bases)."""
    from sina_tpu import native
    from sina_tpu.comparator import (
        IUPAC_PESSIMISTIC, COVER_ALL, COVER_MIN, COVER_MAX,
        COVER_AVERAGE, COVER_ABS,
    )

    db = testing.make_reference(n_seqs=30, n_core=150, width=300, seed=4)
    offsets, flat_pos, flat_masks = db.packed_arrays()
    q = testing.make_queries(db, n=1, seed=9)[0]
    ids = np.arange(len(db))
    for iupac in (IUPAC_OPTIMISTIC, IUPAC_PESSIMISTIC, IUPAC_EXACT):
        for cover in (COVER_ALL, COVER_MIN, COVER_MAX,
                      COVER_AVERAGE, COVER_ABS):
            cmp = Comparator(iupac, "none", cover, False)
            got_native = cmp.score_many(
                q, flat_pos, flat_masks, offsets, ids, db.width
            )
            with monkeypatch.context() as mp:
                mp.setattr(
                    native, "score_counts",
                    lambda *a, **k: None,
                )
                got_py = cmp.score_many(
                    q, flat_pos, flat_masks, offsets, ids, db.width
                )
            np.testing.assert_allclose(
                got_native, got_py, atol=1e-12,
                err_msg=f"{iupac}/{cover}",
            )


def test_score_many_batch_matches_per_query():
    """The one-call threaded batch scorer (sina_score_counts_mq) must
    reproduce per-query score_many exactly, including ragged
    candidate lists and queries with different spans/rules."""
    from sina_tpu.comparator import COVER_ALL, COVER_MIN

    db = testing.make_reference(n_seqs=40, n_core=150, width=300, seed=5)
    offsets, flat_pos, flat_masks = db.packed_arrays()
    qs = testing.make_queries(db, n=6, seed=11)
    rng = np.random.default_rng(0)
    ids_list = [
        np.sort(rng.choice(len(db), size=n, replace=False))
        for n in (40, 17, 3, 40, 25, 1)
    ]
    for iupac in (IUPAC_OPTIMISTIC, IUPAC_EXACT):
        for cover in (COVER_ALL, COVER_MIN):
            cmp = Comparator(iupac, "none", cover, False)
            batch = cmp.score_many_batch(
                qs, flat_pos, flat_masks, offsets, ids_list,
                db.width,
            )
            for q, ids, got in zip(qs, ids_list, batch):
                want = cmp.score_many(
                    q, flat_pos, flat_masks, offsets, ids, db.width
                )
                np.testing.assert_allclose(
                    got, want, atol=1e-12,
                    err_msg=f"{iupac}/{cover}",
                )
