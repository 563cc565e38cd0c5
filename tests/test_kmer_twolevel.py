"""Two-level famfinder scorer: coarse byte-popcount prefilter +
exact candidate rescore (ops/kmer_kernel.py).  CPU validation: the
coarse kernel is bit-exact vs an unpack-sum oracle (XLA and Pallas
interpret), and the two-level top-k reproduces the single-level exact
top-k on a realistic (clustered) reference fixture."""

import numpy as np

from sina_tpu import testing
from sina_tpu.ops import kmer_kernel as kk
from sina_tpu.ops.kmer import query_kmers_padded
from sina_tpu.ops.kmer_index import KmerIndex


def _fixture(n_seqs=640, k=6):
    db = testing.make_reference(
        n_seqs=n_seqs, n_core=300, width=500, seed=11
    )
    idx = KmerIndex.build(db, k=k, fast=False)
    Pp = idx.dense_packed()
    queries = [
        testing.unaligned_copy(q)
        for q in testing.make_queries(db, n=16, seed=5)
    ]
    kmers, _ = query_kmers_padded(
        [q.masks for q in queries], k, fast=False, pad_to=128
    )
    return idx, Pp, kmers


def test_bytes_kernel_matches_unpacked_sums():
    idx, Pp, kmers = _fixture()
    Sb = Pp.shape[1]
    exact = np.asarray(kk.kmer_scores_packed_xla(Pp, kmers))
    grouped = exact.reshape(exact.shape[0], Sb, 8).sum(axis=2)
    got_xla = np.asarray(kk.kmer_scores_bytes_xla(Pp, kmers))
    np.testing.assert_array_equal(got_xla, grouped)
    got_pl = np.asarray(
        kk.kmer_scores_bytes_pallas(Pp, kmers, interpret=True)
    )
    np.testing.assert_array_equal(got_pl, grouped)


def test_twolevel_exact_pass_matches_full_scores():
    # the exact pass restricted to candidate bytes must equal the
    # full kernel's scores at those sequences, whatever the candidates
    idx, Pp, kmers = _fixture()
    B = kmers.shape[0]
    Sb = Pp.shape[1]
    rng = np.random.default_rng(3)
    C = 16
    cand = np.stack(
        [rng.choice(Sb, size=C, replace=False) for _ in range(B)]
    ).astype(np.int32)
    import jax.numpy as jnp

    vals, sel = kk._twolevel_exact(
        Pp, jnp.asarray(kmers), jnp.asarray(cand), k_top=C * 8
    )
    full = np.asarray(kk.kmer_scores_packed_xla(Pp, kmers))
    vals = np.asarray(vals)
    sel = np.asarray(sel)
    for b in range(B):
        ids = cand[b][sel[b] // 8] * 8 + sel[b] % 8
        np.testing.assert_array_equal(vals[b], full[b][ids])
        # and it really is the top of the candidate set
        cand_seqs = (cand[b][:, None] * 8 + np.arange(8)).ravel()
        assert vals[b][0] == full[b][cand_seqs].max()


def _exact_topk(Pp, kmers, k_top):
    import jax

    fn = jax.jit(
        lambda P, km: jax.lax.top_k(
            kk.kmer_scores_packed_xla(P, km), k_top
        )
    )
    return tuple(np.asarray(a) for a in fn(Pp, kmers))


def _assert_ids_match_where_untied(ev, ei, ti):
    # ids agree wherever the exact ranking had no tie at that value;
    # the boundary (minimum) value can tie with elements OUTSIDE the
    # returned k, so it is always excluded
    for b in range(ev.shape[0]):
        uniq, cnt = np.unique(ev[b], return_counts=True)
        tied = set(uniq[cnt > 1].tolist())
        tied.add(int(ev[b].min()))
        mask = ~np.isin(ev[b], list(tied))
        np.testing.assert_array_equal(ti[b][mask], ei[b][mask])


def test_twolevel_topk_matches_exact_on_clustered_db():
    idx, Pp, kmers = _fixture()
    k_top = 40
    ev, ei = _exact_topk(Pp, kmers, k_top)
    # generous candidate ratio (64 of 128 byte groups): full parity
    tv, ti = (
        np.asarray(a)
        for a in kk.kmer_scores_topk_twolevel(
            Pp, kmers, k_top, stride=4, c_bytes=64
        )
    )
    np.testing.assert_array_equal(tv, ev)
    _assert_ids_match_where_untied(ev, ei, ti)
    # tight prefilter (24 of 128 byte groups, stride 4 — far harsher
    # than the production ratio): the best hit is never lost and the
    # head recall stays high; the background tail near the tie floor
    # may swap — the documented recall trade of the sum prefilter
    # (grouped_top_k is the exact alternative when DMA isn't the
    # bottleneck)
    tv2, _ = (
        np.asarray(a)
        for a in kk.kmer_scores_topk_twolevel(
            Pp, kmers, k_top, stride=4, c_bytes=24
        )
    )
    np.testing.assert_array_equal(tv2[:, 0], ev[:, 0])
    head_match = (tv2[:, :10] == ev[:, :10]).mean()
    assert head_match >= 0.9, head_match


def test_grouped_topk_is_exact():
    # the group-max hierarchical top-k is EXACT by construction
    # (c_groups >= k): values equal on every fixture, clustered or not
    idx, Pp, kmers = _fixture()
    import jax.numpy as jnp

    scores = kk.kmer_scores_packed_xla(Pp, kmers)
    for k_top, C in ((40, 40), (40, 64), (200, 200)):
        ev, ei = (
            np.asarray(a)
            for a in __import__("jax").lax.top_k(scores, k_top)
        )
        tv, ti = (
            np.asarray(a)
            for a in kk.grouped_top_k(scores, k_top, c_groups=C)
        )
        np.testing.assert_array_equal(tv, ev)
        _assert_ids_match_where_untied(ev, ei, ti)


def test_grouped_topk_adversarial_ties():
    # worst case for the hierarchy: massive ties at the k-th value
    # across many groups — values must still be exact
    import jax

    rng = np.random.default_rng(0)
    S = 1024
    scores = rng.integers(0, 4, (8, S)).astype(np.int32)
    scores[:, ::97] = 50  # a few clear winners
    k_top = 64
    ev, _ = (np.asarray(a) for a in jax.lax.top_k(scores, k_top))
    tv, ti = (
        np.asarray(a)
        for a in kk.grouped_top_k(
            jnp_arr(scores), k_top, c_groups=64
        )
    )
    np.testing.assert_array_equal(tv, ev)
    # returned ids must be distinct and carry the claimed scores
    for b in range(8):
        assert len(set(ti[b].tolist())) == k_top
        np.testing.assert_array_equal(scores[b][ti[b]], tv[b])


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
