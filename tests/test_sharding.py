"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sina_tpu import testing
from sina_tpu.ops.kmer import query_kmers_padded
from sina_tpu.ops.kmer_index import KmerIndex
from sina_tpu.ops.kmer_kernel import kmer_scores_xla
from sina_tpu.parallel.sharding import (
    make_mesh, sharded_search, shard_index_matrix,
)


@pytest.fixture(scope="module")
def problem():
    db = testing.make_reference(
        n_seqs=64, n_core=300, width=500, seed=31
    )
    idx = KmerIndex.build(db, k=8, fast=True)
    P = idx.dense()
    masks = [s.masks for s in db.sequences[:8]]
    kmers, _ = query_kmers_padded(masks, 8, fast=True, pad_to=512)
    return P, kmers


def test_make_mesh_shapes():
    mesh = make_mesh(jax.devices())
    assert mesh.shape["dp"] * mesh.shape["mp"] == len(jax.devices())


def test_sharded_search_matches_single_device(problem):
    P, kmers = problem
    mesh = make_mesh(jax.devices())
    fn = sharded_search(mesh, k_top=10)
    Pm = shard_index_matrix(mesh, jnp.asarray(P))
    vals, ids = fn(Pm, jnp.asarray(kmers))
    vals, ids = np.asarray(vals), np.asarray(ids)

    ref_scores = np.asarray(kmer_scores_xla(jnp.asarray(P), kmers))
    rv, ri = jax.lax.top_k(jnp.asarray(ref_scores), 10)
    rv = np.asarray(rv)
    # same top scores per query (ids may differ on ties)
    np.testing.assert_array_equal(np.sort(vals, 1), np.sort(rv, 1))
    # the sharded ids really have those scores
    for b in range(vals.shape[0]):
        for k in range(10):
            assert ref_scores[b, ids[b, k]] == vals[b, k]


def test_sharded_search_self_retrieval(problem):
    P, kmers = problem
    mesh = make_mesh(jax.devices())
    fn = sharded_search(mesh, k_top=5)
    Pm = shard_index_matrix(mesh, jnp.asarray(P))
    vals, ids = fn(Pm, jnp.asarray(kmers))
    vals, ids = np.asarray(vals), np.asarray(ids)
    for b in range(8):
        assert b in ids[b], f"query {b} did not retrieve itself"


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[1].shape[0]


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))
