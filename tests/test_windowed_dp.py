"""Sliding-window graph DP core must be bit-identical to the dense
lattice core."""

import numpy as np
import jax.numpy as jnp

from sina_tpu import testing
from sina_tpu.ops.align_kernel import (
    DpParams, poa_dp, poa_dp_forbid,
)
from sina_tpu.ops.graph import build_graph, pad_graph


def _problem():
    db = testing.make_reference(n_seqs=40, n_core=200, width=350, seed=8)
    g = build_graph(db.sequences[:12])
    g = pad_graph(g, -(-g.n_nodes // 64) * 64)
    q = testing.unaligned_copy(
        testing.make_queries(db, n=1, seed=5, branch_len=0.5)[0]
    )
    m = len(q.masks)
    mpad = -(-m // 64) * 64
    qm = np.zeros(mpad, np.int32)
    qm[:m] = q.masks
    cw = np.ones(g.width + 2, np.float32)
    return g, qm, m, cw


def test_windowed_matches_dense():
    g, qm, m, cw = _problem()
    dists = np.arange(g.preds.shape[0])[:, None] - g.preds
    assert dists[g.preds >= 0].max() < 32

    params = DpParams()
    args = (
        jnp.asarray(g.pos),
        jnp.asarray(g.mask.astype(np.int32)),
        jnp.asarray(g.weight),
        jnp.asarray(g.preds),
        jnp.asarray(g.is_start),
        jnp.asarray(g.is_end),
        jnp.asarray(qm),
        jnp.int32(m),
        jnp.int32(g.n_nodes),
        jnp.asarray(cw),
    )
    kw = dict(n_nodes=g.preds.shape[0], m_len=len(qm), params=params)
    bp0, j0, i0, r0 = poa_dp(*args, **kw)
    bp1, j1, i1, r1 = poa_dp(*args, **kw, window=32)
    np.testing.assert_array_equal(np.asarray(bp0), np.asarray(bp1))
    assert int(j0) == int(j1) and int(i0) == int(i1)
    assert float(r0) == float(r1)


def test_windowed_matches_dense_forbid():
    g, qm, m, cw = _problem()
    params = DpParams()
    mi = jnp.asarray(g.max_insert)
    args = (
        jnp.asarray(g.pos),
        jnp.asarray(g.mask.astype(np.int32)),
        jnp.asarray(g.weight),
        jnp.asarray(g.preds),
        jnp.asarray(g.is_start),
        jnp.asarray(g.is_end),
        jnp.asarray(qm),
        jnp.int32(m),
        jnp.int32(g.n_nodes),
        jnp.asarray(cw),
        mi,
    )
    kw = dict(n_nodes=g.preds.shape[0], m_len=len(qm), params=params)
    bp0, j0, i0, r0 = poa_dp_forbid(*args, **kw)
    bp1, j1, i1, r1 = poa_dp_forbid(*args, **kw, window=32)
    np.testing.assert_array_equal(np.asarray(bp0), np.asarray(bp1))
    assert int(j0) == int(j1) and int(i0) == int(i1)
    assert float(r0) == float(r1)
