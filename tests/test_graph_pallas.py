"""The Pallas graph-DP kernel (interpret mode on CPU) must reproduce
the XLA graph core exactly: same emissions, best cell, raw score."""

import numpy as np
import jax.numpy as jnp

from sina_tpu import testing
from sina_tpu.ops import align_kernel as ak
from sina_tpu.ops.align_kernel import DpParams
from sina_tpu.ops.graph import build_graph, pad_graph
from sina_tpu.ops.graph_pallas import (
    graph_dp_pallas, pick_chunk, pick_k_ring,
)


def _test_ring(maxd: int) -> int:
    """Minimal power-of-two ring for interpret-mode tests (the
    production pick_k_ring pins K=32 to avoid kernel-shape churn,
    which makes interpret traces needlessly huge on CPU)."""
    k = 8
    while k <= maxd:
        k *= 2
    return k


def test_pallas_matches_xla_core():
    db = testing.make_reference(n_seqs=40, n_core=200, width=350, seed=8)
    n_queries = 4
    graphs, raw_nodes, qs = [], [], []
    for i in range(n_queries):
        fam = db.sequences[3 * i : 3 * i + 10]
        g = build_graph(fam)
        raw_nodes.append(g.n_nodes)
        graphs.append(g)
        qs.append(
            testing.unaligned_copy(
                testing.make_queries(
                    db, n=1, seed=100 + i, branch_len=0.5
                )[0]
            )
        )
    npad = -(-max(g.n_nodes for g in graphs) // 64) * 64
    mpad = -(-max(len(q.masks) for q in qs) // 64) * 64
    graphs = [pad_graph(g, npad) for g in graphs]
    qm = np.zeros((n_queries, mpad), np.int32)
    ql = np.zeros(n_queries, np.int32)
    for b, q in enumerate(qs):
        qm[b, : len(q.masks)] = q.masks
        ql[b] = len(q.masks)
    nr = np.asarray(raw_nodes, np.int32)
    wmax = max(g.width for g in graphs) + 2
    cw = np.random.RandomState(3).uniform(
        0.5, 2.0, size=(n_queries, wmax)
    ).astype(np.float32)

    preds = np.stack([g.preds for g in graphs])
    dists = np.arange(npad)[None, :, None] - preds
    maxd = int(dists[preds >= 0].max())
    k = _test_ring(maxd)
    assert k > 0
    assert pick_chunk(mpad, k) >= 8

    params = DpParams()
    args = (
        jnp.asarray(np.stack([g.pos for g in graphs])),
        jnp.asarray(
            np.stack([g.mask.astype(np.int32) for g in graphs])
        ),
        jnp.asarray(np.stack([g.weight for g in graphs])),
        jnp.asarray(preds),
        jnp.asarray(np.stack([g.is_start for g in graphs])),
        jnp.asarray(np.stack([g.is_end for g in graphs])),
        jnp.asarray(qm),
        jnp.asarray(ql),
        jnp.asarray(nr),
        jnp.asarray(cw),
    )
    ref = ak.poa_dp_batch(*args, params, window=32)
    got = graph_dp_pallas(
        *args, n_nodes=npad, m_len=mpad, k_ring=k, params=params,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(ref[0]), np.asarray(got[0])
    )  # emissions
    np.testing.assert_array_equal(
        np.asarray(ref[1]), np.asarray(got[1])
    )  # best_j
    np.testing.assert_array_equal(
        np.asarray(ref[2]), np.asarray(got[2])
    )  # best_i
    np.testing.assert_array_equal(
        np.asarray(ref[3]), np.asarray(got[3])
    )  # raw score, bit-exact


def test_chunked_dispatch_helper(monkeypatch):
    """align._graph_dp_pallas_chunked pads partial chunks by edge
    replication; results must match the XLA core for the real rows."""
    from sina_tpu.align import _graph_dp_pallas_chunked
    from sina_tpu.ops import graph_pallas as _gp

    # minimal ring in interpret mode (production pins K=32)
    monkeypatch.setattr(_gp, "pick_k_ring", _test_ring)

    db = testing.make_reference(n_seqs=40, n_core=200, width=350, seed=9)
    n_queries = 3
    graphs, raw_nodes, qs = [], [], []
    for i in range(n_queries):
        fam = db.sequences[4 * i : 4 * i + 8]
        g = build_graph(fam)
        raw_nodes.append(g.n_nodes)
        graphs.append(g)
        qs.append(
            testing.unaligned_copy(
                testing.make_queries(
                    db, n=1, seed=200 + i, branch_len=0.5
                )[0]
            )
        )
    npad = -(-max(g.n_nodes for g in graphs) // 64) * 64
    mpad = -(-max(len(q.masks) for q in qs) // 64) * 64
    graphs = [pad_graph(g, npad) for g in graphs]
    qm = np.zeros((n_queries, mpad), np.int32)
    ql = np.zeros(n_queries, np.int32)
    for b, q in enumerate(qs):
        qm[b, : len(q.masks)] = q.masks
        ql[b] = len(q.masks)
    nr = np.asarray(raw_nodes, np.int32)
    wmax = max(g.width for g in graphs) + 2
    cw = np.ones((n_queries, wmax), np.float32)

    preds = np.stack([g.preds for g in graphs])
    dists = np.arange(npad)[None, :, None] - preds
    maxd = int(dists[preds >= 0].max())
    stacks = (
        np.stack([g.pos for g in graphs]),
        np.stack([g.mask.astype(np.int32) for g in graphs]),
        np.stack([g.weight for g in graphs]),
        preds,
        np.stack([g.is_start for g in graphs]),
        np.stack([g.is_end for g in graphs]),
        qm, ql, nr, cw,
    )
    params = DpParams()
    ref = ak.poa_dp_batch(
        *(jnp.asarray(a) for a in stacks), params, window=32
    )
    got = _graph_dp_pallas_chunked(stacks, npad, mpad, maxd, params)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_pallas_forbid_matches_xla_core():
    """--insertion=forbid (bounded insertion budget) in the Pallas
    kernel vs the XLA windowed core: bit-exact."""
    db = testing.make_reference(n_seqs=40, n_core=200, width=350,
                                seed=12)
    n_queries = 3
    graphs, raw_nodes, qs = [], [], []
    for i in range(n_queries):
        fam = db.sequences[3 * i : 3 * i + 9]
        g = build_graph(fam)
        raw_nodes.append(g.n_nodes)
        graphs.append(g)
        qs.append(
            testing.unaligned_copy(
                testing.make_queries(
                    db, n=1, seed=400 + i, branch_len=0.6
                )[0]
            )
        )
    npad = -(-max(g.n_nodes for g in graphs) // 64) * 64
    mpad = -(-max(len(q.masks) for q in qs) // 64) * 64
    graphs = [pad_graph(g, npad) for g in graphs]
    qm = np.zeros((n_queries, mpad), np.int32)
    ql = np.zeros(n_queries, np.int32)
    for b, q in enumerate(qs):
        qm[b, : len(q.masks)] = q.masks
        ql[b] = len(q.masks)
    nr = np.asarray(raw_nodes, np.int32)
    wmax = max(g.width for g in graphs) + 2
    cw = np.ones((n_queries, wmax), np.float32)
    preds = np.stack([g.preds for g in graphs])
    dists = np.arange(npad)[None, :, None] - preds
    maxd = int(dists[preds >= 0].max())
    k = _test_ring(maxd)
    assert k > 0
    max_ins = np.stack(
        [np.clip(g.max_insert, 0, 10**6) for g in graphs]
    ).astype(np.int32)

    params = DpParams()
    args = (
        jnp.asarray(np.stack([g.pos for g in graphs])),
        jnp.asarray(
            np.stack([g.mask.astype(np.int32) for g in graphs])
        ),
        jnp.asarray(np.stack([g.weight for g in graphs])),
        jnp.asarray(preds),
        jnp.asarray(np.stack([g.is_start for g in graphs])),
        jnp.asarray(np.stack([g.is_end for g in graphs])),
        jnp.asarray(qm),
        jnp.asarray(ql),
        jnp.asarray(nr),
        jnp.asarray(cw),
    )
    ref = ak.poa_dp_batch(
        *args, params, max_insert=jnp.asarray(max_ins), window=32
    )
    got = graph_dp_pallas(
        *args, n_nodes=npad, m_len=mpad, k_ring=k, params=params,
        interpret=True, max_insert=max_ins,
    )
    for i, name in enumerate(("emit", "best_j", "best_i", "raw")):
        np.testing.assert_array_equal(
            np.asarray(ref[i]), np.asarray(got[i]), err_msg=name
        )


def test_pallas_subst_matrix_matches_xla_core():
    """Substitution-matrix scheme in the Pallas kernel vs the XLA
    oracle: bit-exact."""
    db = testing.make_reference(n_seqs=40, n_core=200, width=350,
                                seed=13)
    n_queries = 3
    graphs, raw_nodes, qs = [], [], []
    for i in range(n_queries):
        fam = db.sequences[3 * i : 3 * i + 9]
        g = build_graph(fam)
        raw_nodes.append(g.n_nodes)
        graphs.append(g)
        qs.append(
            testing.unaligned_copy(
                testing.make_queries(
                    db, n=1, seed=500 + i, branch_len=0.6
                )[0]
            )
        )
    npad = -(-max(g.n_nodes for g in graphs) // 64) * 64
    mpad = -(-max(len(q.masks) for q in qs) // 64) * 64
    graphs = [pad_graph(g, npad) for g in graphs]
    qm = np.zeros((n_queries, mpad), np.int32)
    ql = np.zeros(n_queries, np.int32)
    for b, q in enumerate(qs):
        qm[b, : len(q.masks)] = q.masks
        ql[b] = len(q.masks)
    nr = np.asarray(raw_nodes, np.int32)
    wmax = max(g.width for g in graphs) + 2
    cw = np.random.RandomState(5).uniform(
        0.5, 1.5, size=(n_queries, wmax)
    ).astype(np.float32)
    preds = np.stack([g.preds for g in graphs])
    dists = np.arange(npad)[None, :, None] - preds
    maxd = int(dists[preds >= 0].max())
    k = _test_ring(maxd)
    subst = np.random.RandomState(6).uniform(
        -2, 2, size=(n_queries, 4, 4)
    ).astype(np.float32)

    params = DpParams()
    common = (
        jnp.asarray(np.stack([g.pos for g in graphs])),
        jnp.asarray(
            np.stack([g.mask.astype(np.int32) for g in graphs])
        ),
        jnp.asarray(preds),
        jnp.asarray(np.stack([g.is_start for g in graphs])),
        jnp.asarray(np.stack([g.is_end for g in graphs])),
        jnp.asarray(qm),
        jnp.asarray(ql),
        jnp.asarray(nr),
        jnp.asarray(cw),
    )
    ref = ak.poa_dp_subst_batch(
        *common, jnp.asarray(subst), params
    )
    got = graph_dp_pallas(
        common[0], common[1],
        jnp.asarray(np.stack([g.weight for g in graphs])),
        *common[2:],
        n_nodes=npad, m_len=mpad, k_ring=k, params=params,
        interpret=True, max_insert=None,
    )
    # re-run pallas with subst via the packed entry point
    from sina_tpu.ops.graph_pallas import (
        graph_dp_pallas_packed, pack_graph_host,
    )

    mask_u8, predbits, flags = pack_graph_host(
        np.stack([g.mask.astype(np.int32) for g in graphs]),
        preds,
        np.stack([g.is_start for g in graphs]),
        np.stack([g.is_end for g in graphs]),
        nr,
    )
    got = graph_dp_pallas_packed(
        common[0], jnp.asarray(mask_u8),
        jnp.asarray(np.stack([g.weight for g in graphs])),
        jnp.asarray(predbits), jnp.asarray(flags),
        jnp.asarray(qm), jnp.asarray(ql), jnp.asarray(cw),
        None, jnp.asarray(subst),
        n_nodes=npad, m_len=mpad, k_ring=k, params=params,
        interpret=True,
    )
    # emissions and best-cell indices exact; raw may differ by 1 ulp
    # (FMA fusion differs between the fused kernel graph and the
    # oracle's separate mul+add)
    for i, name in enumerate(("emit", "best_j", "best_i")):
        np.testing.assert_array_equal(
            np.asarray(ref[i]), np.asarray(got[i]), err_msg=name
        )
    np.testing.assert_allclose(
        np.asarray(ref[3]), np.asarray(got[3]), rtol=1e-6,
        err_msg="raw",
    )
