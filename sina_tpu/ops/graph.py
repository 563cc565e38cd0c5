"""POA reference graph, linearised for the TPU DP kernel.

Semantics follow mseq (/root/reference/src/mseq.cpp:46-118, mseq.h):
one node per (alignment column, base) pair present in the family; node
weight blends a floor with the base's frequency at that column,
``1/(fw+1) + fw * count/num_seqs`` (mseq.cpp:111-116); edges follow
each sequence's base succession; duplicate edges removed.

Instead of an intrusive linked DAG we emit flat arrays in topological
order (columns ascend along every edge): positions, masks, weights,
padded predecessor lists, start/end flags, and the per-node insertion
budget ("free columns before the next node", mesh.h:480-484) used by
--insertion=forbid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..sequence import Sequence

MAX_PREDS = 8


@dataclass
class LinearGraph:
    pos: np.ndarray        # (N,) int32 alignment column per node
    mask: np.ndarray       # (N,) uint8 IUPAC bitmask per node
    weight: np.ndarray     # (N,) float32 node weight
    preds: np.ndarray      # (N, P) int32 predecessor node ids, -1 pad
    is_start: np.ndarray   # (N,) bool  nodes with no predecessors
    is_end: np.ndarray     # (N,) bool  nodes with no successors
    max_insert: np.ndarray  # (N,) int32 insertion budget after node
    width: int             # alignment width

    @property
    def n_nodes(self) -> int:
        return len(self.pos)


def build_graph(
    family: list[Sequence], fs_weight: float = 1.0
) -> LinearGraph:
    if not family:
        raise ValueError("empty family")
    width = family[0].width
    for s in family:
        if s.width != width:
            raise ValueError(
                f"family sequence {s.name} width {s.width} != {width}"
            )
    num_seqs = len(family)

    # node key: (column, mask-char) -> node id; nodes created in column
    # order so ids are already topological (columns ascend along edges)
    all_pos = np.concatenate([s.positions for s in family])
    all_mask = np.concatenate([s.masks for s in family])
    # np.unique over packed key gives nodes sorted by (pos, mask)
    key = all_pos.astype(np.int64) << 8 | all_mask.astype(np.int64)
    uniq, inverse, counts = np.unique(
        key, return_inverse=True, return_counts=True
    )
    n = len(uniq)
    pos = (uniq >> 8).astype(np.int32)
    mask = (uniq & 0xFF).astype(np.uint8)
    weight = (
        1.0 / (fs_weight + 1.0)
        + fs_weight * counts.astype(np.float32) / num_seqs
    ).astype(np.float32)

    # edges: consecutive bases within each sequence
    edge_src = []
    edge_dst = []
    off = 0
    for s in family:
        m = len(s.positions)
        ids = inverse[off : off + m]
        if m > 1:
            edge_src.append(ids[:-1])
            edge_dst.append(ids[1:])
        off += m
    if edge_src:
        src = np.concatenate(edge_src)
        dst = np.concatenate(edge_dst)
        ekey = src.astype(np.int64) * n + dst
        ekey = np.unique(ekey)
        src = (ekey // n).astype(np.int32)
        dst = (ekey % n).astype(np.int32)
    else:
        src = np.zeros(0, np.int32)
        dst = np.zeros(0, np.int32)

    preds = np.full((n, MAX_PREDS), -1, dtype=np.int32)
    has_succ = np.zeros(n, dtype=bool)
    # edges sorted by dst (stable keeps src ascending within dst, so
    # pred slots are id-ascending); slot = rank within the dst group,
    # ranks >= MAX_PREDS truncated (rare; documented deviation)
    order = np.argsort(dst, kind="stable")
    d_sorted = dst[order]
    s_sorted = src[order]
    first = np.searchsorted(d_sorted, d_sorted, side="left")
    ranks = np.arange(len(d_sorted)) - first
    keep = ranks < MAX_PREDS
    preds[d_sorted[keep], ranks[keep]] = s_sorted[keep]
    pred_count = np.bincount(dst, minlength=n).astype(np.int32)
    has_succ[src] = True

    is_start = pred_count == 0
    is_end = ~has_succ

    # insertion budget: min successor position - pos - 1 (mesh.h:480-484)
    min_next = np.full(n, np.iinfo(np.int32).max, dtype=np.int64)
    if len(src):
        np.minimum.at(min_next, src, pos[dst].astype(np.int64))
    max_insert = np.where(
        has_succ, min_next - pos - 1, np.int64(10**6)
    ).astype(np.int32)

    return LinearGraph(
        pos, mask, weight, preds, is_start, is_end, max_insert, width
    )


def graph_to_dot(g: LinearGraph, name: str = "reference") -> str:
    """Graphviz dump of the POA graph (--debug-graph; semantics of
    dag::print_graphviz, /root/reference/src/graph.h:359-394)."""
    from .. import alphabet

    lines = [f"digraph {name} {{", "rotate=90"]
    for j in range(g.n_nodes):
        ch = chr(alphabet.MASK_TO_RNA[g.mask[j]])
        lines.append(
            f'n{j} [ label = "{ch}({g.pos[j]})" ];'
        )
        for p in g.preds[j]:
            if p >= 0:
                lines.append(f"n{p} -> n{j};")
    lines.append("}")
    return "\n".join(lines) + "\n"


def pad_graph(g: LinearGraph, n_pad: int) -> LinearGraph:
    """Pad node arrays to n_pad for shape-bucketed batching.  Padding
    nodes are isolated non-start non-end nodes at the final column."""
    n = g.n_nodes
    if n_pad < n:
        raise ValueError(f"pad {n_pad} < nodes {n}")
    e = n_pad - n
    return LinearGraph(
        np.concatenate([g.pos, np.full(e, g.width - 1, np.int32)]),
        np.concatenate([g.mask, np.zeros(e, np.uint8)]),
        np.concatenate([g.weight, np.zeros(e, np.float32)]),
        np.concatenate(
            [g.preds, np.full((e, g.preds.shape[1]), -1, np.int32)]
        ),
        np.concatenate([g.is_start, np.zeros(e, bool)]),
        np.concatenate([g.is_end, np.zeros(e, bool)]),
        np.concatenate([g.max_insert, np.zeros(e, np.int32)]),
        g.width,
    )
