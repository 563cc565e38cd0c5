"""Synthetic reference-alignment generator for tests and benchmarks.

The reference's test fixture is a miniature real database
(test_data/ltp_reduced.arb, a git submodule not shipped with the
sources).  We generate an equivalent miniature fixture: sequences are
evolved along a random binary tree with substitutions, deletions and
insertions, tracked directly in alignment-column space so the resulting
MSA is consistent by construction.  Taxonomy strings are derived from
the tree path, giving realistic LCA-classification targets.
"""

from __future__ import annotations

import numpy as np

from .sequence import Sequence
from .refdb import ReferenceDb
from . import alphabet

_BASES = np.array(
    [alphabet.M_A, alphabet.M_G, alphabet.M_C, alphabet.M_TU],
    dtype=np.uint8,
)

_TAX_LEVELS = ["Dom", "Phy", "Cls", "Ord", "Fam", "Gen"]


def _random_base(rng, n):
    return _BASES[rng.integers(0, 4, size=n)]


def _evolve(
    cols: np.ndarray,
    rates: np.ndarray,
    rng: np.random.Generator,
    branch_len: float,
) -> np.ndarray:
    """One branch of evolution on a column-space sequence.

    cols: (W,) uint8 masks, 0 = gap.  rates: per-column relative
    substitution rate.  branch_len scales event probabilities.
    """
    out = cols.copy()
    occupied = np.nonzero(out != 0)[0]
    n = len(occupied)
    if n == 0:
        return out
    # substitutions
    p_sub = np.clip(0.06 * branch_len * rates[occupied], 0, 0.75)
    sub = rng.random(n) < p_sub
    if sub.any():
        out[occupied[sub]] = _random_base(rng, int(sub.sum()))
    # deletions: short runs at variable columns
    p_del = 0.004 * branch_len
    dele = rng.random(n) < p_del * rates[occupied]
    if dele.any():
        out[occupied[dele]] = 0
    # insertions into currently-empty columns
    empty = np.nonzero(out == 0)[0]
    if len(empty):
        p_ins = 0.003 * branch_len
        ins = rng.random(len(empty)) < p_ins
        if ins.any():
            out[empty[ins]] = _random_base(rng, int(ins.sum()))
    return out


_PAIRING = {
    alphabet.M_A: alphabet.M_TU,
    alphabet.M_TU: alphabet.M_A,
    alphabet.M_G: alphabet.M_C,
    alphabet.M_C: alphabet.M_G,
}


def make_reference(
    n_seqs: int = 200,
    n_core: int = 900,
    width: int = 1500,
    seed: int = 1234,
    n_stems: int = 0,
) -> ReferenceDb:
    """Generate a synthetic reference MSA of n_seqs sequences.  With
    n_stems > 0, helix stems are planted (complementary core columns)
    and the bundle carries the pairing vector so the bp score metric
    (cseq::calcPairScore) has signal."""
    rng = np.random.default_rng(seed)
    # root: occupied core columns spread over the width
    core_cols = np.sort(
        rng.choice(width, size=min(n_core, width), replace=False)
    )
    root = np.zeros(width, dtype=np.uint8)
    root[core_cols] = _random_base(rng, len(core_cols))

    pairs = np.zeros(width, dtype=np.int32)
    if n_stems > 0:
        stem_len = 5
        n_half = len(core_cols) // 2
        for _ in range(n_stems):
            a0 = int(rng.integers(0, max(1, n_half - stem_len)))
            b0 = int(
                rng.integers(n_half, len(core_cols) - stem_len)
            )
            for t in range(stem_len):
                i = int(core_cols[a0 + t])
                j = int(core_cols[b0 + stem_len - 1 - t])
                if pairs[i] or pairs[j] or i == 0 or j == 0:
                    continue
                pairs[i], pairs[j] = j, i
                root[j] = _PAIRING[int(root[i]) & 0xF]
    # per-column variability: mostly conserved, some hot columns
    rates = np.where(rng.random(width) < 0.25, 3.0, 0.35)

    # evolve a binary tree until we have n_seqs leaves
    leaves: list[tuple[np.ndarray, list[int]]] = []

    def grow(cols, path, depth):
        if len(leaves) >= n_seqs:
            return
        if depth == 0 or (
            len(leaves) + 2 ** depth > n_seqs and rng.random() < 0.3
        ):
            leaves.append((cols, path))
            return
        for child in range(2):
            blen = float(rng.uniform(0.3, 1.2))
            grow(
                _evolve(cols, rates, rng, blen),
                path + [child],
                depth - 1,
            )

    depth = int(np.ceil(np.log2(max(n_seqs, 2)))) + 2
    while len(leaves) < n_seqs:
        grow(_evolve(root, rates, rng, 0.5), [len(leaves) % 2], depth)
    leaves = leaves[:n_seqs]

    seqs = []
    for i, (cols, path) in enumerate(leaves):
        pos = np.nonzero(cols)[0].astype(np.uint32)
        seq = Sequence(
            f"SEQ{i:05d}",
            pos,
            cols[pos].astype(np.uint8),
            width,
            {},
        )
        # taxonomy from tree path (grouped 1 bit per level)
        labels = []
        acc = 0
        for lvl, name in enumerate(_TAX_LEVELS):
            if lvl < len(path):
                acc = acc * 2 + path[lvl]
            labels.append(f"{name}{acc}")
        seq.attrs["tax_slv"] = ";".join(labels) + ";"
        seq.attrs["acc"] = f"ACC{i:05d}"
        seq.attrs["start"] = "1"
        seq.attrs["stop"] = str(len(pos))
        seq.attrs["version"] = "1"
        seqs.append(seq)
    return ReferenceDb(seqs, width, pairs=pairs)


def make_reference_large(
    n_seqs: int,
    n_core: int = 1450,
    width: int = 50_000,
    seed: int = 1234,
    group: int = 64,
) -> ReferenceDb:
    """SILVA-scale synthetic reference (100k+ seqs, 50k columns).

    The tree generator above is O(width) per tree node and unusable at
    this scale; here a two-level ancestry (root -> n_seqs/group
    ancestors -> leaves) is built vectorised over the ~n_core occupied
    columns only, so cost is O(n_seqs * n_core) regardless of width.
    Taxonomy derives from the ancestor index (group = genus)."""
    rng = np.random.default_rng(seed)
    core_cols = np.sort(
        rng.choice(width, size=min(n_core, width), replace=False)
    ).astype(np.uint32)
    nc = len(core_cols)
    root = _BASES[rng.integers(0, 4, size=nc)]
    rates = np.where(rng.random(nc) < 0.25, 3.0, 0.35)
    # spare (empty) columns adjacent to core columns for insertions
    empty = np.setdiff1d(
        np.arange(width, dtype=np.uint32), core_cols
    )

    n_anc = -(-n_seqs // group)
    # ancestors: substitutions only (vectorised (n_anc, nc))
    p_anc = np.clip(0.10 * rates, 0, 0.6)
    sub = rng.random((n_anc, nc)) < p_anc
    anc = np.broadcast_to(root, (n_anc, nc)).copy()
    anc[sub] = _BASES[rng.integers(0, 4, size=int(sub.sum()))]
    # ancestor deletions: short random knockouts
    anc_keep = rng.random((n_anc, nc)) > 0.01 * rates

    seqs: list[Sequence] = []
    for a in range(n_anc):
        B = min(group, n_seqs - a * group)
        if B <= 0:
            break
        bases = np.broadcast_to(anc[a], (B, nc)).copy()
        p_leaf = np.clip(0.03 * rates, 0, 0.5)
        sub = rng.random((B, nc)) < p_leaf
        bases[sub] = _BASES[rng.integers(0, 4, size=int(sub.sum()))]
        keep = anc_keep[a][None, :] & (
            rng.random((B, nc)) > 0.004 * rates
        )
        n_ins = rng.poisson(2.0, size=B)
        for b in range(B):
            i = a * group + b
            kb = keep[b]
            pos = core_cols[kb]
            msk = bases[b][kb]
            if n_ins[b]:
                icols = rng.choice(
                    empty, size=n_ins[b], replace=False
                ).astype(np.uint32)
                ibase = _BASES[rng.integers(0, 4, size=n_ins[b])]
                pos = np.concatenate([pos, icols])
                msk = np.concatenate([msk, ibase])
                order = np.argsort(pos, kind="stable")
                pos, msk = pos[order], msk[order]
            seq = Sequence(
                f"SEQ{i:06d}", pos.astype(np.uint32),
                msk.astype(np.uint8), width, {},
            )
            labels = []
            acc = 0
            for lvl, name in enumerate(_TAX_LEVELS):
                acc = acc * 2 + ((a >> (len(_TAX_LEVELS) - 1 - lvl)) & 1)
                labels.append(f"{name}{acc}")
            seq.attrs["tax_slv"] = ";".join(labels) + ";"
            seq.attrs["acc"] = f"ACC{i:06d}"
            seq.attrs["start"] = "1"
            seq.attrs["stop"] = str(len(pos))
            seq.attrs["version"] = "1"
            seqs.append(seq)
    return ReferenceDb(seqs, width)


def make_queries(
    db: ReferenceDb,
    n: int = 20,
    seed: int = 99,
    branch_len: float = 0.8,
) -> list[Sequence]:
    """Evolve one extra branch off random reference sequences; the
    returned Sequences carry their true alignment (positions) so tests
    can score realignment accuracy, and attrs['parent'] names the
    origin."""
    rng = np.random.default_rng(seed)
    width = db.width
    rates = np.where(rng.random(width) < 0.25, 3.0, 0.35)
    out = []
    for i in range(n):
        j = int(rng.integers(0, len(db)))
        parent = db.sequences[j]
        cols = np.zeros(width, dtype=np.uint8)
        cols[parent.positions] = parent.masks
        cols = _evolve(cols, rates, rng, branch_len)
        pos = np.nonzero(cols)[0].astype(np.uint32)
        q = Sequence(
            f"QRY{i:04d}", pos, cols[pos].astype(np.uint8), width, {}
        )
        q.attrs["parent"] = parent.name
        out.append(q)
    return out


def unaligned_copy(seq: Sequence) -> Sequence:
    """Strip alignment information (what a FASTA query looks like)."""
    n = len(seq.positions)
    return Sequence(
        seq.name,
        np.arange(n, dtype=np.uint32),
        seq.masks.copy(),
        n,
        dict(seq.attrs),
    )
