"""Inverted k-mer index as a dense device incidence matrix.

The reference keeps an inverted index kmer -> compressed id-set and
scores a query by bumping one counter per posting per query k-mer
(/root/reference/src/kmer_search.cpp:152-276,366-420, idset.h:315-337).
On TPU the natural formulation is dense: an HBM-resident incidence
matrix  P[kmer_row, seq] ∈ {0,1} (int8)  and scoring as an
embedding-bag gather-sum  S[b,:] = Σ_l P[kmer[b,l], :]  — an
HBM-bandwidth-bound kernel (see ops/kmer_kernel.py).  "fast" mode
(prefix-A k-mers, kmer_search.cpp:172) quarters the row count.

The index caches to ``<bundle>/index-k{k}{f}.sidx.npz`` (CSR form,
much smaller than dense) with an mtime freshness check, mirroring the
reference's .sidx artefact cache (kmer_search.cpp:213-242).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from .kmer import kmers_of_masks, BASE_A
from ..refdb import ReferenceDb

logger = logging.getLogger("sina.kmer_index")

SIDX_VERSION = 1


class KmerIndex:
    def __init__(
        self,
        k: int,
        fast: bool,
        n_seqs: int,
        seq_kmers: np.ndarray,
        seq_offsets: np.ndarray,
    ):
        self.k = k
        self.fast = fast
        self.n_seqs = n_seqs
        self.n_rows = 4 ** (k - 1) if fast else 4 ** k
        # CSR: unique k-mers of sequence i are
        # seq_kmers[seq_offsets[i]:seq_offsets[i+1]]
        self.seq_kmers = seq_kmers
        self.seq_offsets = seq_offsets
        self._dense: np.ndarray | None = None
        self._device = None

    # -- construction / caching --------------------------------------

    @classmethod
    def build(cls, db: ReferenceDb, k: int = 10, fast: bool = True):
        cache = None
        if db.path is not None:
            f = "f" if fast else ""
            cache = Path(db.path) / f"index-k{k}{f}.sidx.npz"
            src = Path(db.path) / "arrays.npz"
            if cache.exists() and src.exists():
                if cache.stat().st_mtime >= src.stat().st_mtime:
                    idx = cls.try_load(cache, k, fast, len(db))
                    if idx is not None:
                        return idx
                else:
                    logger.warning(
                        "Reference %s newer than %s - rebuilding",
                        src, cache,
                    )
        idx = cls._build_from_db(db, k, fast)
        if cache is not None:
            idx.store(cache)
        return idx

    @classmethod
    def _build_from_db(cls, db: ReferenceDb, k: int, fast: bool):
        import time

        t0 = time.time()
        # native multithreaded builder (the reference parallel_reduces
        # this, kmer_search.cpp:152-211); python loop as fallback
        from .. import native

        base_offsets, _, flat_mask4 = db.flat_arrays()
        built = native.build_kmer_lists(
            flat_mask4, base_offsets, k, fast
        )
        if built is not None:
            flat, offsets = built
            logger.info(
                "Built index from %d sequences (%d postings, "
                "native, %.1fs)",
                len(db), len(flat), time.time() - t0,
            )
            return cls(k, fast, len(db), flat, offsets)

        from ..progress import Progress

        prefix = BASE_A if fast else None
        lists = []
        with Progress("Building Index", total=len(db)) as p:
            for s in db.sequences:
                lists.append(
                    kmers_of_masks(
                        s.masks, k, prefix_base=prefix, unique=True
                    ).astype(np.int32)
                )
                p.update()
        offsets = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in lists], out=offsets[1:])
        flat = (
            np.concatenate(lists)
            if lists
            else np.zeros(0, dtype=np.int32)
        )
        logger.info(
            "Built index from %d sequences (%d refs)", len(db), len(flat)
        )
        return cls(k, fast, len(db), flat, offsets)

    def store(self, path: Path) -> None:
        np.savez_compressed(
            path,
            version=np.int64(SIDX_VERSION),
            k=np.int64(self.k),
            fast=np.int64(1 if self.fast else 0),
            n_seqs=np.int64(self.n_seqs),
            seq_kmers=self.seq_kmers,
            seq_offsets=self.seq_offsets,
        )

    @classmethod
    def try_load(cls, path: Path, k: int, fast: bool, n_seqs: int):
        try:
            z = np.load(path)
            if (
                int(z["version"]) != SIDX_VERSION
                or int(z["k"]) != k
                or bool(z["fast"]) != fast
                or int(z["n_seqs"]) != n_seqs
            ):
                logger.error(
                    "Index file %s does not match requested "
                    "parameters - rebuilding", path,
                )
                return None
            return cls(
                k, fast, n_seqs, z["seq_kmers"], z["seq_offsets"]
            )
        except Exception as e:  # corrupt cache -> rebuild
            logger.error("Failed to load %s (%s) - rebuilding", path, e)
            return None

    # -- dense representation ----------------------------------------

    def dense(self) -> np.ndarray:
        """(n_rows+1, S_pad) int8 incidence matrix; the extra final
        row stays all-zero as the padding target for invalid k-mers,
        and the sequence axis is padded to a multiple of 128 (TPU lane
        tiling) with all-zero columns."""
        if self._dense is None:
            s_pad = -(-self.n_seqs // 128) * 128
            P = np.zeros((self.n_rows + 1, s_pad), dtype=np.int8)
            seq_ids = np.repeat(
                np.arange(self.n_seqs, dtype=np.int64),
                np.diff(self.seq_offsets),
            )
            P[self.seq_kmers, seq_ids] = 1
            self._dense = P
        return self._dense

    def dense_packed(self) -> np.ndarray:
        """(n_rows+1, S_pad/8) uint8 bitpacked incidence matrix:
        bit b of byte j = sequence 8j+b present (little bit order).
        8x smaller than dense() in HBM and per-row DMA — the
        incidence is {0,1}, the int8 byte per sequence was pure
        padding.  The sequence axis pads to a multiple of 1024 so the
        byte axis keeps TPU lane tiling (128).  Built straight from
        the CSR postings; the unpacked matrix is never materialised."""
        if getattr(self, "_packed", None) is None:
            from .. import native

            s_pad = -(-max(self.n_seqs, 1) // 1024) * 1024
            P = np.zeros((self.n_rows + 1, s_pad // 8), dtype=np.uint8)
            if not native.fill_packed(
                self.seq_kmers, self.seq_offsets, self.n_seqs, P
            ):
                seq_ids = np.repeat(
                    np.arange(self.n_seqs, dtype=np.int64),
                    np.diff(self.seq_offsets),
                )
                np.bitwise_or.at(
                    P,
                    (self.seq_kmers, seq_ids >> 3),
                    (np.uint8(1) << (seq_ids & 7).astype(np.uint8)),
                )
            self._packed = P
        return self._packed

    def dense_packed_tiled(
        self, byte_multiple: int = 4096
    ) -> np.ndarray:
        """(n_rows+1, 32, W) uint8 row-major view of dense_packed()
        with the byte axis padded to a `byte_multiple` multiple
        (W = Sb4/32; byte_multiple must keep W % 128 == 0, i.e. be a
        multiple of 4096).

        The TPU u8 tile is (32, 128) sublanes x lanes; with the
        sublane dim exactly 32 and W a multiple of 128 the HBM
        layout is EXACT-SIZE and each k-mer row is one contiguous
        run of 32*W bytes.  The old (R, 1, Sb) kernel view forced a
        T(4,128)(4,1) layout that padded the size-1 dim 4x — 59GB
        for the 14.7GB SILVA-NR index (the r4 single-chip OOM) and
        ~4x the DMA bytes per row.

        The multi-chip path passes byte_multiple = 4096 * mp so the
        lane axis splits evenly over "mp" index shards, each shard a
        contiguous, locally exact-size tiled block
        (parallel/sharding.sharded_search)."""
        if byte_multiple % 4096:
            raise ValueError(
                f"byte_multiple must be a multiple of 4096 "
                f"(got {byte_multiple})"
            )
        P = self.dense_packed()
        Sb = P.shape[1]
        m = byte_multiple
        Sb4 = -(-max(Sb, m) // m) * m
        if Sb4 != Sb:
            P = np.pad(P, ((0, 0), (0, Sb4 - Sb)))
        return np.ascontiguousarray(P).reshape(
            P.shape[0], 32, Sb4 // 32
        )

    def device_matrix(
        self, packed: bool = True, tiled: bool | None = None
    ):
        """Incidence matrix as a jax array (cached); bitpacked by
        default.  On TPU backends the packed matrix ships in the
        exact-size tiled (R, 32, W) layout (dense_packed_tiled);
        elsewhere as the plain (R, Sb) byte matrix.  `tiled`
        overrides the backend default."""
        import jax
        import jax.numpy as jnp

        if not isinstance(self._device, dict):
            self._device = {}
        if tiled is None:
            # below 32k refs the tiled form's 4096-byte row floor
            # would INFLATE the matrix (2k refs: 256 -> 4096 B/row);
            # the (R, 1, Sb) view's 4x pad is noise at those sizes
            tiled = (
                packed
                and jax.default_backend() in ("tpu", "axon")
                and -(-max(self.n_seqs, 1) // 1024) * 1024 >= 32768
            )
        key = (packed, tiled)
        if key not in self._device:
            # NOTE: the tiled matrix must ship as a HOST array via
            # device_put.  A device-side pad+reshape upload (saving
            # the ~30% tiled-pad bytes over the tunnel) was measured
            # at 43 s/batch steady state: the reshape output's layout
            # differed from the cached scoring executable's input
            # spec, so XLA re-laid-out the 4.3GB matrix on EVERY
            # call (r5, /tmp/r5_100k_c.log).
            if packed and tiled:
                arr = self.dense_packed_tiled()
            elif packed:
                arr = self.dense_packed()
            else:
                arr = self.dense()
            self._device[key] = jnp.asarray(arr)
        return self._device[key]
