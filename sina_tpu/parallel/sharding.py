"""Multi-chip sharding of the search index and query batches.

The reference scales out with a pool of PT-server processes talking
AISC RPC over sockets (/root/reference/src/query_pt.cpp:692-790) and
byte-range input sharding for multi-process runs (rw_fasta.cpp:209-242).
The TPU-native equivalent has no RPC at all: the k-mer incidence
matrix lives HBM-resident, sharded over the reference-sequence axis
("mp"), query batches are data-parallel over "dp", and the per-shard
top-k candidates are merged with an all-gather over ICI — XLA inserts
the collectives from shard_map specs.

Above 32k references the index ships in the exact-size tiled
(R, 32, W) layout (ops/kmer_index.dense_packed_tiled) sharded over
its lane axis: each shard holds a contiguous (R, 32, W/mp) block that
is itself an exact-size tiled matrix, so the same Pallas scorer +
grouped top-k that carried the single-chip 450k point run unchanged
per shard (VERDICT r4 #2 — the flat packed XLA path would re-hit the
HBM-layout and top-k walls round 4 removed on one chip).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

logger = logging.getLogger("sina.sharding")


def make_mesh(devices=None, dp: int | None = None) -> Mesh:
    """Build a (dp, mp) mesh over the given devices.

    Multi-host runs (jax.process_count() > 1, after
    parallel.multihost.initialize): "dp" spans hosts so the
    query-batch axis rides DCN (each host feeds its own --fasta-block
    shard, no cross-host traffic on the data axis) and "mp" stays
    within a host so the index-shard all-gather merge rides ICI.
    jax.devices() orders devices grouped by process, so the reshape
    below produces exactly that layout.

    An explicitly requested dp that does not divide the device count
    raises (no silent config-swallowing); an inferred fallback to
    dp=1 on an odd device count >= 3 is logged loudly."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is not None:
        if dp < 1 or n % dp != 0:
            raise ValueError(
                f"requested dp={dp} does not divide the "
                f"{n}-device mesh"
            )
    else:
        try:
            nproc = jax.process_count()
        except RuntimeError:  # pragma: no cover - pre-init
            nproc = 1
        if nproc > 1 and n % nproc == 0:
            dp = nproc
        else:
            dp = 2 if n % 2 == 0 and n >= 4 else 1
            if dp == 1 and n >= 3:
                logger.warning(
                    "make_mesh: %d devices is odd — using a (1, %d) "
                    "mesh (no data-parallel axis); pass dp= "
                    "explicitly to override", n, n,
                )
    mp = n // dp
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def sharded_search(mesh: Mesh, k_top: int):
    """Compiled sharded scoring+top-k.

    Returns fn(P_matrix, kmers (B, L)) -> (vals, ids) both
    (B, k_top).  P_matrix is either the bitpacked (R+1, Sb) byte
    matrix (Sb % mp == 0) sharded over bytes, the tiled
    (R+1, 32, W) layout (W % (128*mp) == 0) sharded over lanes, or
    the dense (R+1, S) int8 matrix; queries shard over "dp".
    Per-shard top-k (grouped-hierarchy exact top-k at SILVA-scale
    shard widths) merges via all-gather over "mp" — the ICI
    replacement for the PT-server candidate merge
    (query_pt.cpp:692-790)."""
    from ..ops.kmer_kernel import (
        grouped_top_k, kmer_scores_packed_tiled_pallas,
        kmer_scores_packed_xla, kmer_scores_xla,
    )

    mp = mesh.shape["mp"]
    use_pallas = jax.default_backend() in ("tpu", "axon")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, "mp"), P("dp", None),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,  # outputs are mp-replicated via all_gather
    )
    def fn_tiled(P_local, kmers_local):
        # local (R, 32, Wl) block: an exact-size tiled matrix in its
        # own right; run the single-chip kernel per shard
        Wl = P_local.shape[2]
        s_local = 32 * Wl * 8
        if use_pallas:
            scores = kmer_scores_packed_tiled_pallas(
                P_local, kmers_local
            )
        else:
            scores = kmer_scores_packed_xla(
                P_local.reshape(P_local.shape[0], 32 * Wl),
                kmers_local,
            )
        k_local = min(k_top, s_local)
        v, i = grouped_top_k(scores, k_local)
        # local tiled id (sub*Wl + lane)*8 + bit -> global id
        # (sub*W + shard*Wl + lane)*8 + bit, W = mp*Wl: the shard
        # owns lanes [shard*Wl, (shard+1)*Wl) of every sublane row
        shard = jax.lax.axis_index("mp")
        sub = i // (Wl * 8)
        rem = i % (Wl * 8)
        i = (sub * mp + shard) * (Wl * 8) + rem
        return _merge(v, i, k_local)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "mp"), P("dp", None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    def fn_flat(P_local, kmers_local):
        if P_local.dtype == jnp.uint8:  # bitpacked byte axis
            s_local = P_local.shape[1] * 8
            scores = kmer_scores_packed_xla(P_local, kmers_local)
        else:
            s_local = P_local.shape[1]
            scores = kmer_scores_xla(P_local, kmers_local)
        k_local = min(k_top, s_local)
        if s_local >= 32768:
            v, i = grouped_top_k(scores, k_local)
        else:
            v, i = jax.lax.top_k(scores, k_local)
        shard = jax.lax.axis_index("mp")
        i = i + shard * s_local
        return _merge(v, i, k_local)

    def _merge(v, i, k_local):
        # merge candidates across index shards
        vg = jax.lax.all_gather(v, "mp", axis=1)   # (B/dp, mp, k)
        ig = jax.lax.all_gather(i, "mp", axis=1)
        B = vg.shape[0]
        vflat = vg.reshape(B, mp * k_local)
        iflat = ig.reshape(B, mp * k_local)
        k_out = min(k_top, vflat.shape[1])
        vbest, sel = jax.lax.top_k(vflat, k_out)
        ibest = jnp.take_along_axis(iflat, sel, axis=1)
        if k_out < k_top:
            pad = k_top - k_out
            vbest = jnp.pad(vbest, ((0, 0), (0, pad)),
                            constant_values=-1)
            ibest = jnp.pad(ibest, ((0, 0), (0, pad)),
                            constant_values=0)
        return vbest, ibest

    def dispatch(P_matrix, kmers):
        if P_matrix.ndim == 3:
            return fn_tiled(P_matrix, kmers)
        return fn_flat(P_matrix, kmers)

    return jax.jit(dispatch)


def shard_index_matrix(mesh: Mesh, P_matrix):
    """Place the incidence matrix sharded over "mp": the tiled
    (R, 32, W) layout shards over lanes (last axis), the flat
    (R, Sb) layouts over the sequence/byte axis."""
    from jax.sharding import NamedSharding

    spec = (
        P(None, None, "mp")
        if P_matrix.ndim == 3
        else P(None, "mp")
    )
    return jax.device_put(P_matrix, NamedSharding(mesh, spec))
