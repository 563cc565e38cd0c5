"""Batched k-mer scoring: S[b, s] = Σ_l P[kmer[b, l], s].

This is the famfinder hot loop (/root/reference/src/kmer_search.cpp:
366-420 + idset.h:315-337) recast as an embedding-bag gather-sum over a
dense HBM-resident incidence matrix.  Two implementations:

  * ``kmer_scores_xla`` — plain jax (lax.scan over k-mer chunks);
    portable, used on CPU and as reference.
  * ``kmer_scores_pallas`` — TPU Pallas kernel: k-mer indices are
    scalar-prefetched and drive the BlockSpec index_map, so each grid
    step DMAs exactly one matrix row HBM→VMEM (hardware-pipelined /
    double-buffered by the Pallas runtime) and accumulates into a
    VMEM-resident output row.  This is HBM-bandwidth-bound, which is
    the speed-of-light for this op.

Invalid/padding k-mer slots must point at the all-zero final row of P.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("chunk",))
def kmer_scores_xla(P, kmers, chunk: int = 32):
    """P: (R+1, S) int8; kmers: (B, L) int32 -> (B, S) int32."""
    B, L = kmers.shape
    S = P.shape[1]
    pad = (-L) % chunk
    kmers = jnp.pad(kmers, ((0, 0), (0, pad)), constant_values=P.shape[0] - 1)
    nchunks = (L + pad) // chunk
    kc = kmers.reshape(B, nchunks, chunk).transpose(1, 0, 2)

    def step(acc, kk):
        rows = jnp.take(P, kk, axis=0).astype(jnp.int32)  # (B, chunk, S)
        return acc + rows.sum(axis=1), None

    # derive the carry from both inputs so its varying-manual-axes
    # match under shard_map (jax vma rules for scan carries)
    acc0 = (
        jnp.zeros((B, S), dtype=jnp.int32)
        + (kmers[:, :1] * 0)
        + (P[:1, :1].astype(jnp.int32) * 0)
    )
    acc, _ = jax.lax.scan(step, acc0, kc)
    return acc


_KMER_G = 8  # matrix rows accumulated per grid step


def _pallas_kernel(kmer_ref, *refs):
    from jax.experimental import pallas as pl

    rows = refs[:_KMER_G]
    out_ref = refs[_KMER_G]
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc = rows[0][...].astype(jnp.int32)
    for r in rows[1:]:
        acc += r[...].astype(jnp.int32)
    out_ref[...] += acc


# the scalar-prefetched k-mer index array lives in SMEM (1MB on
# current TPUs); cap per-call bytes and chunk the batch above it
_SMEM_BUDGET = 640 * 1024


def _batch_chunks(B: int, L: int) -> int:
    bk = max(1, _SMEM_BUDGET // (L * 4))
    return min(B, bk)


@functools.partial(jax.jit, static_argnames=())
def kmer_scores_pallas(P, kmers):
    """TPU path.  P: (R+1, S) int8, kmers: (B, L) int32 -> (B, S) int32.

    Rows are viewed as (R+1, 1, S) so the (1, 1, S) block satisfies the
    TPU tiling rule; each grid step (b, l) DMAs G rows (G index-mapped
    views of the same matrix, amortising per-step DMA latency) and
    accumulates into the b-th VMEM-resident output row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = kmers.shape
    G = _KMER_G
    pad = (-L) % G
    if pad:
        kmers = jnp.pad(
            kmers, ((0, 0), (0, pad)), constant_values=P.shape[0] - 1
        )
        L += pad
    S = P.shape[1]
    P3 = P.reshape(P.shape[0], 1, S)

    def mk_index(g):
        return lambda b, l, kref: (kref[b, l * G + g], 0, 0)

    bk = _batch_chunks(B, L)
    outs = []
    for s in range(0, B, bk):
        kc = jax.lax.dynamic_slice_in_dim(kmers, s, bk, 0) if (
            s + bk <= B
        ) else jnp.pad(
            kmers[s:], ((0, s + bk - B), (0, 0)),
            constant_values=P.shape[0] - 1,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bk, L // G),
            in_specs=[
                pl.BlockSpec((1, 1, S), mk_index(g))
                for g in range(G)
            ],
            out_specs=pl.BlockSpec(
                (1, 1, S), lambda b, l, kref: (b, 0, 0)
            ),
        )
        outs.append(
            pl.pallas_call(
                _pallas_kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (bk, 1, S), jnp.int32
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                ),
            )(kc, *([P3] * G))
        )
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out[:B].reshape(B, S)


@functools.partial(jax.jit, static_argnames=("chunk",))
def kmer_scores_packed_xla(Pp, kmers, chunk: int = 32):
    """Bitpacked scoring: Pp (R+1, Sb) uint8 (bit b of byte j =
    sequence 8j+b, KmerIndex.dense_packed) -> scores (B, Sb*8)
    int32."""
    B, L = kmers.shape
    Sb = Pp.shape[1]
    pad = (-L) % chunk
    kmers = jnp.pad(
        kmers, ((0, 0), (0, pad)), constant_values=Pp.shape[0] - 1
    )
    nchunks = (L + pad) // chunk
    kc = kmers.reshape(B, nchunks, chunk).transpose(1, 0, 2)
    bitw = jnp.arange(8, dtype=jnp.uint8)

    def step(acc, kk):
        rows = jnp.take(Pp, kk, axis=0)          # (B, chunk, Sb) u8
        bits = (rows[..., None] >> bitw) & jnp.uint8(1)
        return acc + bits.astype(jnp.int32).sum(axis=1), None

    acc0 = (
        jnp.zeros((B, Sb, 8), dtype=jnp.int32)
        + (kmers[:, :1, None] * 0)
        + (Pp[:1, :1, None].astype(jnp.int32) * 0)
    )
    acc, _ = jax.lax.scan(step, acc0, kc)
    return acc.reshape(B, Sb * 8)


def _pallas_kernel_packed(kmer_ref, *refs):
    from jax.experimental import pallas as pl

    rows = refs[:_KMER_G]
    out_ref = refs[_KMER_G]
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    us = [r[0, 0, :].astype(jnp.int32) for r in rows]
    for bit in range(8):
        acc = (us[0] >> bit) & 1
        for u in us[1:]:
            acc += (u >> bit) & 1
        out_ref[0, bit, :] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def kmer_scores_packed_pallas(Pp, kmers, interpret: bool = False):
    """TPU path over the bitpacked matrix: per grid step G packed
    rows (1, Sb) u8 are DMA'd (8x fewer bytes than dense) and
    unpacked on the VPU into a (8, Sb) per-bit accumulator; the
    (B, 8, Sb) output transposes back to sequence order outside."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = kmers.shape
    G = _KMER_G
    pad = (-L) % G
    if pad:
        kmers = jnp.pad(
            kmers, ((0, 0), (0, pad)),
            constant_values=Pp.shape[0] - 1,
        )
        L += pad
    Sb = Pp.shape[1]
    P3 = Pp.reshape(Pp.shape[0], 1, Sb)

    def mk_index(g):
        return lambda b, l, kref: (kref[b, l * G + g], 0, 0)

    bk = _batch_chunks(B, L)
    outs = []
    for s in range(0, B, bk):
        kc = jax.lax.dynamic_slice_in_dim(kmers, s, bk, 0) if (
            s + bk <= B
        ) else jnp.pad(
            kmers[s:], ((0, s + bk - B), (0, 0)),
            constant_values=Pp.shape[0] - 1,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bk, L // G),
            in_specs=[
                pl.BlockSpec((1, 1, Sb), mk_index(g))
                for g in range(G)
            ],
            out_specs=pl.BlockSpec(
                (1, 8, Sb), lambda b, l, kref: (b, 0, 0)
            ),
        )
        outs.append(
            pl.pallas_call(
                _pallas_kernel_packed,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (bk, 8, Sb), jnp.int32
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                ),
                interpret=interpret,
            )(kc, *([P3] * G))
        )
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    out = out[:B]
    # out[b, bit, byte] -> seq id = byte*8 + bit
    return out.transpose(0, 2, 1).reshape(B, Sb * 8)


def _pallas_kernel_tiled(kmer_ref, *refs):
    from jax.experimental import pallas as pl

    rows = refs[:_KMER_G]
    out_ref = refs[_KMER_G]
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    us = [r[0].astype(jnp.int32) for r in rows]      # (32, W)
    for bit in range(8):
        acc = (us[0] >> bit) & 1
        for u in us[1:]:
            acc += (u >> bit) & 1
        out_ref[0, bit] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def kmer_scores_packed_tiled_pallas(P3, kmers, interpret=False):
    """TPU path over the exact-size tiled matrix
    (KmerIndex.dense_packed_tiled): P3 (R, 32, W) u8, W % 128 == 0.
    Each grid step DMAs G full (32, W) row blocks — contiguous
    32*W-byte runs, no layout padding (the (R, 1, Sb) view's
    T(4,128)(4,1) layout 4x'd both HBM bytes and DMA traffic).
    Returns logical scores (B, 32*W*8) int32: seq id of (sub, lane,
    bit) = (sub*W + lane)*8 + bit, matching dense_packed byte
    order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = kmers.shape
    G = _KMER_G
    pad = (-L) % G
    if pad:
        kmers = jnp.pad(
            kmers, ((0, 0), (0, pad)),
            constant_values=P3.shape[0] - 1,
        )
        L += pad
    W = P3.shape[2]

    def mk_index(g):
        return lambda b, l, kref: (kref[b, l * G + g], 0, 0)

    bk = _batch_chunks(B, L)
    outs = []
    for s in range(0, B, bk):
        kc = jax.lax.dynamic_slice_in_dim(kmers, s, bk, 0) if (
            s + bk <= B
        ) else jnp.pad(
            kmers[s:], ((0, s + bk - B), (0, 0)),
            constant_values=P3.shape[0] - 1,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bk, L // G),
            in_specs=[
                pl.BlockSpec((1, 32, W), mk_index(g))
                for g in range(G)
            ],
            out_specs=pl.BlockSpec(
                (1, 8, 32, W), lambda b, l, kref: (b, 0, 0, 0)
            ),
        )
        outs.append(
            pl.pallas_call(
                _pallas_kernel_tiled,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (bk, 8, 32, W), jnp.int32
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                ),
                interpret=interpret,
            )(kc, *([P3] * G))
        )
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    out = out[:B]
    # (b, bit, sub, lane) -> seq id = (sub*W + lane)*8 + bit
    return out.transpose(0, 2, 3, 1).reshape(B, 32 * W * 8)


# A two-level byte-popcount prefilter scorer (SINA_TPU_TWOLEVEL,
# rounds 3-4) lived here; the r5 hardware A/B retired it: 1896.5 ms
# vs the default fused tiled score+grouped-top-k's 33.3 ms per
# 128x512 call at 100k refs (tools/prof_famfinder.py), and its
# required 2D layout cannot fit 450k refs next to the gather
# workspace.  The exact tiled kernel above IS the DMA-bound-regime
# answer.

_pallas_fallback_warned = False


def _pallas_failed(exc: Exception) -> None:
    """A broken Pallas kernel costs ~10x famfinder throughput — never
    swallow it silently.  SINA_TPU_STRICT_PALLAS=1 makes it fatal."""
    import os

    if os.environ.get("SINA_TPU_STRICT_PALLAS"):
        raise exc
    global _pallas_fallback_warned
    if not _pallas_fallback_warned:
        _pallas_fallback_warned = True
        import logging

        logging.getLogger("sina_tpu.kmer").warning(
            "Pallas k-mer kernel failed, falling back to XLA "
            "(~10x slower famfinder); set SINA_TPU_STRICT_PALLAS=1 "
            "to make this fatal: %r",
            exc,
        )


def kmer_scores(P, kmers):
    """Dispatch on matrix layout (3D uint8 = tiled bitpacked, 2D
    uint8 = bitpacked, int8 = dense) and backend (Pallas on TPU,
    XLA elsewhere)."""
    packed = P.dtype == jnp.uint8
    tiled = packed and P.ndim == 3
    if jax.default_backend() in ("tpu", "axon"):
        try:
            if tiled:
                return kmer_scores_packed_tiled_pallas(P, kmers)
            if packed:
                return kmer_scores_packed_pallas(P, kmers)
            return kmer_scores_pallas(P, kmers)
        except Exception as exc:  # pragma: no cover - fallback safety
            _pallas_failed(exc)
    if tiled:
        # logical byte order of the tiled view equals dense_packed's
        return kmer_scores_packed_xla(
            P.reshape(P.shape[0], -1), kmers
        )
    if packed:
        return kmer_scores_packed_xla(P, kmers)
    return kmer_scores_xla(P, kmers)


def grouped_top_k(scores, k_top: int, c_groups: int | None = None):
    """EXACT top-k over (B, S) via a group-max hierarchy: per-8
    group maxima -> top `c_groups` groups -> top-k within their 8*C
    members.  With c_groups >= k_top the top-k VALUES are provably
    exact: at most k-1 groups can have a maximum above the k-th
    score, so the true top-k always fit inside the selected groups
    (ties at the k-th value resolve by group rank instead of lowest
    id).  lax.top_k over the full 100k+ sequence axis is a large
    fraction of the famfinder step at SILVA scale; this runs it over
    an 8x smaller axis plus a k-sized cleanup."""
    B, S = scores.shape
    Sb = S // 8
    C = c_groups if c_groups is not None else max(k_top, 256)
    C = min(C, Sb)
    if S % 8 or C * 8 * 2 >= S:  # little to gain: plain top-k
        return jax.lax.top_k(scores, min(k_top, S))
    g = scores.reshape(B, Sb, 8)
    gm = g.max(axis=2)
    _, cand = jax.lax.top_k(gm, C)
    sub = jnp.take_along_axis(g, cand[:, :, None], axis=1)
    vals, sel = jax.lax.top_k(
        sub.reshape(B, C * 8), min(k_top, C * 8)
    )
    ids = (
        jnp.take_along_axis(cand, sel // 8, axis=1) * 8 + sel % 8
    )
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_scores(scores, k: int):
    """Per-query top-k: returns (values, indices) sorted descending.

    Tie-break deviates from the reference (which prefers higher ids,
    kmer_search.cpp:412): lax.top_k prefers lower indices.
    """
    return jax.lax.top_k(scores, k)
