"""Pallas TPU kernel for the profile chain DP.

One grid step per profile column; the whole batch's row (B, M) is
computed with VPU vector ops while the V/D carry lives in VMEM
scratch across the sequential grid.  All inputs/outputs stream through
the automatic block pipeline (no manual DMA, no gathers) — per-step
HBM traffic is one sub-cost row in and one V row + compact
backpointer row out.  This is the speed-of-light shape for the DP.

Backpointer rows use the compact chain layout (uint8):
  bits 0-1  V choice (edge/match/del/ins)
  bit  2    deletion opened here
  bit  3    insertion opened here
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .align_kernel import CODE_DEL, CODE_MATCH, CODE_INS

BIG = 1e6  # python float: jnp array constants cannot be captured by kernels

_LOG2 = 11  # supports M up to 2048; adjusted dynamically


def _shift_right(x, n: int, fill):
    """Shift lanes right by static n along the last axis, filling
    with `fill` (implemented as roll + mask for Mosaic)."""
    from jax.experimental.pallas import tpu as pltpu

    rolled = pltpu.roll(x, shift=n, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, x.shape, dimension=x.ndim - 1
    )
    return jnp.where(lane < n, jnp.float32(fill), rolled)


def _chain_kernel(
    sub_ref, dgo_ref, dge_ref, v_ref, bp_ref, vp_ref, dp_ref,
    *, go: float, ge: float, m_len: int,
):
    B, M = vp_ref.shape

    @_when(_program_id() == 0)
    def _init():
        vp_ref[...] = jnp.full((B, M), BIG, dtype=jnp.float32)
        dp_ref[...] = jnp.full((B, M), BIG, dtype=jnp.float32)

    Vp = vp_ref[...]
    Dp = dp_ref[...]
    sub = sub_ref[0]
    dgo = dgo_ref[0, 0][:, None]  # (B, 1)
    dge = dge_ref[0, 0][:, None]

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    edge = (_program_id() == 0) | (lane == 0)
    base = jnp.where(edge, jnp.float32(1.0), jnp.float32(BIG))

    d_open = Vp + dgo
    d_ext = Dp + dge
    dmin = jnp.minimum(d_open, d_ext)
    dsel_open = d_open < d_ext
    Drow = jnp.minimum(base, dmin)

    Vp_prev = _shift_right(Vp, 1, BIG)
    Mc = Vp_prev + sub

    U = base
    codeU = jnp.zeros((B, M), dtype=jnp.int32)
    take_d = dmin < U
    U = jnp.where(take_d, dmin, U)
    codeU = jnp.where(take_d, CODE_DEL, codeU)
    take_m = Mc < U
    U = jnp.where(take_m, Mc, U)
    codeU = jnp.where(take_m, CODE_MATCH, codeU)

    # insertion track: prefix-min by doubling
    flane = lane.astype(jnp.float32)
    cand = U + go - (flane + 1.0) * ge
    x = cand
    n = 1
    while n < m_len:
        x = jnp.minimum(x, _shift_right(x, n, BIG))
        n *= 2
    prefix = jnp.minimum(_shift_right(x, 1, BIG), jnp.float32(1.0))
    Irow = prefix + flane * ge
    Iprev = _shift_right(Irow, 1, BIG)
    Uprev = _shift_right(U, 1, BIG)
    ins_opened = (Uprev + go) <= (Iprev + ge)

    take_i = Irow <= U
    Vrow = jnp.where(take_i, Irow, U)
    code = jnp.where(take_i, CODE_INS, codeU)

    bp = (
        code
        | (dsel_open.astype(jnp.int32) << 2)
        | (ins_opened.astype(jnp.int32) << 3)
    )
    bp_ref[0] = bp.astype(jnp.uint8)
    v_ref[0] = Vrow
    vp_ref[...] = Vrow
    dp_ref[...] = Drow


def _program_id():
    from jax.experimental import pallas as pl

    return pl.program_id(0)


def _when(cond):
    from jax.experimental import pallas as pl

    return pl.when(cond)


@functools.partial(
    jax.jit,
    static_argnames=("go", "ge", "c_cols", "m_len", "interpret"),
)
def chain_dp_pallas(
    sub,      # (B, C, M) f32 (padded cols must hold BIG)
    dgo,      # (B, C) f32 per-column deletion-open
    dge,      # (B, C) f32 per-column deletion-extend
    go: float,
    ge: float,
    c_cols: int,
    m_len: int,
    interpret: bool = False,
):
    """Returns (V (C, B, M) f32, bp (C, B, M) uint8)."""
    from jax.experimental import pallas as pl

    B = sub.shape[0]
    C, M = c_cols, m_len
    sub_t = sub.transpose(1, 0, 2)          # (C, B, M)
    # (C, 1, B) so the (1, 1, B) block satisfies the TPU tiling rule
    dgo_t = dgo.T.reshape(C, 1, B)
    dge_t = dge.T.reshape(C, 1, B)

    kernel = functools.partial(
        _chain_kernel, go=go, ge=ge, m_len=M
    )
    V, bp = pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, B, M), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, B, M), lambda j: (j, 0, 0)),
            pl.BlockSpec((1, B, M), lambda j: (j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, B, M), jnp.float32),
            jax.ShapeDtypeStruct((C, B, M), jnp.uint8),
        ],
        scratch_shapes=[
            _vmem((B, M), jnp.float32),
            _vmem((B, M), jnp.float32),
        ],
        interpret=interpret,
    )(sub_t, dgo_t, dge_t)
    return V, bp


def _vmem(shape, dtype):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, dtype)


# traceback over the compact chain layout -----------------------------

_S_RESOLVE = 0
_S_CHAIN = 1
_S_DECIDE = 2
_S_INS = 3
_S_CHAIN_NE = 5
_S_DONE = 6

CODE_EDGE = 0


def chain_traceback_log(bp, best_c, best_i, c_cols: int, m_len: int):
    """Log-mode chain traceback: a fori_loop over a static step count
    whose induction variable indexes the emission log, so under vmap
    every lane writes the same log slot per step (a uniform
    dynamic_update_slice instead of a batched scatter).  Returns
    log (L,) int32 of the emitting column j (-1 = idle step).

    The emitted slave index is NOT logged: emissions consume slave
    bases in strictly consecutive decreasing order from best_i (every
    base in [head, best_i] is consumed exactly once — matches emit on
    _S_RESOLVE, insertions per base in _S_INS), so the host
    reconstructs slave_i = best_i - (emission ordinal).  Halves the
    device→host bytes."""
    L = c_cols + 2 * m_len + 8

    def body(step, carry):
        j, i, state, log = carry
        cell = bp[j, i].astype(jnp.int32)
        code = cell & 0x3
        dopen = (cell >> 2) & 1
        iopen = (cell >> 3) & 1
        at_edge = (i == 0) | (j == 0)

        def s_resolve(_):
            is_del = (code == CODE_DEL) & ~at_edge
            ns = jnp.where(is_del, _S_CHAIN, _S_DECIDE)
            return j, i, ns, jnp.where(is_del, -1, i), j

        def mk_chain(nxt):
            def s_chain(_):
                pj = jnp.maximum(j - 1, 0)
                stop = (dopen == 1) | (pj == 0)
                chain = (
                    _S_CHAIN if nxt == _S_RESOLVE else _S_CHAIN_NE
                )
                return pj, i, jnp.where(stop, nxt, chain), -1, j
            return s_chain

        def s_decide(_):
            done = at_edge | (code == CODE_EDGE)
            is_m = code == CODE_MATCH
            is_i = code == CODE_INS
            nj = jnp.where(is_m & ~done, j - 1, j)
            ni = jnp.where(is_m & ~done, i - 1, i)
            ns = jnp.where(
                done, _S_DONE,
                jnp.where(
                    is_m, _S_RESOLVE,
                    jnp.where(is_i, _S_INS, _S_CHAIN_NE),
                ),
            )
            return nj, ni, ns, -1, j

        def s_ins(_):
            ni = i - 1
            done = ni < 0
            safe = jnp.maximum(ni, 0)
            ns = jnp.where(
                done, _S_DONE,
                jnp.where(iopen == 1, _S_DECIDE, _S_INS),
            )
            return j, safe, ns, jnp.where(done, -1, safe), j

        def s_done(_):
            return j, i, jnp.int32(_S_DONE), -1, j

        nj, ni, ns, ei, ej = jax.lax.switch(
            jnp.minimum(state, 6),
            [
                s_resolve,
                mk_chain(_S_RESOLVE),
                s_decide,
                s_ins,
                s_resolve,
                mk_chain(_S_DECIDE),
                s_done,
            ],
            None,
        )
        row = jnp.where(ei >= 0, ej, -1).reshape(1)
        log = jax.lax.dynamic_update_slice(log, row, (step,))
        return nj, ni, ns, log

    log0 = jnp.full((L,), -1, dtype=jnp.int32)
    j, i, state, log = jax.lax.fori_loop(
        0,
        L,
        body,
        (
            best_c.astype(jnp.int32),
            best_i.astype(jnp.int32),
            jnp.int32(_S_RESOLVE),
            log0,
        ),
    )
    return log


def chain_traceback(bp, best_c, best_i, m_len: int):
    """Traceback for one query over compact chain backpointers
    bp (C, M) uint8.  Returns emit (M,) int32 (column index per slave
    base, -1 = unconsumed).  Chain-specialised version of
    align_kernel.traceback_device (pred is always c-1)."""

    M = m_len

    def cond(c):
        return c[3] != _S_DONE

    def body(carry):
        j, i, emit, state = carry
        cell = bp[j, i].astype(jnp.int32)
        code = cell & 0x3
        dopen = (cell >> 2) & 1
        iopen = (cell >> 3) & 1
        at_edge = (i == 0) | (j == 0)

        def s_resolve(_):
            is_del = (code == CODE_DEL) & ~at_edge
            nxt_emit = jnp.where(is_del, emit, emit.at[i].set(j))
            return j, i, nxt_emit, jnp.where(
                is_del, _S_CHAIN, _S_DECIDE
            )

        def mk_chain(nxt):
            def s_chain(_):
                pj = jnp.maximum(j - 1, 0)
                stop = (dopen == 1) | (pj == 0)
                return pj, i, emit, jnp.where(
                    stop, nxt, _S_CHAIN if nxt == _S_RESOLVE
                    else _S_CHAIN_NE
                )
            return s_chain

        def s_decide(_):
            done = at_edge | (code == CODE_EDGE)
            is_m = code == CODE_MATCH
            is_i = code == CODE_INS
            nj = jnp.where(is_m & ~done, j - 1, j)
            ni = jnp.where(is_m & ~done, i - 1, i)
            ns = jnp.where(
                done, _S_DONE,
                jnp.where(
                    is_m, _S_RESOLVE,
                    jnp.where(is_i, _S_INS, _S_CHAIN_NE),
                ),
            )
            return nj, ni, emit, ns

        def s_ins(_):
            ni = i - 1
            done = ni < 0
            safe = jnp.maximum(ni, 0)
            nxt_emit = jnp.where(done, emit, emit.at[safe].set(j))
            ns = jnp.where(
                done, _S_DONE,
                jnp.where(iopen == 1, _S_DECIDE, _S_INS),
            )
            return j, safe, nxt_emit, ns

        return jax.lax.switch(
            state,
            [
                s_resolve,
                mk_chain(_S_RESOLVE),
                s_decide,
                s_ins,
                s_resolve,          # unused slot (parity with graph)
                mk_chain(_S_DECIDE),
            ],
            None,
        )

    emit0 = jnp.full((M,), -1, dtype=jnp.int32)
    j, i, emit, state = jax.lax.while_loop(
        cond,
        body,
        (
            best_c.astype(jnp.int32),
            best_i.astype(jnp.int32),
            emit0,
            jnp.int32(_S_RESOLVE),
        ),
    )
    return emit
