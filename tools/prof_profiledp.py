"""Micro-profile the profile-DP path on the real chip.

Separates the per-call cost into (a) the fused Pallas forward DP
(writes the (C, B, M) backpointer plane), (b) the vmapped traceback
fori (C + 2M steps), (c) the full packed dispatch as
_profile_pallas_fn runs it.  Inputs are generated on device so the
tunnel is excluded.  Run ONE of these at a time.

Usage: python tools/prof_profiledp.py [--c 2048 3072] [--m 1536] ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

sys.stdout.reconfigure(line_buffering=True)

from sina_tpu.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:4])


def timeit(label, fn, *args, reps=5):
    t0 = time.perf_counter()
    _sync(fn(*args))
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(
        f"{label}: median {med*1e3:.1f} ms "
        f"(min {ts[0]*1e3:.1f}, max {ts[-1]*1e3:.1f}, "
        f"first {warm*1e3:.0f})"
    )
    return med


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, nargs="+", default=[2048])
    ap.add_argument("--m", type=int, default=1536)
    ap.add_argument("--batch", type=int, nargs="+", default=[128])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from sina_tpu.ops.align_kernel import DpParams
    from sina_tpu.ops import profile as prof
    from sina_tpu.ops.profile_pallas import (
        chain_dp_pallas_fused, chain_traceback_log,
    )

    params = DpParams(match=-2.0, mismatch=1.0, gap_open=5.0,
                      gap_ext=2.0)
    print(f"backend={jax.default_backend()}")

    for C in args.c:
        for B in args.batch:
            M = args.m
            key = jax.random.PRNGKey(0)
            ks = jax.random.split(key, 3)
            mk = jax.jit(
                lambda k0, k1, k2: (
                    jax.nn.softmax(
                        jax.random.normal(k0, (B, C, 4)), axis=-1
                    )
                    * 0.9,
                    jax.random.uniform(k1, (B, C)) * 0.5,
                    jax.random.randint(
                        k2, (B, M), 1, 16, dtype=jnp.uint8
                    ),
                )
            )
            freqs, gapcost, qmask = mk(*ks)
            jax.block_until_ready(qmask)
            qlen = jnp.full((B,), M - 7, dtype=jnp.int32)
            c_real = jnp.full((B,), C - 5, dtype=jnp.int32)
            bp_gb = C * B * M / 1e9
            print(f"--- C={C} M={M} B={B} (bp plane {bp_gb:.2f} GB)")

            fwd = jax.jit(
                lambda f, g, q, ql, cr: chain_dp_pallas_fused(
                    f, g, q, ql, cr,
                    params.gap_open, params.gap_ext,
                    params.match, params.mismatch, C, M,
                )
            )
            t_fwd = timeit("fused fwd DP (bp out)", fwd, freqs,
                           gapcost, qmask, qlen, c_real,
                           reps=args.reps)
            print(f"  -> bp write {bp_gb/t_fwd:.0f} GB/s")

            bp, bc, bi, raw = fwd(freqs, gapcost, qmask, qlen, c_real)
            jax.block_until_ready(bp)

            tb = jax.jit(
                lambda b, c, i: jax.vmap(
                    lambda bb, cc, ii: chain_traceback_log(
                        bb, cc, ii, C, M
                    ),
                    in_axes=(1, 0, 0),
                )(b, c, i)
            )
            timeit(f"traceback fori (L={C+2*M+8})", tb, bp, bc, bi,
                   reps=args.reps)

            # full packed dispatch (what ProfileDP "launch" wraps),
            # host->device excluded by pre-staging device arrays
            fn = prof._profile_pallas_fn(C, M, params, compact=True)
            fg = jnp.zeros((B, C, 6), dtype=jnp.uint8)
            lens = jnp.stack(
                [qlen, c_real], axis=1
            ).astype(jnp.int32)
            timeit("full _profile_pallas_fn", fn, fg, qmask, lens,
                   reps=args.reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
