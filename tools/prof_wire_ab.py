"""A/B the coalesced-wire profile-DP entry vs the direct multi-array
entry on the real chip, at given shapes.  Separates device-side cost
(pre-staged device inputs) from the host dispatch (includes the
tunnel transfer), so a wire-induced device-side relayout shows up
unambiguously.

Usage: python tools/prof_wire_ab.py [--c 2048] [--m 1536] [--b 128]
Run ONE TPU job at a time.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.stdout.reconfigure(line_buffering=True)

from sina_tpu.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does not actually wait on the tunnelled
    # backend; fetching a few elements does (same as prof_profiledp)
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
    print(f"{label}: median {med*1e3:.1f} ms "
          f"(min {ts[0]*1e3:.1f}, max {ts[-1]*1e3:.1f}, "
          f"first {warm*1e3:.0f})")
    return med


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=2048)
    ap.add_argument("--m", type=int, default=1536)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    C, M, B = args.c, args.m, args.b

    from sina_tpu.ops.align_kernel import DpParams
    from sina_tpu.ops.profile import (
        _build_wire, _pack_fgq, _profile_pallas_fn, _profile_wire_fn,
    )

    params = DpParams(match=-2.0, mismatch=1.0, gap_open=5.0,
                      gap_ext=2.0)
    print(f"backend={jax.default_backend()} C={C} M={M} B={B}")

    rng = np.random.default_rng(3)
    freqs = rng.random((B, C, 4)).astype(np.float32)
    freqs /= freqs.sum(axis=2, keepdims=True) * 1.25
    gapcost = (rng.random((B, C)) * 2).astype(np.float32)
    qmask = (1 << rng.integers(0, 4, (B, M), dtype=np.uint8)).astype(
        np.uint8
    )
    qlen = np.full(B, M - 7, np.int32)
    cr = np.full(B, C - 5, np.int32)
    fg = _pack_fgq(freqs, gapcost, params)
    lens = np.stack([qlen, cr], axis=1).astype(np.int32)
    wire = _build_wire(fg, qmask, lens, None, None, C, M,
                       dedup=False, aspace=False)

    compact = max(C, M) < 32000
    direct = _profile_pallas_fn(C, M, params, compact=compact)
    wired = _profile_wire_fn(C, M, params, B, B, aspace=False,
                             dedup=False, compact=compact,
                             pallas=True)

    # device-side only (inputs pre-staged)
    fg_d, qm_d, lens_d = (jnp.asarray(x) for x in (fg, qmask, lens))
    wire_d = jnp.asarray(wire)
    jax.block_until_ready((fg_d, qm_d, lens_d, wire_d))
    timeit("direct (device inputs)", direct, fg_d, qm_d, lens_d,
           reps=args.reps)
    timeit("wire   (device inputs)", wired, wire_d, reps=args.reps)

    # host dispatch incl. transfer
    timeit("direct (host arrays)",
           lambda: direct(jnp.asarray(fg), jnp.asarray(qmask),
                          jnp.asarray(lens)), reps=args.reps)
    timeit("wire   (host arrays)",
           lambda: wired(jnp.asarray(wire)), reps=args.reps)
    # and the host wire-build cost itself
    t0 = time.perf_counter()
    for _ in range(5):
        _build_wire(fg, qmask, lens, None, None, C, M,
                    dedup=False, aspace=False)
    print(f"host _build_wire: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
