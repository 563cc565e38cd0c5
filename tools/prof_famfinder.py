"""Micro-profile the famfinder scoring path on the real chip.

Separates the per-batch famfinder cost into (a) the Pallas packed
gather-sum, (b) the device top-k, (c) the fused score+topk dispatch,
at SILVA scale (n_refs=100k) and below.  The index matrix is
generated ON DEVICE (random bytes) so the ~25MB/s tunnel upload is
excluded.  Run ONE of these at a time (tunnel compiles queue).

Usage:  python tools/prof_famfinder.py [--n-refs 100000] [--g 8] ...
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
    """block_until_ready is unreliable over the tunneled backend —
    force real completion by fetching a few bytes of the result."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:4])


def timeit(label, fn, *args, reps=5):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(
        f"{label}: median {ts[len(ts)//2]*1e3:.1f} ms "
        f"(min {ts[0]*1e3:.1f}, max {ts[-1]*1e3:.1f})"
    )
    return ts[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-refs", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=128)
    # fast mode keeps ~1/4 of a 1450nt query's k-mers -> ~360,
    # bucketed to 512 (the production shape at full length)
    ap.add_argument("--kmer-l", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--topk", type=int, default=256)
    ap.add_argument("--g", type=int, default=0,
                    help="also sweep this _KMER_G value")
    ap.add_argument("--skip-score", action="store_true")
    args = ap.parse_args()

    n_rows = 4 ** (args.k - 1) + 1
    s_pad = -(-args.n_refs // 1024) * 1024
    Sb = s_pad // 8
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} n_refs={args.n_refs} "
          f"rows={n_rows} Sb={Sb} ({n_rows*Sb/1e9:.2f} GB)")
    t0 = time.time()
    P = jax.jit(
        lambda k: jax.random.randint(
            k, (n_rows, Sb), 0, 256, dtype=jnp.uint8
        )
    )(key)
    jax.block_until_ready(P)
    print(f"matrix on device in {time.time()-t0:.1f}s")
    kmers = jnp.asarray(
        np.random.default_rng(1).integers(
            0, n_rows - 1, (args.batch, args.kmer_l), dtype=np.int32
        )
    )

    from sina_tpu.ops import kmer_kernel as kk

    if not args.skip_score:
        sc = timeit(
            "pallas packed score", kk.kmer_scores_packed_pallas,
            P, kmers,
        )
        bytes_read = args.batch * args.kmer_l * Sb
        print(f"  -> effective {bytes_read/sc/1e9:.1f} GB/s "
              f"(rows DMA'd: {args.batch*args.kmer_l})")
        # exact-size tiled layout (dense_packed_tiled shape)
        Sb4 = -(-Sb // 4096) * 4096
        P3 = jnp.pad(P, ((0, 0), (0, Sb4 - Sb))).reshape(
            n_rows, 32, Sb4 // 32
        )
        jax.block_until_ready(P3)
        sct = timeit(
            "pallas TILED score", kk.kmer_scores_packed_tiled_pallas,
            P3, kmers,
        )
        bytes_read = args.batch * args.kmer_l * Sb4
        print(f"  -> effective {bytes_read/sct/1e9:.1f} GB/s "
              f"(tiled rows: {args.batch*args.kmer_l})")
        tk = jax.jit(lambda s: kk.grouped_top_k(s, args.topk))
        def fused_tiled(P3, kmers):
            s = kk.kmer_scores_packed_tiled_pallas(P3, kmers)
            v, i = kk.grouped_top_k(s, args.topk)
            return jnp.concatenate([v, i], axis=1)
        timeit("fused TILED score+grouped_topk",
               jax.jit(fused_tiled), P3, kmers)
        del P3  # both layouts at SILVA scale exceed HBM headroom

    scores = kk.kmer_scores_packed_pallas(P, kmers)
    jax.block_until_ready(scores)

    topk_fn = jax.jit(lambda s: jax.lax.top_k(s, args.topk))
    timeit(f"lax.top_k k={args.topk} over {scores.shape}", topk_fn,
           scores)

    # argmax only (what the coarse stage of a two-level scorer needs)
    timeit("argmax", jax.jit(lambda s: jnp.argmax(s, axis=1)), scores)

    # fused, as _score_topk_compiled does
    def fused(P, kmers):
        s = kk.kmer_scores_packed_pallas(P, kmers)
        v, i = jax.lax.top_k(s, args.topk)
        return jnp.concatenate([v, i], axis=1)

    timeit("fused score+topk", jax.jit(fused), P, kmers)

    # (The two-level byte-prefilter scorer was A/B'd here in r5 and
    # retired: 1896.5 ms vs the fused tiled path's 33.3 ms at 100k.)

    if args.g:
        kk._KMER_G = args.g
        kk.kmer_scores_packed_pallas.clear_cache()
        timeit(f"pallas packed score G={args.g}",
               kk.kmer_scores_packed_pallas, P, kmers)
    return 0


if __name__ == "__main__":
    sys.exit(main())
