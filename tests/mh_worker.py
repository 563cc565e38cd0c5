"""Worker for the 2-process multi-host test (test_multihost.py).

Each process initialises jax.distributed against a local coordinator,
builds the SAME synthetic reference (fixed seed), shards the k-mer
incidence matrix over the global (dp, mp) mesh, runs sharded_search,
and writes its view of the merged top-k plus its host_input_shard
parameters to a JSON file for the parent test to assert on.
"""

import json
import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    fasta_path = sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sina_tpu.parallel import multihost

    multihost.initialize(
        coordinator=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import numpy as np

    from sina_tpu import testing
    from sina_tpu.parallel.sharding import (
        make_mesh, shard_index_matrix, sharded_search,
    )
    from sina_tpu.ops.kmer_index import KmerIndex
    from sina_tpu.ops.kmer import query_kmers_padded
    from sina_tpu.ops.kmer_kernel import kmer_scores_packed_xla

    db = testing.make_reference(
        n_seqs=64, n_core=300, width=500, seed=77
    )
    idx = KmerIndex.build(db, k=8, fast=True)
    P = idx.dense_packed()

    mesh = make_mesh()
    assert mesh.shape["dp"] == nproc, mesh.shape
    mp = mesh.shape["mp"]
    Sb = P.shape[1]
    Sb_pad = -(-Sb // mp) * mp
    if Sb_pad != Sb:
        P = np.pad(P, ((0, 0), (0, Sb_pad - Sb)))

    import jax.numpy as jnp

    # global sharded placement of the (replicated-source) matrix
    from jax.sharding import NamedSharding, PartitionSpec as Psp

    Pg = jax.make_array_from_callback(
        P.shape,
        NamedSharding(mesh, Psp(None, "mp")),
        lambda i: P[i],
    )

    queries = [
        testing.unaligned_copy(s) for s in db.sequences[::8]
    ]
    kmers, _ = query_kmers_padded(
        [q.masks for q in queries], idx.k, fast=True
    )
    dp = nproc
    B = kmers.shape[0]
    B_pad = -(-B // dp) * dp
    if B_pad != B:
        kmers = np.pad(
            kmers, ((0, B_pad - B), (0, 0)),
            constant_values=P.shape[0] - 1,
        )
    kg = jax.make_array_from_callback(
        kmers.shape,
        NamedSharding(mesh, Psp("dp", None)),
        lambda i: kmers[i],
    )
    k_top = 8
    fn = sharded_search(mesh, k_top)
    vals, ids = fn(Pg, kg)

    from jax.experimental import multihost_utils

    vals = np.asarray(
        multihost_utils.process_allgather(vals, tiled=True)
    )[:B]
    ids = np.asarray(
        multihost_utils.process_allgather(ids, tiled=True)
    )[:B]

    # single-device oracle (local, replicated inputs)
    scores = np.asarray(kmer_scores_packed_xla(jnp.asarray(P), jnp.asarray(kmers)))[:B]
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k_top]
    oracle_vals = np.take_along_axis(scores, order, axis=1)

    shard = multihost.host_input_shard(fasta_path)

    json_out = {
        "pid": pid,
        "nproc": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "vals": vals.tolist(),
        "ids": ids.tolist(),
        "oracle_vals": oracle_vals.tolist(),
        "shard": shard,
    }
    with open(out_path, "w") as fh:
        json.dump(json_out, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
