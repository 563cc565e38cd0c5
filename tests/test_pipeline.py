"""End-to-end pipeline + CLI tests (align.test / search.test
analogues on the synthetic fixture)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from sina_tpu import testing
from sina_tpu.io.fasta import FastaWriter, read_fasta
from sina_tpu.pipeline import Pipeline, PipelineConfig
from sina_tpu.famfinder import FamFinderConfig
from sina_tpu.search import SearchConfig, lca_classify
from sina_tpu.testing import unaligned_copy


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    db = testing.make_reference(
        n_seqs=120, n_core=400, width=700, seed=21
    )
    db_path = d / "ref.sref"
    db.save(db_path)
    queries = testing.make_queries(db, n=12, seed=3, branch_len=0.5)
    qfile = d / "queries.fasta"
    with FastaWriter(qfile) as w:
        for q in queries:
            w.write(unaligned_copy(q))
    return dict(dir=d, db=db, db_path=db_path,
                queries=queries, qfile=qfile)


def _base_cfg(env, **kw):
    fam = kw.pop("famfinder", FamFinderConfig(
        fs_full_len=300, fs_min=10, fs_max=10, fs_req_gaps=1,
    ))
    return PipelineConfig(
        in_path=str(env["qfile"]),
        db=str(env["db_path"]),
        famfinder=fam,
        batch_size=5,
        **kw,
    )


def test_pipeline_align(env, tmp_path):
    out = tmp_path / "out.fasta"
    cfg = _base_cfg(env, outputs=[("fasta", str(out))])
    res = Pipeline(cfg).run()
    assert res["n_in"] == 12
    assert res["n_aligned"] == 12
    aligned = list(read_fasta(out))
    assert len(aligned) == 12
    # all aligned to reference width
    assert all(s.width == env["db"].width for s in aligned)
    # bases preserved
    for q, a in zip(env["queries"], aligned):
        assert a.get_bases().upper() == q.get_bases().upper()


def test_pipeline_accuracy(env, tmp_path):
    out = tmp_path / "out.fasta"
    cfg = _base_cfg(env, outputs=[("fasta", str(out))],
                    show_dist=True)
    pipe = Pipeline(cfg)
    # show_dist needs the original alignment: queries carry it, but
    # the reader stripped it; compare manually instead
    res = pipe.run()
    aligned = {s.name: s for s in read_fasta(out)}
    from sina_tpu.comparator import Comparator, IUPAC_EXACT, COVER_QUERY
    cmp_exact = Comparator(IUPAC_EXACT, "none", COVER_QUERY, False)
    sps = [
        cmp_exact(q, aligned[q.name]) for q in env["queries"]
    ]
    assert np.mean(sps) > 0.93, f"avg_sps {np.mean(sps)}"


def test_pipeline_search_lca(env, tmp_path):
    out = tmp_path / "out.fasta"
    cfg = _base_cfg(
        env,
        outputs=[("fasta", str(out))],
        do_search=True,
        search=SearchConfig(
            max_result=5,
            min_sim=0.3,
            lca_fields=["tax_slv"],
            kmer_candidates=50,
        ),
        meta_fmt="comment",
    )
    res = Pipeline(cfg).run()
    aligned = list(read_fasta(out))
    assert all(s.get_attr("nearest_slv") for s in aligned)
    lcas = [s.get_attr("lca_tax_slv") for s in aligned]
    assert all(lcas)
    # queries evolved from db members: domain level should match parent
    db = env["db"]
    good = 0
    for q, s in zip(env["queries"], aligned):
        parent_tax = db.get(q.get_attr("parent")).get_attr("tax_slv")
        lca = s.get_attr("lca_tax_slv")
        if lca != "Unclassified;" and parent_tax.startswith(
            lca.split(";")[0]
        ):
            good += 1
    assert good >= len(aligned) // 2


def test_lca_classify_votes():
    paths = [
        ["A", "B", "C"],
        ["A", "B", "C"],
        ["A", "B", "D"],
    ]
    # quorum 0.7 of 3 -> 0 outliers allowed... 3*(1-.7)+.5 -> 1
    assert lca_classify(paths, 3, 0.7) == "A;B;C;"
    assert lca_classify(paths, 3, 1.0) == "A;B;"
    assert lca_classify([], 0, 0.7) == "Unclassified;"


def test_pipeline_prealigned_roundtrip(env, tmp_path):
    # prealigned passthrough: write db sequences, read/write identical
    src = tmp_path / "db.fasta"
    db = env["db"]
    with FastaWriter(src) as w:
        for s in db.sequences[:10]:
            w.write(s)
    out = tmp_path / "out.fasta"
    cfg = PipelineConfig(
        in_path=str(src),
        outputs=[("fasta", str(out))],
        prealigned=True,
    )
    res = Pipeline(cfg).run()
    assert res["n_aligned"] == 10
    orig = src.read_text().splitlines()
    got = out.read_text().splitlines()
    assert [l for l in got if l.startswith(">")] == [
        l for l in orig if l.startswith(">")
    ]


def test_cli_end_to_end(env, tmp_path):
    out = tmp_path / "cli_out.fasta"
    csv_out = tmp_path / "cli_out.csv"
    r = subprocess.run(
        [
            sys.executable, "-m", "sina_tpu",
            "-i", str(env["qfile"]),
            "-o", str(out), "-o", str(csv_out),
            "-r", str(env["db_path"]),
            "--fs-min", "10", "--fs-max", "10",
            "--fs-full-len", "300", "--fs-req-gaps", "1",
            "--meta-fmt", "header",
        ],
        capture_output=True, text=True, timeout=560,
        env={
            "PATH": "/usr/bin:/bin:/opt/venv/bin",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": "/root/repo",
            "HOME": "/root",
        },
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.exists() and csv_out.exists()
    seqs = list(read_fasta(out))
    assert len(seqs) == 12
    header = csv_out.read_text().splitlines()[0]
    assert header.startswith("name")


def test_midrun_compile_logged(monkeypatch, caplog):
    """After warmup, any backend compile (= shape-bucket drift) logs
    a loud warning (VERDICT r2 #10)."""
    import logging

    import jax
    import jax.numpy as jnp

    from sina_tpu import jax_setup

    jax_setup.setup_jax()
    monkeypatch.setattr(jax_setup, "_after_warmup", False)
    with caplog.at_level(logging.WARNING, logger="sina.jax"):
        jax.jit(lambda x: x * 3 + 41)(
            jnp.ones(17)
        ).block_until_ready()
    assert not any(
        "mid-run" in r.getMessage() for r in caplog.records
    )
    monkeypatch.setattr(jax_setup, "_after_warmup", True)
    with caplog.at_level(logging.WARNING, logger="sina.jax"):
        jax.jit(lambda x: x * 5 + 43)(
            jnp.ones(19)
        ).block_until_ready()
    assert any(
        "mid-run XLA compile" in r.getMessage()
        for r in caplog.records
    )
