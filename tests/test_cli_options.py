"""CLI option-surface tests (infocommands.test / readwrite.test
analogues) driven through Pipeline/config plumbing."""

import gzip
import subprocess
import sys

import pytest

from sina_tpu import testing
from sina_tpu.cli import build_parser, config_from_args, detect_type
from sina_tpu.io.fasta import FastaWriter, read_fasta
from sina_tpu.pipeline import Pipeline
from sina_tpu.testing import unaligned_copy


def parse(argv):
    args = build_parser().parse_args(argv)
    return config_from_args(args)


def test_detect_types():
    assert detect_type("x.fasta") == "fasta"
    assert detect_type("x.fa.gz") == "fasta"
    assert detect_type("x.csv") == "csv"
    assert detect_type("x.csv.gz") == "csv"
    assert detect_type("x.arb") == "arb"
    assert detect_type("x.fasta", "csv") == "csv"


def test_config_mapping():
    cfg = parse([
        "-i", "in.fasta", "-o", "out.fasta", "-o", "t.csv",
        "-r", "db.fasta", "--turn", "all", "--fs-max", "20",
        "--overhang", "edge", "--insertion", "forbid",
        "--search", "--lca-fields", "tax_slv,tax_gg",
        "--select-step", "5", "--fields", "a:b,c",
    ])
    assert cfg.outputs == [("fasta", "out.fasta"), ("csv", "t.csv")]
    assert cfg.famfinder.turn == "all"
    assert cfg.famfinder.fs_max == 20
    assert cfg.aligner.overhang == "edge"
    assert cfg.aligner.insertion == "forbid"
    assert cfg.do_search
    assert cfg.search.lca_fields == ["tax_slv", "tax_gg"]
    assert cfg.select_step == 5
    assert cfg.fields == ["a", "b", "c"]


def test_turn_implicit_value():
    cfg = parse(["-i", "x", "-r", "y", "-t"])
    assert cfg.famfinder.turn == "revcomp"
    cfg = parse(["-i", "x", "-r", "y"])
    assert cfg.famfinder.turn == "none"


def test_devnull_output_skipped():
    cfg = parse(["-i", "x", "-r", "y", "-o", "/dev/null"])
    assert cfg.outputs == []


def test_none_output_is_null_sink(tmp_path, monkeypatch):
    """-o none maps to the null writer, never a file named "none"
    (sina.cpp:125-126 TYPE_NONE)."""
    monkeypatch.chdir(tmp_path)
    for argv in (
        ["-i", "x", "-r", "y", "-o", "none"],
        ["-i", "x", "-r", "y", "-o", "NONE"],
        ["-i", "x", "-r", "y", "-o", "out.fa", "--outtype", "none"],
    ):
        cfg = parse(argv)
        assert cfg.outputs == []
    assert not (tmp_path / "none").exists()


def test_inert_compat_flags_warn(caplog):
    """pt-server-only knobs accepted for compatibility must warn
    loudly that the internal engine ignores them (VERDICT r2 #8)."""
    import logging

    with caplog.at_level(logging.WARNING, logger="sina"):
        parse(["-i", "x", "-r", "y",
               "--fs-kmer-mm", "2", "--fs-kmer-norel",
               "--search-kmer-mm", "1", "--search-kmer-norel"])
    text = caplog.text
    for flag in ("--fs-kmer-mm", "--fs-kmer-norel",
                 "--search-kmer-mm", "--search-kmer-norel"):
        assert flag in text, flag
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="sina"):
        parse(["-i", "x", "-r", "y"])
    assert "no effect" not in caplog.text


def test_arb_output_rejected():
    with pytest.raises(SystemExit):
        parse(["-i", "x", "-r", "y", "-o", "out.arb"])


@pytest.fixture(scope="module")
def small_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliopt")
    db = testing.make_reference(n_seqs=60, n_core=250, width=400, seed=33)
    dbp = d / "ref.sref"
    db.save(dbp)
    qf = d / "q.fasta"
    with FastaWriter(qf) as w:
        for q in testing.make_queries(db, n=4, seed=2):
            w.write(unaligned_copy(q))
    return d, dbp, qf


def _run_pipe(dbp, qf, out, extra):
    cfg = parse([
        "-i", str(qf), "-o", str(out), "-r", str(dbp),
        "--fs-min", "8", "--fs-max", "8", "--fs-full-len", "150",
        "--fs-req-gaps", "1",
    ] + extra)
    return Pipeline(cfg).run()


def test_gz_output_roundtrip(small_env, tmp_path):
    d, dbp, qf = small_env
    out = tmp_path / "o.fasta.gz"
    r = _run_pipe(dbp, qf, out, [])
    assert r["n_aligned"] == 4
    seqs = list(read_fasta(out))
    assert len(seqs) == 4


def test_lowercase_original(small_env, tmp_path):
    d, dbp, qf = small_env
    # lowercase query bases survive with --lowercase original
    qlow = tmp_path / "qlow.fasta"
    seqs = list(read_fasta(qf))
    text = f">{seqs[0].name}\n{seqs[0].get_bases().lower()}\n"
    qlow.write_text(text)
    out = tmp_path / "o.fasta"
    r = _run_pipe(dbp, qlow, out, ["--lowercase", "original"])
    got = list(read_fasta(out))[0]
    assert got.get_bases().islower()


def test_meta_csv_sidecar(small_env, tmp_path):
    d, dbp, qf = small_env
    out = tmp_path / "o.fasta"
    _run_pipe(dbp, qf, out, ["--meta-fmt", "csv"])
    sidecar = tmp_path / "o.csv"
    assert sidecar.exists()
    header = sidecar.read_text().splitlines()[0]
    assert "align_quality_slv" in header


def test_select_file(small_env, tmp_path):
    d, dbp, qf = small_env
    names = [s.name for s in read_fasta(qf)]
    sel = tmp_path / "names.txt"
    sel.write_text("\n".join(names[:2]))
    out = tmp_path / "o.fasta"
    r = _run_pipe(dbp, qf, out, ["--select-file", str(sel)])
    got = [s.name for s in read_fasta(out)]
    assert got == names[:2]
