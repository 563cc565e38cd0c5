"""CLI surface additions: --csv-sep, --colors, --has-cli-vers,
--arb-list-fields, .tsv type detection, --help-all."""

import numpy as np
import pytest

from sina_tpu.cli import build_parser, detect_type, main
from sina_tpu.log_stats import color_code


def test_detect_tsv_is_csv():
    assert detect_type("out.tsv") == "csv"
    assert detect_type("out.tsv.gz") == "csv"
    assert detect_type("out.csv") == "csv"
    assert detect_type("out.fasta") == "fasta"


def test_has_cli_vers(capsys):
    assert main(["--has-cli-vers", "1"]) == 0
    assert main(["--has-cli-vers", "ARB5.99"]) == 0
    assert main(["--has-cli-vers", "7"]) == 1
    err = capsys.readouterr().err
    assert "present" in err
    assert "not supported" in err


def test_full_option_surface_parses():
    p = build_parser()
    args = p.parse_args(
        [
            "--csv-sep", ";", "--colors", "--markaligned",
            "--markcopied", "--prot-level", "4", "--ptdb", "x",
            "--ptport", ":9999", "--search-port", ":9998",
            "--search-kmer-mm", "2", "--search-kmer-norel",
            "--debug-graph",
        ]
    )
    assert args.csv_sep == ";"
    assert args.colors and args.debug_graph


def test_color_code_roundtrip():
    s = color_code("AGCU-N")
    # every base wrapped, reset after the gap run
    assert "\033[34m" in s and "\033[35m" in s
    assert "\033[32m" in s and "\033[33m" in s
    assert s.endswith("\033[0m") or "\033[0m" in s
    # stripping ANSI gives back the input
    import re

    assert re.sub(r"\033\[[0-9]*m", "", s) == "AGCU-N"


def test_arb_list_fields(tmp_path, capsys):
    from sina_tpu import testing

    db = testing.make_reference(n_seqs=5, n_core=40, width=80, seed=3)
    db.save(tmp_path / "db.sref")
    rc = main(["--arb-list-fields", "-r", str(tmp_path / "db.sref")])
    assert rc == 0
    out = capsys.readouterr().out.split()
    assert "tax_slv" in out


def test_csv_sep_writer(tmp_path):
    from sina_tpu.io.csv import CsvWriter
    from sina_tpu.sequence import Sequence

    s = Sequence.from_string("s1", "AGC")
    s.set_attr("x", "1")
    f = tmp_path / "o.csv"
    with CsvWriter(str(f), sep="|") as w:
        w.write(s)
    assert f.read_text().splitlines()[0] == "name|x"


def test_debug_graph_dumps(tmp_path, monkeypatch):
    from sina_tpu import testing
    from sina_tpu.align import AlignerConfig, align_sequence

    monkeypatch.chdir(tmp_path)
    db = testing.make_reference(n_seqs=30, n_core=120, width=200, seed=5)
    q = testing.unaligned_copy(db.sequences[0])
    fam = [(1.0, db.sequences[i]) for i in range(1, 9)]
    cfg = AlignerConfig(
        realign=True, engine="graph", debug_graph=True
    )
    out = align_sequence(q, fam, cfg)
    assert out is not None
    dots = list(tmp_path.glob("mseq_*.dot"))
    svgs = list(tmp_path.glob("mesh_*.svg"))
    assert dots and svgs
    assert "<svg" in svgs[0].read_text()


def test_multihost_input_shard(monkeypatch, tmp_path):
    import jax

    from sina_tpu.parallel import multihost

    f = tmp_path / "in.fasta"
    f.write_bytes(b">a\nACGT\n" * 100)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    shard = multihost.host_input_shard(str(f))
    assert shard["fasta_idx"] == 2
    assert shard["fasta_block"] * 4 >= f.stat().st_size


def test_build_refdb_workflow(tmp_path, capsys):
    """ARB interop: arb2fasta-style aligned FASTA + metadata CSV ->
    .sref bundle via --build-refdb; fields round-trip into CSV output
    (VERDICT item 7; field contract per doc/source/fields.rst)."""
    from sina_tpu import testing
    from sina_tpu.io.fasta import FastaWriter
    from sina_tpu.refdb import ReferenceDb

    db = testing.make_reference(n_seqs=40, n_core=200, width=400,
                                seed=31)
    fasta = tmp_path / "export.fasta"
    with FastaWriter(str(fasta)) as w:
        for s in db.sequences:
            w.write(s)
    csv = tmp_path / "meta.csv"
    rows = ["name,tax_slv,strain"]
    for i, s in enumerate(db.sequences):
        rows.append(f"{s.name},Bacteria;Firmicutes;,ST{i}")
    csv.write_text("\n".join(rows) + "\n")

    bundle = tmp_path / "ref.sref"
    rc = main([
        "-i", str(fasta), "--build-refdb", str(bundle),
        "--refdb-metadata", str(csv),
    ])
    assert rc == 0
    loaded = ReferenceDb.load(bundle)
    assert len(loaded) == 40
    assert loaded.sequences[3].attrs["strain"] == "ST3"
    assert loaded.sequences[3].attrs["tax_slv"].startswith("Bacteria")

    # align against the built bundle; copied fields reach CSV output
    qfasta = tmp_path / "q.fasta"
    with FastaWriter(str(qfasta)) as w:
        for q in testing.make_queries(db, n=3, seed=9,
                                      branch_len=0.4):
            w.write(testing.unaligned_copy(q))
    out_csv = tmp_path / "out.csv"
    rc = main([
        "-i", str(qfasta), "-o", str(out_csv),
        "-r", str(bundle),
        "--fs-min", "5", "--fs-max", "5", "--fs-full-len", "150",
        "--fs-req-gaps", "1",
        "-S", "--search-copy-fields", "strain",
        "--search-min-sim", "0.3", "--lca-fields", "tax_slv",
    ])
    assert rc == 0
    text = out_csv.read_text()
    header = text.splitlines()[0]
    assert "copy_strain" in header or "strain" in header
    assert "ST" in text


def test_show_conf_effective_modules(tmp_path, capsys, monkeypatch):
    from sina_tpu import testing

    monkeypatch.chdir(tmp_path)  # -o none must create no file
    db = testing.make_reference(n_seqs=20, n_core=150, width=300,
                                seed=32)
    db.save(tmp_path / "db.sref")
    rc = main([
        "-i", str(tmp_path / "db.sref"), "-o", "none",
        "-r", str(tmp_path / "db.sref"), "--show-conf",
        "--fs-min", "5", "--fs-max", "5", "--fs-full-len", "100",
        "--fs-req-gaps", "1", "--select-step", "20",
    ])
    err = capsys.readouterr().err
    assert "[famfinder]" in err
    assert "fs_max = 5" in err
    assert "[aligner]" in err
    assert not (tmp_path / "none").exists()


def test_terminal_sink_interleaves_bars(capsys):
    """TerminalSinkHandler erases the bar line before a log record
    and repaints active bars after (terminal_sink semantics,
    progress.h:402-480)."""
    import io
    import logging as _logging

    from sina_tpu import progress as prog

    class Tty(io.StringIO):
        def isatty(self):
            return True

    stream = Tty()
    h = prog.attach_terminal_sink(_logging.StreamHandler(stream))
    assert isinstance(h, prog.TerminalSinkHandler)
    lg = _logging.getLogger("sina.test_sink")
    lg.addHandler(h)
    lg.setLevel(_logging.INFO)
    try:
        bar = prog.Progress("work", total=10, out=stream,
                            min_interval=0.0)
        bar.update(3)
        lg.info("hello from the log")
        out = stream.getvalue()
        # bar painted, erased before the log line, repainted after
        assert "work:" in out
        assert "hello from the log" in out
        tail = out.split("hello from the log")[-1]
        assert "work:" in tail  # repaint after the record
        bar.close()
        assert bar not in prog._active_bars
    finally:
        lg.removeHandler(h)


def test_attach_terminal_sink_passthrough_non_tty():
    import io
    import logging as _logging

    from sina_tpu.progress import attach_terminal_sink

    h = _logging.StreamHandler(io.StringIO())
    assert attach_terminal_sink(h) is h
