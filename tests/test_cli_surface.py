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
