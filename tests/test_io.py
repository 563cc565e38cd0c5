"""I/O round-trip tests (readwrite.test / rw_csv_test.cpp analogues)."""

import gzip

import pytest

from sina_tpu.io import fasta as fio
from sina_tpu.io.csv import CsvWriter
from sina_tpu.sequence import Sequence

FASTA = """>seq1 first sequence
ACGU-ACGU
>seq2 [k=v]
; score = 42
ACGUACGU
ACGU
>seq3
ac--gu
"""


def test_read_fasta(tmp_path):
    p = tmp_path / "t.fasta"
    p.write_text(FASTA)
    seqs = list(fio.read_fasta(p))
    assert [s.name for s in seqs] == ["seq1", "seq2", "seq3"]
    assert seqs[0].get_attr("full_name") == "first sequence"
    assert seqs[0].get_bases() == "ACGU" + "ACGU"[:4]
    assert seqs[1].get_attr("score") == "42"
    assert seqs[1].get_bases() == "ACGUACGUACGU"
    assert seqs[2].get_bases() == "acgu"
    assert seqs[2].width == 6


def test_read_fasta_gz(tmp_path):
    p = tmp_path / "t.fasta.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(FASTA)
    seqs = list(fio.read_fasta(p))
    assert len(seqs) == 3


def test_read_skips_bad_sequence(tmp_path):
    p = tmp_path / "t.fasta"
    p.write_text(">bad\nAC!GU\n>good\nACGU\n")
    seqs = list(fio.read_fasta(p))
    assert [s.name for s in seqs] == ["good"]


def test_block_sharding_partitions(tmp_path):
    p = tmp_path / "t.fasta"
    recs = "".join(f">s{i}\n{'ACGU' * 10}\n" for i in range(50))
    p.write_text(recs)
    total = len(recs.encode())
    block = total // 4 + 1
    names = []
    for idx in range(5):
        names += [
            s.name for s in fio.read_fasta(p, block_size=block, block_idx=idx)
        ]
    assert names == [f"s{i}" for i in range(50)]


def test_write_roundtrip(tmp_path):
    s = Sequence.from_string("q1", "AC-GU", full_name="desc")
    s.set_attr("align_quality_slv", 97)
    p = tmp_path / "o.fasta"
    with fio.FastaWriter(p, meta=fio.META_HEADER) as w:
        w.write_result(s)
    text = p.read_text()
    assert text.startswith(">q1 desc [align_quality_slv=97]\n")
    assert "AC-GU" in text
    back = list(fio.read_fasta(p))[0]
    assert back.get_bases() == "ACGU"
    assert back.width == 5


def test_write_dots_and_wrap(tmp_path):
    s = Sequence.from_string("q", "--ACGUACGU--")
    p = tmp_path / "o.fasta"
    with fio.FastaWriter(p, dots=True, line_length=4) as w:
        w.write_result(s)
    lines = p.read_text().splitlines()
    assert lines[1:] == ["..AC", "GUAC", "GU.."]


def test_min_idty_filter(tmp_path):
    s = Sequence.from_string("q", "ACGU")
    s.set_attr("align_ident_slv", 0.5)
    p = tmp_path / "o.fasta"
    with fio.FastaWriter(p, min_idty=0.9) as w:
        assert not w.write_result(s)
        assert w.excluded == 1


def test_csv_writer_golden(tmp_path):
    p = tmp_path / "o.csv"
    s1 = Sequence.from_string("s1", "ACGU")
    s1.set_attr("score", 1.5)
    s1.set_attr("note", 'has,"quote')
    with CsvWriter(p) as w:
        w.write(s1)
    assert p.read_text() == 'name,score,note\ns1,1.5,"has,""quote"\n'


def test_csv_tsv_and_crlf(tmp_path):
    p = tmp_path / "o.tsv"
    s1 = Sequence.from_string("s1", "ACGU")
    s1.set_attr("a", "x")
    with CsvWriter(p, crlf=True) as w:
        w.write(s1)
    assert p.read_bytes() == b"name\ta\r\ns1\tx\r\n"
