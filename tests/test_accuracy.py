"""Accuracy regression harness.

Mirror of the reference's accuracy suite
(/root/reference/tests/accuracy_kmer.test): realign every Nth
reference sequence against the full reference and assert thresholds on
avg_sps (exact identity vs original alignment), avg_cpm (closest-
reference identity drift) and avg_idty.  The fixture is the synthetic
bundle (testing.make_reference) instead of ltp_reduced.arb.
"""

import numpy as np
import pytest

from sina_tpu import testing
from sina_tpu.align import AlignerConfig
from sina_tpu.famfinder import FamFinderConfig
from sina_tpu.pipeline import Pipeline, PipelineConfig


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    d = tmp_path_factory.mktemp("acc")
    db = testing.make_reference(
        n_seqs=300, n_core=600, width=1000, seed=4242
    )
    path = d / "ref.sref"
    db.save(path)
    return str(path)


def run(bundle, step=25, **kw):
    fam_kw = dict(
        fs_full_len=400, fs_req_gaps=1,
        fs_kmer_len=kw.pop("fs_kmer_len", 10),
        fs_no_fast=kw.pop("fs_no_fast", False),
        fs_leave_query_out=kw.pop("fs_leave_query_out", False),
        fs_msc_max=kw.pop("fs_msc_max", 2.0),
    )
    ali_kw = dict(
        realign=kw.pop("realign", False),
        engine=kw.pop("engine", "auto"),
    )
    cfg = PipelineConfig(
        in_path=bundle,
        db=bundle,
        outputs=[],
        prealigned=kw.pop("prealigned", False),
        show_dist=True,
        select_step=step,
        famfinder=FamFinderConfig(**fam_kw),
        aligner=AlignerConfig(**ali_kw),
        batch_size=16,
        **kw,
    )
    return Pipeline(cfg).run()


def test_prealigned(bundle):
    r = run(bundle, prealigned=True)
    assert r["n_aligned"] == 12
    assert r["avg_sps"] == pytest.approx(1.0)
    assert r["avg_cpm"] == pytest.approx(0.0)


def test_align_copy(bundle):
    """Without --realign, the query (present in the reference) is
    copied verbatim (align.cpp:328-389)."""
    r = run(bundle, step=50)
    assert r["n_aligned"] == 6
    assert r["avg_sps"] == pytest.approx(1.0)
    assert r["avg_idty"] == pytest.approx(1.0, abs=1e-6)


# per-engine accuracy floors: graph is the reference-faithful DAG,
# profile the TPU-default column chain (slightly softer NAST fidelity)
THRESH = {
    "graph": dict(sps=0.99, cpm=0.005),
    "profile": dict(sps=0.98, cpm=0.008),
}


@pytest.mark.parametrize("engine", ["graph", "profile"])
def test_realign(bundle, engine):
    r = run(bundle, realign=True, engine=engine)
    t = THRESH[engine]
    assert r["n_aligned"] == 12
    assert r["avg_sps"] > t["sps"], r
    assert r["avg_cpm"] < t["cpm"], r
    assert r["avg_idty"] > 0.8, r


@pytest.mark.parametrize("engine", ["graph", "profile"])
def test_realign_leave_query_out(bundle, engine):
    r = run(bundle, realign=True, fs_leave_query_out=True,
            engine=engine)
    t = THRESH[engine]
    assert r["avg_sps"] > t["sps"], r
    assert r["avg_cpm"] < t["cpm"], r


def test_realign_k8(bundle):
    r = run(bundle, realign=True, fs_leave_query_out=True,
            fs_kmer_len=8)
    assert r["avg_sps"] > 0.97, r


def test_realign_nofast(bundle):
    r = run(bundle, realign=True, fs_leave_query_out=True,
            fs_no_fast=True)
    assert r["avg_sps"] > 0.97, r


def test_realign_msc_capped(bundle):
    """Cap reference similarity (evaluation mode): quality degrades
    gracefully (accuracy.test:70-95 analogue with looser bounds for
    the synthetic fixture)."""
    r = run(bundle, realign=True, fs_leave_query_out=True,
            fs_msc_max=0.9)
    assert r["avg_sps"] > 0.9, r
    assert r["avg_idty"] < 0.95, r
