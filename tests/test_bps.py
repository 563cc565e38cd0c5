"""Helix pair-score (avg_bps) metric tests."""

import numpy as np

from sina_tpu import testing
from sina_tpu.align import AlignerConfig
from sina_tpu.famfinder import FamFinderConfig
from sina_tpu.pipeline import Pipeline, PipelineConfig


def test_bps_flows_through_pipeline(tmp_path):
    db = testing.make_reference(
        n_seqs=80, n_core=300, width=500, seed=5, n_stems=10
    )
    p = tmp_path / "ref.sref"
    db.save(p)
    cfg = PipelineConfig(
        in_path=str(p),
        db=str(p),
        outputs=[],
        show_dist=True,
        select_step=10,
        famfinder=FamFinderConfig(fs_full_len=200, fs_req_gaps=1),
        aligner=AlignerConfig(realign=True),
        batch_size=8,
    )
    r = Pipeline(cfg).run()
    # planted complementary stems: realigned sequences must show a
    # positive pairing score on average
    assert r["avg_bps"] > 0.3, r
