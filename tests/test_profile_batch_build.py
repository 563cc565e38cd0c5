"""Batched profile construction must match the per-family builder."""

import numpy as np

from sina_tpu import testing
from sina_tpu.ops.profile import build_profile, build_profiles_batch


def test_batched_matches_single():
    db = testing.make_reference(n_seqs=60, n_core=250, width=400, seed=2)
    rng = np.random.default_rng(0)
    families = []
    for b in range(5):
        ids = rng.choice(len(db), size=rng.integers(3, 12), replace=False)
        families.append([db.sequences[int(i)] for i in ids])
    cpad = max(
        build_profile(f).n_cols for f in families
    )
    cpad = -(-cpad // 64) * 64
    freqs, gapo, gape, cols = build_profiles_batch(families, cpad)
    for b, fam in enumerate(families):
        p = build_profile(fam)
        C = p.n_cols
        assert np.array_equal(cols[b], p.cols)
        np.testing.assert_allclose(freqs[b, :C], p.freqs, atol=1e-6)
        np.testing.assert_allclose(gapo[b, :C], p.gap_open, atol=1e-6)
        np.testing.assert_allclose(gape[b, :C], p.gap_ext, atol=1e-6)
        assert (freqs[b, C:] == 0).all()
