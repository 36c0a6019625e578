"""Init-sequence tests (reference tests/test_init.py contract plus
low-discrepancy quality checks)."""

import numpy as np
import pytest

from bask_tpu.utils.init_seq import r2_sequence, sb_sequence


def test_sb_sequence_shapes_and_infill():
    x = sb_sequence(n=5, d=1, random_state=1)
    assert x.shape == (5, 1)
    assert np.all((x >= 0) & (x <= 1))

    existing = [(0.5, 0.5)]
    x = sb_sequence(n=5, d=2, existing_points=existing, random_state=1)
    assert x.shape == (5, 2)
    np.testing.assert_allclose(x[0], [0.5, 0.5])

    with pytest.raises(ValueError):
        sb_sequence(n=1, d=2, existing_points=existing, random_state=1)


def test_sb_sequence_spreads_points():
    x = sb_sequence(n=8, d=1, random_state=0)[:, 0]
    gaps = np.diff(np.sort(x))
    # low-discrepancy: no two of 8 points collapse together
    assert gaps.min() > 0.02


def test_r2_sequence():
    z = r2_sequence(n=100, d=2)
    assert z.shape == (100, 2)
    assert np.all((z >= 0) & (z < 1))
    # R2 is a low-discrepancy lattice: bin counts should be near-uniform
    hist, _ = np.histogram(z[:, 0], bins=10, range=(0, 1))
    assert hist.min() >= 5
