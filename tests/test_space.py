"""Space transforms: round trips, normalization, categorical one-hot."""

import numpy as np
import pytest

from bask_tpu.space import (
    Categorical,
    Integer,
    Real,
    Space,
    dimensions_aslist,
    normalize_dimensions,
    point_asdict,
)


def test_tuple_shorthands():
    space = normalize_dimensions([(-2.0, 2.0), (1, 8), ["a", "b", "c"]])
    assert isinstance(space.dimensions[0], Real)
    assert isinstance(space.dimensions[1], Integer)
    assert isinstance(space.dimensions[2], Categorical)
    assert space.n_dims == 3
    assert space.transformed_n_dims == 5
    assert space.is_partly_categorical


def test_transform_roundtrip_real_int_cat():
    space = Space(
        [
            Real(1e-6, 1e6, prior="log-uniform"),
            Real(-2.0, 2.0),
            Integer(1, 8),
            Categorical(["linear", "poly", "rbf"]),
        ]
    )
    pts = space.rvs(n_samples=25, random_state=3)
    t = space.transform(pts)
    assert t.shape == (25, 6)
    assert np.all((t >= 0) & (t <= 1))
    back = space.inverse_transform(t)
    for p, b in zip(pts, back):
        np.testing.assert_allclose(p[0], b[0], rtol=1e-9)
        np.testing.assert_allclose(p[1], b[1], rtol=1e-9)
        assert p[2] == b[2]
        assert p[3] == b[3]


def test_loguniform_sampling_density():
    space = Space([Real(1e-4, 1.0, prior="log-uniform")])
    pts = np.array([p[0] for p in space.rvs(4000, random_state=0)])
    # log-uniform: ~half the samples below the geometric mean 1e-2
    frac = np.mean(pts < 1e-2)
    assert 0.4 < frac < 0.6


def test_integer_inverse_rounds_and_clips():
    dim = Integer(1, 8)
    assert dim.inverse_transform([0.0, 0.49 / 7, 1.0, 1.5]).tolist() == [
        1,
        1,
        8,
        8,
    ]


def test_point_asdict_ordering():
    ss = {"b": (1, 8), "a": (-1.0, 1.0)}
    dims = dimensions_aslist(ss)
    assert dims[0] == (-1.0, 1.0)
    d = point_asdict(ss, [0.3, 5])
    assert d == {"a": 0.3, "b": 5}


def test_bad_specs():
    with pytest.raises(ValueError):
        Real(2.0, 1.0)
    with pytest.raises(ValueError):
        Real(-1.0, 1.0, prior="log-uniform")
    with pytest.raises(ValueError):
        Real(0.0, 1.0, prior="weird")
