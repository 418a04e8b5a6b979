"""Unit tests for StencilSpec construction and invariants."""

import math

import pytest

from stencil_tpu.core import spec as S


def test_star_2d_r1_matches_reference_semantics():
    sp = S.star(2, 1)
    assert sp.num_taps == 4
    assert sp.radius == 1
    assert sp.uniform_weight == pytest.approx(0.25)
    assert set(sp.offsets) == {(-1, 0), (1, 0), (0, -1), (0, 1)}
    # center excluded
    assert (0, 0) not in sp.offsets


def test_star_radius_r_weighting():
    # reference: 1 / (2 * (bw + bh)) with bw = bh = r  (stencil.cpp:85-86)
    for r in (1, 2, 3):
        sp = S.star(2, r)
        assert sp.num_taps == 4 * r
        assert sp.uniform_weight == pytest.approx(1.0 / (4 * r))


def test_star_3d():
    sp = S.jacobi7_3d()
    assert sp.ndim == 3
    assert sp.num_taps == 6
    assert sp.uniform_weight == pytest.approx(1.0 / 6.0)


def test_box_2d_r1():
    sp = S.jacobi9()
    assert sp.num_taps == 8  # center excluded
    assert sp.uniform_weight == pytest.approx(1.0 / 8.0)


def test_box_3d_r1():
    sp = S.jacobi27_3d()
    assert sp.num_taps == 26
    assert sp.radius == 1


def test_box_include_center():
    sp = S.box(2, 1, include_center=True)
    assert sp.num_taps == 9
    assert (0, 0) in sp.offsets


def test_high_order_laplacian():
    sp = S.laplacian_high_order(3)
    assert sp.radius == 2
    assert sp.num_taps == 12
    assert sp.uniform_weight is None
    assert sum(sp.weights) == pytest.approx(
        2 * 3 * (16.0 / 12.0 - 1.0 / 12.0) / (3 * 30.0 / 12.0)
    )


def test_weighted_custom():
    sp = S.weighted(2, [((0, 1), 0.5), ((0, -1), 0.5)])
    assert sp.radius == 1
    assert sp.uniform_weight == pytest.approx(0.5)


def test_canonical_order_is_deterministic():
    a = S.star(2, 2)
    b = S.star(2, 2)
    assert a.offsets == b.offsets
    # dim 0 arms first, negative before positive, near to far
    assert a.offsets[0] == (-1, 0)
    assert a.offsets[1] == (-2, 0)
    assert a.offsets[2] == (1, 0)


def test_validation_errors():
    with pytest.raises(ValueError):
        S.StencilSpec(ndim=2, radius=1, offsets=((2, 0),), weights=(1.0,))
    with pytest.raises(ValueError):
        S.StencilSpec(ndim=2, radius=1, offsets=((1, 0),), weights=(1.0, 2.0))
    with pytest.raises(ValueError):
        S.StencilSpec(ndim=2, radius=1, offsets=((1,),), weights=(1.0,))
    with pytest.raises(KeyError):
        S.get_spec("nope")


def test_spec_is_hashable_static_arg():
    d = {S.jacobi5(): 1, S.jacobi9(): 2}
    assert d[S.jacobi5()] == 1


def test_named_specs_all_construct():
    for name in S.NAMED_SPECS:
        sp = S.get_spec(name)
        assert sp.num_taps >= 1


def test_halo_for_steps():
    sp = S.star(3, 2)
    assert sp.halo_for_steps(4) == 8
