"""Unit tests: intra prediction oracle vs hand-computed spec cases."""

import numpy as np
import pytest

from fasthevc_tpu.spec import intra


def _refs(n, top_vals, left_vals, corner):
    top = np.empty(2 * n + 1, dtype=np.int32)
    left = np.empty(2 * n + 1, dtype=np.int32)
    top[0] = left[0] = corner
    top[1:] = top_vals
    left[1:] = left_vals
    return top, left


def test_dc_flat():
    n = 8
    top, left = _refs(n, np.full(2 * n, 100), np.full(2 * n, 100), 100)
    pred = intra.predict(intra.DC, top, left, n, is_luma=True)
    assert np.all(pred == 100)


def test_dc_value_and_edge_filter():
    n = 4
    top, left = _refs(n, np.arange(1, 9), np.arange(11, 19), 5)
    # dcVal = (sum(top[1:5]) + sum(left[1:5]) + 4) >> 3
    dc = (sum(range(1, 5)) + sum(range(11, 15)) + 4) >> 3
    pred = intra.predict(intra.DC, top, left, n, is_luma=True)
    assert pred[1, 1] == dc
    assert pred[0, 0] == (left[1] + 2 * dc + top[1] + 2) >> 2
    assert pred[0, 2] == (top[3] + 3 * dc + 2) >> 2
    assert pred[2, 0] == (left[3] + 3 * dc + 2) >> 2
    # chroma: no edge filter
    predc = intra.predict(intra.DC, top, left, n, is_luma=False)
    assert np.all(predc == dc)


def test_planar_corners():
    n = 4
    rng = np.random.default_rng(3)
    top, left = _refs(n, rng.integers(0, 256, 2 * n),
                      rng.integers(0, 256, 2 * n), 128)
    pred = intra.predict(intra.PLANAR, top, left, n, is_luma=True)
    # spec formula at (0,0):
    expect = ((n - 1) * left[1] + 1 * top[n + 1]
              + (n - 1) * top[1] + 1 * left[n + 1] + n) >> 3
    assert pred[0, 0] == expect


def test_vertical_mode26():
    n = 8
    top_vals = np.arange(10, 10 + 2 * n)
    left_vals = np.full(2 * n, 50)
    top, left = _refs(n, top_vals, left_vals, 40)
    pred = intra.predict(26, top, left, n, is_luma=False)
    # pure vertical, no edge filter on chroma: each column == top sample
    for x in range(n):
        assert np.all(pred[:, x] == top_vals[x])
    # luma: first column edge-filtered
    predl = intra.predict(26, top, left, n, is_luma=True)
    assert np.all(predl[:, 1:] == pred[:, 1:])
    exp0 = np.clip(top_vals[0] + ((left_vals[:n] - 40) >> 1), 0, 255)
    assert np.all(predl[:, 0] == exp0)


def test_horizontal_mode10():
    n = 8
    left_vals = np.arange(60, 60 + 2 * n)
    top_vals = np.full(2 * n, 90)
    top, left = _refs(n, top_vals, left_vals, 70)
    pred = intra.predict(10, top, left, n, is_luma=False)
    for y in range(n):
        assert np.all(pred[y, :] == left_vals[y])


def test_diagonal_mode2_and_34():
    n = 4
    top_vals = np.arange(2 * n)
    left_vals = np.arange(100, 100 + 2 * n)
    top, left = _refs(n, top_vals, left_vals, 50)
    # mode 34: angle +32 down-right from top: pred[y][x] = top ref[x+y+2]...
    pred34 = intra.predict(34, top, left, n, is_luma=False)
    for y in range(n):
        for x in range(n):
            assert pred34[y, x] == top[1 + x + y + 1]
    # mode 2: angle +32 from left, transposed
    pred2 = intra.predict(2, top, left, n, is_luma=False)
    for y in range(n):
        for x in range(n):
            assert pred2[y, x] == left[1 + x + y + 1]


def test_angular_interpolation_mode30():
    n = 4
    rng = np.random.default_rng(5)
    top, left = _refs(n, rng.integers(0, 256, 2 * n),
                      rng.integers(0, 256, 2 * n), 77)
    pred = intra.predict(30, top, left, n, is_luma=False)
    angle = 13
    for y in range(n):
        idx = ((y + 1) * angle) >> 5
        fact = ((y + 1) * angle) & 31
        for x in range(n):
            a = int(top[1 + x + idx])
            b = int(top[1 + x + idx + 1])
            expect = a if fact == 0 else ((32 - fact) * a + fact * b + 16) >> 5
            assert pred[y, x] == expect


def test_negative_angle_projection_mode18():
    n = 4
    top_vals = np.arange(2 * n)
    left_vals = np.arange(100, 100 + 2 * n)
    top, left = _refs(n, top_vals, left_vals, 55)
    pred = intra.predict(18, top, left, n, is_luma=False)
    # mode 18 angle -32: pure down-right diagonal through the corner.
    assert pred[0, 0] == 55  # ref[-1+1]=corner at (0,0): idx=-1 -> corner
    assert pred[0, 1] == top_vals[0]
    assert pred[1, 0] == left_vals[0]


def test_all_modes_run_all_sizes():
    rng = np.random.default_rng(9)
    for n in (4, 8, 16, 32):
        top, left = _refs(n, rng.integers(0, 256, 2 * n),
                          rng.integers(0, 256, 2 * n), 128)
        for mode in range(35):
            p = intra.predict(mode, top, left, n, is_luma=True)
            assert p.shape == (n, n)
            assert p.min() >= 0 and p.max() <= 255


def test_reference_substitution_no_neighbors():
    plane = np.full((16, 16), 200, dtype=np.int32)
    top, left = intra.get_reference_samples(
        plane, 0, 0, 4, 0, 0, log2_ctu=4, pic_w_luma=16, pic_h_luma=16)
    assert np.all(top == 128) and np.all(left == 128)


def test_reference_substitution_partial():
    plane = np.arange(256, dtype=np.int32).reshape(16, 16)
    # block at (4, 0): left neighbors available (block (0,0) decoded first),
    # top row outside picture -> substituted from top-left-most available.
    top, left = intra.get_reference_samples(
        plane, 4, 0, 4, 4, 0, log2_ctu=4, pic_w_luma=16, pic_h_luma=16)
    # Left column: only rows of the already-decoded block (0,0)..(3,3) are
    # available (z-scan); below-left rows substitute upward from the last
    # available sample.
    assert np.all(left[1:5] == plane[0:4, 3])
    assert np.all(left[5:] == plane[3, 3])
    # corner + top row: outside picture -> substituted from p[-1][0]
    assert top[0] == plane[0, 3]
    assert np.all(top[1:] == plane[0, 3])


def test_availability_zorder():
    # Within a 16x16 CTU, block at (8, 8): top-right neighbor (12..15, 7)
    # is decoded (z-order earlier); bottom-left (7, 12) is not... bottom-left
    # (x=7 y=12) belongs to block (0,8)-(7,15) quadrant which comes AFTER?
    # z-order: (8,8) quadrant is 4th; (0,8) is 3rd -> decoded before.
    assert intra.sample_available(12, 7, 8, 8, 64, 64, 4)
    assert intra.sample_available(7, 12, 8, 8, 64, 64, 4)
    # top-right beyond CTU at same row: (16..) belongs to next CTU: not decoded
    assert not intra.sample_available(16, 7, 8, 8, 64, 64, 4)
    assert not intra.sample_available(-1, 0, 0, 0, 64, 64, 4)


def test_mpm_rules():
    # equal, angular
    assert intra.mpm_candidates(14, 14, True) == [14, 2 + (43 % 32), 2 + (13 % 32)]
    # equal, non-angular
    assert intra.mpm_candidates(1, 1, True) == [0, 1, 26]
    # distinct with planar present
    assert intra.mpm_candidates(0, 10, True) == [0, 10, 1]
    # distinct without planar/dc
    assert intra.mpm_candidates(10, 26, True) == [10, 26, 0]
    # above outside CTU -> DC
    assert intra.mpm_candidates(10, 30, False) == [10, 1, 0]


def test_filter_decision():
    assert not intra.should_filter(26, 8, True)  # pure vertical never
    assert not intra.should_filter(1, 32, True)  # DC never
    assert not intra.should_filter(2, 4, True)  # 4x4 never
    assert intra.should_filter(2, 8, True)  # dist 8 > 7
    assert intra.should_filter(18, 8, True)  # dist 8 > 7
    assert not intra.should_filter(25, 8, True)  # dist 1 <= 7
    assert intra.should_filter(0, 8, True)  # planar: dist 10 > 7
    assert intra.should_filter(25, 32, True)  # 32x32: dist 1 > 0
    assert not intra.should_filter(2, 8, False)  # chroma never filtered
