"""Unit tests: spec transforms/quant vs independent definitions."""

import numpy as np
import pytest

from fasthevc_tpu.spec import tables, transform


def test_dct_matrices_known_values():
    assert tables.T4.tolist() == [
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36],
    ]
    assert tables.T8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert tables.T8[2].tolist() == [83, 36, -36, -83, -83, -36, 36, 83]
    assert tables.T16[1].tolist() == [
        90, 87, 80, 70, 57, 43, 25, 9, -9, -25, -43, -57, -70, -80, -87, -90]
    assert tables.T32[1][:16].tolist() == [
        90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4]
    # Even rows embed the half-size matrix symmetrically.
    for size, half in [(8, 4), (16, 8), (32, 16)]:
        t, th = tables.DCT_MATRICES[size], tables.DCT_MATRICES[half]
        for k in range(half):
            assert t[2 * k, :half].tolist() == th[k].tolist()
            assert t[2 * k, half:].tolist() == th[k][::-1].tolist()


def test_dct_near_orthogonal():
    for size in (4, 8, 16, 32):
        t = tables.DCT_MATRICES[size].astype(np.int64)
        g = t @ t.T
        norm = 64 * 64 * size
        assert np.all(np.abs(np.diag(g) - norm) <= norm * 0.01)
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() <= norm * 0.01


def test_dct_matches_true_dct_direction():
    # Integer matrix rows should be close to scaled real DCT-II basis.
    for size in (4, 8, 16, 32):
        t = tables.DCT_MATRICES[size].astype(np.float64)
        n = np.arange(size)
        for k in range(size):
            basis = np.cos(np.pi * k * (2 * n + 1) / (2 * size))
            scale = 64.0 * (1.0 if k == 0 else np.sqrt(2))
            # account for row norm: row0 is all-64
            ref = basis * (64.0 if k == 0 else 64.0 * np.sqrt(2))
            assert np.abs(t[k] - ref).max() < 2.0, (size, k)


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_transform_roundtrip_lossless_at_qp0ish(size):
    # fwd->inv (no quant) should reproduce the residual within rounding.
    rng = np.random.default_rng(0)
    res = rng.integers(-255, 256, size=(size, size)).astype(np.int32)
    c = transform.forward_transform(res)
    r = transform.inverse_transform(c)
    # The integer transform is only near-orthogonal; error grows ~log(size).
    assert np.abs(r - res).max() <= 4


def test_dst_roundtrip():
    rng = np.random.default_rng(1)
    res = rng.integers(-255, 256, size=(4, 4)).astype(np.int32)
    c = transform.forward_transform(res, use_dst=True)
    r = transform.inverse_transform(c, use_dst=True)
    assert np.abs(r - res).max() <= 2


@pytest.mark.parametrize("qp", [0, 10, 22, 27, 32, 37, 51])
@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_quant_roundtrip_error_bounded(size, qp):
    rng = np.random.default_rng(qp * 100 + size)
    res = rng.integers(-100, 101, size=(size, size)).astype(np.int32)
    levels, recon = transform.transform_quantize(res, qp)
    # Reconstruction error should be bounded by ~Qstep.
    qstep = 2 ** ((qp - 4) / 6.0)
    err = np.abs(recon - res).max()
    assert err <= max(2.0, 1.5 * qstep), (err, qstep)
    # Higher QP -> fewer nonzero levels.
    if qp >= 37:
        assert np.count_nonzero(levels) <= np.count_nonzero(res)


def test_dequant_is_spec_formula():
    # Spot-check the normative dequant formula directly.
    lv = np.zeros((8, 8), dtype=np.int32)
    lv[0, 0] = 7
    qp = 29
    bd_shift = 8 + 3 - 5  # = 6
    scale = int(tables.INV_QUANT_SCALES[29 % 6]) * 16
    expect = (7 * scale << (29 // 6)) + (1 << (bd_shift - 1))
    expect >>= bd_shift
    out = transform.dequantize(lv, qp)
    assert out[0, 0] == expect


def test_chroma_qp_mapping():
    assert tables.chroma_qp(20) == 20
    assert tables.chroma_qp(30) == 29
    assert tables.chroma_qp(33) == 32
    assert tables.chroma_qp(43) == 37
    assert tables.chroma_qp(45) == 39
