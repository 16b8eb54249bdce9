"""Unit tests: residual_coding encode->decode roundtrip for all shapes."""

import numpy as np
import pytest

from fasthevc_tpu.spec import bitstream as bs
from fasthevc_tpu.spec import cabac, residual
from fasthevc_tpu.spec.tables import SCAN_DIAG, SCAN_HOR, SCAN_VER


def _roundtrip_block(levels, log2_size, c_idx, scan_idx, qp=32):
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(0, qp))
    residual.encode_residual(enc, levels, log2_size, c_idx, scan_idx)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    data = w.get_bytes() + b"\x00\x00"
    dec = cabac.CabacDecoder(bs.BitReader(data), cabac.ContextSet(0, qp))
    out = residual.decode_residual(dec, log2_size, c_idx, scan_idx)
    assert dec.decode_terminate() == 1
    np.testing.assert_array_equal(out, levels)
    return len(data)


@pytest.mark.parametrize("scan_idx", [SCAN_DIAG, SCAN_HOR, SCAN_VER])
def test_single_dc_coeff_4x4(scan_idx):
    lv = np.zeros((4, 4), dtype=np.int32)
    lv[0, 0] = 5
    _roundtrip_block(lv, 2, 0, scan_idx)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_random_sparse(log2, c_idx):
    rng = np.random.default_rng(log2 * 10 + c_idx)
    n = 1 << log2
    for trial in range(8):
        lv = np.zeros((n, n), dtype=np.int32)
        k = rng.integers(1, max(2, n * n // 4))
        xs = rng.integers(0, n, k)
        ys = rng.integers(0, n, k)
        lv[ys, xs] = rng.integers(-20, 21, k)
        if not lv.any():
            lv[0, 0] = 1
        _roundtrip_block(lv, log2, c_idx, SCAN_DIAG)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_dense_large_values(log2):
    rng = np.random.default_rng(99 + log2)
    n = 1 << log2
    lv = rng.integers(-500, 501, (n, n)).astype(np.int32)
    lv[0, 0] = 30000  # stress remaining/rice escalation
    _roundtrip_block(lv, log2, 0, SCAN_DIAG)


def test_last_coeff_max_position():
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        lv = np.zeros((n, n), dtype=np.int32)
        lv[n - 1, n - 1] = -3
        _roundtrip_block(lv, log2, 0, SCAN_DIAG)


def test_dc_inference_path():
    # Sub-block with only a DC coefficient surrounded by coded neighbors:
    # exercises inferSbDcSigCoeffFlag.
    lv = np.zeros((16, 16), dtype=np.int32)
    lv[12, 12] = 4  # last coeff in far sub-block
    lv[4, 4] = 1    # lone DC of sub-block (1,1)
    lv[0, 0] = 2
    _roundtrip_block(lv, 4, 0, SCAN_DIAG)


@pytest.mark.parametrize("scan_idx", [SCAN_HOR, SCAN_VER])
def test_8x8_mdcs_scans(scan_idx):
    rng = np.random.default_rng(scan_idx)
    lv = rng.integers(-9, 10, (8, 8)).astype(np.int32)
    lv[0, 0] = 1
    _roundtrip_block(lv, 3, 0, scan_idx)


def test_mixed_sequence_of_blocks():
    # Many blocks through one coder instance (context continuity).
    rng = np.random.default_rng(1234)
    blocks = []
    for _ in range(20):
        log2 = int(rng.integers(2, 6))
        c_idx = int(rng.integers(0, 2))
        n = 1 << log2
        lv = (rng.random((n, n)) < 0.15) * rng.integers(-40, 41, (n, n))
        lv = lv.astype(np.int32)
        if not lv.any():
            lv[0, 0] = -1
        blocks.append((lv, log2, c_idx))
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(0, 32))
    for lv, log2, c_idx in blocks:
        residual.encode_residual(enc, lv, log2, c_idx, SCAN_DIAG)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    data = w.get_bytes() + b"\x00\x00"
    dec = cabac.CabacDecoder(bs.BitReader(data), cabac.ContextSet(0, 32))
    for lv, log2, c_idx in blocks:
        out = residual.decode_residual(dec, log2, c_idx, SCAN_DIAG)
        np.testing.assert_array_equal(out, lv)
    assert dec.decode_terminate() == 1


def test_estimator_close_to_real_rate_on_residuals():
    rng = np.random.default_rng(5)
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(0, 32))
    est = cabac.CabacEstimator(cabac.ContextSet(0, 32))
    for _ in range(30):
        lv = (rng.random((8, 8)) < 0.2) * rng.integers(-15, 16, (8, 8))
        lv = lv.astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1
        residual.encode_residual(enc, lv, 3, 0, SCAN_DIAG)
        residual.encode_residual(est, lv, 3, 0, SCAN_DIAG)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    real_bits = len(w.get_bytes()) * 8
    assert abs(est.bits - real_bits) / real_bits < 0.08
