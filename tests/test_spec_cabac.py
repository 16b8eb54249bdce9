"""Unit tests: CABAC engine encode->decode roundtrip on random bin streams."""

import numpy as np
import pytest

from fasthevc_tpu.spec import bitstream as bs
from fasthevc_tpu.spec import cabac, tables


def test_context_init_matches_spec_formula():
    # initValue 154 is the "equiprobable" init: state 0 either MPS.
    st, mps = tables.init_context_state(154, 26)
    assert st == 0
    # slope = (154>>4)*5-45 = 9*5-45 = 0; offset = (154&15)<<3 - 16 = 10*8-16=64
    # pre = 0 + 64 = 64 -> valMps=1, state=0
    assert mps == 1


def test_frac_bits_monotone():
    fb = tables.FRAC_BITS
    # LPS cost decreases with state index? No: p_lps shrinks with state, so
    # LPS cost increases with state and MPS cost decreases.
    assert np.all(np.diff(fb[:, 1]) >= 0)
    assert np.all(np.diff(fb[:, 0]) <= 0)
    # state 0 is equiprobable: both costs ~1 bit
    assert abs(fb[0, 0] - 32768) < 3000
    assert abs(fb[0, 1] - 32768) < 3000


def _roundtrip(seed, n_bins, qp=32, init_type=0):
    rng = np.random.default_rng(seed)
    names = list(tables.CTX_INIT.keys())
    # Build a random mixed sequence of (kind, name, idx, bin)
    seq = []
    for _ in range(n_bins):
        kind = rng.integers(0, 3)
        if kind == 0:  # context bin
            name = names[rng.integers(0, len(names))]
            idx = int(rng.integers(0, len(tables.CTX_INIT[name][0])))
            seq.append(("ctx", name, idx, int(rng.integers(0, 2))))
        elif kind == 1:  # bypass
            seq.append(("byp", None, None, int(rng.integers(0, 2))))
        else:  # terminate(0)
            seq.append(("trm", None, None, 0))

    w = bs.BitWriter()
    enc_ctx = cabac.ContextSet(init_type, qp)
    enc = cabac.CabacEncoder(w, enc_ctx)
    for kind, name, idx, b in seq:
        if kind == "ctx":
            enc.encode_bin(name, idx, b)
        elif kind == "byp":
            enc.encode_bypass(b)
        else:
            enc.encode_terminate(0)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    data = w.get_bytes() + b"\x00\x00"  # padding for decoder renorm reads

    dec_ctx = cabac.ContextSet(init_type, qp)
    dec = cabac.CabacDecoder(bs.BitReader(data), dec_ctx)
    for kind, name, idx, b in seq:
        if kind == "ctx":
            assert dec.decode_bin(name, idx) == b
        elif kind == "byp":
            assert dec.decode_bypass() == b
        else:
            assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1
    return len(data)


@pytest.mark.parametrize("seed", range(8))
def test_cabac_roundtrip_random(seed):
    _roundtrip(seed, 500)


def test_cabac_roundtrip_long():
    _roundtrip(99, 5000)


def test_cabac_roundtrip_all_zero_bins():
    # Highly skewed stream: all MPS — strong compression, carry paths.
    qp = 32
    w = bs.BitWriter()
    enc_ctx = cabac.ContextSet(0, qp)
    enc = cabac.CabacEncoder(w, enc_ctx)
    n = 2000
    for i in range(n):
        enc.encode_bin("split_cu_flag", 0, 0)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    data = w.get_bytes() + b"\x00\x00"
    assert len(data) < n // 8  # must compress heavily
    dec = cabac.CabacDecoder(bs.BitReader(data), cabac.ContextSet(0, qp))
    for i in range(n):
        assert dec.decode_bin("split_cu_flag", 0) == 0
    assert dec.decode_terminate() == 1


def test_cabac_roundtrip_all_ones_bypass():
    # All-ones bypass stresses the 0xFF carry buffering.
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(0, 26))
    n = 300
    for _ in range(n):
        enc.encode_bypass(1)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    data = w.get_bytes() + b"\x00\x00"
    dec = cabac.CabacDecoder(bs.BitReader(data), cabac.ContextSet(0, 26))
    for _ in range(n):
        assert dec.decode_bypass() == 1
    assert dec.decode_terminate() == 1


def test_estimator_tracks_encoder_rate():
    # The counter-mode estimator should be within ~5% of real emitted bits
    # on a long random stream.
    rng = np.random.default_rng(7)
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(0, 32))
    est = cabac.CabacEstimator(cabac.ContextSet(0, 32))
    n = 20000
    for _ in range(n):
        b = int(rng.integers(0, 2))
        if rng.integers(0, 4) == 0:
            enc.encode_bypass(b)
            est.encode_bypass(b)
        else:
            idx = int(rng.integers(0, 3))
            enc.encode_bin("split_cu_flag", idx, b)
            est.encode_bin("split_cu_flag", idx, b)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    real_bits = len(w.get_bytes()) * 8
    assert abs(est.bits - real_bits) / real_bits < 0.05
