"""Unit tests: bit I/O, Exp-Golomb, emulation prevention, NAL framing."""

import numpy as np

from fasthevc_tpu.spec import bitstream as bs


def test_bits_roundtrip():
    w = bs.BitWriter()
    w.write_bits(0b1011, 4)
    w.write_bits(0xDEAD, 16)
    w.write_flag(1)
    w.byte_align()
    r = bs.BitReader(w.get_bytes())
    assert r.read_bits(4) == 0b1011
    assert r.read_bits(16) == 0xDEAD
    assert r.read_flag() == 1


def test_ue_se_roundtrip():
    vals_ue = [0, 1, 2, 3, 7, 8, 100, 2**16, 2**20 - 1]
    vals_se = [0, 1, -1, 2, -2, 63, -64, 1000, -1000]
    w = bs.BitWriter()
    for v in vals_ue:
        w.write_ue(v)
    for v in vals_se:
        w.write_se(v)
    w.byte_align()
    r = bs.BitReader(w.get_bytes())
    for v in vals_ue:
        assert r.read_ue() == v
    for v in vals_se:
        assert r.read_se() == v


def test_ue_known_codes():
    w = bs.BitWriter()
    w.write_ue(0)  # "1"
    w.write_ue(1)  # "010"
    w.write_ue(2)  # "011"
    w.write_ue(3)  # "00100"
    w.byte_align()
    data = w.get_bytes()
    # 1 010 011 00100 1(stop) 0000 -> 10100110 01001000
    assert data == bytes([0b10100110, 0b01001000])


def test_emulation_prevention_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        raw = bytes(rng.integers(0, 4, size=rng.integers(1, 200)).astype(np.uint8))
        ebsp = bs.rbsp_to_ebsp(raw)
        # no 00 00 0x with x<=3 without escape
        for i in range(len(ebsp) - 2):
            if ebsp[i] == 0 and ebsp[i + 1] == 0:
                assert ebsp[i + 2] > 2 or ebsp[i + 2] == 3
        assert bs.ebsp_to_rbsp(ebsp) == raw


def test_emulation_prevention_specific():
    assert bs.rbsp_to_ebsp(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert bs.rbsp_to_ebsp(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert bs.rbsp_to_ebsp(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert bs.ebsp_to_rbsp(b"\x00\x00\x03\x01") == b"\x00\x00\x01"


def test_nal_roundtrip():
    rbsp1 = b"\x42\x00\x00\x00\x01\x99"
    rbsp2 = b"\x01\x02\x03"
    stream = bs.write_nal(bs.NAL_SPS, rbsp1) + bs.write_nal(
        bs.NAL_IDR_W_RADL, rbsp2, temporal_id=0)
    nals = list(bs.split_annexb(stream))
    assert len(nals) == 2
    assert nals[0][0] == bs.NAL_SPS
    assert nals[0][2] == rbsp1
    assert nals[1][0] == bs.NAL_IDR_W_RADL
    assert nals[1][2] == rbsp2


def test_more_rbsp_data():
    w = bs.BitWriter()
    w.write_ue(5)
    w.byte_align()  # stop bit + pad
    r = bs.BitReader(w.get_bytes())
    assert r.more_rbsp_data()
    r.read_ue()
    assert not r.more_rbsp_data()
