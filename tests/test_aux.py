"""Aux subsystems: rate control, GOP journal resume, metrics."""

import os

import numpy as np
import pytest

from fasthevc_tpu.codec.journal import GopJournal, encode_journaled
from fasthevc_tpu.codec.rate_control import RateController
from fasthevc_tpu.config import EncoderConfig, low_delay_p
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv
from fasthevc_tpu.utils.metrics import MetricsLog, PictureRecord


def test_rate_controller_converges_direction():
    rc = RateController(target_bitrate=500_000, frame_rate=30, width=416,
                        height=240)
    qp1 = rc.picture_qp(30, is_intra=True)
    # simulate overshoot: spending 3x the budget must raise QP over time
    for _ in range(5):
        q = rc.picture_qp(30)
        rc.update_after_picture(int(3 * rc.bits_per_frame))
    q_over = rc.picture_qp(30)
    assert q_over >= q

    rc2 = RateController(500_000, 30, 416, 240)
    q0 = rc2.picture_qp(30)
    for _ in range(5):
        rc2.picture_qp(30)
        rc2.update_after_picture(int(0.2 * rc2.bits_per_frame))
    q_under = rc2.picture_qp(30)
    assert q_under <= q0


def test_rate_control_hits_target_ballpark():
    frames = synthesize_yuv(96, 64, 6, seed=71)
    target = 400_000  # bits/s at 30 fps -> ~13.3 kbit/frame
    cfg = EncoderConfig(width=96, height=64, frames=6, target_bitrate=target,
                        num_intra_rd_candidates=1, sao=False)
    stream, _ = SpecEncoder(cfg).encode(frames)
    bits_per_frame = len(stream) * 8 / 6
    target_per_frame = target / 30
    assert 0.3 * target_per_frame < bits_per_frame < 3.0 * target_per_frame
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_journal_resume_byte_identical(tmp_path):
    frames = synthesize_yuv(64, 64, 6, seed=72)
    cfg = low_delay_p(width=64, height=64, qp=35, frames=6,
                      num_intra_rd_candidates=1, sao=False,
                      deblocking=False)
    cfg = cfg.replace(intra_period=3)  # IDR at 0 and 3

    # uninterrupted reference run
    ref_stream, _ = SpecEncoder(cfg).encode(frames)

    # interrupted run: encode only 4 frames then "crash"
    sp1 = tmp_path / "a.bin"
    jp1 = tmp_path / "a.journal"
    encode_journaled(SpecEncoder(cfg), frames[:4], str(sp1), str(jp1))
    # simulate a crash with a partial trailing write
    with open(sp1, "ab") as f:
        f.write(b"\x00\x00\x01\x00garbage")

    # resume the full sequence
    full = encode_journaled(SpecEncoder(cfg), frames, str(sp1), str(jp1))
    assert full == ref_stream
    pics = SpecDecoder().decode(full)
    assert len(pics) == 6 and all(p.hash_ok for p in pics)


def test_journal_records(tmp_path):
    frames = synthesize_yuv(64, 64, 3, seed=73)
    cfg = EncoderConfig(width=64, height=64, qp=35, frames=3,
                        num_intra_rd_candidates=1, sao=False)
    sp = tmp_path / "s.bin"
    jp = tmp_path / "s.journal"
    stream = encode_journaled(SpecEncoder(cfg), frames, str(sp), str(jp))
    j = GopJournal.load(str(jp))
    assert len(j.entries) == 3
    assert all(e.is_idr for e in j.entries)  # all-intra
    assert j.entries[0].offset > 0  # after parameter sets
    # offsets + sizes tile the stream exactly
    assert j.entries[-1].offset + j.entries[-1].size == len(stream)
    with open(sp, "rb") as f:
        assert f.read() == stream


def test_metrics_log(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricsLog(str(p))
    log.add(PictureRecord(poc=0, slice_type="I", qp=32, bits=1000,
                          psnr_y=40.0, psnr_u=41.0, psnr_v=42.0,
                          times={"search": 0.1}))
    log.add(PictureRecord(poc=1, slice_type="P", qp=33, bits=400,
                          psnr_y=39.0, psnr_u=41.0, psnr_v=42.0))
    s = log.summary()
    assert s["frames"] == 2 and s["bits_total"] == 1400
    log.close()
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 2 and '"slice_type": "I"' in lines[0]


# ---------------------------------------------------------------------------
# decoded-picture-hash SEI variants (SURVEY.md E12: MD5 / CRC / checksum)
# ---------------------------------------------------------------------------

def _crc_spec_bitwise(data: bytes) -> int:
    """Annex D.3.19 CRC, literal bit-by-bit transcription (the oracle the
    table-driven utils implementation must match)."""
    crc = 0xFFFF
    for byte in data:
        for bit_idx in range(8):
            msb = (crc >> 15) & 1
            bit = (byte >> (7 - bit_idx)) & 1
            crc = (((crc << 1) + bit) & 0xFFFF) ^ (0x1021 if msb else 0)
    for _ in range(16):
        msb = (crc >> 15) & 1
        crc = ((crc << 1) & 0xFFFF) ^ (0x1021 if msb else 0)
    return crc


def test_picture_crc_matches_spec_bitwise():
    from fasthevc_tpu.utils.video import picture_crc
    rng = np.random.default_rng(5)
    for shape in ((8, 8), (17, 31), (64, 96)):
        p = rng.integers(0, 256, shape, dtype=np.uint8)
        want = _crc_spec_bitwise(p.tobytes())
        assert picture_crc([p])[0] == want.to_bytes(2, "big")


def test_picture_checksum_matches_spec_loop():
    from fasthevc_tpu.utils.video import picture_checksum
    rng = np.random.default_rng(6)
    p = rng.integers(0, 256, (33, 300), dtype=np.uint8)
    s = 0
    for y in range(p.shape[0]):
        for x in range(p.shape[1]):
            mask = (x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8)
            s = (s + ((int(p[y, x]) & 0xFF) ^ mask)) & 0xFFFFFFFF
    assert picture_checksum([p])[0] == s.to_bytes(4, "big")


@pytest.mark.parametrize("hash_type", [1, 2])
def test_hash_sei_variants_roundtrip(hash_type):
    """Encode with CRC / checksum hash SEI; decoder must verify it."""
    from fasthevc_tpu.codec.encoder import TpuEncoder
    frames = synthesize_yuv(96, 64, 2, seed=9)
    cfg = EncoderConfig(width=96, height=64, frames=2, qp=32,
                        hash_type=hash_type)
    stream, _ = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 2 and all(p.hash_ok for p in pics)


# ---------------------------------------------------------------------------
# native-engine sanitizer build (SURVEY.md §5.2)
# ---------------------------------------------------------------------------

def test_native_engine_asan_ubsan():
    """Build the C++ engine self-test with ASan+UBSan and run it: random
    CABAC bin streams, residual blocks of every size, deblock on random
    pictures — any OOB/UB aborts with a nonzero exit."""
    import subprocess
    from fasthevc_tpu import cabac_cpp
    if not cabac_cpp.available():
        pytest.skip("C++ toolchain unavailable")
    try:
        exe = cabac_cpp.build_sanitized()
    except Exception:
        pytest.skip("sanitizer libs unavailable")
    r = subprocess.run([exe], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert b"sanitize_main OK" in r.stdout
