"""Benchmark harness — primary metric: encode frames/s/chip at 1080p QP32.

Run on the real TPU chip (driver runs this each round). Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline", "platform"} where
vs_baseline is the ratio against the BASELINE.md target of 30 fps 1080p per
chip (no published reference numbers exist: BASELINE.json "published" is
empty, so the north-star target is the denominator). "platform" records
what actually executed (tpu/cpu) so a CPU fallback can never masquerade as
a chip number.

Warm-up discipline: the timed path is the pipelined all-intra encoder,
which jits `search_intra_maps_batch` at a fixed frame-group shape
(codec/encoder.py). The warm-up therefore encodes one full group of frames
so the EXACT jitted signature (same batch shape, same static args) used by
the timed run is compiled before timing starts.

Also prints per-stage/per-resolution detail lines to stderr for tracking.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent XLA compile cache: the 1080p device-pipeline program takes
# minutes to compile; cache it across bench processes/rounds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fasthevc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

TARGET_FPS = 30.0  # BASELINE.md north star, 1080p QP32 per chip


def _device_healthy(timeout_s: int = 120) -> bool:
    """Probe the default JAX device's data plane in a subprocess (a wedged
    TPU tunnel hangs device->host copies forever; don't let bench hang)."""
    code = ("import numpy as np, jax;"
            "v = np.asarray(jax.device_put(np.arange(8)));"
            "print('ok', v.sum())")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _platform() -> str:
    import jax
    return jax.devices()[0].platform


def bench_encode(width: int, height: int, frames: int, qp: int = 32,
                 group: int = 0):
    from fasthevc_tpu.codec.encoder import FRAME_GROUP, TpuEncoder
    from fasthevc_tpu.config import EncoderConfig
    from fasthevc_tpu.config.config import auto_tile_grid
    from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes

    clip = synthesize_yuv(width, height, frames, seed=1)
    tc, tr = auto_tile_grid(width, height)
    # hash_type 2 (Annex-D checksum) is computed ON DEVICE, so the recon
    # planes never cross the ~30 MB/s tunnel; MD5/CRC remain available as
    # config choices (and the conformance check below runs the default).
    cfg = EncoderConfig(width=width, height=height, qp=qp, frames=frames,
                        tile_cols=tc, tile_rows=tr,
                        frame_group=group or 0, hash_type=2)
    enc = TpuEncoder(cfg)
    # Warm-up: encode one full frame group so the pipelined path compiles
    # the same `search_intra_maps_batch` signature the timed run dispatches
    # (a 1-frame warm-up would compile the WRONG program — the unbatched
    # search — leaving the real compile inside the timed region).
    warm = min(group or FRAME_GROUP, frames)
    enc.encode(clip[:warm])
    t0 = time.time()
    stream, recons = enc.encode(clip)
    dt = time.time() - t0
    fps = frames / dt
    ry, _, _ = yuv_from_planes((recons[0].y, recons[0].cb, recons[0].cr),
                               width, height)
    p = psnr(clip[0][0], ry)
    return fps, len(stream) * 8 / frames, p


def bench_encode_ra(width: int, height: int, frames: int, qp: int = 32):
    """Random-access hierarchical-B GOP-16 encode throughput (the CTC
    headline config — BASELINE config #3 class).  Uses the temporal-layer
    coding order so device batches hold whole layers."""
    from fasthevc_tpu.codec.encoder import TpuEncoder
    from fasthevc_tpu.config import random_access_gop16_layered
    from fasthevc_tpu.config.config import auto_tile_grid

    from fasthevc_tpu.utils import synthesize_yuv

    clip = synthesize_yuv(width, height, frames, seed=2)
    tc, tr = auto_tile_grid(width, height)
    cfg = random_access_gop16_layered(
        width=width, height=height, qp=qp, frames=frames,
        tile_cols=tc, tile_rows=tr, hash_type=2)
    cfg.intra_period = 64
    enc = TpuEncoder(cfg)
    warm = min(17, frames)  # IDR + one GOP covers every batch shape
    enc.encode(clip[:warm])
    t0 = time.time()
    stream, _ = enc.encode(clip)
    dt = time.time() - t0
    return frames / dt, len(stream) * 8 / frames


def verify_conformance(width=96, height=64, qp=32) -> bool:
    from fasthevc_tpu.codec.encoder import TpuEncoder
    from fasthevc_tpu.config import EncoderConfig
    from fasthevc_tpu.spec.decoder import SpecDecoder
    from fasthevc_tpu.utils import synthesize_yuv

    clip = synthesize_yuv(width, height, 2, seed=3)
    cfg = EncoderConfig(width=width, height=height, qp=qp, frames=2)
    stream, _ = TpuEncoder(cfg).encode(clip)
    pics = SpecDecoder().decode(stream)
    return all(p.hash_ok for p in pics)


def _emit(value: float, platform: str, ok: bool, extra=None) -> None:
    rec = {
        "metric": "encode_fps_1080p_qp32",
        "value": round(value, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(value / TARGET_FPS, 4),
        "platform": platform,
        "conformance": "OK" if ok else "FAIL",
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def main() -> int:
    platform = "unknown"
    if not _device_healthy():
        # The axon sitecustomize force-registers the TPU plugin, so even
        # JAX_PLATFORMS=cpu in this process may hang. Report the wedge
        # honestly instead of silently benchmarking a CPU as the chip.
        print("ERROR: TPU data plane unresponsive (device->host copies "
              "hang). No trustworthy chip number can be produced.",
              file=sys.stderr)
        _emit(0.0, "wedged", False)
        return 1
    platform = _platform()
    ok = verify_conformance()
    print(f"conformance (encode->decode->hash): {'OK' if ok else 'FAIL'}",
          file=sys.stderr)
    if not ok:
        _emit(0.0, platform, False)
        return 1
    detail = {}
    for w, h, n in ((416, 240, 16), (832, 480, 8)):
        fps, bits, p = bench_encode(w, h, n)
        detail[f"fps_{w}x{h}"] = round(fps, 3)
        print(f"{w}x{h}: {fps:.2f} fps, {bits / 1000:.0f} kbit/frame, "
              f"Y-PSNR {p:.2f} dB", file=sys.stderr)
    # 24 frames = 3 device groups, so the steady-state pipeline overlap
    # (device compute vs fetch vs host CABAC) is what gets measured
    fps, bits, p = bench_encode(1920, 1080, 24)
    print(f"1920x1080: {fps:.2f} fps, {bits / 1000:.0f} kbit/frame, "
          f"Y-PSNR {p:.2f} dB", file=sys.stderr)
    try:
        fps_ra, bits_ra = bench_encode_ra(1920, 1080, 49)
        print(f"1920x1080 RA-GOP16: {fps_ra:.2f} fps, "
              f"{bits_ra / 1000:.0f} kbit/frame", file=sys.stderr)
        detail["fps_1080p_ra"] = round(fps_ra, 3)
    except Exception as exc:  # RA bench must never mask the primary metric
        print(f"RA bench failed: {exc!r}", file=sys.stderr)
    _emit(fps, platform, True, detail)
    return 0


if __name__ == "__main__":
    sys.exit(main())
