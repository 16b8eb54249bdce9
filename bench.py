"""Benchmark harness — primary metric: encode frames/s/chip at 1080p QP32.

Run on the real TPU chip (driver runs this each round). Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is the
ratio against the BASELINE.md target of 30 fps 1080p per chip (no published
reference numbers exist: BASELINE.json "published" is empty, so the
north-star target is the denominator).

Also prints per-stage/per-resolution detail lines to stderr for tracking.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _device_healthy(timeout_s: int = 90) -> bool:
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


def bench_encode(width: int, height: int, frames: int, qp: int = 32):
    from fasthevc_tpu.codec.encoder import TpuEncoder
    from fasthevc_tpu.config import EncoderConfig
    from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes

    from fasthevc_tpu.config.config import auto_tile_grid

    clip = synthesize_yuv(width, height, frames, seed=1)
    tc, tr = auto_tile_grid(width, height)
    cfg = EncoderConfig(width=width, height=height, qp=qp, frames=frames,
                        tile_cols=tc, tile_rows=tr)
    enc = TpuEncoder(cfg)
    enc.encode(clip[:1])  # warm-up: jit compile + C++ build
    t0 = time.time()
    stream, recons = enc.encode(clip)
    dt = time.time() - t0
    fps = frames / dt
    ry, _, _ = yuv_from_planes((recons[0].y, recons[0].cb, recons[0].cr),
                               width, height)
    p = psnr(clip[0][0], ry)
    return fps, len(stream) * 8 / frames, p


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


def main() -> int:
    if not _device_healthy():
        print("WARNING: TPU data plane unresponsive (device->host copies "
              "hang); falling back to CPU so the benchmark completes. "
              "CPU numbers are NOT chip numbers.", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    ok = verify_conformance()
    print(f"conformance (encode->decode->hash): {'OK' if ok else 'FAIL'}",
          file=sys.stderr)
    if not ok:
        print(json.dumps({"metric": "encode_fps_1080p_qp32", "value": 0.0,
                          "unit": "frames/s/chip", "vs_baseline": 0.0}))
        return 1
    for w, h, n in ((416, 240, 8), (832, 480, 4)):
        fps, bits, p = bench_encode(w, h, n)
        print(f"{w}x{h}: {fps:.2f} fps, {bits / 1000:.0f} kbit/frame, "
              f"Y-PSNR {p:.2f} dB", file=sys.stderr)
    fps, bits, p = bench_encode(1920, 1080, 4)
    print(f"1920x1080: {fps:.2f} fps, {bits / 1000:.0f} kbit/frame, "
          f"Y-PSNR {p:.2f} dB", file=sys.stderr)
    print(json.dumps({
        "metric": "encode_fps_1080p_qp32",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 30.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
