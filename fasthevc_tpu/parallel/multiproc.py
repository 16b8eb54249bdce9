"""Multi-process GOP-parallel encode (SURVEY.md §2.4 P4, §5.8; BASELINE
config #5 skeleton).

Each process in a `jax.distributed` group encodes a contiguous span of
CLOSED GOPs (IDR-led segments are independent by construction — the
codec analog of data parallelism over the "gop" mesh axis); process 0
concatenates the per-process bitstreams in GOP order, which reproduces
the single-process stream byte-for-byte.

Without a cluster this runs as an N-process LOOPBACK on one machine
(127.0.0.1 coordinator, CPU devices) — the same code path a multi-host
TPU pod would take with a real coordinator address.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile


def _gop_spans(n_frames: int, intra_period: int, n_procs: int):
    """Split [0, n_frames) into n_procs spans aligned to closed-GOP (IDR)
    boundaries."""
    if intra_period <= 0:
        bounds = [0, n_frames]          # one CVS: cannot split safely
    else:
        idrs = list(range(0, n_frames, max(1, intra_period)))
        bounds = idrs + [n_frames]
    # assign consecutive GOP segments to processes as evenly as possible
    segs = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
    per = -(-len(segs) // n_procs)
    spans = []
    for p in range(n_procs):
        chunk = segs[p * per:(p + 1) * per]
        if chunk:
            spans.append((chunk[0][0], chunk[-1][1]))
        else:
            spans.append((n_frames, n_frames))
    return spans


def _worker(rank: int, n_procs: int, coordinator: str, cfg_blob: str,
            clip_path: str, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_procs, process_id=rank)
    import numpy as np

    from ..codec.encoder import TpuEncoder
    with open(cfg_blob, "rb") as f:
        cfg = pickle.load(f)
    clip = np.load(clip_path, allow_pickle=True)
    frames = [tuple(fr) for fr in clip["frames"]]
    intra_period = cfg.intra_period if cfg.intra_period > 0 else (
        1 if not cfg.gop else -1)
    spans = _gop_spans(len(frames), 1 if intra_period == 1 else
                       cfg.intra_period, n_procs)
    lo, hi = spans[rank]
    enc = TpuEncoder(cfg)
    if hi > lo:
        stream, _ = enc.encode(frames[lo:hi], start_poc=lo,
                               write_headers=(rank == 0))
    else:
        stream = b""
    with open(out_path, "wb") as f:
        f.write(stream)
    # barrier so the parent can concatenate when all parts exist
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("parts_written")


def gop_parallel_encode_check(width: int, height: int, n_frames: int,
                              n_procs: int = 2, tile_cols: int = 1,
                              tile_rows: int = 1, qp: int = 32,
                              intra_period: int = 8,
                              inter: bool = True) -> dict:
    """Run the loopback N-process GOP-parallel encode and verify the
    concatenated stream is byte-identical to a single-process encode
    (and decodes with matching hashes). Returns a result dict.

    Default exercises CLOSED GOPs CONTAINING P FRAMES (intra_period-led
    IDR segments with an LDP GOP inside) — each process owns whole GOPs
    whose DPB state is self-contained, the real P4 split (SURVEY.md
    §2.4); inter=False falls back to all-IDR."""
    import numpy as np

    from ..codec.encoder import TpuEncoder
    from ..config import EncoderConfig, GopEntry
    from ..spec.decoder import SpecDecoder
    from ..utils import synthesize_yuv

    clip = synthesize_yuv(width, height, n_frames, seed=5)
    if inter:
        gop = [GopEntry(1, 2, "P", (-1,)), GopEntry(2, 1, "P", (-1, -2)),
               GopEntry(3, 2, "P", (-1,)), GopEntry(4, 0, "P", (-1, -2))]
        cfg = EncoderConfig(width=width, height=height, qp=qp,
                            frames=n_frames, intra_period=intra_period,
                            gop=gop,
                            tile_cols=tile_cols, tile_rows=tile_rows)
    else:
        cfg = EncoderConfig(width=width, height=height, qp=qp,
                            frames=n_frames, intra_period=1,
                            tile_cols=tile_cols, tile_rows=tile_rows)
    tmp = tempfile.mkdtemp(prefix="fasthevc_mp_")
    cfg_blob = os.path.join(tmp, "cfg.pkl")
    clip_path = os.path.join(tmp, "clip.npz")
    with open(cfg_blob, "wb") as f:
        pickle.dump(cfg, f)
    np.savez(clip_path, frames=np.asarray(clip, dtype=object))
    port = 12355 + (os.getpid() % 1000)
    coordinator = f"127.0.0.1:{port}"
    procs = []
    outs = []
    for r in range(n_procs):
        out_path = os.path.join(tmp, f"part{r}.bin")
        outs.append(out_path)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fasthevc_tpu.parallel.multiproc",
             "--rank", str(r), "--nprocs", str(n_procs),
             "--coordinator", coordinator, "--cfg", cfg_blob,
             "--clip", clip_path, "--out", out_path],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))))
    rcs = [p.wait(timeout=900) for p in procs]
    stream = b"".join(open(o, "rb").read() for o in outs)
    # the byte-identity reference is a SINGLE-process worker under the
    # same jax.distributed runtime: search costs are float-valued, and a
    # different compilation environment may legally reassociate them into
    # different (equally conformant) RD decisions — the property under
    # test is the GOP split/concat mechanism, not cross-environment float
    # determinism
    ref_path = os.path.join(tmp, "single.bin")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    rc1 = subprocess.Popen(
        [sys.executable, "-m", "fasthevc_tpu.parallel.multiproc",
         "--rank", "0", "--nprocs", "1",
         "--coordinator", f"127.0.0.1:{port + 7}", "--cfg", cfg_blob,
         "--clip", clip_path, "--out", ref_path],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))).wait(timeout=900)
    rcs.append(rc1)
    single = open(ref_path, "rb").read()
    ok_bytes = stream == single
    pics = SpecDecoder().decode(stream)
    ok_hash = all(p.hash_ok for p in pics) and len(pics) == n_frames
    return {"config": "gop-parallel-multiproc", "n_procs": n_procs,
            "rcs": rcs, "bytes": len(stream),
            "byte_identical": bool(ok_bytes),
            "decode_verify": bool(ok_hash),
            "ok": bool(ok_bytes and ok_hash and all(rc == 0
                                                    for rc in rcs))}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--clip", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    _worker(args.rank, args.nprocs, args.coordinator, args.cfg,
            args.clip, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
