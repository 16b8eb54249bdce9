"""Multi-device sharded encode == single-device encode, byte-for-byte
(SURVEY.md §7.3.5's prescribed property test; VERDICT r1 item 3).

Runs on the 8-virtual-CPU-device mesh (conftest.py). The sharded
pipeline's halo exchanges (source refs for search, recon strips for
cross-tile deblock) must reproduce the unsharded encoder exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fasthevc_tpu import cabac_cpp
from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import synthesize_yuv

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not cabac_cpp.available(),
                       reason="C++ engine unavailable"),
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def _mesh(gop, tile):
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:gop * tile]).reshape(gop, tile)
    return Mesh(devs, axis_names=("gop", "tile"))


def test_sharded_encode_byte_identical():
    from fasthevc_tpu.parallel.sharded import sharded_encode_all_intra

    w, h, n = 512, 96, 4
    clip = synthesize_yuv(w, h, n, seed=11)
    mesh = _mesh(2, 4)
    cfg = EncoderConfig(width=w, height=h, qp=32, frames=n,
                        tile_cols=4, tile_rows=1, sao=False)
    s_sharded, recons = sharded_encode_all_intra(clip, cfg, mesh)
    s_single, _ = TpuEncoder(cfg).encode(clip)
    assert s_sharded == s_single, (
        f"sharded {len(s_sharded)}B != unsharded {len(s_single)}B")
    pics = SpecDecoder().decode(s_sharded)
    assert all(p.hash_ok for p in pics)


def test_sharded_encode_deblock_halo_matters():
    """Disabling the cross-tile deblock halo must CHANGE the recon —
    proving the halo exchange is load-bearing, not decorative."""
    from fasthevc_tpu.parallel.sharded import (
        build_sharded_intra_pipeline)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fasthevc_tpu.spec.encoder import config_to_sp
    from fasthevc_tpu.spec.ctu import tu_qps
    from fasthevc_tpu.utils.video import pad_plane

    w, h = 256, 64
    clip = synthesize_yuv(w, h, 1, seed=12)
    mesh = _mesh(1, 2)
    cfg = EncoderConfig(width=w, height=h, qp=35, frames=1,
                        tile_cols=2, tile_rows=1, sao=False)
    sp = config_to_sp(cfg)
    qp_y, qp_cb, qp_cr = tu_qps(sp, cfg.qp)
    lam = np.sqrt(0.57 * 2.0 ** ((cfg.qp - 12) / 3.0))

    def run(deblock_on):
        pipe = build_sharded_intra_pipeline(mesh, w, h,
                                            deblock_on=deblock_on)
        y = np.stack([pad_plane(np.asarray(clip[0][0], np.int32), 64, w)
                      .astype(np.uint8)])
        cb = np.stack([np.asarray(clip[0][1], np.uint8)])
        cr = np.stack([np.asarray(clip[0][2], np.uint8)])
        spec_in = NamedSharding(mesh, P("gop", None, "tile"))
        res = pipe(jax.device_put(jnp.asarray(y), spec_in),
                   jax.device_put(jnp.asarray(cb), spec_in),
                   jax.device_put(jnp.asarray(cr), spec_in),
                   jnp.float32(lam), jnp.int32(qp_y), jnp.int32(qp_cb),
                   jnp.int32(qp_cr), jnp.int32(cfg.qp))
        return np.asarray(res[4])

    rec_on = run(True)
    rec_off = run(False)
    # the tile boundary column region must differ once the halo-fed
    # boundary deblock runs
    boundary = rec_on[0, :, 124:132] != rec_off[0, :, 124:132]
    assert boundary.any()
