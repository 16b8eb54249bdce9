"""Device mesh construction + sharded frame-search step.

The canonical layout (SURVEY.md §5.8): mesh axes ("gop", "tile").
  * "gop":  data-parallel over frames (GOP-parallel, P4) — embarrassing for
    all-intra; for inter GOPs, reference pictures move via collectives.
  * "tile": spatial split of each frame into CTU-aligned tile columns (P1);
    intra prediction does not cross tile boundaries (HEVC tiles semantics),
    while ME windows and cross-tile loop filters exchange halo strips via
    lax.ppermute (P6) — exercised here by the boundary-strip exchange.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec.search import search_intra_frame


def gop_tile_mesh(n_devices: int | None = None,
                  n_tile: int | None = None) -> Mesh:
    """Build a ("gop", "tile") mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if n_tile is None:
        # favor tile-dim 4 when possible (halo traffic rides ICI neighbors)
        n_tile = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    n_gop = n // n_tile
    arr = np.array(devs).reshape(n_gop, n_tile)
    return Mesh(arr, axis_names=("gop", "tile"))


def sharded_search_step(mesh: Mesh, log2_ctu: int = 5,
                        log2_min_cu: int = 3, halo: int = 4):
    """Build a jitted, fully sharded encode-search step.

    Returns step(frames, lambda_sqrt) with frames [G, H, W] int32 sharded
    P("gop", None, "tile"). Each (gop, tile) shard searches its tile column
    of its frames; tile-boundary pixel strips are exchanged with the right
    neighbor via ppermute (the P6 halo pattern used by deblock/SAO and ME),
    and a psum over both axes produces the global RD-cost scalar.

    Output: (split32 decisions [G, B32] bool (gathered), total_cost scalar)
    """
    n_tile = mesh.shape["tile"]

    def per_shard(frames, lambda_sqrt):
        # frames: [g_local, H, W_tile]
        def one(frame):
            dec = search_intra_frame(frame, lambda_sqrt, log2_ctu,
                                     log2_min_cu)
            top = 1 << log2_ctu
            return dec[f"split{top}"], dec[f"cost{top}"]

        splits, costs = jax.vmap(one)(frames)
        # halo exchange: rightmost boundary strip -> right neighbor
        # (consumed by cross-tile filtering / ME stages; here it feeds a
        # boundary-continuity statistic so the collective is load-bearing)
        strip = frames[:, :, -halo:]
        perm = [(i, (i + 1) % n_tile) for i in range(n_tile)]
        recv = jax.lax.ppermute(strip, "tile", perm=perm)
        boundary_stat = jnp.sum(
            jnp.abs(frames[:, :, :1].astype(jnp.int32)
                    - recv[:, :, -1:].astype(jnp.int32)))
        total = jax.lax.psum(jnp.sum(costs), axis_name=("gop", "tile"))
        boundary = jax.lax.psum(boundary_stat, axis_name=("gop", "tile"))
        return splits, total, boundary

    from jax.experimental.shard_map import shard_map

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("gop", None, "tile"), P()),
        out_specs=(P("gop", "tile"), P(), P()))

    @jax.jit
    def step(frames, lambda_sqrt):
        return mapped(frames, lambda_sqrt)

    return step
