"""Sample-adaptive offset on device (JAX, TPU) — spec 8.7.3.

Reference parity: HM TComSampleAdaptiveOffset / TEncSampleAdaptiveOffset
(SURVEY.md C8). TPU-first design: the per-CTB estimation loop becomes
dense one-hot segment-sums (MXU contractions) over the whole plane at
once, and application is a masked LUT add — no per-CTB control flow.

Application is the decoder-exact transform (bit-identical to
spec.sao.apply_sao_plane): classification reads the full deblocked plane
(cross-CTB neighbors included), offsets are applied per CTB, output is
clipped. Estimation is encoder freedom (any signaled params are
conformant); it follows the oracle's shape: per class/category (count,
sum) stats, offset = clip(round(sum/count), +-7), pick the candidate with
the best distortion gain, Cr inherits Cb's type/class.

Exactness notes: one-hot stats accumulate in f32 on the MXU — counts
<= ctb^2 <= 4096 and |sum| <= 4096*255 < 2^21 are exact in f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_OFFSET = 7
# EO class -> ((y0,x0),(y1,x1)) neighbor offsets (spec table 8-9 order)
EO_NEIGHBORS = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (1, -1, -1, 1))


def _edge_cats(plane: jnp.ndarray, halo=None) -> jnp.ndarray:
    """Category maps (0..4) for all 4 EO classes: [4, H, W].

    Boundary samples (missing neighbor) are category 0 — matches the
    oracle's in-picture rule.  halo: optional
    (lcol, rcol, l_avail, r_avail) — 1-px neighbor COLUMNS from the
    adjacent tile shards (SURVEY.md §2.4 P6: the SAO classification
    halo) plus traced availability booleans.  When a side is available
    its edge column classifies against the real neighbor pixels instead
    of being forced to category 0, which makes a column-sharded SAO
    byte-identical to the full-plane computation.  Halo use requires the
    plane width to be the coded width (tile columns are CTU-aligned)."""
    h, w = plane.shape
    p = plane.astype(jnp.int32)
    lcol = rcol = l_avail = r_avail = None
    if halo is not None:
        lcol, rcol, l_avail, r_avail = halo
    pad0 = jnp.pad(p, 1, mode="edge")
    if lcol is not None:
        colv = jnp.concatenate([lcol[:1], lcol, lcol[-1:]])
        pad0 = pad0.at[:, 0].set(colv.astype(jnp.int32))
    if rcol is not None:
        colv = jnp.concatenate([rcol[:1], rcol, rcol[-1:]])
        pad0 = pad0.at[:, -1].set(colv.astype(jnp.int32))
    outs = []
    for (y0, x0, y1, x1) in EO_NEIGHBORS:
        pad = pad0
        n0 = pad[1 + y0:1 + y0 + h, 1 + x0:1 + x0 + w]
        n1 = pad[1 + y1:1 + y1 + h, 1 + x1:1 + x1 + w]
        raw = 2 + jnp.sign(p - n0) + jnp.sign(p - n1)
        # remap [1,2,0,3,4][raw] arithmetically — a per-element table
        # gather on a full plane costs ~80 ms/frame on this platform
        cat = jnp.where(raw == 2, 0, jnp.where(raw < 2, raw + 1, raw))
        # zero out picture-boundary rows/cols where a neighbor is missing
        ty, by = max(0, -y0, -y1), max(0, y0, y1)
        lx, rx = max(0, -x0, -x1), max(0, x0, x1)
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        in_xl = xs >= lx
        if lx > 0 and l_avail is not None:
            in_xl = in_xl | ((xs == 0) & l_avail)
        in_xr = xs < w - rx
        if rx > 0 and r_avail is not None:
            in_xr = in_xr | ((xs == w - 1) & r_avail)
        inside = ((ys >= ty) & (ys < h - by))[:, None] & \
                 (in_xl & in_xr)[None, :]
        outs.append(jnp.where(inside, cat, 0))
    return jnp.stack(outs)


def _ctb_sum(x: jnp.ndarray, ctb: int) -> jnp.ndarray:
    """[..., H, W] -> [..., H/ctb, W/ctb] block sums."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    return (x.reshape(lead + (h // ctb, ctb, w // ctb, ctb))
            .sum(axis=(-3, -1)))


def _round_div(s: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """clip(round(s/n), +-MAX_OFFSET) with round-half-away-from-zero;
    0 where n == 0."""
    n_safe = jnp.maximum(n, 1.0)
    o = jnp.sign(s) * jnp.floor(jnp.abs(s) / n_safe + 0.5)
    o = jnp.where(n > 0, o, 0.0)
    return jnp.clip(o, -MAX_OFFSET, MAX_OFFSET).astype(jnp.int32)


def _pad_to(x: jnp.ndarray, ctb: int):
    h, w = x.shape
    ph = -(-h // ctb) * ctb
    pw = -(-w // ctb) * ctb
    if ph == h and pw == w:
        return x
    return jnp.pad(x, ((0, ph - h), (0, pw - w)))


def _estimate_plane(src: jnp.ndarray, rec: jnp.ndarray, ctb: int,
                    bit_depth: int, given=None, halo=None):
    """Per-CTB SAO decision for one plane.

    Returns (params [ny, nx, 7] int32, eo_stats, band_stats) where
    params = (type, eo_class, band_pos, off0..3). given: optional
    (type_map, class_map) [ny, nx] to inherit (Cr path); halo: see
    _edge_cats (requires w to be a ctb multiple)."""
    h, w = src.shape
    srcp = _pad_to(src.astype(jnp.int32), ctb)
    recp = _pad_to(rec.astype(jnp.int32), ctb)
    # padded samples: make cat 0 / diff 0 so they contribute nothing
    ph, pw = srcp.shape
    valid = ((jnp.arange(ph) < h)[:, None]
             & (jnp.arange(pw) < w)[None, :])
    diff = jnp.where(valid, srcp - recp, 0).astype(jnp.float32)

    if halo is not None:
        lcol, rcol, la, ra = halo
        halo = (jnp.pad(lcol.astype(jnp.int32), (0, ph - h)),
                jnp.pad(rcol.astype(jnp.int32), (0, ph - h)), la, ra)
    cats = _edge_cats(recp, halo=halo)               # [4, ph, pw]
    cats = jnp.where(valid[None], cats, 0)
    ny, nx = ph // ctb, pw // ctb

    # ---- edge stats: counts/sums per class x category 1..4 --------------
    onehot = (cats[:, None] == jnp.arange(1, 5)[None, :, None, None]
              ).astype(jnp.float32)                  # [4, 4, ph, pw]
    cnt_e = _ctb_sum(onehot, ctb)                    # [4, 4, ny, nx]
    sum_e = _ctb_sum(onehot * diff[None, None], ctb)
    off_e = _round_div(sum_e, cnt_e)                 # [4, 4, ny, nx]
    # EO sign constraint: cats 1,2 >= 0; cats 3,4 <= 0
    off_e = jnp.stack([jnp.maximum(off_e[:, 0], 0),
                       jnp.maximum(off_e[:, 1], 0),
                       jnp.minimum(off_e[:, 2], 0),
                       jnp.minimum(off_e[:, 3], 0)], axis=1)
    # gains in int32: every term is an exact integer < 2^24 in f32, but
    # the 4-way sums reach ~2^26 — int32 keeps them exact and therefore
    # identical under ANY compiler reassociation (the multi-process
    # byte-identity checks compile under jax.distributed, which may fuse
    # float reductions differently)
    off_ei = off_e.astype(jnp.int32)
    gain_e = (2 * off_ei * sum_e.astype(jnp.int32)
              - off_ei * off_ei * cnt_e.astype(jnp.int32)).sum(axis=1)
    # [4, ny, nx] int32

    # ---- band stats ------------------------------------------------------
    band = jnp.where(valid, recp >> (bit_depth - 5), 32)   # pad -> bin 32
    onehot_b = (band[None] == jnp.arange(32)[:, None, None]
                ).astype(jnp.float32)                # [32, ph, pw]
    cnt_b = _ctb_sum(onehot_b, ctb)                  # [32, ny, nx]
    sum_b = _ctb_sum(onehot_b * diff[None], ctb)
    off_b = _round_div(sum_b, cnt_b)                 # [32, ny, nx]
    gain_b = (2 * off_b * sum_b.astype(jnp.int32)
              - off_b * off_b * cnt_b.astype(jnp.int32))   # int32
    # best run of 4 consecutive bands (positions 0..28)
    run = (gain_b[0:29] + gain_b[1:30] + gain_b[2:31] + gain_b[3:32])
    band_pos = jnp.argmax(run, axis=0).astype(jnp.int32)   # [ny, nx]
    band_gain = jnp.max(run, axis=0)

    if given is None:
        # pick: OFF (gain 0) vs best EO class vs band
        eo_cls = jnp.argmax(gain_e, axis=0).astype(jnp.int32)  # [ny, nx]
        eo_gain = jnp.max(gain_e, axis=0)
        use_band = band_gain > jnp.maximum(eo_gain, 0)
        use_edge = (~use_band) & (eo_gain > 0)
        type_map = jnp.where(use_band, 1, jnp.where(use_edge, 2, 0))
        class_map = jnp.where(use_edge, eo_cls, 0)
    else:
        type_map, class_map = given
        use_band = type_map == 1
        use_edge = type_map == 2

    # gather offsets for the chosen candidate
    cls1h = (class_map[None] == jnp.arange(4)[:, None, None]
             ).astype(jnp.int32)                     # [4, ny, nx]
    eo_sel = (off_e * cls1h[:, None]).sum(axis=0)    # [4, ny, nx]
    pos = band_pos[None] + jnp.arange(4)[:, None, None]    # [4, ny, nx]
    b1h = (pos[None] == jnp.arange(32)[:, None, None, None])
    band_sel = (off_b[:, None] * b1h.astype(jnp.int32)).sum(axis=0)
    offs = jnp.where(use_band[None], band_sel,
                     jnp.where(use_edge[None], eo_sel, 0))  # [4, ny, nx]
    params = jnp.stack([
        type_map.astype(jnp.int32),
        jnp.where(use_edge, class_map, 0).astype(jnp.int32),
        jnp.where(use_band, band_pos, 0),
        offs[0], offs[1], offs[2], offs[3]], axis=-1)       # [ny, nx, 7]
    return params


def _apply_plane(rec: jnp.ndarray, params: jnp.ndarray, ctb: int,
                 bit_depth: int, halo=None) -> jnp.ndarray:
    """Decoder-exact SAO application (twin of spec.sao.apply_sao_plane).
    halo: see _edge_cats — with neighbor columns, a column shard applies
    SAO byte-identically to the full-plane pass."""
    h, w = rec.shape
    recp = _pad_to(rec.astype(jnp.int32), ctb)
    ph, pw = recp.shape
    if halo is not None:
        lcol, rcol, la, ra = halo
        halo = (jnp.pad(lcol.astype(jnp.int32), (0, ph - h)),
                jnp.pad(rcol.astype(jnp.int32), (0, ph - h)), la, ra)
    cats = _edge_cats(recp, halo=halo)               # [4, ph, pw]
    # but boundary rule uses the CODED picture bounds, not padded bounds:
    # recompute validity against (h, w)
    valid = ((jnp.arange(ph) < h)[:, None]
             & (jnp.arange(pw) < w)[None, :])
    # cat maps computed on padded plane equal the coded-plane maps inside
    # (h, w) except at the pad seam; mask the seam columns/rows per class
    la = ra = None
    if halo is not None:
        la, ra = halo[2], halo[3]
    outs = []
    for ci, (y0, x0, y1, x1) in enumerate(EO_NEIGHBORS):
        ty, by = max(0, -y0, -y1), max(0, y0, y1)
        lx, rx = max(0, -x0, -x1), max(0, x0, x1)
        ys = jnp.arange(ph)
        xs = jnp.arange(pw)
        in_xl = xs >= lx
        if lx > 0 and la is not None:
            in_xl = in_xl | ((xs == 0) & la)
        in_xr = xs < w - rx
        if rx > 0 and ra is not None:
            in_xr = in_xr | ((xs == w - 1) & ra)
        inside = ((ys >= ty) & (ys < h - by))[:, None] & \
                 (in_xl & in_xr)[None, :]
        outs.append(jnp.where(inside, cats[ci], 0))
    cats = jnp.stack(outs)

    def up(a):
        return jnp.repeat(jnp.repeat(a, ctb, axis=0), ctb, axis=1)

    type_m = up(params[..., 0])
    class_m = up(params[..., 1])
    band_pos = up(params[..., 2])
    offs = [up(params[..., 3 + i]) for i in range(4)]

    add = jnp.zeros((ph, pw), jnp.int32)
    # edge offsets: category c gets off[c-1] where type==2 & class matches
    sel_cat = jnp.zeros((ph, pw), jnp.int32)
    for ci in range(4):
        sel_cat = jnp.where(class_m == ci, cats[ci], sel_cat)
    for c in range(1, 5):
        add = add + jnp.where((type_m == 2) & (sel_cat == c),
                              offs[c - 1], 0)
    # band offsets
    band = recp >> (bit_depth - 5)
    for i in range(4):
        add = add + jnp.where((type_m == 1)
                              & (band == (band_pos + i) % 32), offs[i], 0)
    out = jnp.clip(recp + add, 0, (1 << bit_depth) - 1)
    return out[:h, :w]


@partial(jax.jit, static_argnames=("log2_ctu", "bit_depth", "has_halo"))
def sao_device(src_y, src_cb, src_cr, rec_y, rec_cb, rec_cr,
               log2_ctu: int, bit_depth: int = 8, has_halo: bool = False,
               halo_y=None, halo_cb=None, halo_cr=None,
               l_avail=None, r_avail=None):
    """SAO estimate + apply for one picture on device.

    src_*: source planes; rec_*: deblocked recon planes (coded dims).
    Returns (out_y, out_cb, out_cr, params) with params int32
    [ny, nx, 3, 7] = per CTB per component (y, cb, cr):
    (type 0/1/2 = off/band/edge, eo_class, band_pos, off0..3).

    has_halo + halo_* = ((lcol, rcol) per plane) + l/r_avail traced
    booleans: the cross-tile SAO classification halo (SURVEY.md §2.4
    P6) — 1-px deblocked columns from the neighboring tile shards, so a
    column-sharded SAO is byte-identical to this full-plane pass.
    """
    ctb = 1 << log2_ctu

    def h(cols):
        if not has_halo:
            return None
        return (cols[0], cols[1], l_avail, r_avail)

    hy = h(halo_y) if has_halo else None
    hcb = h(halo_cb) if has_halo else None
    hcr = h(halo_cr) if has_halo else None
    p_y = _estimate_plane(src_y, rec_y, ctb, bit_depth, halo=hy)
    p_cb = _estimate_plane(src_cb, rec_cb, ctb // 2, bit_depth, halo=hcb)
    # Cr inherits Cb's type/eo_class (spec: one type for both chroma)
    p_cr = _estimate_plane(src_cr, rec_cr, ctb // 2, bit_depth,
                           given=(p_cb[..., 0], p_cb[..., 1]), halo=hcr)
    # Cr band_pos is free; Cb/Cr each signal their own band position
    out_y = _apply_plane(rec_y, p_y, ctb, bit_depth, halo=hy)
    out_cb = _apply_plane(rec_cb, p_cb, ctb // 2, bit_depth, halo=hcb)
    out_cr = _apply_plane(rec_cr, p_cr, ctb // 2, bit_depth, halo=hcr)
    params = jnp.stack([p_y, p_cb, p_cr], axis=-2)   # [ny, nx, 3, 7]
    return out_y, out_cb, out_cr, params
