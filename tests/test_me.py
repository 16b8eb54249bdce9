"""Motion estimation v2: hierarchical integer search honoring SearchRange
and exact-spec sub-pel refinement (SURVEY.md E7 hot loop #2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasthevc_tpu.ops.me import (hier_int_search, search_inter_costs,
                                 subpel_refine)
from fasthevc_tpu.spec.mc import mc_luma


def _smooth_noscipy(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.normal(128, 40, (h // 16 + 3, w // 16 + 3))
    up = np.kron(base, np.ones((16, 16)))[:h, :w]
    return np.clip(up, 0, 255).astype(np.int32)


def test_hier_search_finds_large_translation():
    """A global (sx, sy) = (20, -12) shift is beyond the old clamped range
    of 8; SearchRange 32 must recover it (no silent clamping)."""
    h, w = 128, 192
    sx, sy = 20, -12
    src = _smooth_noscipy(h + 64, w + 64, 3)
    ref_full = src
    cur = np.roll(src, (sy, sx), axis=(0, 1))  # cur[y,x]=src[y-sy,x-sx]
    cur = cur[32:32 + h, 32:32 + w]
    ref = ref_full[32:32 + h, 32:32 + w]
    # cur[o] == ref[o - s] -> mv = -s? cur[y,x] = src[y-sy+32, x-sx+32]
    # = ref[y-sy, x-sx] -> best mv = (-sx, -sy)
    mvs = hier_int_search(jnp.asarray(cur), jnp.asarray(ref), 5, 3, 32)
    for n in (16, 32):
        mv = np.asarray(mvs[n]).reshape(h // n, w // n, 2)
        # interior blocks (away from the rolled wrap/edges)
        inner = mv[1:-1, 2:-2]
        assert (inner[..., 0] == -sx).mean() > 0.9, n
        assert (inner[..., 1] == -sy).mean() > 0.9, n


def test_subpel_pred_matches_spec_mc():
    """The winning sub-pel prediction must equal spec mc_luma for the
    winning MV (same 8-tap two-stage arithmetic)."""
    rng = np.random.default_rng(7)
    h, w, n = 64, 64, 8
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    mv_int = jnp.asarray(rng.integers(-2, 3, (h // n * w // n, 2)),
                         jnp.int32)
    _, mvq, pred = subpel_refine(jnp.asarray(cur), jnp.asarray(ref),
                                 mv_int, n, jnp.float32(1.0))
    mvq = np.asarray(mvq)
    pred = np.asarray(pred)
    gx = w // n
    for b in (0, 5, gx + 3, 3 * gx + 1):
        oy, ox = (b // gx) * n, (b % gx) * n
        want = mc_luma(ref, ox, oy, n, n, int(mvq[b, 0]), int(mvq[b, 1]))
        np.testing.assert_array_equal(pred[b], want, err_msg=f"block {b}")


def test_subpel_beats_integer_on_subpel_motion():
    """Content with true half-pel motion: sub-pel refinement must lower
    the SATD cost for most blocks vs the integer-only MV."""
    h, w, n = 64, 96, 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ref = (128 + 60 * np.sin(xx / 5.1) * np.cos(yy / 7.3)).astype(np.int32)
    xs = xx + 0.5  # half-pel pan
    cur = (128 + 60 * np.sin(xs / 5.1) * np.cos(yy / 7.3)).astype(np.int32)
    zero = jnp.zeros((h // n * w // n, 2), jnp.int32)
    _, mvq, _ = subpel_refine(jnp.asarray(cur), jnp.asarray(ref), zero, n,
                              jnp.float32(0.0))
    mvq = np.asarray(mvq)
    frac = (mvq % 4 != 0).any(axis=1)
    assert frac.mean() > 0.6  # most blocks pick a fractional MV


def test_search_inter_costs_interface():
    cur = jnp.asarray(_smooth_noscipy(64, 64, 1))
    ref = jnp.asarray(_smooth_noscipy(64, 64, 2))
    out = search_inter_costs(cur, ref, jnp.float32(4.0), 5, 3, 64)
    for n in (8, 16, 32):
        cost, mv, pred = out[n]
        b = (64 // n) ** 2
        assert cost.shape == (b,)
        assert mv.shape == (b, 2)
        assert pred.shape == (b, n, n)
