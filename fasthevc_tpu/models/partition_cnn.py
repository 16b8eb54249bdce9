"""Partition-map CNN: CTU pixels -> per-8x8-granule CU depth logits.

Reference parity: the FastHEVC fast CU-partition decision model
(SURVEY.md E8, §3.4). Shape follows the partition-map papers
(PAPERS.md: arXiv 2504.18398 / 2312.10567): one inference per CTU predicts
the whole partition map, replacing the recursive split search.

Self-distillation: training targets are this framework's own full-RDO
search decisions (SURVEY.md §7.1 step 10) — generated on synthetic clips.
"""

from __future__ import annotations

import pickle
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PartitionCNN(nn.Module):
    """Input [B, S, S, 1] luma CTU (normalized) + scalar qp; output
    [B, S/8, S/8, n_depths] depth logits (n_depths = log2_ctu - 2)."""

    n_depths: int = 3  # CTB 32: depths 0..2

    @nn.compact
    def __call__(self, x, qp):
        # x: [B, S, S, 1] float; qp: [B] float
        b, s = x.shape[0], x.shape[1]
        h = nn.Conv(16, (3, 3), strides=(2, 2))(x)     # S/2
        h = nn.relu(h)
        h = nn.Conv(32, (3, 3), strides=(2, 2))(h)     # S/4
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), strides=(2, 2))(h)     # S/8 (granule grid)
        h = nn.relu(h)
        qp_map = jnp.broadcast_to(qp[:, None, None, None] / 51.0,
                                  h.shape[:3] + (1,))
        h = jnp.concatenate([h, qp_map], axis=-1)
        h = nn.Conv(64, (3, 3))(h)
        h = nn.relu(h)
        return nn.Conv(self.n_depths, (1, 1))(h)


def _ctu_batch(y_plane: np.ndarray, ctu: int) -> np.ndarray:
    """[H, W] -> [n_ctus, ctu, ctu, 1] float32, CTU raster order."""
    h, w = y_plane.shape
    gy, gx = h // ctu, w // ctu
    t = (y_plane.reshape(gy, ctu, gx, ctu).transpose(0, 2, 1, 3)
         .reshape(-1, ctu, ctu, 1))
    return (t.astype(np.float32) - 128.0) / 128.0


@partial(jax.jit, static_argnames=("log2_ctu",))
def _apply(params, ctus, qps, log2_ctu: int):
    model = PartitionCNN(n_depths=log2_ctu - 2)
    return model.apply(params, ctus, qps)


def predict_depth_maps(params, y_plane: np.ndarray, qp: int,
                       log2_ctu: int = 5) -> np.ndarray:
    """Predict the per-8x8-granule depth map for a padded luma plane.

    Returns int8 [H/8, W/8] (same layout as codec.search.decisions_to_maps
    output), assembled from per-CTU predictions.
    """
    ctu = 1 << log2_ctu
    h, w = y_plane.shape
    gy, gx = h // ctu, w // ctu
    ctus = jnp.asarray(_ctu_batch(y_plane, ctu))
    qps = jnp.full((ctus.shape[0],), float(qp), jnp.float32)
    logits = _apply(params, ctus, qps, log2_ctu)
    depth = np.asarray(jnp.argmax(logits, axis=-1), dtype=np.int8)
    # [n_ctus, g, g] -> [H/8, W/8]
    g = ctu // 8
    depth = depth.reshape(gy, gx, g, g).transpose(0, 2, 1, 3)
    return depth.reshape(gy * g, gx * g)


def predict_depth_maps_device(params, y_plane, qp, log2_ctu: int = 5):
    """Device-side predict_depth_maps: y_plane is an int32 jnp array
    (padded luma), returns int16 [H/8, W/8] depth map on device. Traced
    inside the search jit (codec.search.search_*_maps) so fast-partition
    inference is fused into the search dispatch (SURVEY.md E8 north star:
    on-TPU inference fused into the search)."""
    ctu = 1 << log2_ctu
    h, w = y_plane.shape
    gy, gx = h // ctu, w // ctu
    ctus = (y_plane.reshape(gy, ctu, gx, ctu).transpose(0, 2, 1, 3)
            .reshape(-1, ctu, ctu, 1).astype(jnp.float32) - 128.0) / 128.0
    qps = jnp.broadcast_to(jnp.asarray(qp, jnp.float32), (ctus.shape[0],))
    model = PartitionCNN(n_depths=log2_ctu - 2)
    logits = model.apply(params, ctus, qps)
    depth = jnp.argmax(logits, axis=-1).astype(jnp.int16)
    g = ctu // 8
    return (depth.reshape(gy, gx, g, g).transpose(0, 2, 1, 3)
            .reshape(gy * g, gx * g))


def init_params(key, log2_ctu: int = 5):
    ctu = 1 << log2_ctu
    model = PartitionCNN(n_depths=log2_ctu - 2)
    return model.init(key, jnp.zeros((1, ctu, ctu, 1), jnp.float32),
                      jnp.zeros((1,), jnp.float32))


def train_self_distilled(clips=None, qps=(27, 32, 37), log2_ctu: int = 5,
                         steps: int = 300, seed: int = 0,
                         log=print):
    """Self-distillation: full-RDO search decisions -> CNN targets.

    clips: list of (y, cb, cr) frames; synthesized when None. Returns
    trained params. CPU-feasible at the default scale; scales up on TPU.
    """
    import optax

    from ..codec.search import decisions_to_maps, search_intra_frame
    from ..utils.video import synthesize_yuv

    ctu = 1 << log2_ctu
    if clips is None:
        clips = synthesize_yuv(8 * ctu, 4 * ctu, 8, seed=seed)

    # ---- generate targets with the full search -----------------------
    xs, ts, qs = [], [], []
    for qp in qps:
        lam = float(np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0)))
        for y, _, _ in clips:
            h, w = y.shape
            h, w = (h // ctu) * ctu, (w // ctu) * ctu
            yp = y[:h, :w].astype(np.int32)
            dec = search_intra_frame(jnp.asarray(yp), jnp.float32(lam),
                                     log2_ctu, 3)
            dec = jax.device_get(dec)
            depth, _, _, _ = decisions_to_maps(dec, w, h, w, h, log2_ctu, 3)
            xs.append(_ctu_batch(yp, ctu))
            g = ctu // 8
            t = (depth.reshape(h // ctu, g, w // ctu, g)
                 .transpose(0, 2, 1, 3).reshape(-1, g, g))
            ts.append(t)
            qs.append(np.full(t.shape[0], float(qp), np.float32))
    x = np.concatenate(xs)
    t = np.concatenate(ts).astype(np.int32)
    q = np.concatenate(qs)
    log(f"partition-cnn: {x.shape[0]} CTU samples, "
        f"depth histogram {np.bincount(t.ravel(), minlength=3).tolist()}")

    # ---- train --------------------------------------------------------
    key = jax.random.PRNGKey(seed)
    params = init_params(key, log2_ctu)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    model = PartitionCNN(n_depths=log2_ctu - 2)

    @jax.jit
    def step(params, opt_state, xb, qb, tb):
        def loss_fn(p):
            logits = model.apply(p, xb, qb)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, tb).mean()
            return loss, logits
        (loss, logits), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, -1) == tb).mean()
        return params, opt_state, loss, acc

    rng = np.random.default_rng(seed)
    bsz = min(64, x.shape[0])
    for i in range(steps):
        idx = rng.integers(0, x.shape[0], bsz)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(x[idx]), jnp.asarray(q[idx]),
            jnp.asarray(t[idx]))
        if (i + 1) % 100 == 0:
            log(f"  step {i+1}: loss {float(loss):.4f} acc {float(acc):.3f}")
    return params


def save_params(params, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(params), f)


def load_params(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
