"""TPU ops vs spec oracle: bit-exact where normative, calibrated for proxies."""

import numpy as np
import pytest

from fasthevc_tpu.spec import intra as spec_intra
from fasthevc_tpu.spec import transform as spec_tr
from fasthevc_tpu.spec.encoder import satd as spec_satd


@pytest.fixture(scope="module")
def jnp_mods():
    import jax.numpy as jnp
    from fasthevc_tpu.ops import cost as ops_cost
    from fasthevc_tpu.ops import intra as ops_intra
    from fasthevc_tpu.ops import transform as ops_tr
    return jnp, ops_tr, ops_intra, ops_cost


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_fwd_inv_transform_bit_exact(jnp_mods, log2):
    jnp, ops_tr, _, _ = jnp_mods
    rng = np.random.default_rng(log2)
    n = 1 << log2
    res = rng.integers(-255, 256, (16, n, n)).astype(np.int32)
    got_f = np.asarray(ops_tr.fwd_transform(res, log2))
    got_i = np.asarray(ops_tr.inv_transform(got_f, log2))
    for b in range(16):
        np.testing.assert_array_equal(
            got_f[b], spec_tr.forward_transform(res[b]))
        np.testing.assert_array_equal(
            got_i[b], spec_tr.inverse_transform(got_f[b]))


def test_dst_bit_exact(jnp_mods):
    jnp, ops_tr, _, _ = jnp_mods
    rng = np.random.default_rng(7)
    res = rng.integers(-255, 256, (8, 4, 4)).astype(np.int32)
    got = np.asarray(ops_tr.fwd_transform(res, 2, use_dst=True))
    for b in range(8):
        np.testing.assert_array_equal(
            got[b], spec_tr.forward_transform(res[b], use_dst=True))
    inv = np.asarray(ops_tr.inv_transform(got, 2, use_dst=True))
    for b in range(8):
        np.testing.assert_array_equal(
            inv[b], spec_tr.inverse_transform(got[b], use_dst=True))


@pytest.mark.parametrize("qp", [0, 17, 32, 51])
@pytest.mark.parametrize("log2", [2, 4])
def test_quant_dequant_bit_exact(jnp_mods, qp, log2):
    jnp, ops_tr, _, _ = jnp_mods
    rng = np.random.default_rng(qp + log2)
    n = 1 << log2
    coeffs = rng.integers(-30000, 30001, (8, n, n)).astype(np.int32)
    got_q = np.asarray(ops_tr.quantize(coeffs, qp, log2))
    got_d = np.asarray(ops_tr.dequantize(got_q, qp, log2))
    for b in range(8):
        np.testing.assert_array_equal(got_q[b],
                                      spec_tr.quantize(coeffs[b], qp))
        np.testing.assert_array_equal(got_d[b],
                                      spec_tr.dequantize(got_q[b], qp))


def test_quant_per_block_qp(jnp_mods):
    jnp, ops_tr, _, _ = jnp_mods
    rng = np.random.default_rng(3)
    coeffs = rng.integers(-1000, 1001, (4, 8, 8)).astype(np.int32)
    qps = np.array([10, 22, 32, 45], np.int32)
    got = np.asarray(ops_tr.quantize(coeffs, qps, 3))
    for b, qp in enumerate(qps):
        np.testing.assert_array_equal(got[b],
                                      spec_tr.quantize(coeffs[b], int(qp)))


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("is_luma", [True, False])
def test_predict_all_modes_bit_exact(jnp_mods, log2, is_luma):
    jnp, _, ops_intra, _ = jnp_mods
    rng = np.random.default_rng(log2 * 2 + is_luma)
    n = 1 << log2
    B = 5
    top = rng.integers(0, 256, (B, 2 * n + 1)).astype(np.int32)
    left = rng.integers(0, 256, (B, 2 * n + 1)).astype(np.int32)
    left[:, 0] = top[:, 0]  # shared corner
    got = np.asarray(ops_intra.predict_all_modes(top, left, log2, is_luma))
    assert got.shape == (B, 35, n, n)
    for b in range(B):
        for mode in range(35):
            t, l = top[b], left[b]
            if is_luma and spec_intra.should_filter(mode, n, True):
                t, l = spec_intra.filter_reference_samples(t, l)
            expect = spec_intra.predict(mode, t, l, n, is_luma)
            np.testing.assert_array_equal(
                got[b, mode], expect,
                err_msg=f"mode {mode} size {n} luma={is_luma}")


def test_satd_matches_oracle(jnp_mods):
    jnp, _, _, ops_cost = jnp_mods
    rng = np.random.default_rng(11)
    for n in (4, 8, 16, 32):
        res = rng.integers(-200, 201, (3, n, n)).astype(np.int32)
        got = np.asarray(ops_cost.satd(res))
        for b in range(3):
            assert got[b] == spec_satd(res[b])


def test_grid_refs_layout(jnp_mods):
    jnp, _, ops_intra, _ = jnp_mods
    h, w, n = 16, 24, 8
    plane = np.arange(h * w, dtype=np.int32).reshape(h, w)
    top, left = ops_intra.grid_refs(plane, n)
    top, left = np.asarray(top), np.asarray(left)
    assert top.shape == (6, 2 * n + 1)
    # block (1,1) (second row, second col): corner = plane[7, 7]
    bi = 1 * 3 + 1
    assert top[bi, 0] == plane[7, 7]
    np.testing.assert_array_equal(top[bi, 1:n + 1], plane[7, 8:16])
    np.testing.assert_array_equal(left[bi, 1:n + 1], plane[8:16, 7])
    # block (0,0): top row replicates the frame edge
    assert top[0, 0] == plane[0, 0]
