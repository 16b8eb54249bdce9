"""C++ CABAC engine must be bit-identical to the Python oracle coder."""

import numpy as np
import pytest

from fasthevc_tpu.spec import bitstream as bs
from fasthevc_tpu.spec import cabac, residual
from fasthevc_tpu.spec.tables import CTX_INIT, SCAN_DIAG, SCAN_HOR, SCAN_VER

cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")

if not cpp.available():
    pytest.skip("C++ toolchain unavailable", allow_module_level=True)


def _streams(run):
    """Run `run(coder)` against both engines; return both byte strings."""
    outs = []
    for engine in ("py", "cpp"):
        w = bs.BitWriter()
        ctx = cabac.ContextSet(0, 32)
        if engine == "py":
            coder = cabac.CabacEncoder(w, ctx)
        else:
            coder = cpp.CppCabacEncoder(w, ctx)
        run(coder)
        coder.encode_terminate(1)
        coder.finish()
        w.byte_align()
        outs.append(w.get_bytes())
    return outs


def test_bin_stream_identical():
    rng = np.random.default_rng(0)
    names = list(CTX_INIT.keys())
    ops = []
    for _ in range(3000):
        k = rng.integers(0, 4)
        if k == 0:
            name = names[rng.integers(0, len(names))]
            ops.append(("bin", name, int(rng.integers(0, len(CTX_INIT[name][0]))),
                        int(rng.integers(0, 2))))
        elif k == 1:
            ops.append(("byp", int(rng.integers(0, 2))))
        elif k == 2:
            ops.append(("bits", int(rng.integers(0, 1 << 12)), 12))
        else:
            ops.append(("trm",))

    def run(c):
        for op in ops:
            if op[0] == "bin":
                c.encode_bin(op[1], op[2], op[3])
            elif op[0] == "byp":
                c.encode_bypass(op[1])
            elif op[0] == "bits":
                c.encode_bypass_bits(op[1], op[2])
            else:
                c.encode_terminate(0)

    py, cc = _streams(run)
    assert py == cc


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan", [SCAN_DIAG, SCAN_HOR, SCAN_VER])
def test_residual_stream_identical(log2, scan):
    if scan != SCAN_DIAG and log2 > 3:
        pytest.skip("hor/ver scans only occur for 4x4/8x8")
    rng = np.random.default_rng(log2 * 7 + scan)
    n = 1 << log2
    blocks = []
    for _ in range(25):
        density = rng.random() * 0.5
        lv = (rng.random((n, n)) < density) * rng.integers(-99, 100, (n, n))
        lv = lv.astype(np.int32)
        if not lv.any():
            lv[rng.integers(0, n), rng.integers(0, n)] = 1
        blocks.append(lv)
    blocks.append(np.eye(n, dtype=np.int32) * 30000)  # rice escape stress

    def run(c):
        for c_idx in (0, 1):
            for lv in blocks:
                residual.encode_residual(c, lv, log2, c_idx, scan)

    py, cc = _streams(run)
    assert py == cc


def test_residual_python_explicit_vs_cpp():
    # Force the Python slow path on a Python coder and compare to the C++
    # native path with interleaved tree-level bins.
    rng = np.random.default_rng(42)
    lvs = [(rng.random((8, 8)) < 0.3) * rng.integers(-5, 6, (8, 8))
           for _ in range(10)]
    lvs = [lv.astype(np.int32) if lv.any() else np.eye(8, dtype=np.int32)
           for lv in lvs]

    def run(c):
        for i, lv in enumerate(lvs):
            c.encode_bin("split_cu_flag", i % 3, i & 1)
            residual.encode_residual(c, lv, 3, 0, SCAN_DIAG)
            c.encode_bypass_bits(i, 5)

    py, cc = _streams(run)
    assert py == cc


def test_cpp_decodes_with_python_decoder():
    rng = np.random.default_rng(9)
    lv = ((rng.random((16, 16)) < 0.2) * rng.integers(-40, 41, (16, 16)))
    lv = lv.astype(np.int32)
    lv[0, 0] = 7
    w = bs.BitWriter()
    enc = cpp.CppCabacEncoder(w, cabac.ContextSet(0, 32))
    residual.encode_residual(enc, lv, 4, 0, SCAN_DIAG)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    dec = cabac.CabacDecoder(bs.BitReader(w.get_bytes() + b"\x00\x00"),
                             cabac.ContextSet(0, 32))
    out = residual.decode_residual(dec, 4, 0, SCAN_DIAG)
    np.testing.assert_array_equal(out, lv)
    assert dec.decode_terminate() == 1
