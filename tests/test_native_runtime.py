"""Native C++ runtime tests: PNG decode parity with cv2 + prefetch pipeline
ordering."""

import numpy as np
import pytest

from boslam_tpu.runtime import NativeLoader, available, decode_frame

cv2 = pytest.importorskip("cv2")

W, H = 128, 96


@pytest.fixture(scope="module")
def png_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    rgbs, deps = [], []
    for i in range(6):
        rgb = rng.integers(0, 256, (H, W, 3), np.uint8)
        dep = rng.integers(0, 30000, (H, W)).astype(np.uint16)
        rp = str(d / f"rgb{i}.png")
        dp = str(d / f"d{i}.png")
        cv2.imwrite(rp, rgb[:, :, ::-1])  # cv2 writes BGR
        cv2.imwrite(dp, dep)
        rgbs.append(rp)
        deps.append(dp)
    return rgbs, deps


def test_native_available():
    assert available(), "native runtime failed to build"


def test_decode_matches_cv2(png_pair):
    rgbs, deps = png_pair
    out = decode_frame(rgbs[0], deps[0], W, H)
    assert out is not None
    gray, depth = out
    rgb = cv2.imread(rgbs[0], cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32)
    ref_gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    d16 = cv2.imread(deps[0], cv2.IMREAD_UNCHANGED)
    ref_depth = d16.astype(np.float32) / 5000.0
    np.testing.assert_allclose(gray, ref_gray, atol=0.51)
    np.testing.assert_allclose(depth, ref_depth, atol=1e-6)


def test_prefetch_pipeline_order(png_pair):
    rgbs, deps = png_pair
    loader = NativeLoader(rgbs, deps, W, H, n_threads=3, capacity=3)
    frames = list(loader)
    loader.close()
    assert len(frames) == 6
    for i, (gray, depth) in enumerate(frames):
        out = decode_frame(rgbs[i], deps[i], W, H)
        np.testing.assert_allclose(gray, out[0], atol=1e-6)
        np.testing.assert_allclose(depth, out[1], atol=1e-6)


def test_decode_rejects_wrong_size(png_pair):
    rgbs, deps = png_pair
    assert decode_frame(rgbs[0], deps[0], W + 2, H) is None
