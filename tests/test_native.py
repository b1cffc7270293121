import numpy as np
import pytest

from contrastyou_tpu import native


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fast_collate_matches_numpy():
    rng = np.random.default_rng(0)
    n, in_h, in_w, out = 6, 64, 64, 32
    images = [rng.integers(0, 256, (in_h, in_w), dtype=np.uint8)
              for _ in range(n)]
    labels = [rng.integers(0, 4, (in_h, in_w), dtype=np.uint8)
              for _ in range(n)]
    ys = rng.integers(0, in_h - out + 1, n)
    xs = rng.integers(0, in_w - out + 1, n)
    out_img, out_lab = native.fast_collate_crop(images, labels, ys, xs, out,
                                                out, num_threads=3)
    for i in range(n):
        ref_img = images[i][ys[i]:ys[i] + out,
                            xs[i]:xs[i] + out].astype(np.float32) / 255.0
        ref_lab = labels[i][ys[i]:ys[i] + out, xs[i]:xs[i] + out]
        np.testing.assert_allclose(out_img[i], ref_img, atol=1e-6)
        np.testing.assert_array_equal(out_lab[i], ref_lab)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fast_collate_images_only():
    rng = np.random.default_rng(1)
    images = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(3)]
    out_img, out_lab = native.fast_collate_crop(
        images, None, np.zeros(3, int), np.zeros(3, int), 16, 16)
    assert out_lab is None
    assert out_img.shape == (3, 16, 16)
