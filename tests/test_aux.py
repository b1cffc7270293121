import jax.numpy as jnp
import math
import numpy as np
import pytest

from contrastyou_tpu.augment import SobelProcess
from contrastyou_tpu.losses.kl import entropy_prior
from contrastyou_tpu.trainers.savers import InferenceSaver
from contrastyou_tpu.utils.colors import label2colored_image, overlay_segmentation


def test_entropy_prior_uniform_zero_kl():
    probs = jnp.full((4, 8), 1 / 8)
    assert float(entropy_prior(probs)) == pytest.approx(math.log(8), abs=1e-4)


def test_sobel_process():
    rng = np.random.default_rng(0)
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 1.0
    out, lab = SobelProcess()(img, None, rng)
    assert out.max() == pytest.approx(1.0)
    assert out[:, 14:18].sum() > out[:, :8].sum()  # edge responds at boundary


def test_label_colors():
    lab = np.array([[0, 1], [2, 3]])
    rgb = label2colored_image(lab)
    assert rgb.shape == (2, 2, 3)
    assert (rgb[0, 0] == 0).all()
    assert not (rgb[0, 1] == rgb[1, 0]).all()
    over = overlay_segmentation(np.ones((2, 2)) * 0.5, lab)
    assert over.shape == (2, 2, 3)


def test_inference_saver(tmp_path):
    saver = InferenceSaver(str(tmp_path))
    image = np.random.rand(2, 16, 16, 1).astype(np.float32)
    target = np.random.randint(0, 4, (2, 16, 16))
    pred = np.random.randint(0, 4, (2, 16, 16))
    saver.save_batch(image=image, target=target, pred=pred,
                     filenames=["a", "b"], mask=np.array([True, False]))
    assert (tmp_path / "predictions" / "pred" / "a.png").exists()
    assert not (tmp_path / "predictions" / "pred" / "b.png").exists()
    assert (tmp_path / "predictions" / "overlay" / "a.png").exists()
