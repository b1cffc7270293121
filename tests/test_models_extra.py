import jax
import jax.numpy as jnp

from contrastyou_tpu.models import ResUNet, UNet2, get_arch


def test_unet2_forward():
    model = UNet2(input_dim=1, num_classes=4, dim=16)
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, taps = model.apply(variables, x)
    assert logits.shape == (2, 32, 32, 4)
    assert logits.dtype == jnp.float32


def test_unet2_time_embedding():
    model = UNet2(input_dim=1, num_classes=4, dim=16, with_time_emb=True)
    x = jnp.ones((2, 32, 32, 1))
    t = jnp.array([0.0, 5.0])
    variables = model.init(jax.random.PRNGKey(0), x, time=t)
    logits, _ = model.apply(variables, x, time=t)
    assert logits.shape == (2, 32, 32, 4)


def test_resunet_protocol():
    model = ResUNet(input_dim=1, num_classes=4, max_channel=128,
                    dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert set(variables["params"].keys()) == set(ResUNet.arch_elements)
    logits, taps = model.apply(variables, x, taps=("Conv5",), train=False)
    assert logits.shape == (2, 32, 32, 4)
    assert taps["Conv5"].shape == (2, 2, 2, 128)
    e5, _ = model.apply(variables, x, until="Conv5", train=False)
    assert e5.shape == (2, 2, 2, 128)


def test_arch_zoo_extended():
    assert isinstance(get_arch("unet2", input_dim=1, num_classes=4), UNet2)
    assert isinstance(get_arch("resunet", input_dim=1, num_classes=4,
                               max_channel=128), ResUNet)
