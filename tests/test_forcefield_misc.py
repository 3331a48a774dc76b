"""Force-field task, warp/SSIM, quaternions, AverageMeter."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from m3l_tpu.models.vit import VisionTransformer
from m3l_tpu.tasks import ForceFieldDecoder, ForceFieldModule, photometric_loss, ssim, warp
from m3l_tpu.train import Trainer
from m3l_tpu.utils import AverageMeter, axis_angle_to_quaternion, quaternion_apply, quaternion_to_axis_angle


def tiny_vit():
    return VisionTransformer(
        img_size=(32, 32), patch_size=8, in_chans=6, embed_dim=32, depth=4, num_heads=2,
        pos_embed_fn="sinusoidal", num_register_tokens=0, rngs=nnx.Rngs(0),
    )


def test_forcefield_decoder_shapes():
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    x = jnp.ones((2, 32, 32, 6))
    field = dec(x)
    assert field.shape == (2, 32, 32, 3)
    f = np.asarray(field)
    assert (f[..., 0] >= 0).all() and (f[..., 0] <= 1).all()  # normal in [0,1]
    assert (np.abs(f[..., 1:]) <= 1).all()  # shear in [-1,1]


def test_forcefield_ssl_training():
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    mod = ForceFieldModule(dec, train_encoder=False)
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((2, 32, 32, 6), dtype=np.float32)} for _ in range(2)]
    hist = Trainer(max_epochs=1, verbose=0).fit(mod, batches)
    assert np.isfinite(hist[-1]["train_loss"])
    # frozen encoder check
    enc = nnx.to_pure_dict(nnx.state(dec.encoder, nnx.Param))
    fresh = nnx.to_pure_dict(nnx.state(tiny_vit(), nnx.Param))
    same = [np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(jax.tree.leaves(enc), jax.tree.leaves(fresh))]
    assert all(same), "frozen encoder moved"


def test_forcefield_supervised():
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    mod = ForceFieldModule(dec)
    rng = np.random.default_rng(0)
    batch = {"image": rng.random((2, 32, 32, 6), dtype=np.float32),
             "forcefield": rng.random((2, 32, 32, 3), dtype=np.float32)}
    loss, aux = mod.training_loss(jax.device_put(batch), jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(loss))


def test_warp_identity_and_shift():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    out = warp(img, jnp.zeros((1, 8, 8, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    # shift by exactly 1 px in x
    flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(1.0)
    out = warp(img, flow)
    np.testing.assert_allclose(np.asarray(out[0, :, :-1]), np.asarray(img[0, :, 1:]), atol=1e-6)


def test_ssim_zero_for_identical():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    assert float(ssim(a, a).mean()) < 1e-4
    b = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    assert float(photometric_loss(a, b)) > float(photometric_loss(a, a))


def test_quaternions_roundtrip():
    rng = np.random.default_rng(0)
    aa = rng.normal(size=(5, 3)) * 0.5
    q = axis_angle_to_quaternion(aa)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, rtol=1e-5)
    aa2 = quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)
    # rotation of z-axis by 90deg about x maps z->-y (right-hand rule: z->(0,-1,0)? check: Rx(90): y->z, z->-y)
    q90 = axis_angle_to_quaternion(jnp.asarray([[np.pi / 2, 0, 0]]))
    v = quaternion_apply(q90, jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(v), [[0.0, -1.0, 0.0]], atol=1e-6)


def test_axis_angle_to_quaternion_grad_finite_at_zero():
    import jax

    g = jax.grad(lambda aa: axis_angle_to_quaternion(aa).sum())(jnp.zeros((2, 3)))
    assert bool(jnp.isfinite(g).all()), g


def test_average_meter():
    m = AverageMeter("loss")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2
