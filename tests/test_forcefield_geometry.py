"""Geometry-aware forcefield stack: intrinsics, reprojection, pose, SSL step
(reference utils_forcefield/ssl_utils.py:17-354, pose_estimator/,
forcefield_sl.py:95-412)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from m3l_tpu.models.vit import VisionTransformer
from m3l_tpu.tasks import (
    ForceFieldDecoder,
    GeometricForceFieldModule,
    PoseEstimator,
    backproject_depth,
    compute_sl_force,
    digit_intrinsics,
    disp_to_depth,
    grid_sample,
    plot_quiver,
    plot_quiver_img,
    project_3d,
    rot_from_axisangle,
    transformation_from_parameters,
)
from m3l_tpu.train import Trainer


def tiny_vit():
    return VisionTransformer(
        img_size=(32, 32), patch_size=8, in_chans=6, embed_dim=32, depth=4, num_heads=2,
        pos_embed_fn="sinusoidal", num_register_tokens=0, rngs=nnx.Rngs(0),
    )


def test_digit_intrinsics_inverse():
    k, inv_k = digit_intrinsics(224, 224)
    np.testing.assert_allclose(np.asarray(k @ inv_k), np.eye(4), atol=1e-4)
    # fx = H/2 / tan(30 deg)
    assert abs(float(k[0, 0]) - 224 * 0.5 / np.tan(np.deg2rad(30))) < 1e-3


def test_disp_to_depth_bounds():
    disp = jnp.asarray([0.0, 0.5, 1.0])
    _, depth = disp_to_depth(disp, 0.1, 100.0)
    d = np.asarray(depth)
    assert abs(d[0] - 100.0) < 1e-4 and abs(d[-1] - 0.1) < 1e-4
    assert d[0] > d[1] > d[2]


def test_backproject_project_identity():
    """With identity pose, project(backproject(depth)) returns the original
    pixel grid for ANY depth (the reprojection round-trip)."""
    h = w = 16
    k, inv_k = digit_intrinsics(h, w)
    rng = np.random.default_rng(0)
    depth = jnp.asarray(1.0 + rng.random((2, h, w), np.float32) * 5.0)
    points = backproject_depth(depth, inv_k)
    assert points.shape == (2, 4, h * w)
    t = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    pix = project_3d(points, k, t, h, w)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    expect_x = (xs / (w - 1) - 0.5) * 2
    expect_y = (ys / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(pix[0, ..., 0]), expect_x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pix[1, ..., 1]), expect_y, atol=1e-3)


def test_rot_from_axisangle():
    # zero rotation -> identity
    r0 = rot_from_axisangle(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(r0[0]), np.eye(4), atol=1e-5)
    # pi/2 about z maps x-axis to y-axis
    r = rot_from_axisangle(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
    v = np.asarray(r[0, :3, :3]) @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-5)


def test_rot_from_axisangle_grad_finite_at_zero():
    """A pose head emitting an exactly-zero axis-angle (typical at init) must
    not NaN the photometric-loss gradient: d||v||/dv is 0/0 at v == 0, so the
    angle uses sqrt(sum + eps^2) (same hazard family as the KoLeo fix)."""
    import jax

    def loss(aa):
        return rot_from_axisangle(aa).sum()

    g = jax.grad(loss)(jnp.zeros((2, 3)))
    assert bool(jnp.isfinite(g).all()), g


def test_transformation_invert_roundtrip():
    rng = np.random.default_rng(1)
    aa = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32) * 0.1)
    tr = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32) * 0.05)
    t_fwd = transformation_from_parameters(aa, tr, invert=False)
    t_bwd = transformation_from_parameters(aa, tr, invert=True)
    prod = np.asarray(jnp.einsum("bij,bjk->bik", t_fwd, t_bwd))
    for b in range(3):
        np.testing.assert_allclose(prod[b], np.eye(4), atol=1e-5)


def test_grid_sample_identity_and_border():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    xs, ys = np.meshgrid(np.arange(8), np.arange(8), indexing="xy")
    coords = np.stack([(xs / 7 - 0.5) * 2, (ys / 7 - 0.5) * 2], -1)[None].astype(np.float32)
    out = grid_sample(img, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # far out-of-range coords clamp to the border pixel
    far = jnp.full((1, 2, 2, 2), 5.0)
    out = grid_sample(img, far)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(img[0, 7, 7]), atol=1e-5)


def test_pose_estimator_outputs():
    pe = PoseEstimator(rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 6), np.float32))
    out = pe(x)
    assert out["axisangle"].shape == (2, 2, 3)
    assert out["translation"].shape == (2, 2, 3)
    t = np.asarray(out["cam_T_cam"])
    assert t.shape == (2, 4, 4)
    # rotation block orthonormal, bottom row (0,0,0,1)
    for b in range(2):
        r = t[b, :3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
        np.testing.assert_allclose(t[b, 3], [0, 0, 0, 1], atol=1e-6)


def test_compute_sl_force():
    normal = jnp.ones((2, 4, 4))
    shear = jnp.stack([jnp.full((2, 4, 4), 2.0), jnp.full((2, 4, 4), -1.0)], -1)
    f = np.asarray(compute_sl_force(normal, shear))
    np.testing.assert_allclose(f, np.tile([[2.0, -1.0, 1.0]], (2, 1)), atol=1e-6)


def test_geometric_forcefield_trains():
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    mod = GeometricForceFieldModule(dec, with_sl_supervision=True, with_mask_supervision=True, rngs=nnx.Rngs(2))
    rng = np.random.default_rng(0)
    batches = [
        {
            "image": rng.random((2, 32, 32, 6), dtype=np.float32),
            "image_bg": rng.random((2, 32, 32, 6), dtype=np.float32),
            "mask": (rng.random((2, 32, 32)) > 0.5).astype(np.float32),
            "force": rng.random((2, 3), dtype=np.float32),
        }
        for _ in range(2)
    ]
    enc_before = nnx.to_pure_dict(nnx.state(dec.encoder, nnx.Param))
    enc_before = jax.tree.map(np.asarray, enc_before)
    pose_before = nnx.to_pure_dict(nnx.state(mod.pose_estimator, nnx.Param))
    pose_before = jax.tree.map(np.asarray, pose_before)
    hist = Trainer(max_epochs=1, verbose=0).fit(mod, batches)
    assert np.isfinite(hist[-1]["train_loss"])
    # frozen ViT encoder, trained pose estimator
    enc_after = jax.tree.map(np.asarray, nnx.to_pure_dict(nnx.state(dec.encoder, nnx.Param)))
    assert all(np.array_equal(a, b) for a, b in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after)))
    pose_after = jax.tree.map(np.asarray, nnx.to_pure_dict(nnx.state(mod.pose_estimator, nnx.Param)))
    moved = max(float(np.abs(a - b).max()) for a, b in zip(jax.tree.leaves(pose_before), jax.tree.leaves(pose_after)))
    assert moved > 0, "pose estimator did not train"


def test_geometric_forcefield_aux_keys():
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    mod = GeometricForceFieldModule(dec, with_sl_supervision=True, rngs=nnx.Rngs(2))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random((2, 32, 32, 6), np.float32)),
        "image_bg": jnp.asarray(rng.random((2, 32, 32, 6), np.float32)),
        "force": jnp.asarray(rng.random((2, 3), np.float32)),
    }
    loss, aux = mod.training_loss(batch, jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(loss))
    for k in ("normal_loss", "shear_loss", "reprojection_loss", "photometric_loss", "rmse_fx", "rmse_fy", "rmse_fz"):
        assert k in aux and np.isfinite(float(aux[k])), k
    assert aux["warped_color"].shape == (2, 32, 32, 3)


def test_quiver_plots():
    rng = np.random.default_rng(0)
    shear = rng.normal(size=(32, 32, 2)).astype(np.float32) * 5
    normal = rng.random((32, 32)).astype(np.float32)
    img = plot_quiver(shear, normal, spacing=8)
    assert img.ndim == 3 and img.shape[0] > 10
    base = rng.random((32, 32, 3)).astype(np.float32)
    overlay = plot_quiver_img(base, shear, normal, np.ones((32, 32)), spacing=8)
    assert np.asarray(overlay).ndim == 3


def test_overlay_video(tmp_path):
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    mod = GeometricForceFieldModule(dec, rngs=nnx.Rngs(2))
    rng = np.random.default_rng(0)
    images = rng.random((3, 32, 32, 6)).astype(np.float32)
    out = mod.render_overlay_video(images, str(tmp_path / "overlay.mp4"), spacing=8, max_frames=3)
    import os

    assert os.path.getsize(out) > 0


def test_photometric_grad_finite_on_identical_frames():
    """robust_photometric_loss is differentiated inside the forcefield SSL
    loss; bit-identical pixel vectors (flat/static tactile regions through
    grid_sample) must not produce a 0/0 norm VJP (ADVICE r4; torch defines
    the norm subgradient at 0 as 0, JAX does not)."""
    from m3l_tpu.tasks.forcefield_geometry import robust_photometric_loss

    im = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3), np.float32))

    def f(w):
        return robust_photometric_loss(im, im * w)  # w=1 -> exactly-zero diff

    val, grad = jax.value_and_grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(val)) and np.isfinite(float(grad)), (val, grad)


@pytest.mark.slow
def test_forcefield_grads_finite_with_duplicate_frames():
    """The forcefield-module arm of the duplicate-frame gradient canary
    (ADVICE r4): a window whose two frames are bit-identical (static sensor)
    with a duplicated row in the batch must keep every gradient finite."""
    dec = ForceFieldDecoder(tiny_vit(), hooks=(0, 1, 2, 3), fusion_ch=16, rngs=nnx.Rngs(1))
    mod = GeometricForceFieldModule(dec, rngs=nnx.Rngs(2))
    rng = np.random.default_rng(0)
    img = rng.random((2, 32, 32, 6), np.float32)
    img[:, :, :, 3:] = img[:, :, :, :3]  # frame_{-1} == frame_0 (static)
    img[1] = img[0]  # duplicate batch row
    batch = {"image": jnp.asarray(img), "image_bg": jnp.asarray(img)}

    graphdef, params, rest = nnx.split(mod, mod.trainable_filter, ...)

    def loss_fn(p):
        m = nnx.merge(graphdef, p, rest)
        loss, _ = m.training_loss(batch, jax.random.PRNGKey(0), jnp.asarray(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    bad = [p for p, l in jax.tree.leaves_with_path(grads) if not bool(jnp.isfinite(l).all())]
    assert not bad, bad
