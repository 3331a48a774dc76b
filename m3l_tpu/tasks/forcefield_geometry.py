"""Geometry-aware force-field SSL: DIGIT intrinsics, depth reprojection,
pose estimation, and the monodepth-style view-synthesis objective.

Capability parity with the reference's forcefield geometry stack:
* intrinsics / backproject / project / disp-to-depth —
  reference tactile_ssl/downstream_task/utils_forcefield/ssl_utils.py:17-222
* axis-angle pose algebra —
  reference utils_forcefield/pose_estimator/utils.py:10-86
* PoseEstimator (ResNet encoder over 2 stacked frames + monodepth
  PoseDecoder) — reference pose_estimator/PoseEstimator.py:13-54,
  pose_decoder.py:16-59
* SSL loss assembly (normal: min-reprojection + edge-aware disparity
  smoothness x5; shear: flow photometric + 1st-order smoothness) —
  reference utils_forcefield/ssl_flow_loss.py:11-120,
  forcefield_sl.py:95-412
* quiver visualizations — reference ssl_utils.py:223-354

Data contract (reference data/vision_tactile_forcefield.py:93-138):
``image`` = concat(frame_t, frame_{t-1}) -> 6 channels (NHWC here),
``image_bg`` = concat(frame_t, background) -> 6 channels.

Consciously fixed reference quirk: ``compute_reprojection_loss``
(ssl_flow_loss.py:83-94) has an inverted ``with_ssim`` branch (with SSIM
enabled it returns plain L1); here ``with_ssim=True`` really applies
0.85*SSIM + 0.15*L1.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..models.baselines import ResNet18Encoder
from .forcefield import ForceFieldDecoder, ssim
from .sl_module import SLModuleBase


# ---------------------------------------------------------------------- #
# intrinsics + projective geometry (ssl_utils.py:17-222)
# ---------------------------------------------------------------------- #
def digit_intrinsics(height: int = 224, width: int = 224, yfov_deg: float = 60.0):
    """DIGIT pinhole intrinsics (4x4 K and its inverse), ssl_utils.py:17-30."""
    fx = height * 0.5 / np.tan(np.deg2rad(yfov_deg) * 0.5)
    fy = fx
    cx, cy = width / 2.0, height / 2.0
    k = np.array(
        [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    )
    return jnp.asarray(k), jnp.asarray(np.linalg.inv(k))


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth) (ssl_utils.py:212-221)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled = min_disp + (max_disp - min_disp) * disp
    return scaled, 1.0 / scaled


def backproject_depth(depth: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """Depth (B, H, W) -> homogeneous camera points (B, 4, H*W)
    (ssl_utils.py BackprojectDepth:146-178)."""
    b, h, w = depth.shape
    xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="xy")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(h * w, jnp.float32)], axis=0)  # (3, HW)
    cam = inv_k[:3, :3] @ pix  # (3, HW)
    cam = depth.reshape(b, 1, -1) * cam[None]
    ones = jnp.ones((b, 1, h * w), jnp.float32)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points: jnp.ndarray, k: jnp.ndarray, t: jnp.ndarray, height: int, width: int, eps: float = 1e-7) -> jnp.ndarray:
    """Camera points (B, 4, H*W) + pose T (B, 4, 4) -> normalized [-1, 1]
    pixel coords (B, H, W, 2) (ssl_utils.py Project3D:181-207)."""
    b = points.shape[0]
    p = jnp.einsum("ij,bjk->bik", k, t)[:, :3]  # (B, 3, 4)
    cam = jnp.einsum("bij,bjn->bin", p, points)  # (B, 3, HW)
    pix = cam[:, :2] / (cam[:, 2:3] + eps)
    pix = pix.reshape(b, 2, height, width).transpose(0, 2, 3, 1)
    scale = jnp.array([width - 1.0, height - 1.0], jnp.float32)
    return (pix / scale - 0.5) * 2.0


def grid_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (B, H, W, C) at normalized [-1, 1] coords
    (B, H', W', 2), border padding, align_corners=True — the
    ``F.grid_sample(..., padding_mode="border", align_corners=True)`` of
    forcefield_sl.py:265-270, as a pure gather."""
    b, h, w, c = img.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0
    flat = img.reshape(b, h * w, c)

    def gather(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        idx = (yy * w + xx).reshape(b, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(b, *yy.shape[1:], c)

    return (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )


# ---------------------------------------------------------------------- #
# axis-angle pose algebra (pose_estimator/utils.py)
# ---------------------------------------------------------------------- #
def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) axis-angle -> (B, 4, 4) rotation (pose_estimator/utils.py:45-86)."""
    # eps inside the sqrt: d||v||/dv is 0/0 = NaN at v == 0, and a pose head
    # can emit an exactly-zero axis-angle (global-mean of ~zero convs, worse
    # under bf16) — same hazard family as the KoLeo fix in ssl/losses.py
    angle = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-14)  # (B, 1)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    cc = 1.0 - ca
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    row0 = jnp.stack([x * x * cc + ca, x * y * cc - z * sa, z * x * cc + y * sa], -1)
    row1 = jnp.stack([x * y * cc + z * sa, y * y * cc + ca, y * z * cc - x * sa], -1)
    row2 = jnp.stack([z * x * cc - y * sa, y * z * cc + x * sa, z * z * cc + ca], -1)
    r3 = jnp.stack([row0, row1, row2], axis=1)  # (B, 3, 3)
    b = vec.shape[0]
    rot = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return rot.at[:, :3, :3].set(r3)


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) -> (B, 4, 4) translation (pose_estimator/utils.py:29-43)."""
    b = t.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    return m.at[:, :3, 3].set(t)


def transformation_from_parameters(axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False) -> jnp.ndarray:
    """(axis-angle, translation) -> 4x4 pose (pose_estimator/utils.py:10-27)."""
    r = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        r = jnp.swapaxes(r, 1, 2)
        t = -t
    tm = get_translation_matrix(t)
    return jnp.einsum("bij,bjk->bik", r, tm) if invert else jnp.einsum("bij,bjk->bik", tm, r)


# ---------------------------------------------------------------------- #
# pose network (pose_estimator/PoseEstimator.py + pose_decoder.py)
# ---------------------------------------------------------------------- #
class PoseDecoder(nnx.Module):
    """Monodepth2 pose decoder over the encoder's last feature map
    (reference pose_decoder.py:16-59): squeeze 1x1 -> 3 convs -> global mean
    -> 0.01 * (axisangle, translation) per predicted frame."""

    def __init__(self, num_ch_enc: int, num_frames_to_predict_for: int = 2, *, dtype=jnp.float32, rngs: nnx.Rngs):
        mk = lambda ci, co, k: nnx.Conv(ci, co, kernel_size=(k, k), padding="SAME", dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.squeeze = mk(num_ch_enc, 256, 1)
        self.pose0 = mk(256, 256, 3)
        self.pose1 = mk(256, 256, 3)
        self.pose2 = mk(256, 6 * num_frames_to_predict_for, 1)
        self.num_frames = num_frames_to_predict_for

    def __call__(self, feat: jnp.ndarray):
        x = nnx.relu(self.squeeze(feat))
        x = nnx.relu(self.pose0(x))
        x = nnx.relu(self.pose1(x))
        x = self.pose2(x)
        out = 0.01 * jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 6*nf)
        out = out.reshape(-1, self.num_frames, 6)
        return out[..., :3], out[..., 3:]  # axisangle, translation


class PoseEstimator(nnx.Module):
    """Relative pose between the two stacked frames
    (reference PoseEstimator.py:13-54): frames passed in temporal order
    [frame_{-1}, frame_0], pose inverted for the backward frame id."""

    def __init__(self, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.encoder = ResNet18Encoder(in_chans=6, dtype=dtype, rngs=rngs)
        self.decoder = PoseDecoder(self.encoder.embed_dim, num_frames_to_predict_for=2, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> dict:
        """x: (B, H, W, 6) = concat(frame_0, frame_{-1}) channels-last."""
        frame0, frame_m1 = x[..., 0:3], x[..., 3:6]
        pose_in = jnp.concatenate([frame_m1, frame0], axis=-1)  # temporal order
        feat = self.encoder.forward_spatial(pose_in)
        axisangle, translation = self.decoder(feat)
        t = transformation_from_parameters(axisangle[:, 0], translation[:, 0], invert=True)
        return {"axisangle": axisangle, "translation": translation, "cam_T_cam": t}


# ---------------------------------------------------------------------- #
# SSL losses (ssl_flow_loss.py + ssl_utils.py)
# ---------------------------------------------------------------------- #
def reprojection_loss(pred: jnp.ndarray, target: jnp.ndarray, with_ssim: bool = True) -> jnp.ndarray:
    """Per-pixel reprojection error map (B, H, W, 1)
    (ssl_flow_loss.py:83-94; the reference's inverted with_ssim branch is
    consciously fixed here — see module docstring)."""
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if not with_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def edge_aware_smoothness(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-weighted disparity smoothness (ssl_flow_loss.py:60-76), NHWC."""
    gd_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    gd_y = jnp.abs(disp[:, :-1] - disp[:, 1:])
    gi_x = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), axis=-1, keepdims=True)
    gi_y = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), axis=-1, keepdims=True)
    return jnp.mean(gd_x * jnp.exp(-gi_x)) + jnp.mean(gd_y * jnp.exp(-gi_y))


def flow_smooth_1st_loss(flow: jnp.ndarray, image: jnp.ndarray, alpha: float = 0.0) -> jnp.ndarray:
    """First-order flow smoothness (ssl_utils.py:97-143), NHWC flow (B,H,W,2)."""
    img_dx = image[:, :, 1:] - image[:, :, :-1]
    img_dy = image[:, 1:] - image[:, :-1]
    w_x = jnp.exp(-jnp.mean(jnp.abs(img_dx * alpha), axis=-1, keepdims=True))
    w_y = jnp.exp(-jnp.mean(jnp.abs(img_dy * alpha), axis=-1, keepdims=True))
    dx = flow[:, :, 1:] - flow[:, :, :-1]
    dy = flow[:, 1:] - flow[:, :-1]
    return jnp.mean(w_x * jnp.abs(dx) / 2.0) + jnp.mean(w_y * jnp.abs(dy) / 2.0)


def robust_photometric_loss(im: jnp.ndarray, im_warp: jnp.ndarray, p: int = 2, eps: float = 1e-8) -> jnp.ndarray:
    """Mean p-norm over channels (ssl_utils.py:69-74), NHWC.

    eps INSIDE the sqrt: d/dx ||x||_2 is 0/0 = NaN at an exactly-zero pixel
    difference, which bit-identical flat/static tactile regions produce
    routinely (torch defines the subgradient at 0 as 0; JAX does not)."""
    if p == 2:
        d = im - im_warp
        return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + eps * eps))
    return jnp.mean(jnp.linalg.norm(im - im_warp, ord=p, axis=-1))


def compute_sl_force(normal: jnp.ndarray, shear: jnp.ndarray) -> jnp.ndarray:
    """Integrate the field into a 3-DoF force (forcefield_sl.py:226-242):
    normal (B, H, W), shear (B, H, W, 2) -> (B, 3) [f_x, f_y, f_z]."""
    h, w = normal.shape[1:3]
    denom = float(h * w)
    f_x = shear[..., 0].sum(axis=(1, 2)) / denom
    f_y = shear[..., 1].sum(axis=(1, 2)) / denom
    f_z = normal.sum(axis=(1, 2)) / denom
    return jnp.stack([f_x, f_y, f_z], axis=1)


# ---------------------------------------------------------------------- #
# the geometry-aware SSL module (forcefield_sl.py:95-412)
# ---------------------------------------------------------------------- #
class GeometricForceFieldModule(SLModuleBase):
    """Self-supervised normal+shear field training with pose estimation and
    depth reprojection (reference ForceFieldModule, forcefield_sl.py:95-412).

    Normal branch: the normal channel is read as sigmoid disparity on the
    background view, converted to depth, backprojected with DIGIT inverse
    intrinsics, reprojected through the estimated relative pose, and the
    source frame is warped to the target — minimised with SSIM+L1
    reprojection and edge-aware disparity smoothness (x5 like the
    reference, ssl_flow_loss.py:21-57). Shear branch: the shear channels
    (x scale_flow=20, reference layers/Head.py:72,103) act as optical flow
    warping frame_{-1} -> frame_0, with robust photometric + 1st-order
    smoothness losses (ssl_flow_loss.py:98-110)."""

    def __init__(
        self,
        model_task: ForceFieldDecoder,
        *,
        min_depth: float = 0.1,
        max_depth: float = 100.0,
        disparity_smoothness: float = 1e-3,
        scale_flow: float = 20.0,
        with_ssim: bool = True,
        with_sl_supervision: bool = False,
        with_mask_supervision: bool = False,
        train_encoder: bool = False,
        checkpoint_encoder: Optional[str] = None,
        encoder_type: str = "mae",
        base_lr: float = 1e-4,
        weight_decay: float = 0.04,
        warmup_epochs: int = 1,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.model_task = model_task
        self.pose_estimator = PoseEstimator(dtype=dtype, rngs=rngs)
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.disparity_smoothness = disparity_smoothness
        self.scale_flow = scale_flow
        self.with_ssim = with_ssim
        self.with_sl_supervision = with_sl_supervision
        self.with_mask_supervision = with_mask_supervision
        self.train_encoder = train_encoder
        self.base_lr = base_lr
        self.weight_decay = weight_decay
        self.warmup_epochs = warmup_epochs
        h, w = model_task.img_size
        k, inv_k = digit_intrinsics(h, w)
        self.k = nnx.data(k)
        self.inv_k = nnx.data(inv_k)
        if checkpoint_encoder is not None:
            from .sl_module import load_encoder_from_checkpoint

            load_encoder_from_checkpoint(model_task.encoder, checkpoint_encoder, encoder_type)
        if train_encoder:
            self.trainable_filter = nnx.Param

    # pose estimator always trains; the ViT encoder inside model_task is
    # frozen unless train_encoder (reference sl_module.py:46-49). A plain
    # PathContains("encoder") would also freeze pose_estimator.encoder, so
    # match the exact (model_task, encoder) prefix instead.
    trainable_filter = nnx.All(nnx.Param, lambda path, x: tuple(str(k) for k in path[:2]) != ("model_task", "encoder"))

    def forward_fields(self, image: jnp.ndarray, image_bg: jnp.ndarray):
        """Two decoder passes with shared weights (the reference's
        mode="normal" on image_bg and mode="shear" on image,
        forcefield_sl.py:182-197)."""
        disp = self.model_task(image_bg)[..., :1]  # sigmoid normal/disparity
        shear = self.model_task(image)[..., 1:] * self.scale_flow  # tanh flow
        return disp, shear

    def training_loss(self, batch: dict, key, step):
        from ..ssl.module import as_float_image

        # uint8 windows stay uint8 through the host->device link (4x less
        # transfer over the relay); dequantize on device like every other
        # module (ssl/module.py as_float_image; float input passes through)
        x = as_float_image(batch["image"])  # (B, H, W, 6): frame_0 ++ frame_{-1}
        x_bg = as_float_image(batch.get("image_bg", batch["image"]))
        frame0, frame_m1 = x[..., 0:3].astype(jnp.float32), x[..., 3:6].astype(jnp.float32)
        b, h, w = frame0.shape[:3]

        disp, shear = self.forward_fields(x, x_bg)
        poses = self.pose_estimator(x)

        # ---- normal branch: depth reprojection (ssl_flow_loss.py:21-57) ----
        _, depth = disp_to_depth(disp[..., 0], self.min_depth, self.max_depth)
        cam_points = backproject_depth(depth, self.inv_k)
        pix = project_3d(cam_points, self.k, poses["cam_T_cam"], h, w)
        pred = grid_sample(frame_m1, pix)
        reproj = jnp.mean(reprojection_loss(pred, frame0, self.with_ssim))
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        smooth_n = edge_aware_smoothness(disp / (mean_disp + 1e-7), frame0)
        normal_loss = (reproj + self.disparity_smoothness * smooth_n) * 5.0

        # ---- shear branch: optical-flow warp (ssl_flow_loss.py:98-110) ----
        warped = _flow_warp(frame0, shear)
        photo = robust_photometric_loss(frame_m1, warped)
        smooth_s = flow_smooth_1st_loss(shear, frame0)
        shear_loss = photo + 0.05 * smooth_s

        loss = normal_loss + shear_loss
        aux = {
            "normal_loss": normal_loss,
            "shear_loss": shear_loss,
            "reprojection_loss": reproj,
            "photometric_loss": photo,
            "warped_color": pred,
        }

        if self.with_mask_supervision and "mask" in batch:
            mask = batch["mask"][..., None].astype(jnp.float32)
            normal_m = _smooth_l1(disp, mask * disp)
            loss = loss + normal_m
            aux["normal_loss"] = aux["normal_loss"] + normal_m

        if self.with_sl_supervision and "force" in batch:
            y_pred = compute_sl_force(disp[..., 0], shear)
            y_gt = batch["force"].astype(jnp.float32)
            loss = loss + _smooth_l1(y_pred, y_gt)
            mse_xyz = jnp.mean((y_pred - y_gt) ** 2, axis=0)
            aux["rmse_fx"], aux["rmse_fy"], aux["rmse_fz"] = (jnp.sqrt(mse_xyz[i]) for i in range(3))

        aux["loss"] = loss
        return loss, aux

    def encode(self, x):
        return x

    def predict(self, x):
        from ..ssl.module import as_float_image

        field = self.model_task(as_float_image(x))
        return jnp.concatenate([field[..., :1], field[..., 1:] * self.scale_flow], axis=-1)

    def render_overlay_video(self, images: np.ndarray, path: str, *, spacing: int = 16, fps: int = 10, max_frames: int = 50) -> str:
        """Quiver-overlay prediction video over a batch of tactile frames
        (the reference's forcefield visualization flow:
        demo_t1_forcefield.py + ssl_utils.py:296-354 plot_quiver_img +
        utils/pretrain_utils.py:148-197 log_videos)."""
        from flax import nnx

        from ..utils.video import write_video

        jit_predict = nnx.jit(lambda m, x: m.predict(x))
        field = np.asarray(jit_predict(self, jnp.asarray(images[:max_frames])))
        frames = []
        for i in range(min(len(images), max_frames)):
            rgb = np.asarray(images[i][..., :3], np.float32)
            rgb = (rgb - rgb.min()) / max(rgb.max() - rgb.min(), 1e-6)
            normal = field[i, ..., 0]
            shear = field[i, ..., 1:]
            frames.append(np.asarray(plot_quiver_img(rgb, shear, normal, np.ones(normal.shape), spacing))[..., :3])
        return write_video(frames, path, fps=fps)


def _flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """warp() of ssl_utils.py:33-66: sample img at grid+flow, zeroing
    out-of-bounds samples (the reference's validity mask)."""
    from .forcefield import warp

    b, h, w, _ = img.shape
    out = warp(img, flow)
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    x = xs[None] + flow[..., 0]
    y = ys[None] + flow[..., 1]
    valid = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)).astype(jnp.float32)
    return out * valid[..., None]


def _smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


# ---------------------------------------------------------------------- #
# quiver visualizations (ssl_utils.py:223-354) — host-side numpy/matplotlib
# ---------------------------------------------------------------------- #
def plot_quiver(shear: np.ndarray, normal: np.ndarray, spacing: int, margin: int = 0, **kwargs) -> np.ndarray:
    """Sparse arrow plot of the shear field colored by the normal field
    (ssl_utils.py plot_quiver:223-293). Returns an RGB(A) image array."""
    import io

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots()
    h, w = shear.shape[:2]
    nx = max(int((w - 2 * margin) / spacing), 1)
    ny = max(int((h - 2 * margin) / spacing), 1)
    x = np.linspace(margin, w - margin - 1, nx, dtype=np.int64)
    y = np.linspace(margin, h - margin - 1, ny, dtype=np.int64)
    sub = shear[np.ix_(y, x)]
    u, v = sub[:, :, 0], sub[:, :, 1]
    m = normal[np.ix_(y, x)]
    rad_max, eps = 20.0, 1e-5
    u = np.clip(u / (rad_max + eps), -1.0, 1.0)
    v = np.clip(v / (rad_max + eps), -1.0, 1.0)
    uu, vv = u.copy(), v.copy()
    r = np.sqrt(u**2 + v**2)
    uu[r < 0.01] = 0.0
    vv[r < 0.01] = 0.0
    uu = uu / (np.abs(uu).max() + eps)
    vv = vv / (np.abs(vv).max() + eps)
    kwargs = {**dict(angles="uv", scale_units="dots", scale=0.025, width=0.007, cmap="inferno", edgecolor="face"), **kwargs}
    ax.quiver(y, x, uu, -vv, m, **kwargs)
    ax.set_ylim(sorted(ax.get_ylim(), reverse=True))
    ax.set_facecolor("black")
    ax.set_xticks([])
    ax.set_yticks([])
    with io.BytesIO() as buff:
        fig.savefig(buff, format="png", bbox_inches="tight", pad_inches=0)
        buff.seek(0)
        import PIL.Image

        img = np.array(PIL.Image.open(buff))
    plt.close(fig)
    return img


def plot_quiver_img(img: np.ndarray, shear: np.ndarray, normal: np.ndarray, mask: np.ndarray, spacing: int, margin: int = 0, **kwargs) -> np.ndarray:
    """Quiver overlaid on the tactile image (ssl_utils.py:296-354)."""
    import io

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots()
    h, w = shear.shape[:2]
    nx = max(int((w - 2 * margin) / spacing), 1)
    ny = max(int((h - 2 * margin) / spacing), 1)
    x = np.linspace(margin, w - margin - 1, nx, dtype=np.int64)
    y = np.linspace(margin, h - margin - 1, ny, dtype=np.int64)
    sub = shear[np.ix_(y, x)]
    u, v = sub[:, :, 0], sub[:, :, 1]
    m = normal[np.ix_(y, x)]
    rad_max, eps = 100.0, 1e-5
    u = u / (rad_max + eps)
    v = v / (rad_max + eps)
    kwargs = {**dict(angles="xy", scale_units="xy", cmap="gnuplot", width=0.005, clim=(0, 1)), **kwargs}
    ax.imshow(img)
    ax.quiver(x, y, u, v, m, **kwargs)
    ax.set_ylim(sorted(ax.get_ylim(), reverse=True))
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    ax.set_xticks([])
    ax.set_yticks([])
    with io.BytesIO() as buff:
        fig.savefig(buff, format="png", bbox_inches="tight", pad_inches=0)
        buff.seek(0)
        import PIL.Image

        out = np.array(PIL.Image.open(buff))
    plt.close(fig)
    return out
