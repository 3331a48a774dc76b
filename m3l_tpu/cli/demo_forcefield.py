"""Live force-field demo (reference tactile_ssl/test/demo_t1_forcefield.py +
data/vision_based_interactive.py DemoForceFieldData parity).

Captures frames from a DIGIT/GelSight-style sensor (any cv2 camera), runs
the force-field decoder, and overlays the predicted normal map + shear
quiver. Gated: with no camera (headless hosts) use ``--source file.mp4``,
``--source synthetic`` (moving blob, untrained-smoke only), or ``--source
dataset`` (replay a fresh synthetic DIGIT trajectory from the training
renderer). With ``--module_ckpt`` the demo restores a TRAINED
GeometricForceFieldModule (a Trainer ``last.ckpt``, e.g.
``runs/forcefield/ff_mae/last.ckpt``) and runs its two-pass
``forward_fields`` exactly like the reference's live path: the background
gel image is captured once at startup (vision_based_interactive.py:74-78)
and concatenated into ``image_bg`` per frame (lines 158-162).
"""
from __future__ import annotations

import argparse
import time

import numpy as np


class _DatasetSource:
    """Replay a synthetic DIGIT trajectory (same renderer the force-field
    stack trains on); exposes the clean gel background like a real rig."""

    def __init__(self, size: int, seed: int = 99):
        from ..data.synthetic import synth_digit_trajectories

        data = synth_digit_trajectories(2, 60, size=size, seed=seed)
        self.frames = data["frames"]
        self.tid = data["traj_id"]
        self.bgs = data["bg_frames"]
        self.i = 0

    def read(self):
        if self.i >= len(self.frames):
            return False, None
        f = self.frames[self.i]
        self.i += 1
        return True, np.ascontiguousarray(f[..., ::-1])  # RGB -> cv2 BGR

    def background(self):
        # self.i already points past the frame last read()
        return np.ascontiguousarray(self.bgs[self.tid[max(self.i - 1, 0)]][..., ::-1])

    def release(self):
        pass


def _open_source(source: str, size: int):
    import cv2

    if source == "dataset":
        return _DatasetSource(size)
    if source == "synthetic":
        rng = np.random.default_rng(0)

        class _Synth:
            def read(self):
                t = time.time()
                yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
                blob = np.exp(-(((xx - 0.5 - 0.2 * np.sin(t)) ** 2 + (yy - 0.5) ** 2) / 0.02))
                img = np.stack([blob, blob * 0.5, 1 - blob], -1)
                return True, (img * 255).astype(np.uint8)

            def release(self):
                pass

        return _Synth()
    cap = cv2.VideoCapture(int(source) if source.isdigit() else source)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video source {source!r}; use --source synthetic on headless hosts")
    return cap


def overlay_field(frame: np.ndarray, field: np.ndarray, stride: int = 8) -> np.ndarray:
    import cv2

    h, w = frame.shape[:2]
    normal = (field[..., 0] * 255).astype(np.uint8)
    heat = cv2.applyColorMap(normal, cv2.COLORMAP_JET)
    out = cv2.addWeighted(frame, 0.6, heat, 0.4, 0)
    for y in range(0, h, stride):
        for x in range(0, w, stride):
            dx, dy = field[y, x, 1] * stride, field[y, x, 2] * stride
            cv2.arrowedLine(out, (x, y), (int(x + dx), int(y + dy)), (255, 255, 255), 1, tipLength=0.3)
    return out


def _build_module_structure(args, size: int):
    """The experiment's GeometricForceFieldModule structure
    (scripts/forcefield_experiment.py build_module), random-initialised."""
    import jax.numpy as jnp
    from flax import nnx

    from ..models.vit import VisionTransformer
    from ..tasks import ForceFieldDecoder, GeometricForceFieldModule

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rngs = nnx.Rngs(42)
    enc = VisionTransformer(
        img_size=(size, size),
        patch_size=16,
        in_chans=6,
        embed_dim=args.dim,
        depth=args.depth,
        num_heads=args.heads,
        pos_embed_fn="sinusoidal",
        num_register_tokens=1,
        dtype=dtype,
        rngs=rngs,
    )
    hooks = tuple(int(h) for h in args.hooks.split(","))
    dec = ForceFieldDecoder(enc, hooks=hooks, fusion_ch=args.fusion_ch, dtype=dtype, rngs=rngs)
    return GeometricForceFieldModule(dec, dtype=dtype, rngs=rngs)


def _build_trained_module(args, size: int):
    """Rebuild the module structure and restore a Trainer full-state
    ``last.ckpt`` (trainer.py _save: payload["model"] = nnx.state(module),
    encoder included)."""
    from ..train.checkpoint import load_checkpoint, restore_module_state

    module = _build_module_structure(args, size)
    restore_module_state(module, load_checkpoint(args.module_ckpt)["model"])
    return module


def main(argv=None):
    import jax.numpy as jnp
    from flax import nnx

    from ..models.vit import vit_tiny
    from ..tasks import ForceFieldDecoder
    from ..tasks.sl_module import load_encoder_from_checkpoint

    parser = argparse.ArgumentParser("m3l-tpu forcefield demo")
    parser.add_argument("--source", type=str, default="synthetic", help="camera index, video file, 'synthetic', or 'dataset'")
    parser.add_argument("--checkpoint", type=str, default=None, help="SSL encoder ckpt (untrained-decoder smoke path)")
    parser.add_argument("--module_ckpt", type=str, default=None, help="trained GeometricForceFieldModule Trainer ckpt, e.g. runs/forcefield/ff_mae/last.ckpt")
    parser.add_argument("--encoder_type", type=str, default="mae")
    parser.add_argument("--dim", type=int, default=192)
    parser.add_argument("--depth", type=int, default=6)
    parser.add_argument("--heads", type=int, default=3)
    parser.add_argument("--hooks", type=str, default="1,3,4,5")
    parser.add_argument("--fusion_ch", type=int, default=64)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--size", type=int, default=None, help="default: 96 with --module_ckpt / dataset source, else 224")
    parser.add_argument("--frames", type=int, default=30, help="frames to process (0 = until q)")
    parser.add_argument("--out", type=str, default=None, help="write annotated video here instead of a window")
    args = parser.parse_args(argv)
    size = args.size or (96 if (args.module_ckpt or args.source == "dataset") else 224)

    import cv2

    if args.module_ckpt:
        module = _build_trained_module(args, size)
        fields_fn = nnx.jit(lambda m, x, xb: m.forward_fields(x, xb))
        scale_flow = float(module.scale_flow)

        def predict_field(frame_rgb, prev_rgb, bg_rgb):
            # training format (data/synthetic.py forcefield_windows):
            # image = [frame_0, frame_{-1}], image_bg = [frame_0, background]
            x = np.concatenate([frame_rgb, prev_rgb], -1).astype(np.float32)[None] / 255.0
            xb = np.concatenate([frame_rgb, bg_rgb], -1).astype(np.float32)[None] / 255.0
            disp, shear = fields_fn(module, jnp.asarray(x), jnp.asarray(xb))
            return np.concatenate([np.asarray(disp[0], np.float32), np.asarray(shear[0], np.float32) / scale_flow], -1)
    else:
        enc = vit_tiny(patch_size=16, img_size=(size, size), in_chans=6, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
        dec = ForceFieldDecoder(enc, rngs=nnx.Rngs(1))
        if args.checkpoint:
            load_encoder_from_checkpoint(enc, args.checkpoint, args.encoder_type)
        predict = nnx.jit(lambda d, x: d(x))

        def predict_field(frame_rgb, prev_rgb, bg_rgb):
            x = np.concatenate([prev_rgb, frame_rgb], axis=-1).astype(np.float32)[None] / 255.0
            return np.asarray(predict(dec, jnp.asarray(x)))[0]

    cap = _open_source(args.source, size)
    writer = None
    prev = None
    bg = None
    n = 0
    try:
        while args.frames == 0 or n < args.frames:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.resize(frame, (size, size))
            if prev is None:
                prev = frame
            if hasattr(cap, "background"):
                bg = cap.background()  # true clean gel bg, per-trajectory
            elif bg is None:
                # reference parity: background gel image captured once at
                # startup (vision_based_interactive.py:74-78)
                bg = frame
            rgb = lambda f: f[..., ::-1]  # cv2 frames are BGR; the network trained on RGB
            field = predict_field(rgb(frame), rgb(prev), rgb(bg))
            vis = overlay_field(frame, field)
            if args.out:
                if writer is None:
                    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 15, (size, size))
                writer.write(vis)
            else:
                cv2.imshow("forcefield", vis)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            prev = frame
            n += 1
    finally:
        cap.release()
        if writer is not None:
            writer.release()
    print(f"processed {n} frames")
    return n


if __name__ == "__main__":
    main()
