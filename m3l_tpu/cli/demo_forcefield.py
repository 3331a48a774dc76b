"""Live force-field demo (reference tactile_ssl/test/demo_t1_forcefield.py +
data/vision_based_interactive.py DemoForceFieldData parity).

Captures frames from a DIGIT/GelSight-style sensor (any cv2 camera), runs
the force-field decoder, and overlays the predicted normal map + shear
quiver. Gated: with no camera (headless hosts) use ``--source file.mp4`` or
``--source synthetic``.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _open_source(source: str, size: int):
    import cv2

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


def main(argv=None):
    import jax.numpy as jnp
    from flax import nnx

    from ..models.vit import vit_tiny
    from ..tasks import ForceFieldDecoder
    from ..tasks.sl_module import load_encoder_from_checkpoint

    parser = argparse.ArgumentParser("m3l-tpu forcefield demo")
    parser.add_argument("--source", type=str, default="synthetic", help="camera index, video file, or 'synthetic'")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--encoder_type", type=str, default="mae")
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--frames", type=int, default=30, help="frames to process (0 = until q)")
    parser.add_argument("--out", type=str, default=None, help="write annotated video here instead of a window")
    args = parser.parse_args(argv)

    import cv2

    enc = vit_tiny(patch_size=16, img_size=(args.size, args.size), in_chans=6, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    dec = ForceFieldDecoder(enc, rngs=nnx.Rngs(1))
    if args.checkpoint:
        load_encoder_from_checkpoint(enc, args.checkpoint, args.encoder_type)
    predict = nnx.jit(lambda d, x: d(x))

    cap = _open_source(args.source, args.size)
    writer = None
    prev = None
    n = 0
    try:
        while args.frames == 0 or n < args.frames:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.resize(frame, (args.size, args.size))
            if prev is None:
                prev = frame
            x = np.concatenate([prev, frame], axis=-1).astype(np.float32)[None] / 255.0
            field = np.asarray(predict(dec, jnp.asarray(x)))[0]
            vis = overlay_field(frame, field)
            if args.out:
                if writer is None:
                    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 15, (args.size, args.size))
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
