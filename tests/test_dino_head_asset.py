"""Load the reference's shipped DINOv2 linear segmentation head asset
(BASELINE.json config #5: dinov2_vits14 linear heads)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

ASSET = "/root/reference/dino_head/dinov2_vits14_ade20k_linear_head.pth"


def test_seg_head_forward():
    from m3l_tpu.models import DINOv2LinearSegHead

    head = DINOv2LinearSegHead(384, 150, rngs=nnx.Rngs(0))
    tokens = jnp.ones((2, 25, 384))
    out = head(tokens)
    assert out.shape == (2, 25, 150)
    out_grid = head(tokens, grid=(5, 5))
    assert out_grid.shape == (2, 5, 5, 150)


def test_load_reference_head_asset():
    if not os.path.isfile(ASSET):
        pytest.skip("reference asset not mounted")
    import torch

    from m3l_tpu.models import DINOv2LinearSegHead, load_torch_linear_seg_head

    ckpt = torch.load(ASSET, map_location="cpu", weights_only=False)
    head = DINOv2LinearSegHead(384, 150, rngs=nnx.Rngs(0))
    n = load_torch_linear_seg_head(head, ckpt)
    assert n == 150 * 384 + 150 + 4 * 384
    # numerical parity vs the torch head on a fixed input
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 25, 384)).astype(np.float32)
    ours = np.asarray(head(jnp.asarray(x)))
    sd = {k.removeprefix("decode_head."): v for k, v in ckpt["state_dict"].items()}
    xt = torch.from_numpy(x)
    xn = (xt - sd["bn.running_mean"]) / torch.sqrt(sd["bn.running_var"] + 1e-5)
    xn = xn * sd["bn.weight"] + sd["bn.bias"]
    theirs = (xn @ sd["conv_seg.weight"][:, :, 0, 0].T + sd["conv_seg.bias"]).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
