"""Numerical interop test for the torch-DINOv2 checkpoint loader
(VERDICT r2 item #4: the loader was shape-tested only; a qkv/proj transpose
bug would have passed the suite).

A functional torch mirror of the DINOv2 forward (patch conv, CLS+register
tokens, learned pos-embed, pre-norm blocks with LayerScale, exact GELU,
eps-1e-6 LayerNorms — the layout of torch-hub ``dinov2_vits14_reg``,
reference models/pretrain_policy.py:105-118) runs a random torch-layout
state dict; the same dict is loaded via ``load_torch_dinov2_state`` and the
JAX forward must match <= 1e-5. Also covers the pos-embed interpolation path
(bicubic kernels differ between frameworks, so that check is cosine-level).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

D, H, DEPTH, PATCH, REG = 64, 4, 3, 14, 4
IMG = 56  # 4x4 patch grid


def make_torch_state(rng) -> dict:
    def r(*shape, scale=0.05):
        return rng.normal(size=shape).astype(np.float32) * scale

    n_patches = (IMG // PATCH) ** 2
    sd = {
        "cls_token": r(1, 1, D),
        "register_tokens": r(1, REG, D),
        "pos_embed": r(1, 1 + n_patches, D),
        "patch_embed.proj.weight": r(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(D),
        "norm.weight": 1.0 + r(D),
        "norm.bias": r(D),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = 1.0 + r(D)
        sd[p + "norm1.bias"] = r(D)
        sd[p + "attn.qkv.weight"] = r(3 * D, D)
        sd[p + "attn.qkv.bias"] = r(3 * D)
        sd[p + "attn.proj.weight"] = r(D, D)
        sd[p + "attn.proj.bias"] = r(D)
        sd[p + "ls1.gamma"] = r(D, scale=0.2)
        sd[p + "norm2.weight"] = 1.0 + r(D)
        sd[p + "norm2.bias"] = r(D)
        sd[p + "mlp.fc1.weight"] = r(4 * D, D)
        sd[p + "mlp.fc1.bias"] = r(4 * D)
        sd[p + "mlp.fc2.weight"] = r(D, 4 * D)
        sd[p + "mlp.fc2.bias"] = r(D)
        sd[p + "ls2.gamma"] = r(D, scale=0.2)
    return sd


def torch_forward(sd: dict, x_nchw: torch.Tensor, img: int) -> torch.Tensor:
    """Functional DINOv2 forward in torch from the raw state dict; returns
    the post-norm sequence (B, 1+R+N, D)."""
    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    b = x_nchw.shape[0]

    def ln(x, p):
        return F.layer_norm(x, (D,), t[p + ".weight"], t[p + ".bias"], eps=1e-6)

    tokens = F.conv2d(x_nchw, t["patch_embed.proj.weight"], t["patch_embed.proj.bias"], stride=PATCH)
    tokens = tokens.flatten(2).transpose(1, 2)  # (B, N, D)
    grid = img // PATCH
    base_grid = IMG // PATCH
    pos = t["pos_embed"][0]
    cls_pos, patch_pos = pos[:1], pos[1:]
    if grid != base_grid:
        pp = patch_pos.reshape(1, base_grid, base_grid, D).permute(0, 3, 1, 2)
        pp = F.interpolate(pp, size=(grid, grid), mode="bicubic", align_corners=False)
        patch_pos = pp.permute(0, 2, 3, 1).reshape(-1, D)
    tokens = tokens + patch_pos[None]
    cls = t["cls_token"].expand(b, -1, -1) + cls_pos[None]
    regs = t["register_tokens"].expand(b, -1, -1)
    x = torch.cat([cls, regs, tokens], dim=1)
    n = x.shape[1]
    dh = D // H
    for i in range(DEPTH):
        p = f"blocks.{i}"
        h = ln(x, p + ".norm1")
        qkv = (h @ t[p + ".attn.qkv.weight"].T + t[p + ".attn.qkv.bias"]).reshape(b, n, 3, H, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = torch.einsum("bnhd,bmhd->bhnm", q, k) * dh**-0.5
        a = torch.softmax(s, dim=-1)
        o = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(b, n, D)
        o = o @ t[p + ".attn.proj.weight"].T + t[p + ".attn.proj.bias"]
        x = x + t[p + ".ls1.gamma"] * o
        h = ln(x, p + ".norm2")
        h = h @ t[p + ".mlp.fc1.weight"].T + t[p + ".mlp.fc1.bias"]
        h = F.gelu(h)
        h = h @ t[p + ".mlp.fc2.weight"].T + t[p + ".mlp.fc2.bias"]
        x = x + t[p + ".ls2.gamma"] * h
    return ln(x, "norm")


def build_jax_model(sd):
    from flax import nnx

    from m3l_tpu.models.dinov2_interop import DINOv2Backbone, load_torch_dinov2_state

    model = DINOv2Backbone(
        img_size=(IMG, IMG), patch_size=PATCH, embed_dim=D, depth=DEPTH, num_heads=H,
        num_register_tokens=REG, rngs=nnx.Rngs(0),
    )
    n_loaded = load_torch_dinov2_state(model, sd)
    expected = sum(v.size for v in sd.values())
    assert n_loaded == expected, (n_loaded, expected)
    return model


def test_forward_parity_native_grid():
    rng = np.random.default_rng(0)
    sd = make_torch_state(rng)
    model = build_jax_model(sd)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32) * 0.5
    out = model.forward_features(x)
    jax_seq = np.concatenate(
        [out["x_norm_clstoken"][:, None], out["x_norm_regtokens"], out["x_norm_patchtokens"]], axis=1
    )
    ref = torch_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), IMG).numpy()
    np.testing.assert_allclose(jax_seq, ref, atol=1e-5, rtol=1e-4)


def test_forward_parity_interpolated_grid():
    """Different input size -> bicubic pos-embed interpolation. torch and jax
    bicubic kernels differ (a=-0.75 vs Keys), so parity here is feature-level
    (cosine > 0.99), not bitwise — still catches any layout/transpose bug."""
    rng = np.random.default_rng(1)
    sd = make_torch_state(rng)
    model = build_jax_model(sd)
    img2 = 84  # 6x6 grid
    x = rng.normal(size=(2, img2, img2, 3)).astype(np.float32) * 0.5
    out = model.forward_features(x)
    jax_seq = np.concatenate(
        [out["x_norm_clstoken"][:, None], out["x_norm_regtokens"], out["x_norm_patchtokens"]], axis=1
    )
    ref = torch_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), img2).numpy()
    cos = np.sum(jax_seq * ref, -1) / (np.linalg.norm(jax_seq, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-8)
    assert cos.min() > 0.99, cos.min()


def test_seg_head_numerics():
    """Linear seg head: BN(frozen stats) + 1x1 conv vs a torch mirror."""
    from flax import nnx

    from m3l_tpu.models.dinov2_interop import DINOv2LinearSegHead, load_torch_linear_seg_head

    rng = np.random.default_rng(2)
    n_cls = 7
    sd = {
        "decode_head.bn.weight": rng.normal(size=D).astype(np.float32),
        "decode_head.bn.bias": rng.normal(size=D).astype(np.float32),
        "decode_head.bn.running_mean": rng.normal(size=D).astype(np.float32),
        "decode_head.bn.running_var": np.abs(rng.normal(size=D)).astype(np.float32) + 0.5,
        "decode_head.conv_seg.weight": rng.normal(size=(n_cls, D, 1, 1)).astype(np.float32),
        "decode_head.conv_seg.bias": rng.normal(size=n_cls).astype(np.float32),
    }
    head = DINOv2LinearSegHead(embed_dim=D, num_classes=n_cls, rngs=nnx.Rngs(0))
    load_torch_linear_seg_head(head, {"state_dict": sd})
    x = rng.normal(size=(2, 9, D)).astype(np.float32)
    got = np.asarray(head(x))
    xt = torch.from_numpy(x)
    bn = F.batch_norm(
        xt.reshape(-1, D),
        torch.from_numpy(sd["decode_head.bn.running_mean"]),
        torch.from_numpy(sd["decode_head.bn.running_var"]),
        torch.from_numpy(sd["decode_head.bn.weight"]),
        torch.from_numpy(sd["decode_head.bn.bias"]),
        training=False,
        eps=1e-5,
    )
    ref = (bn @ torch.from_numpy(sd["decode_head.conv_seg.weight"][:, :, 0, 0]).T + torch.from_numpy(sd["decode_head.conv_seg.bias"])).reshape(2, 9, n_cls).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
