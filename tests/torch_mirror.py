"""Minimal torch mirror of the VTMAE math for cross-framework parity tests.

Written from scratch against the SAME contracts the JAX implementation
documents (patch layout (p1 p2 c), pre-norm vit blocks with exact GELU and
eps-1e-5 LayerNorms, PositionalEncoding2D-layout tables, tactile x10 loss,
early-conv all-patch loss). Weights are TRANSPLANTED from the JAX model and
mask permutations are INJECTED, so a loss match is a genuine statement about
the math, not the RNG (SURVEY.md §7 hard-part #3: parity via injectable mask
indices, not identical RNG streams).

Test-only helper — not part of the framework (the framework is torch-free).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TorchMirrorVTMAE:
    """Functional mirror operating directly on a dict of numpy weights keyed
    by the JAX model's flattened parameter paths."""

    def __init__(self, params: dict, config, *, masking_ratio: float, early_conv: bool, decoder_depth: int, decoder_heads: int, dim_head: int = 64):
        self.p = {k: t(v) for k, v in params.items()}
        self.c = config
        self.masking_ratio = masking_ratio
        self.early_conv = early_conv
        self.decoder_depth = decoder_depth
        self.decoder_heads = decoder_heads
        self.dim_head = dim_head

    # --- primitives --- #
    def linear(self, x, prefix):
        w = self.p[f"{prefix}/kernel"]  # jax (in, out)
        b = self.p.get(f"{prefix}/bias")
        y = x @ w
        return y + b if b is not None else y

    def layernorm(self, x, prefix, eps=1e-5):
        mean = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        xn = (x - mean) / torch.sqrt(var + eps)
        return xn * self.p[f"{prefix}/scale"] + self.p[f"{prefix}/bias"]

    def conv2d(self, x, prefix, stride, padding):
        # jax kernel HWIO -> torch OIHW
        w = self.p[f"{prefix}/kernel"].permute(3, 2, 0, 1)
        b = self.p[f"{prefix}/bias"]
        return F.conv2d(x, w, b, stride=stride, padding=padding)

    def attention(self, x, prefix, heads):
        bsz, n, _ = x.shape
        h = self.layernorm(x, f"{prefix}/norm")
        qkv = h @ self.p[f"{prefix}/to_qkv/kernel"]
        qkv = qkv.reshape(bsz, n, 3, heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = torch.einsum("bnhd,bmhd->bhnm", q, k) * self.dim_head**-0.5
        a = torch.softmax(scores, dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(bsz, n, heads * self.dim_head)
        if f"{prefix}/to_out/kernel" in self.p:
            out = self.linear(out, f"{prefix}/to_out")
        return out

    def feedforward(self, x, prefix):
        h = self.layernorm(x, f"{prefix}/norm")
        h = F.gelu(self.linear(h, f"{prefix}/fc1"), approximate="none")
        return self.linear(h, f"{prefix}/fc2")

    def transformer(self, x, prefix, depth, heads):
        for i in range(depth):
            x = x + self.attention(x, f"{prefix}/blocks/{i}/0", heads)
            x = x + self.feedforward(x, f"{prefix}/blocks/{i}/1")
        return self.layernorm(x, f"{prefix}/norm")

    def early_cnn(self, x_nhwc, prefix, kind):
        x = x_nhwc.permute(0, 3, 1, 2)
        x = F.relu(self.conv2d(x, f"{prefix}/conv1", 2, 1))
        x = F.relu(self.conv2d(x, f"{prefix}/conv2", 2, 1))
        x = F.relu(self.conv2d(x, f"{prefix}/conv3", 2 if kind == "image" else 1, 1))
        x = self.conv2d(x, f"{prefix}/conv4", 1, 0)
        return x.flatten(2).transpose(1, 2)

    @staticmethod
    def patchify(x_nhwc, ph, pw):
        b, h, w, c = x_nhwc.shape
        x = x_nhwc.reshape(b, h // ph, ph, w // pw, pw, c)
        x = x.permute(0, 1, 3, 2, 4, 5)
        return x.reshape(b, (h // ph) * (w // pw), ph * pw * c)

    # --- forward loss with injected masks --- #
    def forward_loss(self, batch: dict, masked_idx: np.ndarray, unmasked_idx: np.ndarray, pos_tables: dict) -> float:
        c = self.c
        img = t(batch["image"])
        tacs = [t(batch[f"tactile{i + 1}"]) for i in range(c.num_tactiles)]
        image_patches = self.patchify(img, c.image_patch_size, c.image_patch_size)
        tactile_patches = torch.cat([self.patchify(x, c.tactile_patch_size, c.tactile_patch_size) for x in tacs], dim=1)
        n_img = image_patches.shape[1]

        if self.early_conv:
            img_tok = self.early_cnn(img, "early_conv_vision", "image")
            tac_tok = torch.cat([self.early_cnn(x, "early_conv_tactile", "tactile") for x in tacs], dim=1)
        else:
            raise NotImplementedError("parity test uses the early-conv flagship path")

        mod = self.p["encoder_modality_embedding/embedding"]
        img_tok = img_tok + mod[0] + t(pos_tables["img_enc"])
        nt = tac_tok.shape[1] // c.num_tactiles
        for i in range(c.num_tactiles):
            tac_tok[:, i * nt : (i + 1) * nt] += mod[1 + i]
        tac_tok = tac_tok + t(pos_tables["tac_enc"])
        tokens = torch.cat([img_tok, tac_tok], dim=1)

        bsz = tokens.shape[0]
        ar = torch.arange(bsz)[:, None]
        um = torch.from_numpy(unmasked_idx).long()
        mm = torch.from_numpy(masked_idx).long()
        kept = tokens[ar, um]
        encoded = self.transformer(kept, "encoder/transformer", depth=c.depth, heads=c.heads)

        dec = encoded  # enc_to_dec is identity when dims match
        full = torch.zeros(bsz, tokens.shape[1], dec.shape[-1])
        full[ar, um] = dec
        full[ar, mm] = self.p["mask_token"]
        dmod = self.p["decoder_modality_embedding/embedding"]
        di = full[:, :n_img] + dmod[0] + t(pos_tables["img_dec"])
        dt_ = full[:, n_img:]
        for i in range(c.num_tactiles):
            dt_[:, i * nt : (i + 1) * nt] += dmod[1 + i]
        dt_ = dt_ + t(pos_tables["tac_dec"])
        full = torch.cat([di, dt_], dim=1)
        decoded = self.transformer(full, "decoder", depth=self.decoder_depth, heads=self.decoder_heads)

        pred_img = self.linear(decoded[:, :n_img], "to_pixels")
        pred_tac = self.linear(decoded[:, n_img:], "to_tactiles")
        loss = 10.0 * F.mse_loss(pred_tac, tactile_patches) + F.mse_loss(pred_img, image_patches)
        return float(loss)


class TorchMirrorPolicy(TorchMirrorVTMAE):
    """Extends the mirror through the MAEExtractor + actor-critic heads
    (reference models/pretrain_models.py:819-923): unmasked get_embeddings ->
    depth-1 post transformer -> token mean-pool -> tanh MLP towers ->
    action mean / value."""

    def get_embeddings(self, batch: dict, pos_tables: dict) -> torch.Tensor:
        c = self.c
        img = t(batch["image"])
        tacs = [t(batch[f"tactile{i + 1}"]) for i in range(c.num_tactiles)]
        img_tok = self.early_cnn(img, "early_conv_vision", "image")
        tac_tok = torch.cat([self.early_cnn(x, "early_conv_tactile", "tactile") for x in tacs], dim=1)
        mod = self.p["encoder_modality_embedding/embedding"]
        img_tok = img_tok + mod[0] + t(pos_tables["img_enc"])
        nt = tac_tok.shape[1] // c.num_tactiles
        for i in range(c.num_tactiles):
            tac_tok[:, i * nt : (i + 1) * nt] += mod[1 + i]
        tac_tok = tac_tok + t(pos_tables["tac_enc"])
        tokens = torch.cat([img_tok, tac_tok], dim=1)
        return self.transformer(tokens, "encoder/transformer", depth=c.depth, heads=c.heads)

    def policy_heads(self, batch: dict, pos_tables: dict, post_depth: int = 1, post_heads: int = 4):
        emb = self.get_embeddings(batch, pos_tables)
        z = self.transformer(emb, "post", depth=post_depth, heads=post_heads)
        feats = z.mean(dim=1)
        h = feats
        for i in range(2):
            h = torch.tanh(self.linear(h, f"pi_mlp/layers/{i}"))
        mean = self.linear(h, "action_net")
        v = feats
        for i in range(2):
            v = torch.tanh(self.linear(v, f"vf_mlp/layers/{i}"))
        value = self.linear(v, "value_net")[:, 0]
        return mean, value
