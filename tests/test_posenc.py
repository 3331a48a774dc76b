"""Positional-table parity tests.

The sincos_2d layout contract is checked against an independent numpy
transliteration of the public PositionalEncoding2D algorithm (the library
the reference instantiates at models/pretrain_models.py:120)."""
import numpy as np

from m3l_tpu.ops.posenc import sincos_2d, sincos_nd


def reference_positional_encoding_2d(h, w, channels):
    ch = int(np.ceil(channels / 4) * 2)
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2) / ch))
    def get_emb(sin_inp):
        emb = np.stack((np.sin(sin_inp), np.cos(sin_inp)), axis=-1)
        return emb.reshape(*emb.shape[:-2], -1)
    pos_x = np.arange(h)
    pos_y = np.arange(w)
    sin_inp_x = np.einsum("i,j->ij", pos_x, inv_freq)
    sin_inp_y = np.einsum("i,j->ij", pos_y, inv_freq)
    emb_x = get_emb(sin_inp_x)[:, None, :]
    emb_y = get_emb(sin_inp_y)
    emb = np.zeros((h, w, ch * 2))
    emb[:, :, :ch] = emb_x
    emb[:, :, ch:] = emb_y
    return emb[:, :, :channels].reshape(h * w, channels)


def test_sincos_2d_matches_reference_layout():
    for (h, w, c) in [(8, 8, 256), (8, 8, 128), (4, 6, 96), (5, 3, 10)]:
        ours = np.asarray(sincos_2d(h, w, c))
        ref = reference_positional_encoding_2d(h, w, c)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_sincos_2d_distinct_positions():
    t = np.asarray(sincos_2d(8, 8, 256))
    # all 64 positions must be pairwise distinct
    d = np.linalg.norm(t[:, None] - t[None, :], axis=-1)
    assert (d + np.eye(64) * 1e3 > 1e-3).all()


def test_sincos_nd_shapes_and_range():
    t = np.asarray(sincos_nd((8, 8), 384))
    assert t.shape == (64, 384)
    assert np.abs(t).max() <= 1.0 + 1e-6
    t3 = np.asarray(sincos_nd((2, 4, 4), 192))
    assert t3.shape == (32, 192)
