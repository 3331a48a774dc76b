"""vt_load packing parity against a numpy transliteration of the reference
algorithm (reference utils/pretrain_utils.py:7-57, NCHW) — our NHWC output
must contain the same values."""
import numpy as np

from m3l_tpu.utils.obs import vt_load


def reference_vt_load_nchw(x, frame_stack=1):
    out = {}
    if "image" in x:
        img = x["image"]
        if img.ndim == 3:
            img = img[None]
        out["image"] = np.transpose(img, (0, 3, 1, 2)).astype(np.float32)  # [0,1] norm = identity
    if "tactile" in x:
        tac = x["tactile"].astype(np.float32)
        if tac.ndim == 3:
            tac = tac[None]
        n_tactiles = tac.shape[1] // frame_stack
        idx = []
        for i in range(frame_stack):
            idx += [i * n_tactiles + 0, i * n_tactiles + 1, i * n_tactiles + 2]
        idx = np.array(idx)
        n_sensors = n_tactiles // 3
        for k in range(n_sensors):
            out[f"tactile{k + 1}"] = (tac[:, idx + 3 * k] - (-1.0)) / 2.0
    return out


def test_vt_load_matches_reference_values():
    rng = np.random.default_rng(0)
    fs = 4
    obs = {
        "image": rng.random((2, 64, 64, 3 * fs), dtype=np.float32),
        "tactile": rng.uniform(-1, 1, (2, 6 * fs, 32, 32)).astype(np.float32),
    }
    ours = vt_load(dict(obs), frame_stack=fs)
    ref = reference_vt_load_nchw(dict(obs), frame_stack=fs)
    # image: ref NCHW vs ours NHWC
    np.testing.assert_allclose(np.asarray(ours["image"]), np.transpose(ref["image"], (0, 2, 3, 1)), rtol=1e-6)
    for k in ["tactile1", "tactile2"]:
        np.testing.assert_allclose(np.asarray(ours[k]), np.transpose(ref[k], (0, 2, 3, 1)), rtol=1e-6)


def test_vt_load_5d_framestack_layouts():
    rng = np.random.default_rng(1)
    fs = 4
    img5 = rng.random((3, fs, 64, 64, 3), dtype=np.float32)
    tac5 = rng.uniform(-1, 1, (3, fs, 6, 32, 32)).astype(np.float32)
    ours = vt_load({"image": img5, "tactile": tac5}, frame_stack=fs)
    assert ours["image"].shape == (3, 64, 64, 12)
    assert ours["tactile1"].shape == (3, 32, 32, 12)
    # reference path: image permute(0,2,3,1,4).reshape; tactile reshape(B,fs*C,H,W)
    img4 = np.transpose(img5, (0, 2, 3, 1, 4)).reshape(3, 64, 64, fs * 3)
    tac4 = tac5.reshape(3, fs * 6, 32, 32)
    ref = reference_vt_load_nchw({"image": img4, "tactile": tac4}, frame_stack=fs)
    np.testing.assert_allclose(np.asarray(ours["image"]), np.transpose(ref["image"], (0, 2, 3, 1)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["tactile2"]), np.transpose(ref["tactile2"], (0, 2, 3, 1)), rtol=1e-6)


def test_vt_load_single_sensor_and_prepacked():
    rng = np.random.default_rng(2)
    obs = {"tactile": rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)}
    ours = vt_load(dict(obs), frame_stack=1)
    assert set(ours) == {"tactile1"}
    pre = {"tactile1": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)}
    ours2 = vt_load(dict(pre))
    assert np.asarray(ours2["tactile1"]).min() >= 0.0
