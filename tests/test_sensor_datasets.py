"""Sensor-specific loaders over synthetic pickled buffers
(reference tactile_ssl/data/digit/utils.py, digit_ycbslide.py,
gelsight_grasp.py, vision_based_forces_slip_probes.py)."""
import os
import pickle

import cv2
import numpy as np
import pytest

from m3l_tpu.data import (
    DigitYCBSlideDataset,
    GelsightGraspDataset,
    VisionForceSlipDataset,
    compute_diff,
    load_dataset_forces,
    load_feeling_success,
    load_dataset_poses,
    load_sample_from_buf,
    load_textile_dataset,
    resize_image,
)


def _png_bytes(img: np.ndarray) -> bytes:
    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    return buf.tobytes()


def _rand_img(rng, h=40, w=30):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_compute_diff_offset():
    a = np.full((4, 4, 3), 200, np.uint8)
    b = np.full((4, 4, 3), 100, np.uint8)
    d = compute_diff(a, b, offset=0.5)
    # (200-100)/255 + 0.5 = 0.892 -> 227
    assert abs(int(d[0, 0, 0]) - int((100 / 255 + 0.5) * 255)) <= 1
    # clipped at 0 for negative diffs without offset
    assert compute_diff(b, a, offset=0.0).max() == 0


def test_load_sample_from_buf_conventions():
    rng = np.random.default_rng(0)
    # landscape frame: rotated to portrait, then 4:3 center crop
    img = _rand_img(rng, h=30, w=40)
    out = load_sample_from_buf(_png_bytes(img))
    h, w, _ = out.shape
    assert h >= w  # portrait
    assert abs(h / w - 4 / 3) < 0.05
    # background diff applied before rotation
    bg = img.copy()
    out_bg = load_sample_from_buf(img, bg)
    mid = np.uint8(np.clip(0.5, 0, 1) * 255)
    assert np.all(np.abs(out_bg.astype(int) - int(mid)) <= 1)


def test_resize_image_range():
    rng = np.random.default_rng(0)
    out = resize_image(_rand_img(rng), (16, 16))
    assert out.shape == (16, 16, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_digit_ycbslide_dataset(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(8):
        cv2.imwrite(str(tmp_path / f"frame_{i:04d}.jpg"), _rand_img(rng, 40, 30))
    ds = DigitYCBSlideDataset(str(tmp_path), d_frames=2, img_sz=(32, 32))
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape == (32, 32, 6)  # 2 frames channel-concat
    assert item["image"].dtype == np.float32
    # with all augmentations forced on, shapes still hold
    ds_aug = DigitYCBSlideDataset(str(tmp_path), d_frames=2, img_sz=(32, 32), p_flip=1.0, p_crop=1.0, p_rot=1.0)
    assert ds_aug[1]["image"].shape == (32, 32, 6)


def test_gelsight_grasp_dataset(tmp_path):
    rng = np.random.default_rng(0)
    n = 4
    data = {"is_gripping": [0, 1, 1, 0]}
    for sensor in ("gelsightA", "gelsightB"):
        for phase in ("before", "during", "after"):
            data[f"{sensor}_{phase}"] = [_png_bytes(_rand_img(rng)) for _ in range(n)]
    with open(tmp_path / "001.pkl", "wb") as f:
        pickle.dump(data, f)
    loaded = load_feeling_success(str(tmp_path), 1)
    ds = GelsightGraspDataset(loaded, out_format="concat_ch_img", img_sz=(32, 32))
    assert len(ds) == 4
    item = ds[1]
    assert item["image"].shape == (32, 32, 6)
    assert item["grasp_label"] == 1
    ds_vid = GelsightGraspDataset(loaded, out_format="video", num_frames=4, img_sz=(32, 32))
    assert ds_vid[0]["image"].shape == (4, 32, 32, 3)
    ds_single = GelsightGraspDataset(loaded, out_format="single_image", img_sz=(32, 32))
    assert ds_single[0]["image"].shape == (32, 32, 3)


def _force_slip_fixture(tmp_path, rng):
    n_frames = 24
    frames = [_png_bytes(_rand_img(rng)) for _ in range(n_frames)]
    os.makedirs(tmp_path / "traj0", exist_ok=True)
    with open(tmp_path / "traj0" / "dataset_digit_00.pkl", "wb") as f:
        pickle.dump(frames[:12], f)
    with open(tmp_path / "traj0" / "dataset_digit_01.pkl", "wb") as f:
        pickle.dump(frames[12:], f)
    trajectories = {
        "t0": {
            "indexes": np.arange(0, 12),
            "forces": rng.normal(size=(12, 3)).astype(np.float32) * 3,
            "slip_label": np.array([0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0]),
        },
        "t1": {
            "indexes": np.arange(12, 24),
            "forces": rng.normal(size=(12, 3)).astype(np.float32) * 3,
            "slip_label": np.zeros(12, int),
        },
    }
    labels = {"in_contact": np.ones(n_frames, int), "trajectories": trajectories}
    with open(tmp_path / "traj0" / "dataset_slip_forces.pkl", "wb") as f:
        pickle.dump(labels, f)
    return labels


def test_vision_force_slip_dataset(tmp_path):
    rng = np.random.default_rng(0)
    _force_slip_fixture(tmp_path, rng)
    frames, force_slip = load_dataset_forces(str(tmp_path), "traj0", "digit")
    assert len(frames) == 24
    ds = VisionForceSlipDataset(
        frames,
        force_slip["trajectories"],
        slip_horizon=2,
        num_frames=2,
        frame_stride=1,
        img_sz=(32, 32),
        max_abs_force=(5.0, 5.0, 5.0),
        max_delta_force=(2.0, 2.0, 2.0),
    )
    # 2 trajectories x (12 - 5 settling frames)
    assert len(ds) == 14
    item = ds[0]
    assert item["image"].shape == (32, 32, 6)
    assert item["force"].shape == (3,) and np.abs(item["force"]).max() <= 1.0
    assert item["delta_force"].shape == (3,) and np.abs(item["delta_force"]).max() <= 1.0
    assert item["slip_category_label"] in ("slip", "no_slip")
    # horizon debounce: sample 0 of t0 sees slip at t=5 only with horizon>=5;
    # slip events at raw positions 5,6 -> after the 5-frame skip, sample 0
    # (raw 5... wait labels index the trajectory's own slip array directly)
    labels = [ds[i]["slip_label"] for i in range(7)]
    assert any(labels), "expected at least one slip within horizons"
    # t1 has no slips at all
    assert all(ds[i]["slip_label"] == 0 for i in range(7, 14))


def test_pose_and_textile_loaders(tmp_path):
    rng = np.random.default_rng(0)
    data = {
        "digit_left": [_png_bytes(_rand_img(rng)) for _ in range(5)],
        "object_left_rel_pose_n2": rng.normal(size=(6, 7)).astype(np.float32),
    }
    with open(tmp_path / "pose_ds.pkl", "wb") as f:
        pickle.dump(data, f)
    frames, poses = load_dataset_poses(str(tmp_path), "pose_ds", "left", 2)
    assert len(frames) == len(poses) == 5

    os.makedirs(tmp_path / "textile0")
    with open(tmp_path / "textile0" / "dataset_gelsight.pkl", "wb") as f:
        pickle.dump({"frames": [1, 2, 3]}, f)
    (tmp_path / "textile0" / "metadata.txt").write_text("cotton")
    data, meta = load_textile_dataset(str(tmp_path), "textile0")
    assert meta == "cotton" and data["frames"] == [1, 2, 3]


def test_digit_slip_dataset(tmp_path):
    from m3l_tpu.data import DigitSlipDataset
    from m3l_tpu.data.sensors import DIGIT_SLIP_LABELS

    rng = np.random.default_rng(4)
    n = 12
    for i in range(n):
        img = _rand_img(rng, h=32, w=24)
        cv2.imwrite(str(tmp_path / f"frame_{i:04d}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    labels = rng.integers(0, 5, n)
    ds = DigitSlipDataset(str(tmp_path), labels, d_frames=2, img_sz=(32, 32))
    assert len(ds) == n - 4
    item = ds[0]
    # two frames channel-concatenated (digit_slip.py:38-42)
    assert item["image"].shape == (32, 32, 6)
    assert item["label"] == int(labels[2])
    assert item["category_label"] == DIGIT_SLIP_LABELS[item["label"]]
    # markers mode: single frame + sequence-start reference, no bg diff
    ds_m = DigitSlipDataset(str(tmp_path), labels, d_frames=2, img_sz=(32, 32), with_markers=True)
    assert ds_m.bg is None
    assert ds_m[0]["image"].shape == (32, 32, 6)


def test_forcefield_ssl_dataset():
    from m3l_tpu.data import ForceFieldSSLDataset

    rng = np.random.default_rng(5)
    frames = [_png_bytes(_rand_img(rng, h=40, w=30)) for _ in range(8)]
    bg = _rand_img(rng, h=40, w=30)
    ds = ForceFieldSSLDataset(frames, bg=bg, num_frames=2, frame_stride=2, img_sz=(64, 64))
    item = ds[0]
    # window concat + current-frame/background pair (vision_tactile_forcefield.py:93-138)
    assert item["image"].shape == (64, 64, 6)
    assert item["image_bg"].shape == (64, 64, 6)
    # the first half of image_bg is the window's current frame
    np.testing.assert_allclose(item["image_bg"][..., :3], item["image"][..., :3])
    vid = ForceFieldSSLDataset(frames, bg=None, num_frames=3, out_format="video", img_sz=(32, 32))[1]
    assert vid["image"].shape == (3, 32, 32, 3)
    single = ForceFieldSSLDataset(frames, bg=None, out_format="single_image", img_sz=(32, 32))[1]
    assert single["image"].shape == (32, 32, 3)
