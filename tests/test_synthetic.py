"""Synthetic DIGIT-style generator: label recoverability + windowing."""
import numpy as np

from m3l_tpu.data.synthetic import synth_digit_trajectories, windowed_probe_samples


def test_shapes_and_rates():
    d = synth_digit_trajectories(10, 40, seed=0)
    assert d["frames"].shape == (400, 96, 96, 3) and d["frames"].dtype == np.uint8
    assert d["force"].shape == (400, 3)
    assert 0.05 < d["slip"].mean() < 0.7
    assert d["in_contact"].mean() > 0.5
    w = windowed_probe_samples(d, 2)
    assert w["image"].shape[-1] == 6
    # windows never straddle trajectories
    assert len(w["image"]) == 400 - 10


def test_force_linearly_decodable_from_pixels():
    """The observation model must make force recoverable. A position-blind
    ridge regression over background-differenced pooled pixels (the DIGIT
    pipeline's bg removal, reference digit/utils.py:51-58) is a weak LOWER
    bound on what a conv/ViT probe can read out — it must still correlate
    clearly per axis, else the transfer experiment would be testing noise."""
    d = synth_digit_trajectories(40, 40, seed=1)
    frames = d["frames"].astype(np.float32) / 255.0
    tid = d["traj_id"]
    diff = np.empty_like(frames)
    for t in np.unique(tid):
        m = tid == t
        diff[m] = frames[m] - np.median(frames[m], axis=0)
    mask = d["in_contact"] > 0
    imgs, f = diff[mask], d["force"][mask]
    b, h, w, c = imgs.shape
    pool = lambda a: a.reshape(b, 12, h // 12, 12, w // 12, c).mean((2, 4)).reshape(b, -1)
    pooled = np.concatenate([pool(imgs), pool(np.abs(imgs)), np.ones((b, 1), np.float32)], axis=1)
    n_train = int(0.8 * b)
    A, y = pooled[:n_train], f[:n_train]
    wls = np.linalg.lstsq(A.T @ A + 1e-3 * np.eye(A.shape[1]), A.T @ y, rcond=None)[0]
    pred = pooled[n_train:] @ wls
    gt = f[n_train:]
    for i in range(3):
        r = np.corrcoef(pred[:, i], gt[:, i])[0, 1]
        assert r > 0.5, (i, r)


def test_slip_visible_in_two_frame_window():
    """Slip (patch motion) must be separable from stick using only 2-frame
    pixel differences: mean |frame_t - frame_{t-1}| inside the contact region
    should be materially larger for slip windows."""
    d = synth_digit_trajectories(40, 40, seed=2)
    w = windowed_probe_samples(d, 2)
    contact = w["in_contact"] > 0
    img = w["image"].astype(np.float32)
    diff = np.abs(img[..., 3:] - img[..., :3]).mean((1, 2, 3))
    slip_diff = diff[(w["slip"] == 1) & contact]
    stick_diff = diff[(w["slip"] == 0) & contact]
    assert slip_diff.mean() > 1.5 * stick_diff.mean(), (slip_diff.mean(), stick_diff.mean())


def test_texture_classes_decodable_from_orientation_energy():
    """textures=K weaves a class-keyed oriented grating into the background;
    the class must be recoverable from a global second-order statistic
    (FFT orientation-energy histogram, nearest centroid) but NOT from mean
    intensity — the invariance-friendly T6-textile analogue."""
    K = 4
    d = synth_digit_trajectories(48, 10, seed=5, textures=K)
    imgs = d["frames"].astype(np.float32).mean(-1)  # (N, H, W) gray
    labels = d["textile"]
    # orientation-energy features: FFT magnitude binned by angle
    N, H, W = imgs.shape
    f = np.abs(np.fft.fftshift(np.fft.fft2(imgs - imgs.mean((1, 2), keepdims=True)), axes=(1, 2)))
    yy, xx = np.mgrid[0:H, 0:W]
    ang = np.arctan2(yy - H // 2, xx - W // 2) % np.pi
    rad = np.hypot(yy - H // 2, xx - W // 2)
    sel = (rad > 4) & (rad < H // 2)
    nbins = 16
    bins = np.minimum((ang / np.pi * nbins).astype(int), nbins - 1)
    feats = np.zeros((N, nbins), np.float32)
    for b in range(nbins):
        m = sel & (bins == b)
        feats[:, b] = f[:, m].mean(1)
    feats /= feats.sum(1, keepdims=True)
    n_train = N // 2
    cents = np.stack([feats[:n_train][labels[:n_train] == k].mean(0) for k in range(K)])
    pred = np.argmin(((feats[n_train:, None] - cents[None]) ** 2).sum(-1), axis=1)
    acc = (pred == labels[n_train:]).mean()
    assert acc > 0.8, acc
    # mean intensity must NOT separate the classes (guards against a
    # brightness shortcut any probe would exploit)
    mean_int = imgs.mean((1, 2))
    cents_i = np.array([mean_int[:n_train][labels[:n_train] == k].mean() for k in range(K)])
    pred_i = np.argmin(np.abs(mean_int[n_train:, None] - cents_i[None]), axis=1)
    assert (pred_i == labels[n_train:]).mean() < 0.55
    # without textures the key is absent
    assert "textile" not in synth_digit_trajectories(2, 2, seed=0)


def test_feature_diag_windowing_matches_probe_windowing():
    # scripts/feature_diag.py re-derives the probe windows WITH traj_id (the
    # shared helper drops it); the episode-vs-texture diagnosis is only valid
    # if its windows are bit-identical to what the probes trained/tested on.
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "feature_diag", os.path.join(os.path.dirname(__file__), "..", "scripts", "feature_diag.py")
    )
    fd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fd)

    data = synth_digit_trajectories(4, 7, seed=3, textures=3)
    ref = windowed_probe_samples(data, 2)
    win, tex, tid = fd.windowed_with_traj(data, 2)
    np.testing.assert_array_equal(win, ref["image"])
    np.testing.assert_array_equal(tex, ref["textile"])
    # traj ids are constant within each window's span and label frames
    assert win.shape[0] == tid.shape[0]
    assert set(np.unique(tid)) <= set(range(4))


def test_effective_rank_detects_collapse():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "feature_diag", os.path.join(os.path.dirname(__file__), "..", "scripts", "feature_diag.py")
    )
    fd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fd)

    rng = np.random.default_rng(0)
    iso = rng.normal(size=(512, 64)).astype(np.float32)
    assert fd.effective_rank(iso) > 50
    collapsed = np.outer(rng.normal(size=512), rng.normal(size=64)).astype(np.float32)
    assert fd.effective_rank(collapsed) < 2.5


def test_pose_and_grasp_labels():
    """T3/T4 synthetic labels (VERDICT r4 #5): pose bins cover their ranges
    and track the recorded blob position; grasp = firm non-slipping contact."""
    d = synth_digit_trajectories(10, 40, seed=0)
    assert d["pos"].shape == (400, 2)
    w = windowed_probe_samples(d, 2, pose_bins=10)
    for k in ("pose_x", "pose_y", "pose_theta", "grasp"):
        assert w[k].shape == (len(w["image"]),)
    for h in ("pose_x", "pose_y", "pose_theta"):
        assert w[h].min() >= 0 and w[h].max() <= 9
    # bins are monotone in position: recompute from the recorded pos
    span_idx = np.arange(1, 400)
    ok = d["traj_id"][span_idx] == d["traj_id"][span_idx - 1]
    pos = d["pos"][span_idx][ok]
    expect_x = np.clip((pos[:, 0] - 0.15) / 0.7, 0, 1 - 1e-6) * 10
    np.testing.assert_array_equal(w["pose_x"], expect_x.astype(np.int64))
    # grasp label consistency + both classes present
    f = w["force"]
    np.testing.assert_array_equal(w["grasp"], ((f[:, 2] >= 0.45) & (w["slip"] == 0)).astype(np.int64))
    assert 0.1 < w["grasp"].mean() < 0.9
    # gripping implies contact (pixel-recoverable: a blob is visible)
    assert (w["in_contact"][w["grasp"] == 1] == 1).all()


def test_pose_position_decodable_from_pixels():
    """Blob position must be recoverable from pixels in contact: the
    intensity-minimum (indentation darkening) location tracks pos."""
    d = synth_digit_trajectories(6, 30, seed=1)
    mask = (d["in_contact"] > 0.5) & (d["force"][:, 2] > 0.3)
    frames, pos = d["frames"][mask], d["pos"][mask]
    errs = []
    for fr, p in zip(frames[:80], pos[:80]):
        g = fr.astype(np.float32).mean(-1)
        yx = np.unravel_index(np.argmin(g), g.shape)
        errs.append(np.hypot(yx[1] / 96 - p[0], yx[0] / 96 - p[1]))
    assert np.median(errs) < 0.08, np.median(errs)


def test_forcefield_windows_format():
    """ForceFieldSSL sample format (reference vision_tactile_forcefield.py:
    93-138): image = [frame_0, frame_{-1}], image_bg = [frame_0, bg];
    contact mask covers the blob when in contact."""
    from m3l_tpu.data.synthetic import forcefield_windows

    d = synth_digit_trajectories(5, 20, seed=2)
    w = forcefield_windows(d)
    m = len(w["image"])
    assert m == 5 * 20 - 5
    assert w["image"].shape == (m, 96, 96, 6) and w["image"].dtype == np.uint8
    assert w["image_bg"].shape == (m, 96, 96, 6)
    # first 3 channels of image and image_bg are the SAME current frame
    np.testing.assert_array_equal(w["image"][..., :3], w["image_bg"][..., :3])
    # image's second half is the PREVIOUS frame
    idx = np.arange(1, 100)
    idx = idx[d["traj_id"][idx] == d["traj_id"][idx - 1]]
    np.testing.assert_array_equal(w["image"][..., 3:], d["frames"][idx - 1])
    # bg half is constant within a trajectory
    tid = d["traj_id"][idx]
    first = np.searchsorted(tid, tid)
    np.testing.assert_array_equal(w["image_bg"][..., 3:], w["image_bg"][first][..., 3:])
    # mask nonzero iff in contact (blob present), and localized (not full-frame)
    frac = w["mask"].mean((1, 2))
    contact = w["in_contact"] > 0.5
    assert (frac[contact] > 0.002).all()
    assert frac.max() < 0.5
