import numpy as np

from gps_slam_tpu.config import Config
from gps_slam_tpu.data import synthetic
from gps_slam_tpu.data.reader import DatasetReader, RandomSelector


def test_synthetic_render_consistency(synthetic_cams):
    cam = synthetic_cams[0]
    assert cam.image.shape == (120, 160, 3)
    assert cam.depth.shape == (120, 160, 1)
    assert np.all(cam.depth > 0.1)
    # depth should be bounded by the room diagonal
    assert float(cam.depth.max()) < np.linalg.norm(synthetic.ROOM) + 1e-3


def test_synthetic_depth_reprojection(synthetic_cams):
    """Back-projecting frame A's depth into world and reprojecting into
    frame B must land on pixels with consistent depth (exact geometry)."""
    a, b = synthetic_cams[0], synthetic_cams[1]
    H, W = a.depth.shape[:2]
    i, j = np.meshgrid(np.arange(W), np.arange(H))
    pts_c = np.stack(
        [(i - a.cx) / a.fx, (j - a.cy) / a.fy, np.ones_like(i, dtype=np.float32)], -1
    ) * a.depth
    pts_w = pts_c.reshape(-1, 3) @ a.c2w[:3, :3].T + a.c2w[:3, 3]
    w2c_b = np.linalg.inv(b.c2w)
    pts_b = pts_w @ w2c_b[:3, :3].T + w2c_b[:3, 3]
    u = pts_b[:, 0] / pts_b[:, 2] * b.fx + b.cx
    v = pts_b[:, 1] / pts_b[:, 2] * b.fy + b.cy
    valid = (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1) & (pts_b[:, 2] > 0.05)
    ui, vi = u[valid].round().astype(int), v[valid].round().astype(int)
    db = b.depth[vi, ui, 0]
    # most points should agree (occlusions cause a tail)
    err = np.abs(db - pts_b[valid, 2])
    assert np.median(err) < 0.02


def test_dataset_roundtrip(tmp_path):
    out = str(tmp_path / "scene")
    reader_node = synthetic.write_dataset(out, n_frames=4, width=80, height=60)
    cfg = Config.from_dict(synthetic.default_config_dict(out, reader_node))
    reader = DatasetReader(cfg.reader)
    reader.read()
    assert len(reader.train_vec) == 4
    cam = reader.train_vec[0]
    assert cam.image.shape == (60, 80, 3)
    assert cam.depth.shape == (60, 80, 1)
    # frame 0 must be rebased to identity
    np.testing.assert_allclose(cam.c2w, np.eye(4), atol=1e-5)
    # relative pose between frames preserved by rebasing
    mem = synthetic.make_cameras(4, 80, 60)
    rel_ref = np.linalg.inv(mem[0].c2w) @ mem[2].c2w
    rel_read = np.linalg.inv(reader.train_vec[0].c2w) @ reader.train_vec[2].c2w
    np.testing.assert_allclose(rel_ref, rel_read, atol=1e-4)
    # depth survives the png quantization
    np.testing.assert_allclose(cam.depth, mem[0].depth, atol=2e-3)
    reader.update_scene_geo()
    assert reader.scene_scale > 0

    # pose export
    reader.save_pose(str(tmp_path / "poses"))
    import os

    assert len(os.listdir(tmp_path / "poses")) == 4


def test_random_selector():
    sel = RandomSelector(list("abcde"))
    seen = [sel.get_next()[0] for _ in range(10)]
    # two full epochs, each a permutation
    assert sorted(seen[:5]) == list("abcde")
    assert sorted(seen[5:]) == list("abcde")


def test_disparity_depth_mode(tmp_path):
    """kinect_disparity decoding recovers metric depth from raw disparity
    (ConvertDisparityToDepth parity: depth = 8*c2*fx/(c1 - raw))."""
    import cv2

    from gps_slam_tpu.data.reader import disparity_to_depth

    out = str(tmp_path / "scene")
    reader_node = synthetic.write_dataset(out, n_frames=2, width=80, height=60)
    cfg0 = Config.from_dict(synthetic.default_config_dict(out, reader_node))
    r0 = DatasetReader(cfg0.reader)
    r0.read()
    ref = [c.depth.copy() for c in r0.train_vec]
    fx = cfg0.reader.intrinsics[0]
    # c2 large enough that u16 disparity quantization stays sub-mm over
    # the scene's 1-2 m depth range (err ~ depth^2/(8*c2*fx) * 0.5)
    c1, c2 = 40000.0, 8.0
    # re-encode every depth png as raw disparity
    import os

    ddir = os.path.join(out, reader_node["depth_path"])
    for f in sorted(os.listdir(ddir)):
        p = os.path.join(ddir, f)
        raw16 = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        depth = raw16.astype(np.float64) / cfg0.reader.depth_scale
        with np.errstate(divide="ignore"):
            disp = np.where(depth > 0, c1 - 8.0 * c2 * fx / np.maximum(depth, 1e-9), 0)
        cv2.imwrite(p, np.clip(disp, 0, 65535).astype(np.uint16))

    node = dict(reader_node)
    node["depth_mode"] = "kinect_disparity"
    node["disparity_calib"] = [c1, c2]
    cfg = Config.from_dict(synthetic.default_config_dict(out, node))
    assert cfg.reader.depth_mode == "kinect_disparity"
    r1 = DatasetReader(cfg.reader)
    r1.read()
    for got, want in zip((c.depth for c in r1.train_vec), ref):
        mask = want > 0.05
        err = np.abs(got - want)[mask]
        assert err.mean() < 5e-3, err.mean()  # disparity-quantization noise
