"""Auxiliary subsystems: remote viewer protocol, fern relocalizer,
prefetcher, offline ges trainer."""

import json
import os
import socket
import struct
import threading

import jax.numpy as jnp
import numpy as np

from gps_slam_tpu.data import synthetic
from gps_slam_tpu.slam.relocalizer import FernRelocalizer
from gps_slam_tpu.viewer import server as vs


class _FakePipe:
    def __init__(self, cam):
        self.cam = cam

    def run_raycast_by_cam(self, cam, use_cam_depth):
        H, W = cam.height, cam.width
        return {
            "color_map": jnp.full((H, W, 3), 0.25),
            "depth_map": jnp.full((H, W, 1), 2.0),
        }


class _FakeModel:
    def forward(self, c2w, K, ref_depth, base_color):
        H, W = ref_depth.shape
        return {"rgb": jnp.full((H, W, 3), 0.5)}


def test_viewer_protocol_roundtrip():
    cams = synthetic.make_cameras(1, 64, 48)
    pipe, model = _FakePipe(cams[0]), _FakeModel()
    port = 16699
    t = threading.Thread(
        target=vs.serve, args=(pipe, model, port), kwargs={"max_requests": 1},
        daemon=True,
    )
    t.start()
    import time

    time.sleep(0.5)
    sock = socket.create_connection(("127.0.0.1", port), timeout=10)
    pose = np.eye(4, dtype=np.float32)
    msg = json.dumps({
        "fov_x": 1.0, "fov_y": 0.8, "resolution_x": 64, "resolution_y": 48,
        "pose": pose.T.reshape(-1).tolist(),
    }).encode()
    sock.sendall(struct.pack("<i", len(msg)) + msg)

    def read_exact(n):
        buf = b""
        while len(buf) < n:
            buf += sock.recv(n - len(buf))
        return buf

    imgs = []
    for _ in range(4):
        w, h = struct.unpack("<II", read_exact(8))
        data = read_exact(w * h * 3)
        imgs.append(np.frombuffer(data, np.uint8).reshape(h, w, 3))
    assert imgs[0].shape == (48, 64, 3)
    assert abs(int(imgs[0][0, 0, 0]) - 128) <= 1  # 0.5 gray render
    rot = np.frombuffer(read_exact(9 * 4), "<f4").reshape(3, 3)
    trans = np.frombuffer(read_exact(3 * 4), "<f4")
    (slen,) = struct.unpack("<I", read_exact(4))
    info = read_exact(slen).decode()
    mvp = np.frombuffer(read_exact(16 * 4), "<f4").reshape(4, 4)
    # SIBR convention: y/z columns negated
    np.testing.assert_allclose(rot, np.diag([1, -1, -1]), atol=1e-6)
    assert "viewer" in info
    sock.close()
    t.join(timeout=10)


def test_fern_relocalizer():
    cams = synthetic.make_cameras(8, 80, 60)
    reloc = FernRelocalizer(harvest_threshold=0.05)
    for cam in cams[:6]:
        reloc.process_frame(cam.depth, cam.c2w, tracking_good=True)
    assert reloc.num_keyframes >= 2
    # query with a stored frame's depth: must return (close to) its pose
    est = reloc.relocalize(cams[0].depth)
    assert est is not None
    np.testing.assert_allclose(est, cams[0].c2w, atol=1e-5)
    # untrusted tracking never harvests
    n = reloc.num_keyframes
    reloc.process_frame(cams[7].depth, cams[7].c2w, tracking_good=False)
    assert reloc.num_keyframes == n


def test_prefetcher_order():
    from gps_slam_tpu.data.prefetch import FramePrefetcher

    cams = synthetic.make_cameras(5, 32, 24)
    seen = []
    for cam, d, c in FramePrefetcher(cams, None, None):
        assert d.shape == (24, 32)
        assert c.shape == (24, 32, 3)
        seen.append(cam.id)
    assert seen == [0, 1, 2, 3, 4]


def test_offline_ges_trainer(tmp_path):
    from gps_slam_tpu.config import Config
    from gps_slam_tpu.gs import model as gmodel
    from gps_slam_tpu.gs.model import GaussianModel
    from gps_slam_tpu.slam.offline import OfflinePipeline

    cams = synthetic.make_cameras(2, 96, 72)
    node = {
        "input_dir": "x", "image_path": "c", "pose_path": "c", "depth_path": "d",
        "pcd_name": "n", "depth_scale": 6553.5, "scene_scale": 1.0,
        "start_frame": 0, "end_frame": 1, "frame_step": 1,
        "intrinsics": [cams[0].fx, cams[0].fy, cams[0].cx, cams[0].cy],
        "image_shape": [96, 72], "downscale_factor": 1, "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict(str(tmp_path), node)
    cfg_dict["PIPE"]["max_iterations"] = 25
    cfg = Config.from_dict(cfg_dict)
    model = GaussianModel(cfg, 96, 72)
    fm = cams[0].get_frame_maps()
    mask = jnp.zeros((72, 96), bool).at[::2, ::2].set(True)
    model.pool, _, _ = gmodel.add_gaussians(
        model.pool, fm["vertex_map"], fm["color_map"], fm["normal_map"], mask,
        0.5, 1024, 0.5, (-1.0, 0.05), model.next_rng(),
    )
    targets = [
        {"depth_map": jnp.zeros((72, 96, 1)), "color_map": jnp.zeros((72, 96, 3))}
        for _ in cams
    ]
    pipe = OfflinePipeline(cfg, str(tmp_path))
    l_before = float(
        jnp.abs(model.forward(cams[0].c2w, cams[0].K, targets[0]["depth_map"],
                              targets[0]["color_map"])["rgb"]
                - jnp.asarray(cams[0].image)).mean()
    )
    pipe.ges_train_cams(model, cams, targets)
    l_after = float(
        jnp.abs(model.forward(cams[0].c2w, cams[0].K, targets[0]["depth_map"],
                              targets[0]["color_map"])["rgb"]
                - jnp.asarray(cams[0].image)).mean()
    )
    assert l_after < l_before


def test_lpips_jax_math(tmp_path, monkeypatch):
    """lpips_jax forward vs a plain-numpy oracle on random weights — tests
    the architecture plumbing (conv/relu/pool/taps/normalize/heads), not
    the metric values (which need the real pretrained weights)."""
    import numpy as np

    from gps_slam_tpu.eval import lpips_jax

    rng = np.random.default_rng(7)
    w = lpips_jax.random_weights(rng)
    # round-trip through the npz loader path
    np.savez(tmp_path / "w.npz", **w)
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "w.npz"))
    lpips_jax._CACHED = None
    net = lpips_jax.get()
    assert net is not None and lpips_jax.available()

    H = W = 32
    a = rng.uniform(size=(H, W, 3)).astype(np.float32)
    b = rng.uniform(size=(H, W, 3)).astype(np.float32)

    # identity and symmetry
    assert abs(net(a, a)) < 1e-6
    assert abs(net(a, b) - net(b, a)) < 1e-5
    assert net(a, b) > 0

    # numpy oracle
    def conv3(x, k, bias):  # x [H,W,C], k [3,3,ci,co]
        xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
        out = np.zeros((x.shape[0], x.shape[1], k.shape[3]), np.float32)
        for dy in range(3):
            for dx in range(3):
                out += np.tensordot(
                    xp[dy:dy + x.shape[0], dx:dx + x.shape[1]],
                    k[dy, dx], axes=1)
        return np.maximum(out + bias, 0.0)

    def pool(x):
        h, wdt = x.shape[0] // 2, x.shape[1] // 2
        return x[:2 * h, :2 * wdt].reshape(h, 2, wdt, 2, -1).max((1, 3))

    def oracle(x, y):
        stages = lpips_jax._STAGES
        shift, scale = lpips_jax._SHIFT, lpips_jax._SCALE
        xs = [(im * 2 - 1 - shift) / scale for im in (x, y)]
        total, n = 0.0, 0
        for si, st in enumerate(stages):
            for _ in st:
                xs = [conv3(im, w[f"conv{n}_w"], w[f"conv{n}_b"]) for im in xs]
                n += 1
            na, nb = [im / np.sqrt((im ** 2).sum(-1, keepdims=True) + 1e-10)
                      for im in xs]
            total += (((na - nb) ** 2) * w[f"lin{si}_w"]).sum(-1).mean()
            if si < len(stages) - 1:
                xs = [pool(im) for im in xs]
        return total

    got, want = net(a, b), oracle(a, b)
    assert abs(got - want) < 1e-3 * max(1.0, abs(want)), (got, want)
    lpips_jax._CACHED = None


def test_metrics_lpips_unavailable_marker(tmp_path):
    """scripts/metric.py must write an explicit 'unavailable' marker, not
    a silent null, when no LPIPS weights exist."""
    import json
    import subprocess
    import sys

    import numpy as np

    try:
        import cv2
    except ImportError:
        import pytest

        pytest.skip("cv2 not available")
    rd = tmp_path / "render"
    gd = tmp_path / "gt"
    rd.mkdir(), gd.mkdir()
    img = (np.random.default_rng(0).uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(rd / "000000.png"), img)
    cv2.imwrite(str(gd / "000000.png"), img)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               LPIPS_WEIGHTS=str(tmp_path / "nonexistent.npz"))
    subprocess.run(
        [sys.executable, "scripts/metric.py", "-i", str(tmp_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, check=True, capture_output=True)
    res = json.load(open(tmp_path / "results.json"))
    assert res["LPIPS"] == "unavailable"
    assert isinstance(res["PSNR"], float)


def test_model_pt_and_ply_interop(tmp_path):
    """model.pt (torch-archive, reference loadTensor layout,
    raw_gs_param.cpp:220-254) and 3DGS binary PLY round-trip through the
    io module, and GaussianModel.load opens each format."""
    from gps_slam_tpu.utils import io as uio

    rng = np.random.default_rng(0)
    n, k_rest = 13, 15
    params = {
        "means": rng.normal(size=(n, 3)).astype(np.float32),
        "scales": rng.normal(size=(n, 3)).astype(np.float32),
        "quats": rng.normal(size=(n, 4)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(n, k_rest, 3)).astype(np.float32),
        "opacities": rng.normal(size=(n,)).astype(np.float32),
        "exposure": rng.normal(size=(2, 3, 4)).astype(np.float32),
    }

    pt = str(tmp_path / "model.pt")
    uio.save_model_pt(pt, params)
    back = uio.load_model_pt(pt)
    for k, v in params.items():
        np.testing.assert_allclose(back[k], v, rtol=0, atol=0, err_msg=k)
    # the archive really is a TorchScript zip with reference buffer names
    import torch

    mod = torch.jit.load(pt)
    assert dict(mod.named_buffers())["featuresDc"].shape == (n, 3)
    assert dict(mod.named_buffers())["opacities"].shape == (n, 1)

    ply = str(tmp_path / "point_cloud.ply")
    uio.save_gaussian_ply(ply, params["means"], params["scales"],
                          params["quats"], params["features_dc"],
                          params["features_rest"], params["opacities"])
    back_ply = uio.load_gaussian_ply(ply)
    for k in ("means", "scales", "quats", "features_dc", "features_rest"):
        np.testing.assert_allclose(back_ply[k], params[k], err_msg=k)
    np.testing.assert_allclose(back_ply["opacities"], params["opacities"])

    # GaussianModel.load opens npz, pt, and ply alike
    from gps_slam_tpu.config import Config
    from gps_slam_tpu.gs.model import GaussianModel

    cams = synthetic.make_cameras(n_frames=2, width=64, height=48)
    node = {
        "input_dir": "mem", "image_path": "c", "pose_path": "c",
        "depth_path": "d", "pcd_name": "n", "depth_scale": 6553.5,
        "scene_scale": 1.0, "start_frame": 0, "end_frame": 1,
        "frame_step": 1,
        "intrinsics": [cams[0].fx, cams[0].fy, cams[0].cx, cams[0].cy],
        "image_shape": [64, 48], "downscale_factor": 1,
        "test_split_interval": -1,
    }
    cfg_dict = synthetic.default_config_dict(str(tmp_path / "ws"), node)
    cfg_dict["MODEL"]["sh_degree"] = 3
    cfg_dict["TPU"] = {"gaussian_capacity": 256}
    cfg = Config.from_dict(cfg_dict)
    for leave_only in ("model.pt", "point_cloud.ply", "model.npz"):
        d = tmp_path / f"load_{leave_only.split('.')[0]}_{leave_only[-3:]}"
        os.makedirs(d, exist_ok=True)
        np.savez(d / "model.npz", **params)
        uio.save_model_pt(str(d / "model.pt"), params)
        uio.save_gaussian_ply(str(d / "point_cloud.ply"), params["means"],
                              params["scales"], params["quats"],
                              params["features_dc"], params["features_rest"],
                              params["opacities"])
        for f in ("model.npz", "model.pt", "point_cloud.ply"):
            if f != leave_only:
                os.remove(d / f)
        m = GaussianModel(cfg, 64, 48)
        m.load(str(d))
        got = np.asarray(m.pool.params["means"][: n])
        np.testing.assert_allclose(got, params["means"], atol=1e-6)
