"""Evaluation metrics — the library behind scripts/metric*.py, ate_general,
geo_general (reference scripts/ directory, SURVEY §2.1 #20).

PSNR/SSIM in numpy (SSIM = 11x11 Gaussian window, same constants as the
reference's utils/image_utils + fused SSIM).  LPIPS uses a pretrained VGG
when one is importable; in a hermetic image with no weights it reports
None — callers serialize that as JSON null.  Trajectory alignment is the
Horn/SVD method (ate_general.py:29-53); geometry metrics sample both
meshes and measure directed chamfer distances + precision/recall/F1
(geo_general.py:20-91) with scipy's KDTree instead of open3d/trimesh.
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------- image

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def _gauss_win(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(a: np.ndarray, b: np.ndarray, c1=0.01 ** 2, c2=0.03 ** 2) -> float:
    """Mean SSIM over an 11x11 Gaussian window, channels averaged."""
    from scipy.ndimage import convolve1d

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    w = _gauss_win()

    def blur(x):
        y = convolve1d(x, w, axis=0, mode="reflect")
        return convolve1d(y, w, axis=1, mode="reflect")

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 ** 2
    s2 = blur(b * b) - mu2 ** 2
    s12 = blur(a * b) - mu1 * mu2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
    )
    return float(m.mean())


_LPIPS = None
_LPIPS_TRIED = False


def lpips(a: np.ndarray, b: np.ndarray):
    """TRUE LPIPS(vgg) — learned linear weights over VGG features, the
    exact metric the reference vendors (scripts/lpipsPyTorch/modules/
    lpips.py).  Requires the `lpips` package (or its vendored weights) to
    be importable; when it is not, returns None — callers serialize that
    as JSON null and MUST NOT compare against published LPIPS numbers.

    Resolution order: the `lpips` torch package if importable, else the
    JAX re-implementation (eval/lpips_jax.py) with locally converted
    weights ($LPIPS_WEIGHTS / ~/.cache/gps_slam_tpu/lpips_vgg.npz, see
    tools/convert_lpips_weights.py), else None + one loud warning.

    Deliberately NO silent stand-in: an unweighted VGG feature distance is
    a different metric and reporting it under the LPIPS name would make
    quality comparisons wrong.  `vgg_perceptual` below exposes that
    distance under its own honest name when torchvision weights exist."""
    global _LPIPS, _LPIPS_TRIED
    if not _LPIPS_TRIED:
        _LPIPS_TRIED = True
        try:
            import lpips as lpips_pkg  # type: ignore
            import torch

            _LPIPS = (lpips_pkg.LPIPS(net="vgg"), torch)
        except Exception:
            from . import lpips_jax

            net = lpips_jax.get()  # warns once when weights are absent
            _LPIPS = (net, None) if net is not None else None
    if _LPIPS is None:
        return None
    net, torch = _LPIPS
    if torch is None:  # lpips_jax path
        return float(net(np.asarray(a, np.float32), np.asarray(b, np.float32)))
    ta = torch.from_numpy(np.asarray(a, np.float32)).permute(2, 0, 1)[None]
    tb = torch.from_numpy(np.asarray(b, np.float32)).permute(2, 0, 1)[None]
    with torch.no_grad():
        return float(net(ta * 2 - 1, tb * 2 - 1))


_VGG = None
_VGG_TRIED = False


def vgg_perceptual(a: np.ndarray, b: np.ndarray):
    """Unweighted normalized-VGG-feature distance (LPIPS architecture
    minus the learned linear layer).  A useful relative quality signal
    when true LPIPS weights are unavailable — reported under its own
    key, never as LPIPS.  Returns None without torchvision weights."""
    global _VGG, _VGG_TRIED
    if not _VGG_TRIED:
        _VGG_TRIED = True
        try:
            import torch
            import torchvision

            vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
            _VGG = (vgg, torch)
        except Exception:
            _VGG = None
    if _VGG is None:
        return None
    net, torch = _VGG
    ta = torch.from_numpy(np.asarray(a, np.float32)).permute(2, 0, 1)[None]
    tb = torch.from_numpy(np.asarray(b, np.float32)).permute(2, 0, 1)[None]
    with torch.no_grad():
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        xa, xb = (ta - mean) / std, (tb - mean) / std
        dist = 0.0
        layers = {3, 8, 15, 22, 29}
        for i, layer in enumerate(net):
            xa, xb = layer(xa), layer(xb)
            if i in layers:
                na = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                nb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                dist = dist + ((na - nb) ** 2).sum(1).mean()
        return float(dist / len(layers))


# ------------------------------------------------------------ trajectory

def horn_align(model: np.ndarray, data: np.ndarray):
    """Closed-form similarity-free rigid alignment (ate_general.py:29-53).
    model/data: [3, N].  Returns (rot, trans, per-pose translation error)."""
    mc = model - model.mean(1, keepdims=True)
    dc = data - data.mean(1, keepdims=True)
    W = mc @ dc.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    aligned = rot @ model + trans
    err = np.sqrt(((aligned - data) ** 2).sum(0))
    return rot, trans, err


def ate_rmse_cm(est_poses: list[np.ndarray], gt_poses: list[np.ndarray]) -> float:
    """Mean translation error after alignment, in cm (the reference labels
    this 'ATE RMSE', ate_general.py:60-64 — we keep its exact definition)."""
    est = np.stack([p[:3, 3] for p in est_poses]).T
    gt = np.stack([p[:3, 3] for p in gt_poses]).T
    _, _, err = horn_align(gt, est)
    return float(err.mean() * 100.0)


# -------------------------------------------------------------- geometry

def sample_mesh_surface(vertices: np.ndarray, faces: np.ndarray, n: int,
                        rng=None) -> np.ndarray:
    """Uniform area-weighted surface sampling (trimesh.sample equivalent)."""
    rng = rng or np.random.default_rng(0)
    v0, v1, v2 = (vertices[faces[:, k]] for k in range(3))
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    total = areas.sum()
    if total <= 0:
        return vertices[rng.integers(0, len(vertices), n)]
    probs = areas / total
    tri = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    return (1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri] + r1 * r2 * v2[tri]


def geometry_metrics(rec_points: np.ndarray, gt_points: np.ndarray,
                     dist_thres=(0.03,)) -> dict:
    """accuracy/completion (cm) + ratio/F1 at thresholds
    (geo_general.py:20-91)."""
    from scipy.spatial import cKDTree

    rec_tree = cKDTree(rec_points)
    gt_tree = cKDTree(gt_points)
    d_rec_to_gt, _ = gt_tree.query(rec_points)   # accuracy direction
    d_gt_to_rec, _ = rec_tree.query(gt_points)   # completion direction
    results = {
        "accuracy": float(d_rec_to_gt.mean() * 100.0),
        "completion": float(d_gt_to_rec.mean() * 100.0),
    }
    for t in dist_thres:
        P = float((d_rec_to_gt < t).mean() * 100.0)
        R = float((d_gt_to_rec < t).mean() * 100.0)
        F1 = 2 * P * R / max(P + R, 1e-9)
        results[f"accuracy ratio (< {t})"] = P
        results[f"completion ratio (< {t})"] = R
        results[f"F1 (< {t})"] = F1
    return results
