#!/usr/bin/env python
"""Render-vs-GT image metrics -> results.json / per_view.json
(reference scripts/metric.py:34-85: reads <input_path>/render vs
<input_path>/gt, writes mean SSIM/PSNR/LPIPS and per-view dicts)."""

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from gps_slam_tpu.eval import metrics as M


def read_images(input_path):
    render_dir = os.path.join(input_path, "render")
    gt_dir = os.path.join(input_path, "gt")
    names = sorted(
        n for n in os.listdir(render_dir) if n.endswith((".color.jpg", ".png", ".jpg"))
        and not n.endswith((".alpha.jpg", ".depth.jpg"))
    )
    renders, gts, kept = [], [], []
    for n in names:
        r = cv2.imread(os.path.join(render_dir, n))
        g = cv2.imread(os.path.join(gt_dir, n))
        if r is None or g is None:
            continue
        renders.append(cv2.cvtColor(r, cv2.COLOR_BGR2RGB).astype(np.float32) / 255)
        gts.append(cv2.cvtColor(g, cv2.COLOR_BGR2RGB).astype(np.float32) / 255)
        kept.append(n)
    return renders, gts, kept


def evaluate(input_path):
    renders, gts, names = read_images(input_path)
    ssims, psnrs, lpipss = [], [], []
    for r, g in zip(renders, gts):
        psnrs.append(M.psnr(r, g))
        ssims.append(M.ssim(r, g))
        lpipss.append(M.lpips(r, g))
    has_lpips = all(v is not None for v in lpipss) and lpipss
    full = {
        "SSIM": float(np.mean(ssims)) if ssims else None,
        "PSNR": float(np.mean(psnrs)) if psnrs else None,
        # explicit marker, not a silent null: no local LPIPS weights
        # (see gps_slam_tpu/eval/lpips_jax.py + tools/convert_lpips_weights.py)
        "LPIPS": float(np.mean(lpipss)) if has_lpips else "unavailable",
    }
    per_view = {
        "SSIM": dict(zip(names, map(float, ssims))),
        "PSNR": dict(zip(names, map(float, psnrs))),
        "LPIPS": dict(zip(names, lpipss)) if has_lpips else {},
    }
    print("  SSIM : {:>12.7f}".format(full["SSIM"] or float("nan")))
    print("  PSNR : {:>12.7f}".format(full["PSNR"] or float("nan")))
    if isinstance(full["LPIPS"], float):
        print("  LPIPS: {:>12.7f}".format(full["LPIPS"]))
    with open(os.path.join(input_path, "results.json"), "w") as f:
        json.dump(full, f, indent=True)
    with open(os.path.join(input_path, "per_view.json"), "w") as f:
        json.dump(per_view, f, indent=True)
    return full


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--input_path", "-i", required=True)
    args = parser.parse_args()
    evaluate(args.input_path)
