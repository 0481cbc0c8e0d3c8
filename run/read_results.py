#!/usr/bin/env python
"""Aggregate per-run time_log.txt + val/results.json into one CSV
(reference run/read_results.py:36-68: Fusion_FPS = 1000/per_frame_fusion_ms,
Gaussian_FPS = 1000/(1000/FPS - per_frame_fusion_ms))."""

import argparse
import csv
import json
import os
import re


def parse_time_log(file_path):
    per_frame_time = fps = gpu_memory = None
    with open(file_path) as f:
        for line in f:
            m = re.search(r"per frame fusion time: ([\d.]+)", line)
            if m:
                per_frame_time = float(m.group(1))
            m = re.search(r"FPS: ([\d.]+)", line)
            if m:
                fps = float(m.group(1))
            m = re.search(r"GPU memory usage: (\d+) MB", line)
            if m:
                gpu_memory = int(m.group(1))
    if per_frame_time is None or fps is None or gpu_memory is None:
        print(f"Warning: Skipping {file_path} due to missing data.")
        return None
    calculated_fps = 1000 / per_frame_time if per_frame_time > 0 else 0.0
    rem = 1000 / fps - per_frame_time if fps > 0 else 0.0
    gaussian_fps = 1000 / rem if rem > 0 else 0.0
    file_dir = os.path.dirname(file_path)
    ssim = psnr = lpips = None
    json_path = os.path.join(file_dir, "val", "results.json")
    if os.path.exists(json_path):
        try:
            with open(json_path) as jf:
                data = json.load(jf)
            ssim, psnr, lpips = data.get("SSIM"), data.get("PSNR"), data.get("LPIPS")
            if not isinstance(lpips, (int, float)):
                lpips = None  # "unavailable" marker
        except Exception as e:
            print(f"Error reading {json_path}: {e}")
    res = {
        "RootDir": file_dir,
        "Fusion_FPS": round(calculated_fps, 2),
        "Gaussian_FPS": round(gaussian_fps, 2),
        "FPS": round(fps, 2),
        "GPU_Memory": gpu_memory,
        "SSIM": ssim,
        "PSNR": psnr,
        "LPIPS": lpips,
    }
    print(res)
    return res


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    parser.add_argument("--out", type=str, default="results.csv")
    args = parser.parse_args()
    rows = []
    for root, _dirs, files in os.walk(args.result_dir):
        if "time_log.txt" in files:
            r = parse_time_log(os.path.join(root, "time_log.txt"))
            if r:
                rows.append(r)
    if rows:
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
