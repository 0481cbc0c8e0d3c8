#!/usr/bin/env python
"""Convert raw Replica sequences (traj.txt + results/frameNNNNNN.jpg +
results/depthNNNNNN.png) into the custom dataset format this framework
reads (reference scripts/replica_preprocess.py): camera/frameNNNNNN.jpg +
camera/poseNNNNNN.txt + depth/depthNNNNNN.png, subsampled to
`--max-frames` frames.  Fixed Replica intrinsics: fx=fy=600,
cx=599.5, cy=339.5, 1200x680, depth scale 6553.5
(reference replica_preprocess.py:175-182)."""

import argparse
import os
import shutil

import numpy as np

REPLICA_INTRINSICS = dict(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                          width=1200, height=680, depth_scale=6553.5)


def convert(input_dir: str, output_dir: str, max_frames: int = 2000) -> None:
    traj = np.loadtxt(os.path.join(input_dir, "traj.txt")).reshape(-1, 4, 4)
    results = os.path.join(input_dir, "results")
    frames = sorted(n for n in os.listdir(results) if n.startswith("frame"))
    n = min(len(frames), len(traj))
    step = max(n // max_frames, 1)
    cam_dir = os.path.join(output_dir, "camera")
    depth_dir = os.path.join(output_dir, "depth")
    os.makedirs(cam_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)
    out_id = 0
    for i in range(0, n, step):
        if out_id >= max_frames:
            break
        src_img = os.path.join(results, f"frame{i:06d}.jpg")
        src_depth = os.path.join(results, f"depth{i:06d}.png")
        if not (os.path.exists(src_img) and os.path.exists(src_depth)):
            continue
        shutil.copy(src_img, os.path.join(cam_dir, f"frame{out_id:06d}.jpg"))
        shutil.copy(src_depth, os.path.join(depth_dir, f"depth{out_id:06d}.png"))
        np.savetxt(os.path.join(cam_dir, f"pose{out_id:06d}.txt"), traj[i], fmt="%.9f")
        out_id += 1
    print(f"wrote {out_id} frames to {output_dir}")
    print("intrinsics:", REPLICA_INTRINSICS)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--max-frames", type=int, default=2000)
    args = p.parse_args()
    convert(args.input, args.output, args.max_frames)
