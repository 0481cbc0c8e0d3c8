"""Camera container — host-side equivalent of the reference Camera class
(include/dataset_reader.h:111-169, src/dataset_reader.cpp:86-216).

Holds intrinsics, ground-truth pose (`c2w`), estimated pose (`c2w_slam`) and
host (numpy) image/depth buffers.  Device work takes the raw arrays; the
Camera object itself never crosses into jit.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import se3


class Camera:
    def __init__(
        self,
        width: int,
        height: int,
        fx: float,
        fy: float,
        cx: float,
        cy: float,
        has_depth: bool,
        c2w: np.ndarray,
        img_file_path: str = "",
        depth_file_path: str = "",
        cam_id: int = -1,
    ):
        self.width = int(width)
        self.height = int(height)
        self.fx, self.fy, self.cx, self.cy = float(fx), float(fy), float(cx), float(cy)
        self.has_depth = bool(has_depth)
        self.c2w = np.asarray(c2w, dtype=np.float32)
        self.c2w_slam = self.c2w.copy()
        self.img_file_path = img_file_path
        self.depth_file_path = depth_file_path
        self.id = cam_id
        self.image: np.ndarray | None = None  # [H, W, 3] float32 in [0,1]
        self.depth: np.ndarray | None = None  # [H, W, 1] float32 metres

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    def get_frame_id(self, prefix: str = "frame", suffix: str = ".") -> str:
        """Extract the zero-padded frame number from the image filename
        (reference src/dataset_reader.cpp:134-160 getFrameID)."""
        import os

        name = os.path.basename(self.img_file_path)
        if prefix in name:
            start = name.find(prefix) + len(prefix)
            end = name.find(suffix, start)
            if end != -1:
                return name[start:end]
        return f"{self.id:06d}"

    def get_frame_maps(self) -> dict:
        """Vertex/normal maps in *world* frame from this camera's own depth,
        using the SLAM-estimated pose (reference src/dataset_reader.cpp:163-216
        Camera::getFrameMaps)."""
        depth = jnp.asarray(self.depth)
        vmap_c = se3.compute_vertex_map(depth, self.fx, self.fy, self.cx, self.cy)
        c2w = jnp.asarray(self.c2w_slam)
        vmap_w = se3.transform_points(vmap_c.reshape(-1, 3), c2w).reshape(vmap_c.shape)
        nmap = se3.compute_normal_map(vmap_w)
        return {
            "color_map": jnp.asarray(self.image),
            "vertex_map": vmap_w,
            "normal_map": nmap,
        }

    def scaled(self, downscale_factor: float) -> "Camera":
        """Return intrinsics scaled by 1/downscale_factor (reference
        src/dataset_reader.cpp:92-104 loadImage)."""
        if downscale_factor <= 1.0:
            return self
        s = 1.0 / downscale_factor
        cam = Camera(
            int(self.width * s),
            int(self.height * s),
            self.fx * s,
            self.fy * s,
            self.cx * s,
            self.cy * s,
            self.has_depth,
            self.c2w,
            self.img_file_path,
            self.depth_file_path,
            self.id,
        )
        cam.c2w_slam = self.c2w_slam.copy()
        return cam
