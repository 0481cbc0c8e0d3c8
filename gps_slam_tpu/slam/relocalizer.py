"""Fern-based appearance relocalizer + tracking-failure policy.

Re-expression of InfiniTAM's FernRelocLib (FernRelocLib/, active under
FAILUREMODE_RELOCALISE; policy surface ITMLibSettings behaviourOnFailure +
ITMBasicEngine.tpp:283-333): each "fern" is a handful of random
(pixel, threshold) comparisons on a downsampled depth image; a frame's
binary code concatenates all ferns; keyframes are harvested when
sufficiently dissimilar from everything stored, and relocalization returns
the stored pose whose code is nearest in Hamming distance.

All code computation is one vectorized gather+compare (VPU-trivial); the
database lives host-side (a few KB per keyframe).
"""

from __future__ import annotations

import numpy as np


class FailurePolicy:
    """behaviourOnFailure (ITMLibSettings.cpp:42): default IGNORE."""

    IGNORE = "ignore"
    STOP_INTEGRATION = "stop_integration"
    RELOCALISE = "relocalise"


class FernRelocalizer:
    def __init__(self, width: int = 40, height: int = 30, n_ferns: int = 500,
                 n_decisions: int = 4, harvest_threshold: float = 0.2,
                 depth_range: tuple = (0.3, 4.0), seed: int = 0):
        rng = np.random.default_rng(seed)
        self.w, self.h = width, height
        self.n_ferns, self.n_dec = n_ferns, n_decisions
        self.harvest_threshold = harvest_threshold
        n = n_ferns * n_decisions
        self.px = rng.integers(0, width, n)
        self.py = rng.integers(0, height, n)
        self.thresh = rng.uniform(depth_range[0], depth_range[1], n).astype(np.float32)
        self.codes: list[np.ndarray] = []
        self.poses: list[np.ndarray] = []

    def compute_code(self, depth: np.ndarray) -> np.ndarray:
        """Downsample + binary comparisons -> bool code [n_ferns*n_dec]."""
        import cv2

        d = np.asarray(depth, np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        small = cv2.resize(d, (self.w, self.h), interpolation=cv2.INTER_NEAREST)
        return small[self.py, self.px] > self.thresh

    def dissimilarity(self, code: np.ndarray) -> float:
        """Min normalized Hamming distance to the database (1.0 = empty)."""
        if not self.codes:
            return 1.0
        db = np.stack(self.codes)
        return float((db != code[None]).mean(axis=1).min())

    def process_frame(self, depth: np.ndarray, pose: np.ndarray,
                      tracking_good: bool) -> None:
        """Harvest a keyframe when the view is novel enough and tracking is
        trusted (FernRelocLib::ProcessFrame semantics)."""
        if not tracking_good:
            return
        code = self.compute_code(depth)
        if self.dissimilarity(code) > self.harvest_threshold:
            self.codes.append(code)
            self.poses.append(np.asarray(pose, np.float32).copy())

    def relocalize(self, depth: np.ndarray) -> np.ndarray | None:
        """Best-matching stored pose, or None when the database is empty."""
        if not self.codes:
            return None
        code = self.compute_code(depth)
        db = np.stack(self.codes)
        idx = int((db != code[None]).mean(axis=1).argmin())
        return self.poses[idx]

    @property
    def num_keyframes(self) -> int:
        return len(self.codes)
