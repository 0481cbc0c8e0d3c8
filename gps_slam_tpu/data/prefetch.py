"""Host->device frame prefetcher.

The reference preloads every frame into host RAM up front
(slam/InfiniTAM_tools.cpp:33-45) and uploads synchronously inside
ProcessFrame.  Here a background thread stages the next frames' RGB-D
arrays onto the device (jax.device_put is async) while the current frame
fuses, so the sequential track->fuse->refine loop never stalls on the
host->HBM copy."""

from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np


class FramePrefetcher:
    def __init__(self, cams, depth_shape, rgb_shape, depth_prep=None,
                 lookahead: int = 2):
        self.cams = cams
        self._q: queue.Queue = queue.Queue(maxsize=lookahead)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._depth_prep = depth_prep or (lambda d: d[..., 0] if d.ndim == 3 else d)
        self._thread.start()

    def _worker(self):
        for cam in self.cams:
            d = jax.device_put(jnp.asarray(self._depth_prep(np.asarray(cam.depth))))
            c = jax.device_put(jnp.asarray(np.asarray(cam.image)))
            self._q.put((cam, d, c))
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item
