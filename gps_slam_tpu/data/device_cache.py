"""Device-resident frame cache with a compact wire format.

The host<->device link in this deployment is a tunnel whose f32 upload
throughput is ~1 MB/s (measured: one 640x480 f32 RGB frame = 3.6 s(!),
the same frame as u8 + on-device conversion = ~25 ms).  The reference
re-uploads frames per use (cam.toGPU) over PCIe where this is free; here
every frame crosses once as quantized integers (rgb888 + u16 depth at
0.2 mm resolution) and is converted + cached on device.  The SLAM loop's
random keyframe replay re-reads cached entries with zero transfer.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_SCALE = 5000.0  # u16 depth quantization: 0.2 mm steps, 13 m range


@jax.jit
def _convert(rgb_u8: jax.Array, depth_u16: jax.Array):
    return (
        rgb_u8.astype(jnp.float32) / 255.0,
        depth_u16.astype(jnp.float32) / DEPTH_SCALE,
    )


class DeviceFrameCache:
    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self._cache: OrderedDict[int, tuple] = OrderedDict()

    def get(self, cam) -> tuple[jax.Array, jax.Array]:
        """(rgb f32 [H,W,3], depth f32 [H,W]) on device for a Camera."""
        key = cam.id if cam.id >= 0 else id(cam)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        rgb_u8 = np.clip(
            np.asarray(cam.image) * 255.0 + 0.5, 0, 255
        ).astype(np.uint8)
        if cam.depth is not None:
            d = np.asarray(cam.depth)
            if d.ndim == 3:
                d = d[..., 0]
            depth_u16 = np.clip(d * DEPTH_SCALE + 0.5, 0, 65535).astype(np.uint16)
        else:
            depth_u16 = np.zeros(rgb_u8.shape[:2], np.uint16)
        rgb, depth = _convert(jax.device_put(rgb_u8), jax.device_put(depth_u16))
        self._cache[key] = (rgb, depth)
        while len(self._cache) > self.capacity:
            self._cache.popitem(last=False)
        return rgb, depth
