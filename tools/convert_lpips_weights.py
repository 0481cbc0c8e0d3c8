#!/usr/bin/env python
"""Convert LPIPS(vgg) weights to the npz layout gps_slam_tpu.eval.lpips_jax
loads.  Run this OFFLINE on a machine with torchvision + the `lpips`
package (this image has neither and no network egress), then copy the npz
to $LPIPS_WEIGHTS or ~/.cache/gps_slam_tpu/lpips_vgg.npz.

Usage:
  python tools/convert_lpips_weights.py out.npz
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz"
    import lpips as lpips_pkg  # noqa: requires network-enabled machine
    import torchvision

    sys.path.insert(0, ".")
    from gps_slam_tpu.eval.lpips_jax import _from_torch_state, weight_names

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    net = lpips_pkg.LPIPS(net="vgg")
    vgg_sd = {k: v.detach().numpy() for k, v in vgg.state_dict().items()}
    lin_sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
              if ".model.1.weight" in k}
    w = _from_torch_state(vgg_sd, lin_sd)
    missing = set(weight_names()) - set(w)
    assert not missing, missing
    np.savez(out, **w)
    print(f"wrote {out}: {len(w)} arrays")


if __name__ == "__main__":
    main()
