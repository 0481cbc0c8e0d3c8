"""LPIPS(vgg) re-implemented in JAX — the learned perceptual metric the
reference vendors (reference scripts/lpipsPyTorch/modules/lpips.py:1-40,
networks.py — VGG16 backbone, unit-normalized activations at the five
relu taps, learned per-channel linear heads, spatial average, layer sum).

This image has no torchvision, no `lpips` package, and no network egress,
so pretrained weights cannot be fetched here.  The module therefore:

  * loads weights from a LOCAL file — either a converted ``.npz`` (see
    ``tools/convert_lpips_weights.py``) or a torch checkpoint readable by
    the baked-in CPU torch — found via the ``LPIPS_WEIGHTS`` env var or
    ``~/.cache/gps_slam_tpu/lpips_vgg.npz``;
  * computes the exact LPIPS(vgg) forward in JAX when weights exist;
  * reports availability explicitly (``available()`` / a loud stderr
    warning), so callers serialize an honest marker instead of a silent
    null.

The forward math (verified against a numpy oracle in
tests/test_aux.py::test_lpips_jax_math):

  x -> (x*2-1 - shift) / scale          # imagenet-ish input scaling
  5 VGG16 stages (convs + relu, 2x2 maxpool between stages)
  taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
  f_hat = f / ||f||_channels            # unit-normalize over channels
  d_l   = mean_hw( sum_c  w_lc * (fa_hat - fb_hat)^2 )
  LPIPS = sum_l d_l
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 `features` conv plan per stage: (out_channels per conv)
_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512))
# channels at the five taps (after the last relu of each stage)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpipsPyTorch's ScalingLayer constants (modules/networks.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "gps_slam_tpu", "lpips_vgg.npz")


def weight_names() -> list[str]:
    """Flat npz key list: conv{i}_w [kh,kw,cin,cout], conv{i}_b [cout]
    (i in VGG order), lin{l}_w [c_l] (per-channel head weights)."""
    names = []
    n = 0
    for stage in _STAGES:
        for _ in stage:
            names += [f"conv{n}_w", f"conv{n}_b"]
            n += 1
    names += [f"lin{l}_w" for l in range(5)]
    return names


def random_weights(rng: np.random.Generator) -> dict:
    """Structurally correct random weights — for tests only (the metric
    values are meaningless; the math/shape plumbing is what's tested)."""
    w = {}
    n = 0
    cin = 3
    for stage in _STAGES:
        for cout in stage:
            w[f"conv{n}_w"] = rng.normal(
                0, 0.1, (3, 3, cin, cout)).astype(np.float32)
            w[f"conv{n}_b"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
            cin = cout
            n += 1
    for l, c in enumerate(TAP_CHANNELS):
        w[f"lin{l}_w"] = np.abs(rng.normal(0, 0.1, (c,))).astype(np.float32)
    return w


def _from_torch_state(vgg_sd: dict, lin_sd: dict) -> dict:
    """Convert torch state dicts (torchvision vgg16 `features.*` +
    lpips `lin{l}.model.1.weight`) to the flat npz layout.  Torch conv
    weights are [cout, cin, kh, kw] -> HWIO."""
    out = {}
    conv_keys = sorted(
        (k for k in vgg_sd if k.endswith(".weight") and vgg_sd[k].ndim == 4),
        key=lambda k: int(k.split(".")[-2]))
    for n, k in enumerate(conv_keys):
        wt = np.asarray(vgg_sd[k], np.float32)
        out[f"conv{n}_w"] = np.transpose(wt, (2, 3, 1, 0))
        out[f"conv{n}_b"] = np.asarray(
            vgg_sd[k.replace(".weight", ".bias")], np.float32)
    for l in range(5):
        for cand in (f"lin{l}.model.1.weight", f"lin.{l}.model.1.weight"):
            if cand in lin_sd:
                out[f"lin{l}_w"] = np.asarray(
                    lin_sd[cand], np.float32).reshape(-1)
                break
        else:
            raise KeyError(f"no linear-head weight for tap {l}")
    return out


def load_weights(path: str | None = None) -> dict | None:
    """Load LPIPS(vgg) weights from `path`, $LPIPS_WEIGHTS, or the default
    cache location.  Returns None (with one loud warning) when absent."""
    path = path or os.environ.get("LPIPS_WEIGHTS") or _DEFAULT_PATH
    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        z = np.load(path)
        return {k: z[k] for k in weight_names()}
    # torch checkpoint: {"vgg": vgg_state_dict, "lin": lpips_lin_state}
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return _from_torch_state(to_np(blob["vgg"]), to_np(blob["lin"]))


@jax.jit
def _forward(wa, a, b):
    def scale_in(x):
        x = x * 2.0 - 1.0
        return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

    def vgg_taps(x):
        taps = []
        n = 0
        for si, stage in enumerate(_STAGES):
            for _ in stage:
                x = jax.lax.conv_general_dilated(
                    x, wa[f"conv{n}_w"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x + wa[f"conv{n}_b"])
                n += 1
            taps.append(x)
            if si < len(_STAGES) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
        return taps

    ta = vgg_taps(scale_in(a))
    tb = vgg_taps(scale_in(b))
    total = 0.0
    for l, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa * jax.lax.rsqrt(jnp.sum(fa * fa, -1, keepdims=True) + 1e-10)
        nb = fb * jax.lax.rsqrt(jnp.sum(fb * fb, -1, keepdims=True) + 1e-10)
        d = jnp.sum((na - nb) ** 2 * wa[f"lin{l}_w"], -1)  # [N, H, W]
        total = total + jnp.mean(d, axis=(1, 2))
    return total


class LpipsJax:
    """Callable LPIPS(vgg).  Construct via `get()` (cached singleton)."""

    def __init__(self, weights: dict):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}

    def __call__(self, a: np.ndarray, b: np.ndarray) -> float:
        """a, b: [H, W, 3] float in [0, 1] (or [N, H, W, 3])."""
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        batched = a.ndim == 4
        if not batched:
            a, b = a[None], b[None]
        out = _forward(self.weights, a, b)
        return np.asarray(out) if batched else float(out[0])


_CACHED: tuple | None = None


def get(path: str | None = None) -> LpipsJax | None:
    """Singleton loader; None (once-warned) when no weights exist."""
    global _CACHED
    if _CACHED is None:
        w = load_weights(path)
        if w is None:
            import sys

            print(
                "[lpips_jax] WARNING: no LPIPS(vgg) weights found "
                f"(set LPIPS_WEIGHTS or place {_DEFAULT_PATH}); LPIPS will "
                "be reported as 'unavailable'.  Convert weights offline "
                "with tools/convert_lpips_weights.py.", file=sys.stderr)
        _CACHED = (LpipsJax(w) if w is not None else None,)
    return _CACHED[0]


def available(path: str | None = None) -> bool:
    return get(path) is not None
