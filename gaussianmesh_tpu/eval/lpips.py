"""LPIPS (VGG16 backbone) in pure JAX — metrics parity with lpips_jittor.

The reference evaluates LPIPS with a VGG16 feature net + learned 1x1
"lin" layers (lpips_jittor/lpips.py:44-188), loading pretrained weights
from disk (README.md:52-55 — they are not part of the repo either).
This is the same computation graph:

  scale input by (shift, scale) -> VGG16 conv slices (relu1_2, relu2_2,
  relu3_3, relu4_3, relu5_3) -> unit-normalize channels -> squared diff
  -> 1x1 lin conv -> spatial mean -> sum over layers

Weights must be supplied as an .npz (this container has no network
egress and no torchvision); `convert_torch_weights` converts a
torchvision VGG16 state_dict + LPIPS lin weights when available. Metrics
report LPIPS only when a weights file is present.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

# channels per VGG16 conv block (conv layers before each maxpool)
_VGG_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.environ.get(
    "GM_TPU_LPIPS_WEIGHTS", "/root/repo/weights/lpips_vgg16.npz")


def load_weights(path: str | None = None) -> dict | None:
    path = path or DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def _conv(x, w, b):
    # x (1, C, H, W), w (O, I, kh, kw) torch layout
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _features(x, weights):
    feats = []
    idx = 0
    for block, (ch, n_convs) in enumerate(_VGG_CFG):
        for i in range(n_convs):
            x = _conv(x, weights[f"conv{idx}_w"], weights[f"conv{idx}_b"])
            x = jax.nn.relu(x)
            idx += 1
        feats.append(x)
        if block < len(_VGG_CFG) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
    return feats


@functools.partial(jax.jit, static_argnames=())
def _lpips_pair(img1, img2, weights):
    # images (3, H, W) in [0, 1] -> [-1, 1]. (The reference's metrics.py:80
    # feeds [0,1] images with normalize=False — an inherited quirk of the
    # 3DGS eval script; we apply the documented normalize=True mapping,
    # lpips_jittor/lpips.py:142-145.)
    def prep(im):
        im = im * 2.0 - 1.0
        return ((im - jnp.asarray(_SHIFT)[:, None, None])
                / jnp.asarray(_SCALE)[:, None, None])[None]

    f1 = _features(prep(img1), weights)
    f2 = _features(prep(img2), weights)
    total = 0.0
    for li, (a, b) in enumerate(zip(f1, f2)):
        # norm + eps (not max(norm, eps)): exact parity with the
        # reference's normalize_tensor (lpips_jittor/lpips.py:39-41)
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{li}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total


class LPIPS:
    """Callable matching lpips_jittor.LPIPS(net='vgg') usage.

    `uncalibrated=True` falls back to deterministic seed weights when no
    pretrained file exists: the full LPIPS GRAPH with random VGG
    features. Random-feature perceptual distances rank image similarity
    usefully (lower still means more similar) but are NOT comparable to
    published LPIPS numbers — callers must report them under a separate
    `LPIPS_uncalibrated` key, never as LPIPS. Exists because this
    container has no weight ingress (see BASELINE.md)."""

    def __init__(self, weights_path: str | None = None,
                 uncalibrated: bool = False):
        self.weights = load_weights(weights_path)
        self.calibrated = self.weights is not None
        if self.weights is None and uncalibrated:
            self.weights = random_weights(seed=0)

    @property
    def available(self) -> bool:
        return self.weights is not None

    def __call__(self, img1, img2) -> float:
        if not self.available:
            raise RuntimeError(
                "LPIPS weights not found; provide lpips_vgg16.npz (see "
                "gaussianmesh_tpu/eval/lpips.py docstring)")
        return float(_lpips_pair(jnp.asarray(img1), jnp.asarray(img2),
                                 self.weights))


def random_weights(seed: int = 0) -> dict:
    """Random-initialized weights (tests/debug only — NOT perceptual)."""
    rng = np.random.default_rng(seed)
    w = {}
    idx = 0
    in_ch = 3
    for li, (ch, n_convs) in enumerate(_VGG_CFG):
        for _ in range(n_convs):
            w[f"conv{idx}_w"] = jnp.asarray(
                rng.normal(scale=0.05, size=(ch, in_ch, 3, 3)).astype(np.float32))
            w[f"conv{idx}_b"] = jnp.zeros(ch)
            in_ch = ch
            idx += 1
        w[f"lin{li}_w"] = jnp.asarray(
            rng.uniform(0, 0.1, (1, ch, 1, 1)).astype(np.float32))
    return w


def convert_torch_weights(vgg_state_dict, lin_state_dict, out_path: str):
    """torchvision vgg16.features + LPIPS lins -> our .npz layout."""
    out = {}
    # NUMERIC sort on the layer index: lexicographic ordering puts
    # features.10 before features.2 and silently scrambles every conv
    conv_keys = sorted(
        (k for k in vgg_state_dict if k.endswith(".weight")
         and "features" in k),
        key=lambda k: int(k.split("features.")[-1].split(".")[0]))
    idx = 0
    for k in conv_keys:
        out[f"conv{idx}_w"] = np.asarray(vgg_state_dict[k])
        out[f"conv{idx}_b"] = np.asarray(
            vgg_state_dict[k.replace(".weight", ".bias")])
        idx += 1
    for li in range(5):
        out[f"lin{li}_w"] = np.asarray(
            lin_state_dict[f"lin{li}.model.1.weight"])
    np.savez(out_path, **out)
