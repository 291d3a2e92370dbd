"""LPIPS graph golden tests — VGG16 slices + lin layers vs a torch oracle.

The perceptual weights cannot ship in this container (no egress), so the
GRAPH is certified instead: with fixed random weights, the JAX graph in
gaussianmesh_tpu/eval/lpips.py must match an independent PyTorch
transcription of the reference architecture
(/root/reference/lpips_jittor/lpips.py:142-175 and
pretrained_networks.py vgg16 slices) to ~1e-5. With correct weights the
two graphs then compute the same metric by construction.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from gaussianmesh_tpu.eval import lpips as lp  # noqa: E402

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _torch_lpips(img1, img2, weights):
    """Independent oracle: reference LPIPS(net='vgg') forward in torch.

    Mirrors lpips_jittor/lpips.py execute(): [0,1] -> [-1,1]
    (normalize=True path, :142-145), ScalingLayer (:13-25), VGG16
    relu{1_2,2_2,3_3,4_3,5_3} feature slices with 2x2 maxpools between
    blocks (pretrained_networks.py vgg16), normalize_tensor with
    norm + 1e-10 (:39-41), squared diff, 1x1 lin conv, spatial mean,
    sum over layers (:152-175).
    """
    def prep(im):
        t = torch.from_numpy(np.asarray(im, np.float32))[None]
        t = t * 2.0 - 1.0
        shift = torch.from_numpy(_SHIFT)[None, :, None, None]
        scale = torch.from_numpy(_SCALE)[None, :, None, None]
        return (t - shift) / scale

    def features(x):
        feats = []
        idx = 0
        for block, (_, n_convs) in enumerate(lp._VGG_CFG):
            for _ in range(n_convs):
                w = torch.from_numpy(np.asarray(weights[f"conv{idx}_w"]))
                b = torch.from_numpy(np.asarray(weights[f"conv{idx}_b"]))
                x = F.relu(F.conv2d(x, w, b, padding=1))
                idx += 1
            feats.append(x)
            if block < len(lp._VGG_CFG) - 1:
                x = F.max_pool2d(x, 2, 2)
        return feats

    f1 = features(prep(img1))
    f2 = features(prep(img2))
    total = 0.0
    for li, (a, b) in enumerate(zip(f1, f2)):
        a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (a - b) ** 2
        lin = torch.from_numpy(np.asarray(weights[f"lin{li}_w"]))
        total = total + (d * lin).sum(dim=1, keepdim=True).mean()
    return float(total)


def test_lpips_graph_matches_torch_oracle():
    rng = np.random.default_rng(7)
    # odd size exercises the floor-mode maxpool boundary
    img1 = rng.uniform(0, 1, (3, 35, 33)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(
        np.float32)
    weights = lp.random_weights(seed=0)

    got = float(lp._lpips_pair(img1, img2, weights))
    want = _torch_lpips(img1, img2, weights)
    assert abs(got - want) <= 1e-5 * max(1.0, abs(want)), (got, want)
    assert got > 0.0


def test_lpips_identical_images_zero():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    weights = lp.random_weights(seed=0)
    assert abs(float(lp._lpips_pair(img, img, weights))) < 1e-7


def test_convert_torch_weights_roundtrip(tmp_path):
    """Fake torchvision vgg16 state_dict (REAL feature indices, incl. the
    two-digit ones that break lexicographic sorting) + lin dict ->
    convert -> load -> same metric as calling the graph directly."""
    rng = np.random.default_rng(3)
    # torchvision vgg16.features conv indices
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg_sd = {}
    in_ch = 3
    direct = {}
    for i, (fi, ch) in enumerate(zip(conv_idx, chans)):
        w = rng.normal(scale=0.05, size=(ch, in_ch, 3, 3)).astype(np.float32)
        b = rng.normal(scale=0.01, size=(ch,)).astype(np.float32)
        vgg_sd[f"features.{fi}.weight"] = torch.from_numpy(w)
        vgg_sd[f"features.{fi}.bias"] = torch.from_numpy(b)
        direct[f"conv{i}_w"] = w
        direct[f"conv{i}_b"] = b
        in_ch = ch
    lin_sd = {}
    for li, ch in enumerate([64, 128, 256, 512, 512]):
        lw = rng.uniform(0, 0.1, (1, ch, 1, 1)).astype(np.float32)
        lin_sd[f"lin{li}.model.1.weight"] = torch.from_numpy(lw)
        direct[f"lin{li}_w"] = lw

    out = tmp_path / "lpips_vgg16.npz"
    lp.convert_torch_weights(vgg_sd, lin_sd, str(out))

    metric = lp.LPIPS(str(out))
    assert metric.available

    rng2 = np.random.default_rng(9)
    img1 = rng2.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    img2 = rng2.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    via_file = metric(img1, img2)
    via_direct = float(lp._lpips_pair(img1, img2, direct))
    np.testing.assert_allclose(via_file, via_direct, rtol=1e-6)
    # the numeric-sort regression: converted conv0 must be features.0,
    # conv4 must be features.10 (not features.2's neighborhood)
    with np.load(out) as z:
        np.testing.assert_array_equal(z["conv0_w"],
                                      np.asarray(vgg_sd["features.0.weight"]))
        np.testing.assert_array_equal(z["conv4_w"],
                                      np.asarray(vgg_sd["features.10.weight"]))


def test_metrics_reports_lpips_none_when_no_weights(tmp_path, capsys):
    from PIL import Image
    from gaussianmesh_tpu.eval.metrics import evaluate_dirs

    rd = tmp_path / "renders"
    gd = tmp_path / "gt"
    rd.mkdir()
    gd.mkdir()
    rng = np.random.default_rng(0)
    arr = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(rd / "0.png")
    Image.fromarray(arr).save(gd / "0.png")

    res = evaluate_dirs(str(rd), str(gd),
                        lpips_weights=str(tmp_path / "nonexistent.npz"))
    assert res["mean"]["LPIPS"] is None          # loud in the artifact
    assert res["mean"]["LPIPS_note"]            # reason next to the null
    assert "WARNING: no pretrained LPIPS weights" in capsys.readouterr().out


def test_metrics_uncalibrated_mode_reports_separate_key(tmp_path):
    """--lpips_uncalibrated: the seed-weight graph is reported ONLY under
    LPIPS_uncalibrated (never LPIPS), ranks similarity (identical pair
    scores 0, a perturbed pair scores > 0), and is deterministic."""
    from PIL import Image
    from gaussianmesh_tpu.eval.metrics import evaluate_dirs

    rd = tmp_path / "renders"
    gd = tmp_path / "gt"
    rd.mkdir()
    gd.mkdir()
    rng = np.random.default_rng(1)
    arr = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(rd / "0.png")
    Image.fromarray(arr).save(gd / "0.png")
    res = evaluate_dirs(str(rd), str(gd),
                        lpips_weights=str(tmp_path / "none.npz"),
                        lpips_uncalibrated=True)
    assert res["mean"]["LPIPS"] is None
    assert res["mean"]["LPIPS_uncalibrated"] == pytest.approx(0.0, abs=1e-6)

    noisy = np.clip(arr.astype(np.int32)
                    + rng.integers(-60, 60, arr.shape), 0, 255).astype(np.uint8)
    Image.fromarray(noisy).save(rd / "0.png")
    res2 = evaluate_dirs(str(rd), str(gd),
                         lpips_weights=str(tmp_path / "none.npz"),
                         lpips_uncalibrated=True)
    assert res2["mean"]["LPIPS_uncalibrated"] > 1e-4
