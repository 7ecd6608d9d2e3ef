"""scripts/predict.py integration: checkpoint -> masks on a folder,
fixed-size and tiled paths, driven as a subprocess on the CPU backend."""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _make_ckpt_and_images(tmp_path, image_size=32, n=3, img_hw=(48, 40)):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.utils.checkpoint import save_checkpoint

    model = create_model("unet", in_channels=3, num_classes=1,
                         image_size=image_size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, image_size, image_size, 3)))
    ckpt = tmp_path / "ckpt" / "unet_best"
    save_checkpoint(str(ckpt), {"variables": variables, "epoch": 0})

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (*img_hw, 3), dtype=np.uint8)
        ).save(img_dir / f"im{i}.png")
    return ckpt, img_dir


def _run(args):
    env = dict(os.environ)
    env["UNET_ZOO_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "predict.py"), *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.mark.slow
def test_predict_masks_and_tiled(tmp_path):
    from PIL import Image

    ckpt, img_dir = _make_ckpt_and_images(tmp_path)
    out_dir = tmp_path / "preds"
    _run(["--model", "unet", "--checkpoint", str(ckpt),
          "--input", str(img_dir), "--output", str(out_dir),
          "--image-size", "32", "--batch", "2"])
    # masks come back as L-mode PNGs at each input's ORIGINAL resolution
    outs = sorted(out_dir.glob("*.png"))
    assert [p.name for p in outs] == ["im0.png", "im1.png", "im2.png"]
    m = np.asarray(Image.open(outs[0]))
    assert m.shape == (48, 40) and m.dtype == np.uint8
    assert set(np.unique(m)) <= {0, 255}

    # tiled path: native resolution (no resize), probs as .npy
    out_t = tmp_path / "preds_tiled"
    _run(["--model", "unet", "--checkpoint", str(ckpt),
          "--input", str(img_dir / "im0.png"), "--output", str(out_t),
          "--image-size", "32", "--tiled", "--overlap", "0.25",
          "--output-kind", "probs"])
    p = np.load(out_t / "im0.npy")
    assert p.shape == (48, 40, 1)
    assert p.min() >= 0.0 and p.max() <= 1.0

    # int8 PTQ path: calibrate on the first image, masks still valid
    out_q = tmp_path / "preds_int8"
    stdout = _run(["--model", "unet", "--checkpoint", str(ckpt),
                   "--input", str(img_dir / "im0.png"), "--output",
                   str(out_q), "--image-size", "32", "--batch", "1",
                   "--int8"])
    assert "int8: calibrated" in stdout
    from PIL import Image as PILImage

    mq = np.asarray(PILImage.open(out_q / "im0.png"))
    assert mq.shape == (48, 40) and set(np.unique(mq)) <= {0, 255}

    # TTA path: flip-ensemble masks, same output contract
    out_a = tmp_path / "preds_tta"
    _run(["--model", "unet", "--checkpoint", str(ckpt),
          "--input", str(img_dir / "im0.png"), "--output", str(out_a),
          "--image-size", "32", "--batch", "1", "--tta"])
    ma = np.asarray(PILImage.open(out_a / "im0.png"))
    assert ma.shape == (48, 40) and set(np.unique(ma)) <= {0, 255}


@pytest.mark.slow
def test_predict_export_artifact(tmp_path):
    ckpt, img_dir = _make_ckpt_and_images(tmp_path, n=1)
    out_dir = tmp_path / "preds"
    blob = tmp_path / "unet.stablehlo"
    _run(["--model", "unet", "--checkpoint", str(ckpt),
          "--input", str(img_dir), "--output", str(out_dir),
          "--image-size", "32", "--batch", "1", "--export", str(blob)])
    assert blob.stat().st_size > 0

    import jax.numpy as jnp

    from unet_zoo_tpu.utils.serving import load_predictor

    predict = load_predictor(str(blob))
    out = predict(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert out.shape == (1, 32, 32, 1)
