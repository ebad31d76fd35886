"""SSTV Martin M1 (beyond the reference — no image modes): VIS header,
line-synced image roundtrip, noise robustness."""

import numpy as np
import pytest

from orion_sdr_tpu.modulate.sstv import sstv_mod, MARTIN_M1
from orion_sdr_tpu.demodulate.sstv import sstv_demod

FS = 11025.0


def _test_image():
    H, W = 256, 320
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, W)[None, :]
    img[:, :, 1] = np.linspace(0, 255, H)[:, None]
    img[:H // 2, :, 2] = 200
    return img


def _psnr(got, want):
    err = np.abs(got.astype(float) - want.astype(float))[3:-3, 6:-6]
    return 20 * np.log10(255 / np.sqrt(np.mean(err ** 2)))


def test_sstv_roundtrip_clean():
    img = _test_image()
    audio = sstv_mod(img, FS)
    # ~115 s of audio at the Martin M1 rate
    assert abs(len(audio) / FS - 115.2) < 2.0
    out = sstv_demod(audio, FS)
    assert out.vis == MARTIN_M1["vis"]
    assert out.image.shape == (256, 320, 3)
    assert _psnr(out.image, img) > 35.0


def test_sstv_under_noise():
    img = _test_image()
    audio = sstv_mod(img, FS)
    rng = np.random.default_rng(0)
    noisy = audio + rng.standard_normal(len(audio)).astype(np.float32) \
        * np.sqrt(np.mean(audio ** 2) / 10 ** 2)        # 20 dB
    out = sstv_demod(noisy, FS)
    assert out.vis == MARTIN_M1["vis"]
    assert _psnr(out.image, img) > 25.0


def test_sstv_resamples_arbitrary_input_size():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (100, 100, 3)).astype(np.uint8)
    audio = sstv_mod(img, FS)
    out = sstv_demod(audio, FS)
    assert out.image.shape == (256, 320, 3)
    with pytest.raises(ValueError):
        sstv_mod(np.zeros((64, 64), np.uint8), FS)
    with pytest.raises(ValueError):
        sstv_demod(np.zeros(int(FS), np.float32), FS)   # no sync in silence
