"""The extra transform choices (AutoAugment policies, RandAugment variants,
cutout, random_crop/translation, grayscale, blur, instance_norm, augmix)."""

import random

import numpy as np
import pytest
from PIL import Image

from ovmr_tpu.utils.defaults import get_cfg_default


def make_img(seed=0, size=64):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8))


@pytest.mark.parametrize(
    "choice",
    [
        "imagenet_policy", "cifar10_policy", "svhn_policy",
        "randaugment", "randaugment_fixmatch", "randaugment2", "augmix",
        "cutout", "random_crop", "random_translation",
        "randomgrayscale", "gaussian_blur", "instance_norm",
    ],
)
def test_choice_produces_valid_output(choice):
    from ovmr_tpu.data.transforms import build_transform

    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = [choice, "normalize"]
    tr = build_transform(cfg, is_train=True)
    rng = random.Random(0)
    out = tr(make_img(), rng=rng)
    assert out.shape == (3, 32, 32)
    assert np.isfinite(out).all()


def test_policies_are_stochastic_but_seed_stable():
    from ovmr_tpu.data.autoaugment import ImageNetPolicy

    pol = ImageNetPolicy()
    img = make_img(1)
    a = np.asarray(pol(img, random.Random(5)))
    b = np.asarray(pol(img, random.Random(5)))
    np.testing.assert_array_equal(a, b)
    outs = [np.asarray(pol(img, random.Random(s))) for s in range(8)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_cutout_zeroes_region():
    from ovmr_tpu.data.transforms import cutout

    arr = np.ones((3, 32, 32), np.float32)
    out = cutout(arr, n_holes=1, length=16, rng=random.Random(0))
    assert (out == 0).sum() > 0
    assert (arr == 1).all()  # input untouched


def test_resize_with_pad_geometry():
    from ovmr_tpu.data.transforms import resize_with_pad

    img = make_img(2, size=64).resize((128, 64))
    out = resize_with_pad(img, (64, 64))
    assert out.size == (64, 64)
    arr = np.asarray(out)
    # letterboxed: top/bottom bands are black
    assert arr[:15].sum() == 0 and arr[-15:].sum() == 0
