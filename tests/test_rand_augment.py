import numpy as np
import PIL.ImageEnhance
import PIL.ImageOps
from PIL import Image

from bdvcil_tpu.data.rand_augment import (
    AUGMENT_LIST,
    FILL_COLOR,
    RandAugment,
    cutout_abs,
    posterize,
    rotate,
    shear_x,
    solarize,
    translate_x,
)


def _img(seed=0, h=64, w=80):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)


def _clip(n=4, seed=0):
    return {
        "imgs": [_img(seed + i) for i in range(n)],
        "img_shape": (64, 80),
        "rng": np.random.default_rng(42),
    }


def test_op_parity_with_pil():
    """Each color-type op must bit-match direct PIL application."""
    arr = _img()
    img = Image.fromarray(arr)
    assert np.array_equal(np.array(PIL.ImageOps.solarize(img, 128)), np.array(solarize(img, 128)))
    assert np.array_equal(np.array(PIL.ImageOps.posterize(img, 4)), np.array(posterize(img, 4)))
    assert np.array_equal(
        np.array(PIL.ImageEnhance.Contrast(img).enhance(0.5)),
        np.array(PIL.ImageEnhance.Contrast(img).enhance(0.5)),
    )


def test_geometric_fill_color():
    img = Image.fromarray(_img())
    out = np.array(translate_x(img, 0.3, flip_sign=False))
    # translate right->left by +0.3*W shifts content; vacated right side is fill
    assert tuple(out[0, -1]) == FILL_COLOR
    out = np.array(rotate(img, 30, flip_sign=False))
    assert tuple(out[0, 0]) == FILL_COLOR


def test_shear_sign_flip():
    img = Image.fromarray(_img())
    a = np.array(shear_x(img, 0.3, flip_sign=False))
    b = np.array(shear_x(img, 0.3, flip_sign=True))
    assert not np.array_equal(a, b)


def test_cutout_abs_rect():
    img = Image.fromarray(_img())
    out = np.array(cutout_abs(img, 20, (40, 32)))
    assert tuple(out[32, 40]) == FILL_COLOR
    # far corner untouched
    assert not np.array_equal(out[0, 0], np.array(FILL_COLOR))


def test_prob_zero_sets_flag_false():
    ra = RandAugment(n=2, m=10, prob=0.0)
    out = ra(_clip())
    assert out["randAug"] is False


def test_prob_one_applies_and_flags():
    ra = RandAugment(n=2, m=10, prob=1.0)
    clip = _clip()
    out = ra(clip)
    assert out["randAug"] is True


def test_clip_consistency():
    """All frames of a clip must receive identical transform parameters:
    applying the sampled ops to identical frames must give identical outputs."""
    ra = RandAugment(n=2, m=10, prob=1.0)
    base = _img(3)
    clip = {
        "imgs": [base.copy() for _ in range(4)],
        "img_shape": (64, 80),
        "rng": np.random.default_rng(5),
    }
    out = ra(clip)
    for i in range(1, 4):
        assert np.array_equal(out["imgs"][0], out["imgs"][i])


def test_mask_transformed_in_lockstep():
    ra = RandAugment(n=1, m=30, prob=1.0)
    # Force a geometric op by monkeypatching augment list to TranslateX only
    ra.augment_list = [AUGMENT_LIST[10]]  # TranslateX
    base = _img(3)
    mask = np.ones((64, 80, 3), np.uint8)
    clip = {
        "imgs": [base.copy()],
        "human_mask": [mask.copy()],
        "img_shape": (64, 80),
        "rng": np.random.default_rng(5),
    }
    out = ra(clip)
    # vacated region must be 0 in the mask (fillcolor=0) wherever img is FILL
    img_fill = np.all(out["imgs"][0] == np.array(FILL_COLOR), axis=-1)
    assert img_fill.any()
    assert (out["human_mask"][0][img_fill] == 0).all()


def test_fixmatch_table_size():
    assert len(AUGMENT_LIST) == 15
    names = [name for name, *_ in AUGMENT_LIST]
    assert names[0] == "Identity" and "CutoutAbs" in names and "Posterize" in names
