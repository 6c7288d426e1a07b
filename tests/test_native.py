"""Native (C++) preprocessing: bit-exactness vs PIL and the PIL fallback path.

The native resampler (vit_pruning_tpu/native/preprocess.cpp) claims BYTE
parity with PIL's BILINEAR resize — the resize HF's ViTImageProcessor applies
(himanshu/main_model_utils.py:58) — and bit-identical float32 output vs
data/preprocess.py::pil_preprocess. These tests are the claim.
"""

import numpy as np
import pytest

from vit_pruning_tpu import native
from vit_pruning_tpu.data.preprocess import pil_preprocess

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native build unavailable (no g++?)"
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((32, 32), (224, 224)),   # CIFAR upscale — the reference's main path
        ((64, 64), (224, 224)),   # TinyImageNet upscale
        ((224, 224), (96, 128)),  # downscale, non-square
        ((100, 67), (31, 45)),    # odd sizes both ways
        ((224, 224), (224, 224)), # identity
        ((50, 224), (224, 50)),   # one axis up, one down
    ],
)
def test_resize_byte_exact_vs_pil(in_hw, out_hw):
    from PIL import Image

    (h, w), (oh, ow) = in_hw, out_hw
    ims = RNG.randint(0, 256, (4, h, w, 3), np.uint8)
    ours = native.resize_bilinear(ims, oh, ow)
    ref = np.stack(
        [np.asarray(Image.fromarray(im).resize((ow, oh), Image.BILINEAR))
         for im in ims]
    )
    np.testing.assert_array_equal(ours, ref)


def test_fused_preprocess_bit_identical_to_pil_path():
    ims = RNG.randint(0, 256, (6, 32, 32, 3), np.uint8)
    ours = native.preprocess(ims, size=224)
    ref = pil_preprocess(list(ims), size=224)
    assert ours.dtype == np.float32 and ours.shape == (6, 3, 224, 224)
    np.testing.assert_array_equal(ours, ref)


def test_threaded_equals_single_thread():
    ims = RNG.randint(0, 256, (8, 48, 40, 3), np.uint8)
    np.testing.assert_array_equal(
        native.preprocess(ims, size=64, nthreads=1),
        native.preprocess(ims, size=64, nthreads=4),
    )
    np.testing.assert_array_equal(
        native.resize_bilinear(ims, 224, 224, nthreads=1),
        native.resize_bilinear(ims, 224, 224, nthreads=4),
    )


def test_pil_preprocess_uses_native_fast_path():
    """pil_preprocess auto-dispatches to the native kernel for uniform uint8
    batches; the result must match the pure-PIL loop bit-for-bit."""
    ims = RNG.randint(0, 256, (5, 32, 32, 3), np.uint8)
    fast = pil_preprocess(list(ims), size=96)
    slow = pil_preprocess(list(ims), size=96, _force_pil=True)
    np.testing.assert_array_equal(fast, slow)


def test_preprocess_rejects_bad_input():
    with pytest.raises(ValueError):
        native.preprocess(RNG.rand(2, 32, 32, 3).astype(np.float32))
    with pytest.raises(ValueError):
        native.preprocess(RNG.randint(0, 256, (2, 32, 32, 4), np.uint8))


def test_pil_preprocess_generator_and_per_channel_stats():
    """The dispatch guard must not break the old pil_preprocess contract:
    generator inputs (single pass) and per-channel mean/std broadcasting."""
    ims = RNG.randint(0, 256, (4, 32, 32, 3), np.uint8)
    from_gen = pil_preprocess((im for im in ims), size=64)
    np.testing.assert_array_equal(from_gen, pil_preprocess(ims, size=64))
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    got = pil_preprocess(ims, size=64, mean=np.float32(mean), std=np.float32(std))
    ref = pil_preprocess(ims, size=64, mean=np.float32(mean),
                         std=np.float32(std), _force_pil=True)
    np.testing.assert_array_equal(got, ref)
    with pytest.raises(ValueError, match="scalar"):
        native.preprocess(ims, size=64, mean=mean, std=std)
