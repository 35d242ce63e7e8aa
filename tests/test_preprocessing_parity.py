"""Image preprocessing parity vs HF processors (no weights needed).

The caption metrics depend on pixel-exact preprocessing; these tests
compare our PIL-based preprocessors (utils/processor.py) and the native
C++ pipeline (native/ddtpu_image.cpp) against the HF reference processors
on random images."""
import numpy as np
import pytest
from PIL import Image

from dropoutdecoding_tpu.utils.processor import (
    ClipImagePreprocessor,
    LlavaNextImagePreprocessor,
)

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def _img(rng, h, w):
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8), "RGB")


@pytest.mark.parametrize("size", [(250, 400), (400, 250), (336, 336), (123, 457)])
def test_clip_preprocessor_matches_hf(rng, size):
    from transformers import CLIPImageProcessor

    hf = CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": 336},
        do_center_crop=True,
        crop_size={"height": 336, "width": 336},
        do_rescale=True,
        do_normalize=True,
        do_convert_rgb=True,
    )
    ours = ClipImagePreprocessor(size=336)
    img = _img(rng, *size)
    ref = hf(img, return_tensors="np")["pixel_values"][0]
    got = ours(img)
    assert got.shape == ref.shape == (3, 336, 336)
    # identical resize path (PIL bicubic) => tight tolerance
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("size", [(250, 400), (700, 300), (336, 1200), (500, 500)])
def test_llava_next_preprocessor_matches_hf(rng, size):
    """Tile geometry + pixels vs HF get_image_patches (the anyres pipeline;
    compared pre-normalization since normalize is elementwise)."""
    from transformers import LlavaNextImageProcessor
    from transformers.image_utils import ChannelDimension, PILImageResampling

    from dropoutdecoding_tpu.utils.processor import (
        OPENAI_CLIP_MEAN,
        OPENAI_CLIP_STD,
    )

    pinpoints = [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]
    hf = LlavaNextImageProcessor(
        size={"shortest_edge": 336}, image_grid_pinpoints=pinpoints
    )
    ours = LlavaNextImagePreprocessor(pinpoints, tile_size=336)
    img = _img(rng, *size)
    patches = hf.get_image_patches(
        np.asarray(img),
        pinpoints,
        size=(336, 336),
        patch_size=336,
        resample=PILImageResampling.BICUBIC,
        data_format=ChannelDimension.LAST,
        input_data_format=ChannelDimension.LAST,
    )
    ref = np.stack(
        [
            ((p.astype(np.float32) / 255.0 - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD)
            .transpose(2, 0, 1)
            for p in patches
        ]
    )
    got, orig = ours(img)
    assert orig == size
    assert got.shape == ref.shape, (got.shape, ref.shape)
    diff = np.abs(got - ref)
    # same algorithms; bicubic rounding differences stay tiny
    assert diff.max() < 0.05, diff.max()
    assert diff.mean() < 2e-3


def test_native_clip_pipeline_close_to_pil(rng, tmp_path):
    from dropoutdecoding_tpu.utils import native_image as ni

    if not ni.available():
        pytest.skip("native pipeline unavailable")
    img = _img(rng, 250, 333)
    path = str(tmp_path / "t.jpg")
    img.save(path, "JPEG", quality=98)

    pil = ClipImagePreprocessor(size=336)(Image.open(path).convert("RGB"))
    native = ni.NativeClipPreprocessor(size=336).from_file(path)
    assert native.shape == pil.shape
    # native keeps float intermediates and float coefficients where PIL
    # rounds both to fixed precision; on noise images (worst case) isolated
    # pixels can differ by a few LSB — assert distributional closeness
    diff = np.abs(native - pil)
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.999) < 0.08, np.quantile(diff, 0.999)
    assert diff.max() < 0.5, diff.max()
