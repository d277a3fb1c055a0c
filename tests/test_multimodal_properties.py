"""Property-based pixel-codec tests (hypothesis): arbitrary rasters
survive every encode->decode path bit-exactly, across all three
containers and every PNG scanline filter."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataset_grouper_spark.operators import multimodal

dims = st.tuples(
    st.integers(min_value=1, max_value=12),  # height
    st.integers(min_value=1, max_value=12),  # width
)


def _raster(h, w, seed):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, 3))
        .astype(np.uint8)
    )


@given(dims, st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=120, deadline=None)
def test_all_containers_roundtrip_bit_exact(hw, seed):
    h, w = hw
    rgb = _raster(h, w, seed)
    for enc in (
        multimodal.encode_bmp_pixels,
        multimodal.encode_ppm_pixels,
        multimodal.encode_png_pixels,
    ):
        got = multimodal.decode_pixels(enc(rgb))
        assert got is not None and np.array_equal(got, rgb), enc.__name__


@given(
    dims,
    st.integers(min_value=0, max_value=2**32 - 1),
    st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
)
@settings(max_examples=120, deadline=None)
def test_png_any_filter_sequence_roundtrips(hw, seed, filters):
    h, w = hw
    rgb = _raster(h, w, seed)
    png = multimodal.encode_png_pixels(rgb, filters)
    got = multimodal.decode_pixels(png)
    assert got is not None and np.array_equal(got, rgb), filters
