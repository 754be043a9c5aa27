"""End-to-end Modular frame decode on the real cmyk_layers.jxl fixture.

Every TOC section is an independent rANS stream whose final state must equal
0x130000; a single wrong prediction/property/context would desync the decoder
and fail that check, so clean decode of all 4 layer frames transitively
validates the MA tree walk, all exercised predictors, and channel plumbing.
"""

import numpy as np
import pytest

from jxl_oxide_tpu.color.icc import read_icc
from jxl_oxide_tpu.headers.image import ImageHeader
from jxl_oxide_tpu.io.bitstream import Bitstream
from jxl_oxide_tpu.io.container import ContainerParser
from jxl_oxide_tpu.render.frame import Frame


@pytest.fixture(scope="module")
def decoded_frames(cmyk_layers_jxl):
    p = ContainerParser()
    cs = b"".join(e.data for e in p.feed(cmyk_layers_jxl) if e.kind == "codestream")
    bs = Bitstream(cs)
    header = ImageHeader.parse(bs)
    read_icc(bs)
    frames = []
    while True:
        frame = Frame(header, bs)
        end = frame.start_byte + frame.data_start + frame.toc.total_size
        frame.feed_bytes(cs[frame.start_byte + frame.data_start : end])
        channels = frame.decode_modular_frame()
        frames.append((frame, channels))
        if frame.header.is_last:
            break
        bs.pos = end * 8
    return frames


def test_frame_count_and_names(decoded_frames):
    names = [f.header.name for f, _ in decoded_frames]
    assert names == ["Background", "Layer 1", "Test Name", "Black"]


def test_frame_geometry(decoded_frames):
    f1 = decoded_frames[1][0].header
    assert (f1.width, f1.height, f1.x0, f1.y0) == (200, 107, 143, 166)
    assert f1.blending_info.mode.name == "BLEND"
    assert f1.blending_info.alpha_channel == 1


def test_channel_shapes_and_ranges(decoded_frames):
    for frame, channels in decoded_frames:
        assert len(channels) == 5  # RGB + black + alpha
        for c in channels:
            assert c.shape == (frame.header.height, frame.header.width)
            # 8-bit image: all samples must land in [0, 255]
            assert c.min() >= 0 and c.max() <= 255


def test_background_stats(decoded_frames):
    # Background layer is mostly white; alpha fully opaque.
    _, channels = decoded_frames[0]
    assert channels[4].min() == 255  # alpha constant
    assert channels[0].mean() > 200
