"""Container parser tests, including the real cmyk_layers.jxl fixture."""

import numpy as np
import pytest

from jxl_oxide_tpu.io.container import BitstreamKind, ContainerParser
from jxl_oxide_tpu.utils.errors import JxlBitstreamError


def test_bare_codestream():
    p = ContainerParser()
    events = p.feed(b"\xff\x0a123456")
    assert p.kind == BitstreamKind.BARE_CODESTREAM
    cs = b"".join(e.data for e in events if e.kind == "codestream")
    assert cs == b"\xff\x0a123456"


def _box(ty: bytes, content: bytes, to_eof=False) -> bytes:
    if to_eof:
        return (0).to_bytes(4, "big") + ty + content
    return (8 + len(content)).to_bytes(4, "big") + ty + content


def test_container_jxlc():
    from jxl_oxide_tpu.io.container import CONTAINER_SIG

    data = (
        CONTAINER_SIG
        + _box(b"ftyp", b"jxl \x00\x00\x00\x00jxl ")
        + _box(b"jxlc", b"\xff\x0acodestream!")
    )
    p = ContainerParser()
    events = p.feed(data)
    assert p.kind == BitstreamKind.CONTAINER
    cs = b"".join(e.data for e in events if e.kind == "codestream")
    assert cs == b"\xff\x0acodestream!"


def test_container_jxlp_ordering():
    from jxl_oxide_tpu.io.container import CONTAINER_SIG

    part0 = (0).to_bytes(4, "big") + b"part0!"
    part1 = (0x80000001).to_bytes(4, "big") + b"part1!"
    data = CONTAINER_SIG + _box(b"jxlp", part0) + _box(b"jxlp", part1)
    p = ContainerParser()
    events = p.feed(data)
    cs = b"".join(e.data for e in events if e.kind == "codestream")
    assert cs == b"part0!part1!"

    bad = CONTAINER_SIG + _box(b"jxlp", part1)
    p = ContainerParser()
    with pytest.raises(JxlBitstreamError):
        p.feed(bad)


def test_incremental_feed_one_byte_at_a_time():
    from jxl_oxide_tpu.io.container import CONTAINER_SIG

    data = CONTAINER_SIG + _box(b"Exif", b"EXIFDATA") + _box(b"jxlc", b"\xff\x0aXY")
    p = ContainerParser()
    events = []
    for i in range(len(data)):
        events += p.feed(data[i : i + 1])
    aux = b"".join(e.data for e in events if e.kind == "aux_data")
    cs = b"".join(e.data for e in events if e.kind == "codestream")
    assert aux == b"EXIFDATA"
    assert cs == b"\xff\x0aXY"
    starts = [e for e in events if e.kind == "aux_start"]
    assert starts and starts[0].box_type == b"Exif"


def test_real_file_detects_container(cmyk_layers_jxl):
    p = ContainerParser()
    events = p.feed(cmyk_layers_jxl)
    assert p.kind == BitstreamKind.CONTAINER
    cs = b"".join(e.data for e in events if e.kind == "codestream")
    assert cs[:2] == b"\xff\x0a"
    assert len(cs) > 1000


def test_invalid_signature():
    p = ContainerParser()
    with pytest.raises(JxlBitstreamError):
        p.feed(b"GIF89a")


def test_brob_box_and_metadata_accessors():
    """brob (brotli-compressed) aux boxes decompress transparently through
    JxlImage.aux_box; Exif/XMP accessors apply the tiff-offset rule
    (aux_box.rs:16-360)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import encode_jxl_modular
    from test_jbr import brotli_compress

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.io.container import CONTAINER_SIG

    codestream = encode_jxl_modular(
        [np.zeros((8, 8), dtype=np.int64)], bit_depth=8, grayscale=True
    )
    exif_payload = (0).to_bytes(4, "big") + b"II*\x00EXIFBODY"
    xmp = b"<x:xmpmeta/>"
    data = (
        CONTAINER_SIG
        + _box(b"Exif", exif_payload)
        + _box(b"brob", b"xml " + brotli_compress(xmp))
        + _box(b"jxlc", codestream)
    )
    img = JxlImage.from_bytes(data)
    assert img.aux_box(b"Exif") == exif_payload
    assert img.raw_exif_data == b"II*\x00EXIFBODY"
    assert img.aux_box(b"xml ") == xmp
    assert img.raw_xmp == xmp
    img.render_frame(0)
