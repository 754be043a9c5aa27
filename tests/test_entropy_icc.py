"""Entropy decoder + ICC reconstruction tests against the real fixture.

This is the primary validation of the rANS core: decoding the embedded ICC
profile of cmyk_layers.jxl exercises histogram parsing (all encodings),
cluster maps, hybrid integers, and the 0x130000 final-state checksum.
"""

import io

import pytest

from jxl_oxide_tpu.coding.entropy import (
    Decoder,
    IntegerConfig,
    PrefixHistogram,
    add_log2_ceil,
    read_uint,
)
from jxl_oxide_tpu.color.icc import decode_icc, read_icc
from jxl_oxide_tpu.headers.image import ImageHeader
from jxl_oxide_tpu.io.bitstream import Bitstream
from jxl_oxide_tpu.io.container import ContainerParser


def _codestream(data: bytes) -> bytes:
    p = ContainerParser()
    return b"".join(e.data for e in p.feed(data) if e.kind == "codestream")


def test_real_icc_roundtrip(cmyk_layers_jxl):
    bs = Bitstream(_codestream(cmyk_layers_jxl))
    header = ImageHeader.parse(bs)
    assert header.metadata.colour_encoding.want_icc
    enc = read_icc(bs)  # raises if ANS final state mismatches
    icc = decode_icc(enc)
    assert icc[36:40] == b"acsp"
    assert int.from_bytes(icc[:4], "big") == len(icc)
    assert icc[16:20] == b"CMYK"
    # Validate with an independent CMS implementation.
    from PIL import ImageCms

    prof = ImageCms.ImageCmsProfile(io.BytesIO(icc))
    assert "SWOP" in prof.profile.profile_description


def test_add_log2_ceil():
    assert [add_log2_ceil(x) for x in [0, 1, 2, 3, 4, 7, 8, 255]] == [
        0, 1, 2, 2, 3, 3, 4, 8,
    ]


def test_prefix_histogram_canonical():
    # lengths: a=1, b=2, c=3, d=3 — canonical: a=0, b=10, c=110, d=111 (MSB)
    h = PrefixHistogram([1, 2, 3, 3])
    # LSB-first stream: symbol a = bit 0
    bs = Bitstream(bytes([0b0]))
    assert h.read_symbol(bs) == 0
    # b = bits 01 read LSB-first (code 10 MSB = reversed 01)
    bs = Bitstream(bytes([0b01]))
    assert h.read_symbol(bs) == 1
    # c = 110 MSB -> LSB 011
    bs = Bitstream(bytes([0b011]))
    assert h.read_symbol(bs) == 2
    # d = 111 -> LSB 111
    bs = Bitstream(bytes([0b111]))
    assert h.read_symbol(bs) == 3


def test_prefix_histogram_rejects_incomplete():
    from jxl_oxide_tpu.utils.errors import JxlBitstreamError

    with pytest.raises(JxlBitstreamError):
        PrefixHistogram([1, 3, 3])  # covers 1/2+1/8+1/8 != 1


def test_read_uint_literal_and_extended():
    cfg = IntegerConfig(split_exponent=4, msb_in_token=2, lsb_in_token=1)
    bs = Bitstream(b"\xff\xff")
    # token below split -> literal, no bits consumed
    assert read_uint(bs, cfg, 7) == 7
    assert bs.pos == 0
    # token 16 (== split): n = 4-3 + (0>>3) = 1
    # msb part: token>>1 & 3 | 4 ; lsb = token & 1
    bs = Bitstream(bytes([0b1]))
    v = read_uint(bs, cfg, 16)
    # t = (16>>1)&3 =0; t|=4 -> 4; result = ((4<<1)|1)<<1 | 0 = 18
    assert v == 18


def test_lz77_stream_decode():
    """LZ77-enabled entropy stream: literals then a copy run, then a
    special 2-D distance (jxl-coding lib.rs:310-368,487-569)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import AnsStreamEncoder, BitWriter, IntegerConfig

    from jxl_oxide_tpu.coding.entropy import Decoder, add_log2_ceil
    from jxl_oxide_tpu.io.bitstream import Bitstream

    cfg = IntegerConfig(split_exponent=8, msb_in_token=0, lsb_in_token=0)
    enc = AnsStreamEncoder(1, 256, 8, cfg)

    w = BitWriter()
    w.write_bool(True)  # lz77 enabled
    w.write(0, 2)       # min_symbol = 224
    w.write(0, 2)       # min_length = 3
    w.write(8, add_log2_ceil(8))  # len_config split_exponent = 8 (literals)
    w.write_bool(True)  # simple cluster map for 2 dists
    w.write(0, 2)       # nbits=0 -> all contexts -> cluster 0
    w.write_bool(False)  # ANS, not prefix
    w.write(3, 2)        # log_alphabet_size = 8
    enc._write_integer_config(w)
    enc._write_histogram(w)
    # tokens: 5, 7, 9, then copy-run: len token 225 -> copy 1+3=4,
    # distance token 0 -> distance 1 (repeat last symbol)
    enc.encode_raw_tokens(w, [
        (5, 0, 0), (7, 0, 0), (9, 0, 0), (225, 0, 0), (0, 0, 0),
    ])

    bs = Bitstream(w.to_bytes())
    dec = Decoder(bs, 1)
    dec.begin(bs)
    vals = [dec.read_varint(bs, 0) for _ in range(7)]
    dec.finalize()
    assert vals == [5, 7, 9, 9, 9, 9, 9]


def test_lz77_special_distances():
    """dist_multiplier != 0 routes distances < 120 through the special
    2-D distance table (lib.rs:497-510)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import AnsStreamEncoder, BitWriter, IntegerConfig

    from jxl_oxide_tpu.coding.entropy import (
        _SPECIAL_DISTANCES, Decoder, add_log2_ceil,
    )
    from jxl_oxide_tpu.io.bitstream import Bitstream

    cfg = IntegerConfig(split_exponent=8, msb_in_token=0, lsb_in_token=0)
    enc = AnsStreamEncoder(1, 256, 8, cfg)
    w = BitWriter()
    w.write_bool(True)
    w.write(0, 2)
    w.write(0, 2)
    w.write(8, add_log2_ceil(8))
    w.write_bool(True)
    w.write(0, 2)
    w.write_bool(False)
    w.write(3, 2)
    enc._write_integer_config(w)
    enc._write_histogram(w)
    # 4 literals then copy 3 with special distance index 0
    enc.encode_raw_tokens(w, [
        (1, 0, 0), (2, 0, 0), (3, 0, 0), (4, 0, 0), (224, 0, 0), (0, 0, 0),
    ])
    bs = Bitstream(w.to_bytes())
    dec = Decoder(bs, 1)
    dec.begin(bs)
    mult = 2
    vals = [dec.read_varint(bs, 0, dist_multiplier=mult) for _ in range(7)]
    dec.finalize()
    off, d = _SPECIAL_DISTANCES[0]
    distance = max(0, off + mult * d - 1)
    distance = min(distance, 1 << 20) + 1 if distance < (1 << 20) else distance
    distance = min(distance, 4)
    want = [1, 2, 3, 4]
    src = len(want) - distance
    for _ in range(3):
        want.append(want[src])
        src += 1
    assert vals == want


def test_prefix_code_stream():
    """Brotli-style prefix-code path (prefix.rs simple form): 2-symbol
    1-bit canonical code, literal hybrid-uint tokens."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import BitWriter

    from jxl_oxide_tpu.coding.entropy import Decoder, add_log2_ceil
    from jxl_oxide_tpu.io.bitstream import Bitstream

    w = BitWriter()
    w.write_bool(False)  # lz77 off
    w.write_bool(True)   # use_prefix_code
    w.write(15, add_log2_ceil(15))  # IntegerConfig: split_exponent = 15
    # alphabet size 16: bool(True), n=3, 1+8+7 = 16
    w.write_bool(True)
    w.write(3, 4)
    w.write(7, 3)
    # PrefixHistogram: hskip=1 -> simple form, 2 symbols {5, 9}, 1 bit each
    w.write(1, 2)
    w.write(1, 2)  # nsym - 1
    w.write(5, 4)
    w.write(9, 4)
    # canonical: symbol 5 -> bit 0, symbol 9 -> bit 1
    for bit in (0, 1, 1, 0, 0, 1):
        w.write(bit, 1)

    bs = Bitstream(w.to_bytes())
    dec = Decoder(bs, 1)
    dec.begin(bs)
    vals = [dec.read_varint(bs, 0) for _ in range(6)]
    dec.finalize()
    assert vals == [5, 9, 9, 5, 5, 9]


def test_cluster_map_mtf():
    """Entropy-coded cluster map with move-to-front (lib.rs:688-749)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import AnsStreamEncoder, BitWriter, DEFAULT_CFG

    from jxl_oxide_tpu.coding.entropy import read_clusters
    from jxl_oxide_tpu.io.bitstream import Bitstream

    w = BitWriter()
    w.write_bool(False)  # not simple
    w.write_bool(True)   # use_mtf
    enc = AnsStreamEncoder(1, 32, 5, DEFAULT_CFG)
    enc.write_header(w)
    # desired clusters [0, 1, 0, 2] -> MTF tokens [0, 1, 1, 2]
    enc.encode_tokens(w, [0, 1, 1, 2])

    bs = Bitstream(w.to_bytes())
    num_clusters, clusters = read_clusters(bs, 4)
    assert clusters == [0, 1, 0, 2]
    assert num_clusters == 3


def test_ans_histogram_forms():
    """ANS histogram encodings beyond 'evenly distributed' (ans.rs:48-178):
    binary two-symbol, unary single-symbol, and the compressed form with
    prefix-coded log counts and omitted max entry."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import BitWriter

    from jxl_oxide_tpu.coding.entropy import AnsHistogram
    from jxl_oxide_tpu.io.bitstream import Bitstream

    # binary: dist[2] = 1000, dist[5] = 3096
    w = BitWriter()
    w.write_bool(True)
    w.write_bool(True)
    for v in (2, 5):  # u8-coded symbols
        w.write_bool(True)
        n = v.bit_length() - 1
        w.write(n, 3)
        w.write(v - (1 << n), n)
    w.write(1000, 12)
    h = AnsHistogram(Bitstream(w.to_bytes()), 5)
    assert h.dist[2] == 1000 and h.dist[5] == 4096 - 1000

    # unary: all mass on symbol 3
    w = BitWriter()
    w.write_bool(True)
    w.write_bool(False)
    w.write_bool(True)
    w.write(1, 3)
    w.write(1, 1)  # u8-coded: 2 + 1 = 3
    h = AnsHistogram(Bitstream(w.to_bytes()), 5)
    assert h.dist[3] == 4096 and h.single_symbol == 3

    # compressed: dist [1024, 512, 2048(omitted), 512], shift 13
    w = BitWriter()
    w.write_bool(False)
    w.write_bool(False)
    for _ in range(3):
        w.write_bool(True)  # length = 3
    w.write(6, 3)  # shift = 6 + 7 = 13
    w.write_bool(True)  # alphabet_size - 3 = 1 (u8-coded)
    w.write(0, 3)
    # log-count codes (kLogCountLut inverse)
    # c=11: 3-bit 1 then F,F,T ; c=10: 3-bit 0 ; c=12: 3-bit 1 then FFFF
    w.write(1, 3); w.write_bool(False); w.write_bool(False); w.write_bool(True)
    w.write(0, 3)
    w.write(1, 3)
    for _ in range(4):
        w.write_bool(False)
    w.write(0, 3)
    # extra value bits follow per non-omitted entry in order:
    # idx0 c=11 -> zeros=10, bitcount=10, value bits 0
    # idx1 c=10 -> zeros=9, bits 0 ; idx3 same
    w.write(0, 10)
    w.write(0, 9)
    w.write(0, 9)
    h = AnsHistogram(Bitstream(w.to_bytes()), 5)
    assert list(h.dist[:4]) == [1024, 512, 2048, 512], list(h.dist[:4])


def test_prefix_code_complex_form():
    """Complex prefix-code form (prefix.rs parse_complex): code-length
    code with a single-symbol shortcut, flat 2-bit symbol code."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder import BitWriter

    from jxl_oxide_tpu.coding.entropy import PrefixHistogram
    from jxl_oxide_tpu.io.bitstream import Bitstream

    def build(stream_bits):
        w = BitWriter()
        w.write(0, 2)  # hskip = 0 -> complex form
        # code-length code: only cl-symbol '2' nonzero (single-symbol
        # shortcut after scanning all 18 entries). Order starts (1, 2, ...)
        w.write(0, 2)  # cl sym 1: length 0
        w.write(3, 2)  # cl sym 2: extension
        w.write_bool(True)
        w.write_bool(True)  # -> length 5
        for _ in range(16):
            w.write(0, 2)  # remaining cl symbols: 0
        # 4 symbol lengths, all '2', zero bits each (single-symbol cl code)
        for b, n in stream_bits:
            w.write(b, n)
        return Bitstream(w.to_bytes())

    bs = build([])
    hist = PrefixHistogram.parse(bs, 4)
    decoded = []
    for b in range(4):
        bs2 = build([(b, 2)])
        PrefixHistogram.parse(bs2, 4)
        decoded.append(hist.read_symbol(bs2))
    assert sorted(decoded) == [0, 1, 2, 3]
    assert decoded[0] == 0  # canonical: symbol 0 <- code 00


def test_native_table_parse_matches_python():
    """The C++ entropy-table parser (jxlhost_parse_decoder) must produce
    byte-identical serialized tables and the same final bit position as
    the Python parser, across ANS and prefix streams with/without LZ77."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo/tools")
    from encoder import DEFAULT_CFG, AnsStreamEncoder, BitWriter

    from jxl_oxide_tpu import native as _native
    from jxl_oxide_tpu.coding.entropy import Decoder
    from jxl_oxide_tpu.io.bitstream import Bitstream

    if not _native.available():
        pytest.skip("native unavailable")

    rng = np.random.default_rng(17)
    streams = []
    for num_ctx, alphabet in [(1, 16), (8, 64), (39, 256), (495 * 15, 256)]:
        w = BitWriter()
        enc = AnsStreamEncoder(num_ctx, alphabet, 8, DEFAULT_CFG)
        enc.write_header(w)
        toks = [int(t) for t in rng.integers(0, alphabet, 400)]
        enc.encode_tokens(w, toks)
        streams.append((w.to_bytes(), num_ctx, toks))

    for data, num_ctx, toks in streams:
        bs_py = Bitstream(bytearray(data))  # bytearray forces python parse
        dec_py = Decoder(bs_py, num_ctx)
        bs_nat = Bitstream(bytes(data))
        dec_nat = Decoder(bs_nat, num_ctx)
        assert bs_py.pos == bs_nat.pos
        from jxl_oxide_tpu.native import DecoderTables

        tp = DecoderTables(dec_py)
        tn = dec_nat._native_tables
        for name in ("header", "cluster_map", "cfgs", "ans_meta",
                     "ans_blob", "pfx_meta", "pfx_blob"):
            np.testing.assert_array_equal(
                np.asarray(getattr(tp, name)),
                np.asarray(getattr(tn, name)), err_msg=name,
            )
        # decoded tokens agree through the PYTHON symbol loop too
        dec_nat.begin(bs_nat)
        got = [dec_nat.read_varint(bs_nat, 0) for _ in range(50)]
        dec_py.begin(bs_py)
        want = [dec_py.read_varint(bs_py, 0) for _ in range(50)]
        assert got == want
