"""JPEG reconstruction tests: synthetic jbrd box -> reconstruct -> decode
the produced JPEG with PIL and compare pixels against the coefficient math.

Builds the jbrd header bit-exactly (same bitstream conventions as the
parser) and compresses the data stream with the system brotli encoder, so
the whole path — header parse, brotli, marker replay, DQT/DHT writing,
sequential scan Huffman encoding, bit stuffing — is exercised.
"""

import ctypes
import ctypes.util
import io
import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from encoder import BitWriter  # noqa: E402

from jxl_oxide_tpu.headers.frame import Encoding
from jxl_oxide_tpu.jbr import JpegBitstreamData, reconstruct_jpeg


def idct2d(block):
    # imported lazily: the ASan harness imports this module without jax
    from jxl_oxide_tpu.ops.dct import idct2d as _f

    return _f(block)


def brotli_compress(data: bytes) -> bytes:
    name = ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1"
    lib = ctypes.CDLL(name)
    lib.BrotliEncoderCompress.restype = ctypes.c_int
    out = ctypes.create_string_buffer(len(data) + 1024)
    out_len = ctypes.c_size_t(len(out))
    ret = lib.BrotliEncoderCompress(
        5, 22, 0,
        ctypes.c_size_t(len(data)), ctypes.c_char_p(data),
        ctypes.byref(out_len), out,
    )
    assert ret == 1
    return out.raw[: out_len.value]


# Standard JPEG Annex K luminance tables
DC_COUNTS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALUES = list(range(12))
AC_COUNTS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALUES = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _write_u32_dist(w, value, dists):
    """Write a U32-distribution value (selectors with (bits, offset))."""
    for sel, (bits, offset) in enumerate(dists):
        if offset <= value < offset + (1 << bits):
            w.write(sel, 2)
            if bits:
                w.write(value - offset, bits)
            return
    raise AssertionError(f"value {value} not encodable")


def _write_huffman_code(w, is_ac, hid, is_last, counts, values):
    """Inverse of jbr HuffmanCode.parse, including the sentinel value."""
    # add sentinel: bump the largest used length count, append sentinel value
    counts = list(counts)
    values = list(values)
    last_len = max(i for i, c in enumerate(counts) if c)
    counts[last_len] += 1
    values.append(0)

    w.write_bool(is_ac)
    w.write(hid, 2)
    w.write_bool(is_last)
    for c in counts:
        # U32(0, 1, 2+u(3), u(8))
        if c == 0:
            w.write(0, 2)
        elif c == 1:
            w.write(1, 2)
        elif c < 10:
            w.write(2, 2)
            w.write(c - 2, 3)
        else:
            w.write(3, 2)
            w.write(c, 8)
    for v in values:
        # U32(u(2), 4+u(2), 8+u(4), 1+u(8))
        if v < 4:
            w.write(0, 2)
            w.write(v, 2)
        elif v < 8:
            w.write(1, 2)
            w.write(v - 4, 2)
        elif v < 24:
            w.write(2, 2)
            w.write(v - 8, 4)
        else:
            w.write(3, 2)
            w.write(v - 1, 8)


def make_jbrd_box(markers, tail=b"") -> bytes:
    """Craft a grayscale sequential jbrd header + compressed data stream."""
    w = BitWriter()
    w.write_bool(True)  # is_gray
    for m in markers:
        w.write(m - 0xC0, 6)
    # no app markers, no com
    w.write(0, 2)  # num_quant_tables - 1 = 0
    # QuantTable: precision 0, index 0, is_last
    w.write(0, 1)
    w.write(0, 2)
    w.write_bool(True)
    w.write(0, 2)  # comp_type = 0 -> ids [1]
    w.write(0, 2)  # q_idx for the component
    # num_huff = 2: U32(4, 2+u(3), 10+u(4), 26+u(6)): value 2 -> sel 1, u3=0
    w.write(1, 2)
    w.write(0, 3)
    _write_huffman_code(w, False, 0, False, DC_COUNTS, DC_VALUES)
    _write_huffman_code(w, True, 0, True, AC_COUNTS, AC_VALUES)
    # ScanInfo: 1 comp, ss=0 se=63 al=0 ah=0
    w.write(0, 2)  # num_comps - 1
    w.write(0, 6)  # ss
    w.write(63, 6)  # se
    w.write(0, 4)  # al
    w.write(0, 4)  # ah
    # ScanComponentInfo: comp 0, ac_tbl 0, dc_tbl 0
    w.write(0, 2)
    w.write(0, 2)
    w.write(0, 2)
    # last_needed_pass: U32(0,1,2,3+u(3)) -> 0
    w.write(0, 2)
    # ScanMoreInfo: no reset points, no extra zero runs
    w.write(0, 2)
    w.write(0, 2)
    # tail_data_length
    if len(tail) == 0:
        w.write(0, 2)
    else:
        w.write(1, 2)
        w.write(len(tail) - 1, 8)
    w.write_bool(False)  # no padding bits
    w.zero_pad_to_byte()
    header_bytes = w.to_bytes()
    return header_bytes + brotli_compress(tail)


class _Flags:
    use_lf_frame = False
    skip_adaptive_lf_smoothing = True


def make_fake_frame(width, height, lf_quant_y, coeff_y, quant):
    """Frame-like object with just the attributes reconstruct_jpeg needs."""
    frame_header = types.SimpleNamespace(
        encoding=Encoding.VARDCT,
        do_ycbcr=True,  # dc_offset = 0 path; component idx passthrough
        jpeg_upsampling=(0, 0, 0),
        flags=_Flags(),
        width=width,
        height=height,
        lf_groups_per_row=1,
        lf_group_dim=2048,
    )
    image_header = types.SimpleNamespace(
        metadata=types.SimpleNamespace(xyb_encoded=False),
        size=types.SimpleNamespace(width=width, height=height),
    )
    h8, w8 = -(-height // 8), -(-width // 8)
    zero_lf = np.zeros((h8, w8), dtype=np.int32)
    zero_hf = np.zeros((h8 * 8, w8 * 8), dtype=np.int32)
    state = types.SimpleNamespace(
        # planes in [x, y, b] order
        coeff_planes=[zero_hf, coeff_y, zero_hf.copy()],
        lf_quant_planes=[zero_lf, lf_quant_y, zero_lf.copy()],
        plane_shapes=[(h8 * 8, w8 * 8)] * 3,
        width_rounded=w8 * 8,
        height_rounded=h8 * 8,
        lf_groups={},
        header=frame_header,
    )
    hf_global = types.SimpleNamespace(
        dequant_matrices=types.SimpleNamespace(
            jpeg_quant_values=[list(quant.ravel())] * 3
        )
    )
    return types.SimpleNamespace(
        header=frame_header,
        image_header=image_header,
        _vardct_state=state,
        _hf_global=hf_global,
    )


def test_reconstruct_grayscale_sequential():
    """DC-only 16x16 grayscale JPEG: PIL-decoded pixels must match
    DC * quant / 8 + 128 per block."""
    from PIL import Image

    quant = np.full((8, 8), 16, dtype=np.int32)
    lf_quant = np.array([[2, -3], [5, 0]], dtype=np.int32)
    coeff = np.zeros((16, 16), dtype=np.int32)

    markers = [0xC0, 0xC4, 0xDB, 0xDA, 0xD9]
    jbrd = JpegBitstreamData(make_jbrd_box(markers))
    frame = make_fake_frame(16, 16, lf_quant, coeff, quant)
    jpeg = reconstruct_jpeg(jbrd, frame)

    assert jpeg[:2] == b"\xff\xd8" and jpeg[-2:] == b"\xff\xd9"
    img = Image.open(io.BytesIO(jpeg))
    arr = np.asarray(img.convert("L"), dtype=np.float64)
    assert arr.shape == (16, 16)
    for by in range(2):
        for bx in range(2):
            block = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            expected = np.clip(lf_quant[by, bx] * 16 / 8.0 + 128.0, 0, 255)
            np.testing.assert_allclose(block.mean(), expected, atol=1.5)


def test_reconstruct_with_ac_coefficients():
    """AC coefficients must survive the run-length Huffman encoding."""
    from PIL import Image

    quant = np.full((8, 8), 8, dtype=np.int32)
    lf_quant = np.array([[10]], dtype=np.int32)
    coeff = np.zeros((8, 8), dtype=np.int32)
    coeff[0, 1] = 4   # horizontal AC (stored layout row=vfreq? col=hfreq)
    coeff[3, 2] = -2
    coeff[7, 7] = 1

    markers = [0xC0, 0xC4, 0xDB, 0xDA, 0xD9]
    jbrd = JpegBitstreamData(make_jbrd_box(markers))
    frame = make_fake_frame(8, 8, lf_quant, coeff, quant)
    jpeg = reconstruct_jpeg(jbrd, frame)

    img = Image.open(io.BytesIO(jpeg))
    arr = np.asarray(img.convert("L"), dtype=np.float64) - 128.0

    # expected: JPEG IDCT of (coeff * quant). JPEG's convention maps to
    # our idct2d with an extra 1/8 scale per axis (DC = F/8 -> mean).
    F = coeff.astype(np.float64) * 8.0
    F[0, 0] = 10 * 8.0
    expected = idct2d((F / 8.0).astype(np.float32))
    np.testing.assert_allclose(arr, expected, atol=1.5)


def test_tail_data_preserved():
    markers = [0xC0, 0xC4, 0xDB, 0xDA, 0xD9]
    tail = b"TRAILER-BYTES"
    jbrd = JpegBitstreamData(make_jbrd_box(markers, tail=tail))
    quant = np.full((8, 8), 16, dtype=np.int32)
    frame = make_fake_frame(8, 8, np.zeros((1, 1), np.int32),
                            np.zeros((8, 8), np.int32), quant)
    jpeg = reconstruct_jpeg(jbrd, frame)
    assert jpeg.endswith(tail)


def make_jbrd_box_color_420(markers, tail=b"") -> bytes:
    """Craft a 3-component (YCbCr, 4:2:0) sequential jbrd header."""
    w = BitWriter()
    w.write_bool(False)  # is_gray = False
    for m in markers:
        w.write(m - 0xC0, 6)
    w.write(1, 2)  # num_quant_tables - 1 = 1 (luma + chroma)
    for idx, last in ((0, False), (1, True)):
        w.write(0, 1)       # precision 0
        w.write(idx, 2)     # table index
        w.write_bool(last)
    w.write(1, 2)  # comp_type = 1 -> ids [1, 2, 3]
    for q_idx in (0, 1, 1):
        w.write(q_idx, 2)
    # num_huff = 4: U32(4, 2+u(3), ...) -> sel 1, u3 = 2
    w.write(1, 2)
    w.write(2, 3)
    _write_huffman_code(w, False, 0, False, DC_COUNTS, DC_VALUES)
    _write_huffman_code(w, True, 0, False, AC_COUNTS, AC_VALUES)
    _write_huffman_code(w, False, 1, False, DC_COUNTS, DC_VALUES)
    _write_huffman_code(w, True, 1, True, AC_COUNTS, AC_VALUES)
    # ScanInfo: 3 comps, ss=0 se=63
    w.write(2, 2)  # num_comps - 1
    w.write(0, 6)
    w.write(63, 6)
    w.write(0, 4)
    w.write(0, 4)
    for comp, tbl in ((0, 0), (1, 1), (2, 1)):
        w.write(comp, 2)
        w.write(tbl, 2)  # ac table
        w.write(tbl, 2)  # dc table
    w.write(0, 2)  # last_needed_pass
    w.write(0, 2)  # no reset points
    w.write(0, 2)  # no extra zero runs
    if len(tail) == 0:
        w.write(0, 2)
    else:
        w.write(1, 2)
        w.write(len(tail) - 1, 8)
    w.write_bool(False)  # no padding bits
    w.zero_pad_to_byte()
    return w.to_bytes() + brotli_compress(tail)


def test_reconstruct_color_420():
    """Interleaved 4:2:0 MCU scan (2x2 luma + Cb + Cr per MCU,
    reconstruct.rs MCU loop): libjpeg (PIL) must decode the result with
    the expected per-block means."""
    from PIL import Image

    width = height = 32
    quant = np.full((8, 8), 16, dtype=np.int32)
    y_dc = np.array(
        [[-2, 1, 4, -1], [3, 0, -4, 2], [1, 1, 0, -3], [2, -1, 3, 0]],
        dtype=np.int32,
    )
    cb_dc = np.array([[4, -4], [2, -2]], dtype=np.int32)
    cr_dc = np.array([[-3, 3], [-1, 1]], dtype=np.int32)

    frame_header = types.SimpleNamespace(
        encoding=Encoding.VARDCT,
        do_ycbcr=True,
        jpeg_upsampling=(0, 1, 0),  # y full, x/b half
        flags=_Flags(),
        width=width,
        height=height,
        lf_groups_per_row=1,
        lf_group_dim=2048,
    )
    image_header = types.SimpleNamespace(
        metadata=types.SimpleNamespace(xyb_encoded=False),
        size=types.SimpleNamespace(width=width, height=height),
    )
    state = types.SimpleNamespace(
        coeff_planes=[
            np.zeros((16, 16), dtype=np.int32),  # x (Cb) half res
            np.zeros((32, 32), dtype=np.int32),  # y full res
            np.zeros((16, 16), dtype=np.int32),  # b (Cr)
        ],
        lf_quant_planes=[cb_dc, y_dc, cr_dc],
        plane_shapes=[(16, 16), (32, 32), (16, 16)],
        width_rounded=32,
        height_rounded=32,
        lf_groups={},
        header=frame_header,
    )
    hf_global = types.SimpleNamespace(
        dequant_matrices=types.SimpleNamespace(
            jpeg_quant_values=[list(quant.ravel())] * 3
        )
    )
    frame = types.SimpleNamespace(
        header=frame_header,
        image_header=image_header,
        _vardct_state=state,
        _hf_global=hf_global,
    )

    markers = [0xC0, 0xC4, 0xDB, 0xDA, 0xD9]
    jbrd = JpegBitstreamData(make_jbrd_box_color_420(markers))
    jpeg = reconstruct_jpeg(jbrd, frame)
    img = Image.open(io.BytesIO(jpeg))
    assert img.size == (32, 32)
    ycc = np.asarray(img.convert("YCbCr"), dtype=np.float64)
    for by in range(4):
        for bx in range(4):
            block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
            want = np.clip(y_dc[by, bx] * 16 / 8.0 + 128.0, 0, 255)
            np.testing.assert_allclose(block.mean(), want, atol=2.0)
    for by in range(2):
        for bx in range(2):
            cb = ycc[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16, 1]
            cr = ycc[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16, 2]
            np.testing.assert_allclose(
                cb.mean(),
                np.clip(cb_dc[by, bx] * 16 / 8.0 + 128.0, 0, 255),
                atol=3.0,
            )
            np.testing.assert_allclose(
                cr.mean(),
                np.clip(cr_dc[by, bx] * 16 / 8.0 + 128.0, 0, 255),
                atol=3.0,
            )


def make_jbrd_box_progressive(tail=b"") -> bytes:
    """Grayscale PROGRESSIVE jbrd header: SOF2 + three scans
    (DC first al=1, AC first ss=1..63, DC refinement ah=1)."""
    w = BitWriter()
    w.write_bool(True)  # is_gray
    for m in [0xC2, 0xC4, 0xDB, 0xDA, 0xDA, 0xDA, 0xD9]:
        w.write(m - 0xC0, 6)
    w.write(0, 2)  # num_quant_tables - 1
    w.write(0, 1)  # precision
    w.write(0, 2)  # index
    w.write_bool(True)  # is_last
    w.write(0, 2)  # comp_type 0 -> ids [1]
    w.write(0, 2)  # q_idx
    w.write(1, 2)  # num_huff = 2
    w.write(0, 3)
    _write_huffman_code(w, False, 0, False, DC_COUNTS, DC_VALUES)
    _write_huffman_code(w, True, 0, True, AC_COUNTS, AC_VALUES)
    # ScanInfo x3: (ss, se, al, ah)
    for ss, se, al, ah in ((0, 0, 1, 0), (1, 63, 0, 0), (0, 0, 0, 1)):
        w.write(0, 2)  # num_comps - 1
        w.write(ss, 6)
        w.write(se, 6)
        w.write(al, 4)
        w.write(ah, 4)
        w.write(0, 2)  # comp_idx
        w.write(0, 2)  # ac_tbl
        w.write(0, 2)  # dc_tbl
        w.write(0, 2)  # last_needed_pass
    for _ in range(3):  # ScanMoreInfo x3
        w.write(0, 2)  # no reset points
        w.write(0, 2)  # no extra zero runs
    if len(tail) == 0:
        w.write(0, 2)
    else:
        w.write(1, 2)
        w.write(len(tail) - 1, 8)
    w.write_bool(False)  # no padding bits
    w.zero_pad_to_byte()
    return w.to_bytes() + brotli_compress(tail)


def test_reconstruct_progressive():
    """Progressive JPEG (DC first + AC first + DC refinement): PIL must
    decode it, pixels must match the coefficient math, and the native
    scan encoder must produce bytes identical to the Python fallback."""
    from PIL import Image

    import jxl_oxide_tpu.native as native

    quant = np.full((8, 8), 8, dtype=np.int32)
    lf_quant = np.array([[5, -6], [7, 2]], dtype=np.int32)
    coeff = np.zeros((16, 16), dtype=np.int32)
    # a couple of AC values plus a nonzero at every block's zigzag tail
    # (keeps eobrun at zero -> no EOBn symbols, absent from Annex K)
    coeff[0, 1] = 4
    coeff[3, 2] = -2
    coeff[8 + 1, 8 + 2] = 3
    for by in range(2):
        for bx in range(2):
            coeff[by * 8 + 7, bx * 8 + 7] = (-1) ** (by + bx) * (1 + bx)

    jbrd = JpegBitstreamData(make_jbrd_box_progressive())
    frame = make_fake_frame(16, 16, lf_quant, coeff, quant)
    jpeg_native = reconstruct_jpeg(jbrd, frame)

    old = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        jpeg_py = reconstruct_jpeg(
            JpegBitstreamData(make_jbrd_box_progressive()),
            make_fake_frame(16, 16, lf_quant, coeff, quant),
        )
    finally:
        native._lib, native._tried = old
    assert jpeg_native == jpeg_py

    img = Image.open(io.BytesIO(jpeg_native))
    arr = np.asarray(img.convert("L"), dtype=np.float64) - 128.0
    for by in range(2):
        for bx in range(2):
            F = coeff[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] * 8.0
            F[0, 0] = lf_quant[by, bx] * 8.0
            expected = idct2d((F / 8.0).astype(np.float32))
            got = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            np.testing.assert_allclose(got, expected, atol=1.5,
                                       err_msg=f"block {by},{bx}")


def test_reconstruct_native_python_equivalence_sequential():
    """Sequential + restart-free 4:2:0 scans: native and Python encoders
    byte-identical."""
    import jxl_oxide_tpu.native as native

    quant = np.full((8, 8), 16, dtype=np.int32)
    rng = np.random.default_rng(3)
    lf_quant = rng.integers(-20, 21, (4, 4)).astype(np.int32)
    coeff = rng.integers(-6, 7, (32, 32)).astype(np.int32)
    coeff[rng.random((32, 32)) < 0.7] = 0

    markers = [0xC0, 0xC4, 0xDB, 0xDA, 0xD9]

    def run():
        return reconstruct_jpeg(
            JpegBitstreamData(make_jbrd_box(markers)),
            make_fake_frame(32, 32, lf_quant, coeff, quant),
        )

    jpeg_native = run()
    old = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        jpeg_py = run()
    finally:
        native._lib, native._tried = old
    assert jpeg_native == jpeg_py


def make_jbrd_box_dri(restart_interval: int, tail=b"") -> bytes:
    """Grayscale sequential jbrd with a DRI marker (restart intervals
    exercise the per-MCU flush + RSTm emission + padding-bit path)."""
    w = BitWriter()
    w.write_bool(True)  # is_gray
    for m in [0xC0, 0xC4, 0xDB, 0xDD, 0xDA, 0xD9]:
        w.write(m - 0xC0, 6)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 2)
    w.write_bool(True)
    w.write(0, 2)
    w.write(0, 2)
    w.write(1, 2)
    w.write(0, 3)
    _write_huffman_code(w, False, 0, False, DC_COUNTS, DC_VALUES)
    _write_huffman_code(w, True, 0, True, AC_COUNTS, AC_VALUES)
    w.write(0, 2)  # num_comps - 1
    w.write(0, 6)  # ss
    w.write(63, 6)  # se
    w.write(0, 4)  # al
    w.write(0, 4)  # ah
    w.write(0, 2)
    w.write(0, 2)
    w.write(0, 2)
    w.write(0, 2)  # last_needed_pass
    w.write(restart_interval, 16)  # DRI value (has_dri)
    w.write(0, 2)  # no reset points
    w.write(0, 2)  # no extra zero runs
    w.write(0, 2)  # tail length 0
    w.write_bool(False)  # no padding bits (restart pads with 1s)
    w.zero_pad_to_byte()
    return w.to_bytes() + brotli_compress(tail)


def test_reconstruct_restart_intervals():
    """DRI=2 over a 4-MCU-wide image: RST markers every 2 MCUs, PIL must
    decode, native == Python bytes."""
    from PIL import Image

    import jxl_oxide_tpu.native as native

    quant = np.full((8, 8), 16, dtype=np.int32)
    rng = np.random.default_rng(9)
    lf_quant = rng.integers(-15, 16, (2, 4)).astype(np.int32)
    coeff = rng.integers(-4, 5, (16, 32)).astype(np.int32)
    coeff[rng.random((16, 32)) < 0.75] = 0

    def run():
        return reconstruct_jpeg(
            JpegBitstreamData(make_jbrd_box_dri(2)),
            make_fake_frame(32, 16, lf_quant, coeff, quant),
        )

    jpeg_native = run()
    assert b"\xff\xd0" in jpeg_native  # first restart marker present
    old = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        jpeg_py = run()
    finally:
        native._lib, native._tried = old
    assert jpeg_native == jpeg_py

    img = Image.open(io.BytesIO(jpeg_native))
    arr = np.asarray(img.convert("L"), dtype=np.float64)
    assert arr.shape == (16, 32)
    for by in range(2):
        for bx in range(4):
            block = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            F = coeff[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] * 16.0
            F[0, 0] = lf_quant[by, bx] * 16.0
            expected = idct2d((F / 8.0).astype(np.float32))
            np.testing.assert_allclose(block, expected, atol=1.5)


def test_reconstruct_dri_parallel_parity():
    """Segment-parallel scan encode (restart intervals, VERDICT r4 item
    10): the multi-threaded native encode must be byte-identical to the
    single-threaded native encode on a many-segment stream (64 MCU rows,
    DRI=8 -> 32 segments)."""
    from jxl_oxide_tpu import native

    quant = np.full((8, 8), 16, dtype=np.int32)
    rng = np.random.default_rng(21)
    h, w = 64, 256
    lf_quant = rng.integers(-15, 16, (h // 8, w // 8)).astype(np.int32)
    coeff = rng.integers(-4, 5, (h, w)).astype(np.int32)
    coeff[rng.random((h, w)) < 0.7] = 0

    def run(threads):
        import jxl_oxide_tpu.utils.threads as th

        th.set_num_threads(threads)
        try:
            return reconstruct_jpeg(
                JpegBitstreamData(make_jbrd_box_dri(8)),
                make_fake_frame(w, h, lf_quant, coeff, quant),
            )
        finally:
            th.set_num_threads(None)

    par = run(4)
    ser = run(1)
    assert par == ser
    assert par.count(b"\xff\xd0") >= 1  # restart markers present


@pytest.mark.parametrize("seed", range(6))
def test_jbr_differential_sweep(seed):
    """Randomized differential check: native and Python scan encoders
    must agree byte-for-byte across scan types, subsampling, DRI, and
    coefficient patterns."""
    import jxl_oxide_tpu.native as native

    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(100 + seed)
    quant = np.full((8, 8), int(rng.integers(4, 32)), dtype=np.int32)
    kind = seed % 3
    if kind == 0:  # grayscale sequential (+DRI on odd seeds)
        h8, w8 = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        lf = rng.integers(-30, 31, (h8, w8)).astype(np.int32)
        co = rng.integers(-8, 9, (h8 * 8, w8 * 8)).astype(np.int32)
        co[rng.random(co.shape) < 0.6] = 0
        box_fn = (lambda: make_jbrd_box_dri(int(rng.integers(1, 4)))) \
            if seed % 2 else (lambda: make_jbrd_box([0xC0, 0xC4, 0xDB, 0xDA, 0xD9]))
        frame_fn = lambda: make_fake_frame(w8 * 8, h8 * 8, lf, co, quant)
    elif kind == 1:  # grayscale progressive
        h8, w8 = 2, 2
        lf = rng.integers(-20, 21, (h8, w8)).astype(np.int32)
        co = rng.integers(-6, 7, (h8 * 8, w8 * 8)).astype(np.int32)
        co[rng.random(co.shape) < 0.5] = 0
        for by in range(h8):  # keep eobrun at 0 (no EOBn in Annex K)
            for bx in range(w8):
                co[by * 8 + 7, bx * 8 + 7] = 1
        box_fn = make_jbrd_box_progressive
        frame_fn = lambda: make_fake_frame(w8 * 8, h8 * 8, lf, co, quant)
    else:  # color 4:2:0
        box_fn = lambda: make_jbrd_box_color_420([0xC0, 0xC4, 0xDB, 0xDA, 0xD9])
        yv = rng.integers(-7, 8, (32, 32)).astype(np.int32)
        yv[rng.random((32, 32)) < 0.7] = 0
        lf_planes = [rng.integers(-9, 10, (2, 2)).astype(np.int32),
                     rng.integers(-9, 10, (4, 4)).astype(np.int32),
                     rng.integers(-9, 10, (2, 2)).astype(np.int32)]

        def frame_fn():
            frame_header = types.SimpleNamespace(
                encoding=Encoding.VARDCT, do_ycbcr=True,
                jpeg_upsampling=(0, 1, 0), flags=_Flags(),
                width=32, height=32, lf_groups_per_row=1, lf_group_dim=2048)
            image_header = types.SimpleNamespace(
                metadata=types.SimpleNamespace(xyb_encoded=False),
                size=types.SimpleNamespace(width=32, height=32))
            state = types.SimpleNamespace(
                coeff_planes=[np.zeros((16, 16), np.int32), yv.copy(),
                              np.zeros((16, 16), np.int32)],
                lf_quant_planes=[p.copy() for p in lf_planes],
                plane_shapes=[(16, 16), (32, 32), (16, 16)],
                width_rounded=32, height_rounded=32, lf_groups={},
                header=frame_header)
            hf_global = types.SimpleNamespace(
                dequant_matrices=types.SimpleNamespace(
                    jpeg_quant_values=[list(quant.ravel())] * 3))
            return types.SimpleNamespace(
                header=frame_header, image_header=image_header,
                _vardct_state=state, _hf_global=hf_global)

    jpeg_native = reconstruct_jpeg(JpegBitstreamData(box_fn()), frame_fn())
    old = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        jpeg_py = reconstruct_jpeg(JpegBitstreamData(box_fn()), frame_fn())
    finally:
        native._lib, native._tried = old
    assert jpeg_native == jpeg_py
