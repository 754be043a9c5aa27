"""VarDCT frame codec: bitstream structures (host) feeding device tensors.

Reference: jxl-vardct crate (lf.rs, hf_metadata.rs, hf_pass.rs, hf_coeff.rs,
dequant.rs, dct_select.rs) and jxl-render/src/vardct. Built up incrementally;
LfGlobalVarDct parsing first.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from ..coding.entropy import Decoder, read_clusters, read_permutation
from ..io.bitstream import Bitstream, U, unpack_signed
from ..utils.errors import JxlValidationError

__all__ = [
    "HfBlockContext",
    "LfChannelCorrelation",
    "LfGlobalVarDct",
    "Quantizer",
    "TransformType",
    "DequantMatrixSet",
    "LfCoeff",
    "HfMetadata",
    "HfPass",
    "write_hf_coeff",
]


@dataclass
class Quantizer:
    global_scale: int
    quant_lf: int

    @classmethod
    def parse(cls, bs: Bitstream) -> "Quantizer":
        return cls(
            global_scale=bs.read_u32(1 + U(11), 2049 + U(11), 4097 + U(12), 8193 + U(16)),
            quant_lf=bs.read_u32(16, 1 + U(5), 1 + U(8), 1 + U(16)),
        )


@dataclass
class HfBlockContext:
    qf_thresholds: list[int] = field(default_factory=list)
    lf_thresholds: tuple = ((), (), ())
    block_ctx_map: list[int] = field(default_factory=list)
    num_block_clusters: int = 0

    @classmethod
    def parse(cls, bs: Bitstream) -> "HfBlockContext":
        if bs.read_bool():
            return cls(
                qf_thresholds=[],
                lf_thresholds=((), (), ()),
                block_ctx_map=[
                    0, 1, 2, 2, 3, 3, 4, 5, 6, 6, 6, 6, 6, 7, 8, 9, 9, 10, 11, 12,
                    13, 14, 14, 14, 14, 14, 7, 8, 9, 9, 10, 11, 12, 13, 14, 14, 14,
                    14, 14,
                ],
                num_block_clusters=15,
            )
        lf_thresholds = []
        bsize = 1
        for _ in range(3):
            n = bs.read_bits(4)
            bsize *= n + 1
            lf_thresholds.append(
                tuple(
                    unpack_signed(
                        bs.read_u32(U(4), 16 + U(8), 272 + U(16), 65808 + U(32))
                    )
                    for _ in range(n)
                )
            )
        qf_thresholds = []
        n = bs.read_bits(4)
        bsize *= n + 1
        for _ in range(n):
            qf_thresholds.append(1 + bs.read_u32(U(2), 4 + U(3), 12 + U(5), 44 + U(8)))
        num_clusters, ctx_map = read_clusters(bs, bsize * 39)
        return cls(
            qf_thresholds=qf_thresholds,
            lf_thresholds=tuple(lf_thresholds),
            block_ctx_map=ctx_map,
            num_block_clusters=num_clusters,
        )


@dataclass
class LfChannelCorrelation:
    colour_factor: int = 84
    base_correlation_x: float = 0.0
    base_correlation_b: float = 1.0
    x_factor_lf: int = 128
    b_factor_lf: int = 128

    @classmethod
    def parse(cls, bs: Bitstream) -> "LfChannelCorrelation":
        if bs.read_bool():
            return cls()
        return cls(
            colour_factor=bs.read_u32(84, 256, 2 + U(8), 258 + U(16)),
            base_correlation_x=bs.read_f16_as_f32(),
            base_correlation_b=bs.read_f16_as_f32(),
            x_factor_lf=bs.read_bits(8),
            b_factor_lf=bs.read_bits(8),
        )


@dataclass
class LfGlobalVarDct:
    quantizer: Quantizer
    hf_block_ctx: HfBlockContext
    lf_chan_corr: LfChannelCorrelation

    @classmethod
    def parse(cls, bs: Bitstream) -> "LfGlobalVarDct":
        return cls(
            quantizer=Quantizer.parse(bs),
            hf_block_ctx=HfBlockContext.parse(bs),
            lf_chan_corr=LfChannelCorrelation.parse(bs),
        )


# ---------------------------------------------------------------------------
# Transform types (jxl-vardct dct_select.rs)


class TransformType:
    """Varblock transform types, numbered per spec (dct_select.rs:4-32).

    Tables are plain arrays indexed by the type id; the decode plan buckets
    varblocks by type id so the device pipeline is fully shape-static.
    """

    DCT8 = 0
    HORNUSS = 1
    DCT2 = 2
    DCT4 = 3
    DCT16 = 4
    DCT32 = 5
    DCT16X8 = 6
    DCT8X16 = 7
    DCT32X8 = 8
    DCT8X32 = 9
    DCT32X16 = 10
    DCT16X32 = 11
    DCT4X8 = 12
    DCT8X4 = 13
    AFV0 = 14
    AFV1 = 15
    AFV2 = 16
    AFV3 = 17
    DCT64 = 18
    DCT64X32 = 19
    DCT32X64 = 20
    DCT128 = 21
    DCT128X64 = 22
    DCT64X128 = 23
    DCT256 = 24
    DCT256X128 = 25
    DCT128X256 = 26

    NUM_TYPES = 27

    # (bw, bh) in 8x8 blocks (dct_select_size, dct_select.rs:51-77)
    SELECT_SIZE = [
        (1, 1), (1, 1), (1, 1), (1, 1), (2, 2), (4, 4), (1, 2), (2, 1),
        (1, 4), (4, 1), (2, 4), (4, 2), (1, 1), (1, 1), (1, 1), (1, 1),
        (1, 1), (1, 1), (8, 8), (4, 8), (8, 4), (16, 16), (8, 16), (16, 8),
        (32, 32), (16, 32), (32, 16),
    ]

    # 17 dequant parameter classes (dequant_matrix_param_index, dct_select.rs:79-101)
    PARAM_INDEX = [
        0, 1, 2, 3, 4, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 10, 10, 11, 12,
        12, 13, 14, 14, 15, 16, 16,
    ]

    # (width, height) of the dequant matrix (dequant_matrix_size)
    MATRIX_SIZE = [
        (8, 8), (8, 8), (8, 8), (8, 8), (16, 16), (32, 32), (16, 8), (16, 8),
        (32, 8), (32, 8), (32, 16), (32, 16), (8, 8), (8, 8), (8, 8), (8, 8),
        (8, 8), (8, 8), (64, 64), (64, 32), (64, 32), (128, 128), (128, 64),
        (128, 64), (256, 256), (256, 128), (256, 128),
    ]

    # 13 coefficient-order classes (order_id, dct_select.rs:120-140)
    ORDER_ID = [
        0, 1, 1, 1, 2, 3, 4, 4, 5, 5, 6, 6, 1, 1, 1, 1, 1, 1, 7, 8, 8, 9,
        10, 10, 11, 12, 12,
    ]

    # vectorized views for varblock placement (built once, not per group)
    SELECT_SIZE_ARR = np.asarray(SELECT_SIZE, dtype=np.int32)  # [27, 2]
    IS_1X1 = np.asarray([w == 1 and h == 1 for w, h in SELECT_SIZE])

    @staticmethod
    def need_transpose(t: int) -> bool:
        """need_transpose (dct_select.rs:143-157)."""
        if t in (1, 2, 3, 12, 13, 14, 15, 16, 17):
            return False
        w, h = TransformType.SELECT_SIZE[t]
        return h >= w


# order_id -> (bw*8, bh*8) but expressed as matrix dims (hf_pass.rs BLOCK_SIZES)
_ORDER_BLOCK_SIZES = [
    (8, 8), (8, 8), (16, 16), (32, 32), (16, 8), (32, 8), (32, 16),
    (64, 64), (64, 32), (128, 128), (128, 64), (256, 256), (256, 128),
]


@functools.lru_cache(maxsize=None)
def natural_order(order_id: int) -> tuple[tuple[int, int], ...]:
    """Natural (zigzag-like) coefficient order for an order class.

    Reimplements hf_pass.rs fill_natural_order: the first lbw*lbh entries
    are the LF corner in raster order, then anti-diagonal scan positions
    with y compressed by y_scale.
    """
    bw, bh = _ORDER_BLOCK_SIZES[order_id]
    y_scale = bw // bh
    lbw, lbh = bw // 8, bh // 8
    out = []
    for idx in range(lbw * lbh):
        out.append((idx % lbw, idx // lbw))
    for dist in range(1, 2 * bw):
        margin = max(0, dist - bw)
        for order in range(margin, dist - margin):
            if dist % 2 == 1:
                x, y = order, dist - 1 - order
            else:
                x, y = dist - 1 - order, order
            if x < lbw and y < lbw:
                continue
            if y % y_scale != 0:
                continue
            out.append((x, y // y_scale))
    return tuple(out)


# ---------------------------------------------------------------------------
# Dequantization matrices (jxl-vardct dequant.rs)

_SEQ_A = [-1.025, -0.78, -0.65012, -0.19041574, -0.20819396, -0.421064, -0.32733846]
_SEQ_B = [-0.30419582, -0.36330363, -0.3566038, -0.34430745, -0.33699593, -0.30180866, -0.27321684]
_SEQ_C = [-1.2, -1.2, -0.8, -0.7, -0.7, -0.4, -0.5]
_DCT4X8_PARAMS = [
    [2198.0505, -0.96269625, -0.7619425, -0.65511405],
    [764.36554, -0.926302, -0.967523, -0.2784529],
    [527.10754, -1.4594386, -1.4500821, -1.5843723],
]
_DCT4_PARAMS = [
    [2200.0, 0.0, 0.0, 0.0],
    [392.0, 0.0, 0.0, 0.0],
    [112.0, -0.25, -0.25, -0.5],
]

# The 17 parameter classes in parse order (dequant.rs DCT_SELECT_LIST)
_DCT_SELECT_LIST = [
    TransformType.DCT8, TransformType.HORNUSS, TransformType.DCT2,
    TransformType.DCT4, TransformType.DCT16, TransformType.DCT32,
    TransformType.DCT8X16, TransformType.DCT8X32, TransformType.DCT16X32,
    TransformType.DCT4X8, TransformType.AFV0, TransformType.DCT64,
    TransformType.DCT32X64, TransformType.DCT128, TransformType.DCT64X128,
    TransformType.DCT256, TransformType.DCT128X256,
]


def _default_dct_params(dct_select: int):
    """Library default encoding parameters (dequant.rs default_with)."""
    T = TransformType
    def seq(a, b, c):
        return ("dct", [[a] + _SEQ_A, [b] + _SEQ_B, [c] + _SEQ_C])
    if dct_select == T.DCT8:
        return ("dct", [
            [3150.0, 0.0, -0.4, -0.4, -0.4, -2.0],
            [560.0, 0.0, -0.3, -0.3, -0.3, -0.3],
            [512.0, -2.0, -1.0, 0.0, -1.0, -2.0],
        ])
    if dct_select == T.HORNUSS:
        return ("hornuss", [
            [280.0, 3160.0, 3160.0],
            [60.0, 864.0, 864.0],
            [18.0, 200.0, 200.0],
        ])
    if dct_select == T.DCT2:
        return ("dct2", [
            [3840.0, 2560.0, 1280.0, 640.0, 480.0, 300.0],
            [960.0, 640.0, 320.0, 180.0, 140.0, 120.0],
            [640.0, 320.0, 128.0, 64.0, 32.0, 16.0],
        ])
    if dct_select == T.DCT4:
        return ("dct4", [[1.0, 1.0]] * 3, [list(p) for p in _DCT4_PARAMS])
    if dct_select == T.DCT16:
        return ("dct", [
            [8996.873, -1.3000778, -0.4942453, -0.43909377, -0.6350102, -0.9017726, -1.6162099],
            [3191.4836, -0.67424583, -0.80745816, -0.4492584, -0.3586544, -0.3132239, -0.37615025],
            [1157.504, -2.0531423, -1.4, -0.5068713, -0.4270873, -1.4856834, -4.920914],
        ])
    if dct_select == T.DCT32:
        return ("dct", [
            [15718.408, -1.025, -0.98, -0.9012, -0.4, -0.48819396, -0.421064, -0.27],
            [7305.7637, -0.8041958, -0.76330364, -0.5566038, -0.49785304, -0.43699592, -0.40180868, -0.27321684],
            [3803.5317, -3.0607336, -2.041327, -2.023565, -0.54953897, -0.4, -0.4, -0.3],
        ])
    if dct_select == T.DCT8X16:
        return ("dct", [
            [7240.7734, -0.7, -0.7, -0.2, -0.2, -0.2, -0.5],
            [1448.1547, -0.5, -0.5, -0.5, -0.2, -0.2, -0.2],
            [506.85413, -1.4, -0.2, -0.5, -0.5, -1.5, -3.6],
        ])
    if dct_select == T.DCT8X32:
        return ("dct", [
            [16283.249, -1.7812846, -1.6309059, -1.0382179, -0.85, -0.7, -0.9, -1.2360638],
            [5089.1577, -0.3200494, -0.3536285, -0.3034, -0.61, -0.5, -0.5, -0.6],
            [3397.7761, -0.32132736, -0.3450762, -0.7034, -0.9, -1.0, -1.0, -1.1754606],
        ])
    if dct_select == T.DCT16X32:
        return ("dct", [
            [13844.971, -0.971138, -0.658, -0.42026, -0.22712, -0.2206, -0.226, -0.6],
            [4798.964, -0.6112531, -0.8377079, -0.7901486, -0.26927274, -0.38272768, -0.22924222, -0.20719099],
            [1807.2369, -1.2, -1.2, -0.7, -0.7, -0.7, -0.4, -0.5],
        ])
    if dct_select == T.DCT4X8:
        return ("dct4x8", [[1.0]] * 3, [list(p) for p in _DCT4X8_PARAMS])
    if dct_select == T.AFV0:
        return ("afv",
                [
                    [3072.0, 3072.0, 256.0, 256.0, 256.0, 414.0, 0.0, 0.0, 0.0],
                    [1024.0, 1024.0, 50.0, 50.0, 50.0, 58.0, 0.0, 0.0, 0.0],
                    [384.0, 384.0, 12.0, 12.0, 12.0, 22.0, -0.25, -0.25, -0.25],
                ],
                [list(p) for p in _DCT4X8_PARAMS],
                [list(p) for p in _DCT4_PARAMS])
    if dct_select == T.DCT64:
        return seq(23966.166, 8380.191, 4493.024)
    if dct_select == T.DCT32X64:
        return seq(15358.898, 5597.3604, 2919.9617)
    if dct_select == T.DCT128:
        return seq(47932.332, 16760.383, 8986.048)
    if dct_select == T.DCT64X128:
        return seq(30717.797, 11194.721, 5839.9233)
    if dct_select == T.DCT256:
        return seq(95864.664, 33520.766, 17972.096)
    if dct_select == T.DCT128X256:
        return seq(61435.594, 24209.441, 12979.847)
    raise AssertionError(dct_select)


def _interpolate(pos: float, vmax: float, bands: list[float]) -> float:
    if len(bands) == 1:
        return bands[0]
    scaled_pos = pos * (len(bands) - 1) / vmax
    idx = int(scaled_pos)
    frac = scaled_pos - idx
    # IEEE semantics, not Python-float (which raises on x/0): the
    # reference computes a * (b/a)^frac with f32 — a zero band gives
    # inf/NaN which the matrix range check downstream rejects or passes
    # exactly like dequant.rs:176-178 does.
    a, b = np.float64(bands[idx]), np.float64(bands[idx + 1])
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(a * (b / a) ** frac)


def _mult(x: float) -> float:
    return 1.0 + x if x > 0.0 else 1.0 / (1.0 - x)


def _dct_quant_weights(params: list[float], width: int, height: int) -> np.ndarray:
    bands = [params[0]]
    for val in params[1:]:
        band = bands[-1] * _mult(val)
        if band <= 0.0:
            raise JxlValidationError("DCT dequant matrix: band <= 0")
        bands.append(band)
    vmax = float(np.sqrt(2.0) + 1e-6)
    dy = (np.arange(height) / (height - 1))[:, None]
    dx = (np.arange(width) / (width - 1))[None, :]
    distance = np.sqrt(dx * dx + dy * dy)
    if len(bands) == 1:
        return np.full((height, width), bands[0], dtype=np.float32)
    # geometric interpolation between bands (dequant.rs interpolate)
    b = np.asarray(bands, dtype=np.float64)
    scaled = distance * (len(bands) - 1) / vmax
    idx = scaled.astype(np.int64)
    frac = scaled - idx
    a = b[idx]
    nxt = b[np.minimum(idx + 1, len(bands) - 1)]
    out = a * (nxt / a) ** frac
    return out.astype(np.float32)


def _params_to_matrix(dct_select: int, encoding: tuple) -> list[np.ndarray]:
    """dequant.rs into_matrix: three [h, w] float32 matrices (x, y, b)."""
    kind = encoding[0]
    w, h = TransformType.MATRIX_SIZE[dct_select]
    out = []
    if kind == "dct":
        for params in encoding[1]:
            out.append(_dct_quant_weights(params, w, h))
    elif kind == "hornuss":
        for params in encoding[1]:
            m = np.full((8, 8), params[0], dtype=np.float32)
            m[0, 0] = 1.0
            m[0, 1] = params[1]
            m[1, 0] = params[1]
            m[1, 1] = params[2]
            out.append(m)
    elif kind == "dct2":
        for params in encoding[1]:
            m = np.zeros((8, 8), dtype=np.float32)
            m[0, 0] = 1.0
            for idx, val in enumerate(params):
                dim = 1 << (idx // 2)
                if idx % 2 == 0:
                    m[0:dim, dim:dim * 2] = val
                    m[dim:dim * 2, 0:dim] = val
                else:
                    m[dim:dim * 2, dim:dim * 2] = val
            out.append(m)
    elif kind == "dct4":
        for params, dct_params in zip(encoding[1], encoding[2]):
            mat = _dct_quant_weights(dct_params, 4, 4)
            m = np.repeat(np.repeat(mat, 2, axis=0), 2, axis=1)
            # zero params give inf (f32 semantics, like dequant.rs), which
            # the range check below rejects
            with np.errstate(divide="ignore"):
                m[0, 1] /= params[0]
                m[1, 0] /= params[0]
                m[1, 1] /= params[1]
            out.append(m)
    elif kind == "dct4x8":
        for params, dct_params in zip(encoding[1], encoding[2]):
            mat = _dct_quant_weights(dct_params, 8, 4)
            m = np.repeat(mat, 2, axis=0)
            with np.errstate(divide="ignore"):
                m[1, 0] /= params[0]
            out.append(m)
    elif kind == "afv":
        freqs = [0.0, 0.0, 0.8517779, 5.3777843, 0.0, 0.0, 4.734748,
                 5.4492455, 1.659827, 4.0, 7.275749, 10.423227, 2.6629324,
                 7.6306577, 8.962389, 12.971662]
        freq_lo, freq_hi = freqs[2], freqs[15]
        for params, dct_params, dct4x4_params in zip(
            encoding[1], encoding[2], encoding[3]
        ):
            weights_4x8 = _dct_quant_weights(dct_params, 8, 4)
            weights_4x4 = _dct_quant_weights(dct4x4_params, 4, 4)
            bands = [params[5]]
            for p in params[6:9]:
                bands.append(bands[-1] * _mult(p))
            m = np.zeros((8, 8), dtype=np.float32)
            for y in range(4):
                for x in range(4):
                    if (x, y) == (0, 0):
                        val = 1.0
                    elif (x, y) == (0, 1):
                        val = params[2]
                    elif (x, y) == (1, 0):
                        val = params[3]
                    elif (x, y) == (1, 1):
                        val = params[4]
                    else:
                        val = _interpolate(
                            freqs[y * 4 + x] - freq_lo,
                            freq_hi - freq_lo + 1e-6, bands,
                        )
                    m[2 * y, 2 * x] = val
            for y in range(4):
                for x in range(8):
                    m[2 * y + 1, x] = params[0] if (y == 0 and x == 0) else weights_4x8[y, x]
                for x in range(4):
                    m[2 * y, 2 * x + 1] = params[1] if (y == 0 and x == 0) else weights_4x4[y, x]
            out.append(m)
    elif kind == "raw":
        denominator, channels = encoding[1], encoding[2]
        for c in range(3):
            out.append(channels[c].astype(np.float32) * denominator)
    else:
        raise AssertionError(kind)

    if kind != "raw":
        # zero weights invert to inf and are rejected by the range check
        # below (dequant.rs band<=0 validation); silence the numpy warning
        with np.errstate(divide="ignore"):
            out = [1.0 / m for m in out]
    for m in out:
        if np.any(m >= 1e8) or np.any(m <= 0.0):
            raise JxlValidationError("dequant matrix element out of range")
        if m.shape != (h, w):
            raise AssertionError((m.shape, (h, w)))
    return out


class DequantMatrixSet:
    """The 17 dequant matrices + transposed variants (dequant.rs:580+).

    matrices[param_idx][channel] is an [h, w] float32 array in raster order
    (h = bh*8, w = bw*8 of the canonical orientation).
    """

    def __init__(self, matrices, jpeg_quant_values=None):
        self.matrices = matrices  # list of [3][h,w]
        self.matrices_tr = [
            [self._transpose_raster(m) for m in chans] for chans in matrices
        ]
        self.jpeg_quant_values = jpeg_quant_values

    @staticmethod
    def _transpose_raster(m: np.ndarray) -> np.ndarray:
        # dequant.rs matrices_tr: out[idx] = matrix[(idx%h)*w + idx//h]
        # for a [h, w] matrix => plain transpose as a [w, h] array.
        return np.ascontiguousarray(m.T)

    _default_cache = None

    @classmethod
    def default(cls) -> "DequantMatrixSet":
        if cls._default_cache is None:
            cls._default_cache = cls([
                _params_to_matrix(sel, _default_dct_params(sel))
                for sel in _DCT_SELECT_LIST
            ])
        return cls._default_cache

    @classmethod
    def parse(cls, bs: Bitstream, bit_depth: int, num_lf_groups: int,
              global_ma_config, group_dim: int) -> "DequantMatrixSet":
        if bs.read_bool():
            return cls.default()
        matrices = []
        jpeg_quant = None
        for idx, sel in enumerate(_DCT_SELECT_LIST):
            stream_index = 1 + num_lf_groups * 3 + idx
            encoding = cls._parse_params(
                bs, sel, bit_depth, stream_index, global_ma_config, group_dim
            )
            if idx == 0 and encoding[0] == "raw":
                denominator = encoding[1]
                if round(1.0 / denominator) == 2040:
                    jpeg_quant = [ch.ravel().tolist() for ch in encoding[2]]
            matrices.append(_params_to_matrix(sel, encoding))
        return cls(matrices, jpeg_quant)

    @staticmethod
    def _parse_params(bs, dct_select, bit_depth, stream_index,
                      global_ma_config, group_dim):
        def read_fixed(n):
            return [[bs.read_f16_as_f32() for _ in range(n)] for _ in range(3)]

        def read_dct_params():
            num = bs.read_bits(4) + 1
            params = [[bs.read_f16_as_f32() for _ in range(num)] for _ in range(3)]
            for p in params:
                p[0] *= 64.0
            return params

        mode = bs.read_bits(3)
        if 1 <= mode <= 5 and TransformType.PARAM_INDEX[dct_select] not in (
            0, 1, 2, 3, 9, 10
        ):
            raise JxlValidationError("invalid dequant encoding mode for DctSelect")
        if mode == 0:
            return _default_dct_params(dct_select)
        if mode == 1:
            return ("hornuss", read_fixed(3))
        if mode == 2:
            return ("dct2", read_fixed(6))
        if mode == 3:
            return ("dct4", read_fixed(2), read_dct_params())
        if mode == 4:
            return ("dct4x8", read_fixed(1), read_dct_params())
        if mode == 5:
            params = read_fixed(9)
            for p in params:
                for i in range(6):
                    p[i] *= 64.0
            return ("afv", params, read_dct_params(), read_dct_params())
        if mode == 6:
            return ("dct", read_dct_params())
        if mode == 7:
            from .modular import ModularImage
            from .modular_transform import ChannelInfo

            w, h = TransformType.MATRIX_SIZE[dct_select]
            denominator = bs.read_f16_as_f32()
            channels = [ChannelInfo(w, h) for _ in range(3)]
            modular = ModularImage(
                bs, channels, group_dim, bit_depth, global_ma_config
            )
            modular.subimage_all().decode(bs, stream_index)
            chans = modular.finish()
            return ("raw", denominator, chans)
        raise AssertionError(mode)

    def get(self, channel: int, dct_select: int, transposed: bool) -> np.ndarray:
        idx = TransformType.PARAM_INDEX[dct_select]
        src = self.matrices_tr if transposed else self.matrices
        return src[idx][channel]


# ---------------------------------------------------------------------------
# Channel shifts from jpeg_upsampling (jxl-modular param.rs:105-122)


def jpeg_shifts(jpeg_upsampling) -> list[tuple[int, int]]:
    """(hshift, vshift) for channels x, y, b in XYB order [0, 1, 2]."""
    hscale = any(v in (1, 2) for v in jpeg_upsampling)
    vscale = any(v in (1, 3) for v in jpeg_upsampling)
    out = []
    for ups in jpeg_upsampling:
        h, v = {
            0: (hscale, vscale),
            1: (False, False),
            2: (False, vscale),
            3: (hscale, False),
        }[ups]
        out.append((int(h), int(v)))
    return out


def _shifted_size(size: int, shift: int) -> int:
    return (size + (1 << shift) - 1) >> shift


# ---------------------------------------------------------------------------
# LfCoeff (jxl-vardct lf.rs:118-182)


@dataclass
class LfCoeff:
    extra_precision: int
    lf_quant: list[np.ndarray]  # [y, x, b] order as stored (stream order 1,0,2)

    @classmethod
    def parse(cls, bs: Bitstream, lf_group_idx: int, lf_width: int,
              lf_height: int, jpeg_upsampling, bits_per_sample: int,
              global_ma_config, group_dim: int) -> "LfCoeff":
        from .modular import ModularImage
        from .modular_transform import ChannelInfo

        extra_precision = bs.read_bits(2)
        width = -(-lf_width // 8)
        height = -(-lf_height // 8)
        shifts = jpeg_shifts(jpeg_upsampling)
        channels = []
        for c in (1, 0, 2):  # y, x, b stream order
            hs, vs = shifts[c]
            channels.append(
                ChannelInfo(
                    _shifted_size(width, hs), _shifted_size(height, vs), hs, vs
                )
            )
        modular = ModularImage(bs, channels, group_dim, bits_per_sample,
                               global_ma_config)
        modular.subimage_all().decode(bs, 1 + lf_group_idx)
        chans = modular.finish()
        return cls(extra_precision, chans)

    def lf_quant_xyb(self) -> list[np.ndarray]:
        """Channels reordered to [x, y, b]."""
        y, x, b = self.lf_quant
        return [x, y, b]


# ---------------------------------------------------------------------------
# HfMetadata (jxl-vardct hf_metadata.rs)


@dataclass
class HfMetadata:
    x_from_y: np.ndarray  # [h64, w64] i32 CfL grid
    b_from_y: np.ndarray
    block_sel: np.ndarray  # [bh, bw] int8: transform type at varblock origin, -1 otherwise
    block_mul: np.ndarray  # [bh, bw] i32: hf_mul at varblock origin
    epf_sigma: np.ndarray  # [bh, bw] f32
    _varblocks: list | None = None  # lazy (bx, by, dct_select, hf_mul)

    @property
    def varblocks(self) -> list:
        """(bx, by, dct_select, hf_mul) tuples in placement order — built
        lazily from the origin grids (only the subsampled decode path
        iterates varblocks in Python)."""
        if self._varblocks is None:
            ys, xs = np.nonzero(self.block_sel >= 0)
            self._varblocks = list(zip(
                xs.tolist(), ys.tolist(),
                self.block_sel[ys, xs].tolist(),
                self.block_mul[ys, xs].tolist(),
            ))
        return self._varblocks

    @classmethod
    def parse(cls, bs: Bitstream, *, num_lf_groups: int, lf_group_idx: int,
              lf_width: int, lf_height: int, jpeg_upsampling,
              bits_per_sample: int, global_ma_config, group_dim: int,
              epf: tuple | None, quantizer_global_scale: int) -> "HfMetadata":
        from .modular import ModularImage
        from .modular_transform import ChannelInfo

        bw = -(-lf_width // 8)
        bh = -(-lf_height // 8)
        h_up = any(j in (1, 2) for j in jpeg_upsampling)
        v_up = any(j in (1, 3) for j in jpeg_upsampling)
        if h_up:
            bw = -(-bw // 2) * 2
        if v_up:
            bh = -(-bh // 2) * 2

        nb_blocks = 1 + bs.read_bits(max(bw * bh - 1, 0).bit_length())
        w64 = -(-lf_width // 64)
        h64 = -(-lf_height // 64)
        channels = [
            ChannelInfo(w64, h64),
            ChannelInfo(w64, h64),
            ChannelInfo(nb_blocks, 2),
            ChannelInfo(bw, bh),
        ]
        modular = ModularImage(bs, channels, group_dim, bits_per_sample,
                               global_ma_config)
        modular.subimage_all().decode(bs, 1 + 2 * num_lf_groups + lf_group_idx)
        x_from_y, b_from_y, block_info_raw, sharpness = modular.finish()

        if epf is not None:
            quant_mul, sharp_lut = epf
            sigma_base = quant_mul * 65536.0 / quantizer_global_scale

        # Fast path: every coded block is 1x1 (<= 8x8 transforms) and fills
        # the grid exactly -> pure row-major placement, fully vectorized.
        n_raw = block_info_raw.shape[1]
        sels_raw = block_info_raw[0]
        if n_raw == bw * bh and np.all(
            (sels_raw >= 0) & (sels_raw < TransformType.NUM_TYPES)
        ):
            if TransformType.IS_1X1[sels_raw].all():
                muls_raw = block_info_raw[1].astype(np.int64) + 1
                if np.any(muls_raw <= 0):
                    raise JxlValidationError("non-positive HfMul")
                sel_grid = sels_raw.reshape(bh, bw).astype(np.int8)
                mul_grid = muls_raw.reshape(bh, bw).astype(np.int32)
                if epf is not None:
                    if np.any((sharpness < 0) | (sharpness >= 8)):
                        raise JxlValidationError(
                            "invalid EPF sharpness value"
                        )
                    lut = np.asarray(sharp_lut, dtype=np.float32)
                    epf_sigma = (
                        np.float32(sigma_base) / mul_grid.astype(np.float32)
                    ) * lut[sharpness]
                else:
                    epf_sigma = np.zeros((bh, bw), dtype=np.float32)
                return cls(x_from_y, b_from_y, sel_grid, mul_grid,
                           epf_sigma)

        sel_grid = np.full((bh, bw), -1, dtype=np.int8)
        mul_grid = np.zeros((bh, bw), dtype=np.int32)
        occupied = np.zeros((bh, bw), dtype=bool)
        epf_sigma = np.zeros((bh, bw), dtype=np.float32)
        varblocks: list[tuple[int, int, int, int]] = []

        group_blocks = group_dim // 8

        from .. import native as _native

        if _native.available():
            sel_grid, mul_grid, mul_full = _native.place_varblocks(
                block_info_raw, bh, bw, group_blocks,
                TransformType.SELECT_SIZE_ARR.reshape(-1)
            )
            if epf is not None:
                covered = mul_full > 0
                sh = np.asarray(sharpness)
                if np.any(((sh < 0) | (sh >= 8)) & covered):
                    raise JxlValidationError("invalid EPF sharpness value")
                lut = np.asarray(sharp_lut, dtype=np.float32)
                epf_sigma = np.where(
                    covered,
                    (np.float32(sigma_base)
                     / np.maximum(mul_full, 1).astype(np.float32))
                    * lut[np.clip(sh, 0, 7)],
                    np.float32(0.0),
                )
            return cls(x_from_y, b_from_y, sel_grid, mul_grid, epf_sigma)

        lut = (np.asarray(sharp_lut, dtype=np.float32)
               if epf is not None else None)
        data_idx = 0
        for y in range(bh):
            x = 0
            while x < bw:
                if occupied[y, x]:
                    x += 1
                    continue
                if data_idx >= block_info_raw.shape[1]:
                    raise JxlValidationError("BlockInfo doesn't fill LF group")
                dct_select = int(block_info_raw[0, data_idx])
                if not 0 <= dct_select < TransformType.NUM_TYPES:
                    raise JxlValidationError("invalid TransformType")
                hf_mul = int(block_info_raw[1, data_idx]) + 1
                if hf_mul <= 0:
                    raise JxlValidationError("non-positive HfMul")
                dw, dh = TransformType.SELECT_SIZE[dct_select]
                if (
                    (x % group_blocks) + dw > group_blocks
                    or (y % group_blocks) + dh > group_blocks
                ):
                    raise JxlValidationError(
                        "varblock placed across pass group border"
                    )
                if x + dw > bw or y + dh > bh:
                    raise JxlValidationError("varblock doesn't fit in LF group")
                if occupied[y : y + dh, x : x + dw].any():
                    raise JxlValidationError("varblocks overlap")
                occupied[y : y + dh, x : x + dw] = True
                sel_grid[y, x] = dct_select
                mul_grid[y, x] = hf_mul
                varblocks.append((x, y, dct_select, hf_mul))
                if epf is not None:
                    sh = sharpness[y : y + dh, x : x + dw]
                    if np.any((sh < 0) | (sh >= 8)):
                        raise JxlValidationError("invalid EPF sharpness value")
                    epf_sigma[y : y + dh, x : x + dw] = (
                        sigma_base / hf_mul
                    ) * lut[sh]
                data_idx += 1
                x += dw
        return cls(x_from_y, b_from_y, sel_grid, mul_grid, epf_sigma, varblocks)


# ---------------------------------------------------------------------------
# HfPass (jxl-vardct hf_pass.rs)


class HfPass:
    """Per-pass coefficient orders + shared HF coefficient distributions."""

    def __init__(self, bs: Bitstream, hf_block_ctx: HfBlockContext,
                 num_hf_presets: int):
        used_orders = bs.read_u32(0x5F, 0x13, 0x00, U(13))
        self.permutations: list[list[tuple | None]] = [
            [None, None, None] for _ in range(13)
        ]
        if used_orders != 0:
            decoder = Decoder(bs, 8)
            decoder.begin(bs)
            for idx in range(13):
                if used_orders & (1 << idx):
                    mw, mh = _ORDER_BLOCK_SIZES[idx]
                    size = mw * mh
                    skip = size // 64
                    nat = natural_order(idx)
                    for c in range(3):
                        perm = read_permutation(bs, decoder, size, skip)
                        self.permutations[idx][c] = tuple(nat[i] for i in perm)
            decoder.finalize()
        self.hf_dist = Decoder(
            bs, 495 * num_hf_presets * hf_block_ctx.num_block_clusters
        )

    def order(self, order_id: int, channel: int):
        perm = self.permutations[order_id][channel]
        return perm if perm is not None else natural_order(order_id)


# ---------------------------------------------------------------------------
# HF coefficient decoding (jxl-vardct hf_coeff.rs:21-252)

_COEFF_FREQ_CONTEXT = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 15, 16, 16, 17,
    17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22, 23, 23, 23, 23, 24, 24, 24,
    24, 25, 25, 25, 25, 26, 26, 26, 26, 27, 27, 27, 27, 28, 28, 28, 28, 29,
    29, 29, 29, 30, 30, 30, 30,
]
_COEFF_NUM_NONZERO_CONTEXT = [
    0, 31, 62, 62, 93, 93, 93, 93, 123, 123, 123, 123, 152, 152, 152, 152,
    152, 152, 152, 152, 180, 180, 180, 180, 180, 180, 180, 180, 180, 180,
    180, 180, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206,
]


def ensure_packed_orders(hf_pass, needed: set) -> tuple:
    """(offsets [13*3] i32, lengths [13*3] i32, blob i32): concatenated
    (x, y) coefficient-order pairs for every (order_id, channel) in
    `needed`, cached on the HfPass and grown incrementally as new
    transform types appear (per-frame cost, not per-group)."""
    import threading

    lock = getattr(hf_pass, "_native_lock", None)
    if lock is None:
        lock = hf_pass.__dict__.setdefault("_native_lock", threading.Lock())
    with lock:
        cache = getattr(hf_pass, "_native_orders", None)
        if cache is None:
            cache = hf_pass._native_orders = {}
        grew = False
        for key in needed:
            if key not in cache:
                cache[key] = np.asarray(hf_pass.order(*key), dtype=np.int32)
                grew = True
        packed = getattr(hf_pass, "_native_orders_packed", None)
        if packed is None or grew:
            offsets = np.zeros(13 * 3, dtype=np.int32)
            lengths = np.zeros(13 * 3, dtype=np.int32)
            blobs = []
            off = 0
            for (oid, c), arr in cache.items():
                offsets[oid * 3 + c] = off
                lengths[oid * 3 + c] = len(arr)
                blobs.append(arr.reshape(-1))
                off += arr.size
            blob = np.ascontiguousarray(
                np.concatenate(blobs) if blobs
                else np.zeros(2, dtype=np.int32),
                dtype=np.int32,
            )
            packed = (offsets, lengths, blob)
            hf_pass._native_orders_packed = packed
    return packed


def write_hf_coeff(
    bs: Bitstream,
    *,
    num_hf_presets: int,
    hf_block_ctx: HfBlockContext,
    block_sel: np.ndarray,
    block_mul: np.ndarray,
    jpeg_upsampling,
    lf_quant: list[np.ndarray] | None,  # [x, y, b] subgrids for this group
    hf_pass: HfPass,
    coeff_shift: int,
    hf_coeff_output: list[np.ndarray],  # [x, y, b] i32 planes for this group
) -> None:
    """Decode one pass-group's HF coefficients, adding into the output planes.

    `block_sel`/`block_mul` are the group-local slices of the LF group's
    varblock grids; `hf_coeff_output` planes are group-local [h, w] i32 with
    coefficients stored in the transposed-raster layout the reference uses.
    """
    qf_thresholds = hf_block_ctx.qf_thresholds
    lf_thresholds = hf_block_ctx.lf_thresholds
    block_ctx_map = hf_block_ctx.block_ctx_map
    num_block_clusters = hf_block_ctx.num_block_clusters

    lf_idx_mul = (
        (len(lf_thresholds[0]) + 1)
        * (len(lf_thresholds[1]) + 1)
        * (len(lf_thresholds[2]) + 1)
    )
    hf_idx_mul = len(qf_thresholds) + 1
    shifts = jpeg_shifts(jpeg_upsampling)
    hshifts = [s[0] for s in shifts]
    vshifts = [s[1] for s in shifts]

    hfp_bits = max(num_hf_presets - 1, 0).bit_length()
    hfp = bs.read_bits(hfp_bits)
    if hfp >= num_hf_presets:
        raise JxlValidationError("selected HF preset out of bounds")

    dist = hf_pass.hf_dist
    ctx_size = 495 * num_block_clusters
    cluster_map = dist.clusters[ctx_size * hfp : ctx_size * (hfp + 1)]

    # Native (C++) host runtime: whole-group HF decode in one call.
    from .. import native as _native

    if _native.available():
        needed = set()
        for sel in np.unique(block_sel):
            if sel < 0:
                continue
            oid = TransformType.ORDER_ID[int(sel)]
            for c in range(3):
                needed.add((oid, c))
        packed = ensure_packed_orders(hf_pass, needed)
        _native.decode_hf_group_native(
            bs, dist, ctx_size * hfp,
            hf_block_ctx=hf_block_ctx,
            block_sel=block_sel, block_mul=block_mul,
            hshifts=hshifts, vshifts=vshifts,
            lf_quant=lf_quant,
            orders_packed=packed,
            coeff_shift=coeff_shift,
            out_planes=hf_coeff_output,
        )
        return

    dist.restart()
    dist.begin(bs)

    height, width = block_sel.shape
    non_zeros_row = [
        np.zeros(_shifted_size(width, hshifts[c]), dtype=np.int64)
        for c in range(3)
    ]

    for y in range(height):
        for x in range(width):
            sel = int(block_sel[y, x])
            if sel < 0:
                continue
            qf = int(block_mul[y, x])
            w8, h8 = TransformType.SELECT_SIZE[sel]
            num_blocks = w8 * h8
            num_blocks_log = num_blocks.bit_length() - 1
            order_id = TransformType.ORDER_ID[sel]

            lf_idx = 0
            if lf_quant is not None:
                for c in (0, 2, 1):
                    thr = lf_thresholds[c]
                    lf_idx *= len(thr) + 1
                    q = int(lf_quant[c][y >> vshifts[c], x >> hshifts[c]])
                    for threshold in thr:
                        if q > threshold:
                            lf_idx += 1

            hf_idx = sum(1 for threshold in qf_thresholds if qf > threshold)

            for ci in range(3):
                ch_idx = ci * 13 + order_id
                c = (1, 0, 2)[ci]  # y, x, b channel order

                hshift, vshift = hshifts[c], vshifts[c]
                sx, sy = x >> hshift, y >> vshift
                if hshift or vshift:
                    if (sx << hshift) != x or (sy << vshift) != y:
                        continue
                    if block_sel[sy, sx] < 0:
                        continue

                idx = (ch_idx * hf_idx_mul + hf_idx) * lf_idx_mul + lf_idx
                block_ctx = block_ctx_map[idx]
                nzr = non_zeros_row[c]
                if sy == 0:
                    predicted = 32 if sx == 0 else int(nzr[sx - 1])
                elif sx == 0:
                    predicted = int(nzr[sx])
                else:
                    predicted = (int(nzr[sx]) + int(nzr[sx - 1]) + 1) >> 1
                nz_idx = 4 + predicted // 2 if predicted >= 8 else predicted
                non_zeros_ctx = block_ctx + nz_idx * num_block_clusters

                non_zeros = dist.read_varint_clustered(
                    bs, cluster_map[non_zeros_ctx]
                )
                if non_zeros > (63 << num_blocks_log):
                    raise JxlValidationError("non_zeros too large")
                nzr[sx : sx + w8] = (non_zeros + num_blocks - 1) >> num_blocks_log
                if non_zeros == 0:
                    continue

                coeff_grid = hf_coeff_output[c]
                is_prev_nonzero = 1 if non_zeros <= num_blocks * 4 else 0
                order = hf_pass.order(order_id, c)
                transpose = TransformType.need_transpose(sel)

                coeff_ctx_base = block_ctx * 458 + 37 * num_block_clusters
                sub_cluster_map = cluster_map[
                    coeff_ctx_base : coeff_ctx_base + 458
                ]
                for oi in range(num_blocks, len(order)):
                    nz_for_ctx = (non_zeros - 1) >> num_blocks_log
                    fi = (oi - num_blocks) >> num_blocks_log
                    coeff_ctx = (
                        _COEFF_NUM_NONZERO_CONTEXT[nz_for_ctx]
                        + _COEFF_FREQ_CONTEXT[fi]
                    ) * 2 + is_prev_nonzero
                    if coeff_ctx >= len(sub_cluster_map):
                        raise JxlValidationError(
                            "too many zeros in varblock HF coefficient"
                        )
                    ucoeff = dist.read_varint_clustered(
                        bs, sub_cluster_map[coeff_ctx]
                    )
                    if ucoeff == 0:
                        is_prev_nonzero = 0
                        continue
                    coeff = unpack_signed(ucoeff) << coeff_shift
                    dx, dy = order[oi]
                    if transpose:
                        dx, dy = dy, dx
                    coeff_grid[sy * 8 + dy, sx * 8 + dx] += coeff
                    is_prev_nonzero = 1
                    non_zeros -= 1
                    if non_zeros == 0:
                        break

    dist.finalize()
