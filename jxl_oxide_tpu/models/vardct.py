"""VarDCT frame codec: bitstream structures (host) feeding device tensors.

Reference: jxl-vardct crate (lf.rs, hf_metadata.rs, hf_pass.rs, hf_coeff.rs,
dequant.rs, dct_select.rs) and jxl-render/src/vardct. Built up incrementally;
LfGlobalVarDct parsing first.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..coding.entropy import read_clusters
from ..io.bitstream import Bitstream, U, unpack_signed

__all__ = ["HfBlockContext", "LfChannelCorrelation", "LfGlobalVarDct", "Quantizer"]


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
