"""JPEG XL entropy decoding: rANS (alias-table), Brotli-style prefix codes,
hybrid integers, LZ77, distribution clustering, Lehmer permutations.

Behavioral parity with jxl-coding (reference: lib.rs, ans.rs, prefix.rs,
permutation.rs). The symbol loop is strictly sequential per stream — this is a
host-side stage by design; each TOC section owns an independent Decoder so
sections decode in parallel on host threads (see SURVEY.md §2.3). Histogram
tables are stored as flat numpy arrays so the C++ host runtime can consume the
same layout.

Spec contracts worth naming:
- ANS: 12-bit precision, 32-bit state, 16-bit renormalization, final state
  must equal 0x130000 (ans final-state checksum).
- Alias table construction is normative: underfull/overfull stacks popped
  LIFO in bucket-index order; layouts must match the encoder exactly.
- Hybrid integer: token < split -> literal; else token encodes bit count and
  msb/lsb packing (reference lib.rs:571-605).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.bitstream import Bitstream, U
from ..utils.errors import JxlBitstreamError

__all__ = [
    "AnsHistogram",
    "Decoder",
    "IntegerConfig",
    "PrefixHistogram",
    "read_clusters",
    "read_permutation",
]

ANS_PRECISION_BITS = 12
ANS_FINAL_STATE = 0x130000


def add_log2_ceil(x: int) -> int:
    # Matches reference add_log2_ceil: (x+1).next_power_of_two().trailing_zeros()
    if x >= 0x80000000:
        return 32
    v = x + 1
    p = 1
    n = 0
    while p < v:
        p <<= 1
        n += 1
    return n


def _read_u8_coded(bs: Bitstream) -> int:
    """Variable u8 coding used by ANS histograms (ans.rs read_u8)."""
    if bs.read_bool():
        n = bs.read_bits(3)
        return (1 << n) + bs.read_bits(n)
    return 0


# ---------------------------------------------------------------------------
# ANS histogram with alias table


class AnsHistogram:
    __slots__ = (
        "log_bucket_size",
        "bucket_mask",
        "dist",
        "alias_symbol",
        "alias_cutoff",
        "alias_offset",
        "single_symbol",
    )

    def __init__(self, bs: Bitstream, log_alphabet_size: int):
        table_size = 1 << log_alphabet_size
        log_bucket_size = ANS_PRECISION_BITS - log_alphabet_size
        bucket_size = 1 << log_bucket_size
        self.log_bucket_size = log_bucket_size
        self.bucket_mask = bucket_size - 1

        dist = self._parse_distribution(bs, table_size)
        self.dist = dist

        # Single-symbol fast path: one bucket has the full 2^12 mass.
        single = None
        for i, d in enumerate(dist):
            if d == (1 << ANS_PRECISION_BITS):
                single = i
                break
        self.single_symbol = single

        n = table_size
        alias_symbol = np.zeros(n, dtype=np.int32)
        alias_cutoff = np.zeros(n, dtype=np.int32)
        alias_offset = np.zeros(n, dtype=np.int32)
        if single is not None:
            for i in range(n):
                alias_symbol[i] = single
                alias_offset[i] = bucket_size * i
                alias_cutoff[i] = 0
        else:
            # Normative alias mapping: stacks of underfull/overfull buckets.
            sym = list(range(n))
            cutoff = list(dist)
            offset = [0] * n
            underfull = [i for i in range(n) if dist[i] < bucket_size]
            overfull = [i for i in range(n) if dist[i] > bucket_size]
            while overfull and underfull:
                o = overfull.pop()
                u = underfull.pop()
                by = bucket_size - cutoff[u]
                cutoff[o] -= by
                sym[u] = o
                offset[u] = cutoff[o]
                if cutoff[o] < bucket_size:
                    underfull.append(o)
                elif cutoff[o] > bucket_size:
                    overfull.append(o)
            for i in range(n):
                if cutoff[i] == bucket_size:
                    alias_symbol[i] = i
                    alias_offset[i] = 0
                    alias_cutoff[i] = 0
                else:
                    alias_symbol[i] = sym[i]
                    alias_offset[i] = offset[i] - cutoff[i]
                    alias_cutoff[i] = cutoff[i]
        self.alias_symbol = alias_symbol
        self.alias_cutoff = alias_cutoff
        self.alias_offset = alias_offset

    # -- parsing -----------------------------------------------------------

    @staticmethod
    def _parse_distribution(bs: Bitstream, table_size: int) -> list[int]:
        dist = [0] * table_size
        if bs.read_bool():
            if bs.read_bool():
                # binary: two symbols with 12-bit split
                v0 = _read_u8_coded(bs)
                v1 = _read_u8_coded(bs)
                if v0 == v1 or max(v0, v1) + 1 > table_size:
                    raise JxlBitstreamError("invalid binary ANS histogram")
                prob = bs.read_bits(12)
                dist[v0] = prob
                dist[v1] = (1 << 12) - prob
            else:
                # unary: single symbol
                val = _read_u8_coded(bs)
                if val + 1 > table_size:
                    raise JxlBitstreamError("invalid unary ANS histogram")
                dist[val] = 1 << 12
            return dist
        if bs.read_bool():
            # evenly distributed over alphabet
            alphabet_size = _read_u8_coded(bs) + 1
            if alphabet_size > table_size:
                raise JxlBitstreamError("invalid flat ANS histogram")
            base = (1 << 12) // alphabet_size
            leftover = (1 << 12) % alphabet_size
            for i in range(alphabet_size):
                dist[i] = base + (1 if i < leftover else 0)
            return dist

        # compressed distribution: prefix-coded log counts + repeat-13 RLE,
        # max entry omitted and reconstructed from the remainder.
        length = 0
        while length < 3 and bs.read_bool():
            length += 1
        shift = bs.read_bits(length) + (1 << length) - 1
        if shift > 13:
            raise JxlBitstreamError("invalid ANS histogram shift")
        alphabet_size = _read_u8_coded(bs) + 3
        if alphabet_size > table_size:
            raise JxlBitstreamError("ANS alphabet too large")

        codes = [0] * table_size
        repeat_ranges: list[tuple[int, int]] = []
        omit_log = -1
        omit_pos = -1
        idx = 0
        while idx < alphabet_size:
            c = _read_log_count(bs)
            codes[idx] = c
            if c == 13:
                repeat_count = _read_u8_coded(bs) + 4
                if idx + repeat_count > alphabet_size:
                    raise JxlBitstreamError("ANS repeat overruns alphabet")
                repeat_ranges.append((idx, idx + repeat_count))
                idx += repeat_count
                continue
            if omit_pos < 0 or c > omit_log:
                omit_log = c
                omit_pos = idx
            idx += 1
        if omit_pos < 0:
            raise JxlBitstreamError("no ANS omit position")
        if omit_pos + 1 < table_size and codes[omit_pos + 1] == 13:
            raise JxlBitstreamError("ANS omit followed by repeat")

        rr_idx = 0
        acc = 0
        prev = 0
        for i in range(table_size):
            if rr_idx < len(repeat_ranges) and repeat_ranges[rr_idx][0] <= i:
                if repeat_ranges[rr_idx][1] == i:
                    rr_idx += 1
                else:
                    dist[i] = prev
                    acc += prev
                    if acc > (1 << 12):
                        raise JxlBitstreamError("ANS distribution overflow")
                    continue
            c = codes[i]
            if c == 0 or i == omit_pos:
                prev = 0
                continue
            if c > 1:
                zeros = c - 1
                bitcount = shift - ((12 - zeros) >> 1)
                bitcount = max(0, min(zeros, bitcount))
                c = (1 << zeros) + (bs.read_bits(bitcount) << (zeros - bitcount))
            dist[i] = c
            prev = c
            acc += c
            if acc > (1 << 12):
                raise JxlBitstreamError("ANS distribution overflow")
        dist[omit_pos] = (1 << 12) - acc
        return dist

    # -- decode ------------------------------------------------------------

    def read_symbol(self, bs: Bitstream, state: int) -> tuple[int, int]:
        """Decode one symbol; returns (symbol, next_state)."""
        idx = state & 0xFFF
        i = idx >> self.log_bucket_size
        pos = idx & self.bucket_mask
        if pos >= self.alias_cutoff[i]:
            symbol = int(self.alias_symbol[i])
            offset = int(self.alias_offset[i]) + pos
        else:
            symbol = i
            offset = pos
        next_state = (state >> 12) * int(self.dist[symbol]) + offset
        if next_state < (1 << 16):
            next_state = (next_state << 16) | bs.peek_bits(16)
            bs.consume_bits(16)
        return symbol, next_state


def _read_log_count(bs: Bitstream) -> int:
    """kLogCountLut prefix decoding (ans.rs read_prefix)."""
    v = bs.read_bits(3)
    if v == 0:
        return 10
    if v == 1:
        for val in (4, 0, 11, 13):
            if bs.read_bool():
                return val
        return 12
    if v == 2:
        return 7
    if v == 3:
        return 1 if bs.read_bool() else 3
    if v == 4:
        return 6
    if v == 5:
        return 8
    if v == 6:
        return 9
    return 2 if bs.read_bool() else 5


# ---------------------------------------------------------------------------
# Prefix (Brotli-style) histogram

MAX_PREFIX_BITS = 15
_CODE_LENGTH_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _reverse_bits(x: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


class PrefixHistogram:
    """Canonical prefix code decoded via a flat LSB-first lookup table."""

    __slots__ = ("table_sym", "table_len", "max_len", "mask", "single")

    def __init__(self, code_lengths: list[int] | None, single_symbol: int | None = None):
        if single_symbol is not None:
            self.single = single_symbol
            self.max_len = 0
            self.mask = 0
            self.table_sym = np.array([single_symbol], dtype=np.int32)
            self.table_len = np.array([0], dtype=np.int32)
            return
        assert code_lengths is not None
        self.single = None
        max_len = max(code_lengths)
        # Completeness check in 2^max_len units.
        total = sum((1 << (max_len - l)) for l in code_lengths if l > 0)
        if total != (1 << max_len):
            raise JxlBitstreamError("incomplete or over-subscribed prefix code")
        self.max_len = max_len
        self.mask = (1 << max_len) - 1
        table_sym = np.zeros(1 << max_len, dtype=np.int32)
        table_len = np.zeros(1 << max_len, dtype=np.int32)
        # Canonical assignment: symbols ordered by (length, symbol index).
        code = 0
        for length in range(1, max_len + 1):
            for sym, l in enumerate(code_lengths):
                if l != length:
                    continue
                rev = _reverse_bits(code >> (max_len - length), length)
                step = 1 << length
                for k in range(rev, 1 << max_len, step):
                    table_sym[k] = sym
                    table_len[k] = length
                code += 1 << (max_len - length)
        self.table_sym = table_sym
        self.table_len = table_len

    @classmethod
    def parse(cls, bs: Bitstream, alphabet_size: int) -> "PrefixHistogram":
        if alphabet_size == 1:
            return cls(None, single_symbol=0)
        if alphabet_size > (1 << MAX_PREFIX_BITS):
            raise JxlBitstreamError("prefix alphabet too large")
        hskip = bs.read_bits(2)
        if hskip == 1:
            return cls._parse_simple(bs, alphabet_size)
        return cls._parse_complex(bs, alphabet_size, hskip)

    @classmethod
    def _parse_simple(cls, bs: Bitstream, alphabet_size: int) -> "PrefixHistogram":
        alphabet_bits = (alphabet_size - 1).bit_length()
        nsym = bs.read_bits(2) + 1
        if nsym == 1:
            sym = bs.read_bits(alphabet_bits)
            if sym >= alphabet_size:
                raise JxlBitstreamError("invalid simple prefix code")
            return cls(None, single_symbol=sym)
        if nsym == 2:
            syms = [bs.read_bits(alphabet_bits) for _ in range(2)]
            lens = [1, 1]
        elif nsym == 3:
            syms = [bs.read_bits(alphabet_bits) for _ in range(3)]
            lens = [1, 2, 2]
        else:
            syms = [bs.read_bits(alphabet_bits) for _ in range(4)]
            lens = [1, 2, 3, 3] if bs.read_bool() else [2, 2, 2, 2]
        code_lengths = [0] * alphabet_size
        for sym, l in zip(syms, lens):
            if sym >= alphabet_size:
                raise JxlBitstreamError("invalid simple prefix code symbol")
            code_lengths[sym] = l
        return cls(code_lengths)

    @classmethod
    def _parse_complex(
        cls, bs: Bitstream, alphabet_size: int, hskip: int
    ) -> "PrefixHistogram":
        cl_lengths = [0] * 18
        bitacc = 0
        nonzero_count = 0
        nonzero_sym = 0
        for idx in _CODE_LENGTH_ORDER[hskip:]:
            base = bs.read_u32(0, 4, 3, 8)
            if base == 8:
                if bs.read_bool():
                    length = 5 if bs.read_bool() else 1
                else:
                    length = 2
            else:
                length = base
            cl_lengths[idx] = length
            if length:
                nonzero_count += 1
                nonzero_sym = idx
                bitacc += 32 >> length
                if bitacc == 32:
                    break
                if bitacc > 32:
                    raise JxlBitstreamError("over-subscribed code-length code")

        if nonzero_count == 1:
            cl_hist = cls(None, single_symbol=nonzero_sym)
        elif bitacc != 32:
            raise JxlBitstreamError("incomplete code-length code")
        else:
            cl_hist = cls(cl_lengths)

        code_lengths = [0] * alphabet_size
        bitacc = 0
        prev_sym = 8
        last_nonzero = 8
        last_repeat = 0
        repeat_count = 0
        repeat_sym = 0
        for i in range(alphabet_size):
            if repeat_count > 0:
                code_lengths[i] = repeat_sym
                repeat_count -= 1
            else:
                sym = cl_hist.read_symbol(bs)
                if sym == 0:
                    pass
                elif sym <= 15:
                    code_lengths[i] = sym
                    last_nonzero = sym
                elif sym == 16:
                    repeat_count = bs.peek_bits(2) + 3
                    bs.consume_bits(2)
                    if prev_sym == 16:
                        repeat_count += last_repeat * 3 - 8
                        last_repeat += repeat_count
                    else:
                        last_repeat = repeat_count
                    repeat_sym = last_nonzero
                    code_lengths[i] = repeat_sym
                    repeat_count -= 1
                else:  # 17
                    repeat_count = bs.peek_bits(3) + 3
                    bs.consume_bits(3)
                    if prev_sym == 17:
                        repeat_count += last_repeat * 7 - 16
                        last_repeat += repeat_count
                    else:
                        last_repeat = repeat_count
                    repeat_sym = 0
                    code_lengths[i] = 0
                    repeat_count -= 1
                prev_sym = sym
            if code_lengths[i]:
                bitacc += 1 << max(0, MAX_PREFIX_BITS - code_lengths[i])
                if bitacc > 1 << MAX_PREFIX_BITS:
                    raise JxlBitstreamError("prefix code over-subscribed")
                if bitacc == 1 << MAX_PREFIX_BITS and repeat_count == 0:
                    break
        if bitacc != 1 << MAX_PREFIX_BITS or repeat_count > 0:
            raise JxlBitstreamError("prefix code incomplete")
        return cls(code_lengths)

    def read_symbol(self, bs: Bitstream) -> int:
        if self.max_len == 0:
            return int(self.table_sym[0])
        peeked = bs.peek_bits(self.max_len)
        sym = int(self.table_sym[peeked])
        bs.consume_bits(int(self.table_len[peeked]))
        return sym

    def single_symbol_value(self) -> int | None:
        return self.single


# ---------------------------------------------------------------------------
# Hybrid integer config


@dataclass(frozen=True)
class IntegerConfig:
    split_exponent: int
    msb_in_token: int
    lsb_in_token: int

    @property
    def split(self) -> int:
        return 1 << self.split_exponent

    @classmethod
    def parse(cls, bs: Bitstream, log_alphabet_size: int) -> "IntegerConfig":
        split_exponent = bs.read_bits(add_log2_ceil(log_alphabet_size))
        if split_exponent != log_alphabet_size:
            msb = bs.read_bits(add_log2_ceil(split_exponent))
            if msb > split_exponent:
                raise JxlBitstreamError("invalid hybrid-integer config (msb)")
            lsb = bs.read_bits(add_log2_ceil(split_exponent - msb))
        else:
            msb = lsb = 0
        if msb + lsb > split_exponent:
            raise JxlBitstreamError("invalid hybrid-integer config (lsb)")
        return cls(split_exponent, msb, lsb)


def read_uint(bs: Bitstream, config: IntegerConfig, token: int) -> int:
    if token < config.split:
        return token
    msb, lsb = config.msb_in_token, config.lsb_in_token
    n = (config.split_exponent - (msb + lsb)) + ((token - config.split) >> (msb + lsb))
    n &= 31
    rest = bs.peek_bits(n)
    try:
        bs.consume_bits(n)
    except Exception:
        pass  # reference ignores EOF here (truncated-stream tolerance)
    low = token & ((1 << lsb) - 1)
    t = (token >> lsb) & ((1 << msb) - 1)
    t |= 1 << msb
    return ((((t << n) | rest) << lsb) | low) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# LZ77

# 2-D special distance table used when dist_multiplier != 0 (lib.rs:497-510).
_SPECIAL_DISTANCES = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3),
    (3, 2), (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2), (4, 4), (-4, 4),
    (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6),
    (6, 3), (-6, 3), (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5), (8, 0), (4, 7), (-4, 7), (7, 4),
    (-7, 4), (8, 1), (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
    (8, 4), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_LZ_WINDOW_SIZE = 1 << 20
_LZ_WINDOW_MASK = _LZ_WINDOW_SIZE - 1


class _Lz77State:
    __slots__ = ("len_config", "window", "num_to_copy", "copy_pos",
                 "num_decoded", "_tracker")

    def __init__(self, len_config: IntegerConfig):
        self.len_config = len_config
        from ..utils.alloc import current_tracker

        # 4 MiB rolling window, released on drop against the tracker that
        # charged it (alloc_tracker.rs RAII handle semantics)
        self._tracker = current_tracker()
        if self._tracker is not None:
            self._tracker.alloc(_LZ_WINDOW_SIZE * 4)
        self.window = np.zeros(_LZ_WINDOW_SIZE, dtype=np.uint32)
        self.num_to_copy = 0
        self.copy_pos = 0
        self.num_decoded = 0

    def __del__(self):
        try:
            if self._tracker is not None:
                self._tracker.release(_LZ_WINDOW_SIZE * 4)
        except Exception:  # pragma: no cover - interpreter shutdown
            pass


# ---------------------------------------------------------------------------
# Decoder


class Decoder:
    """Per-stream entropy decoder (ANS or prefix, optional LZ77)."""

    def __init__(self, bs: Bitstream, num_dist: int, allow_lz77: bool = True):
        # Fast path: parse the tables (lz77 config, cluster map,
        # histograms + alias/prefix table construction) in the C++ runtime
        # and rebuild the Python-side objects from the flat arrays — the
        # Python decode methods stay fully functional, and the serialized
        # tables feed the native decode entry points without re-packing.
        from .. import native as _native

        if _native.available() and type(bs.data) is bytes:
            try:
                parsed = _native.parse_decoder_native(bs, num_dist, allow_lz77)
            except Exception as e:
                from ..utils.errors import JxlError

                if isinstance(e, JxlError):
                    raise
                parsed = None
            if parsed is not None:
                self._init_from_parsed(parsed)
                return
        self._init_python(bs, num_dist, allow_lz77)

    def _init_from_parsed(self, p: dict) -> None:
        if p["lz77_enabled"]:
            self.lz77_min_symbol = p["min_symbol"]
            self.lz77_min_length = p["min_length"]
            self.lz77 = _Lz77State(IntegerConfig(*p["len_cfg"]))
        else:
            self.lz77 = None
            self.lz77_min_symbol = 0
            self.lz77_min_length = 0
        self.num_clusters = p["num_clusters"]
        # conversion of the (possibly large) cluster map to a Python list
        # is deferred with the histograms: eager per-element int() cost
        # ~1 ms per VarDCT frame, while the Python symbol path wants list
        # indexing (numpy scalar boxing per token is slower)
        self._clusters_arr = np.asarray(p["cluster_map"], dtype=np.int32)
        self.use_prefix_code = p["use_prefix"]
        self.log_alphabet_size = p["log_alphabet_size"]
        self.configs = [
            IntegerConfig(int(a), int(b), int(c)) for a, b, c in p["cfgs"]
        ]
        # Histogram OBJECT construction is deferred: on the native decode
        # path only the flat serialized tables (p["tables"]) are ever
        # used, and building the Python-side histogram views costs ~35us
        # per cluster (~1.4 ms per VarDCT frame). __getattr__ builds them
        # on first Python-path access (read_symbol / rle_mode).
        self._parsed = p
        self._native_tables = p["tables"]
        self.state = 0
        self._initial = True

    def __getattr__(self, name):
        if name in ("ans_hists", "prefix_hists") and "_parsed" in self.__dict__:
            self._build_hists_from_parsed()
            return self.__dict__[name]
        if name == "clusters" and "_clusters_arr" in self.__dict__:
            self.clusters = self._clusters_arr.tolist()
            return self.clusters
        raise AttributeError(name)

    def _build_hists_from_parsed(self) -> None:
        p = self._parsed
        blob = p["blob"]
        if self.use_prefix_code:
            self.ans_hists = None
            hists = []
            for max_len, off in p["meta"]:
                max_len, off = int(max_len), int(off)
                h = PrefixHistogram.__new__(PrefixHistogram)
                if max_len == 0:
                    h.single = int(blob[off])
                    h.max_len = 0
                    h.mask = 0
                    h.table_sym = blob[off : off + 1]
                    h.table_len = np.zeros(1, dtype=np.int32)
                else:
                    n = 1 << max_len
                    h.single = None
                    h.max_len = max_len
                    h.mask = n - 1
                    h.table_sym = blob[off : off + n]
                    h.table_len = blob[off + n : off + 2 * n]
                hists.append(h)
            self.prefix_hists = hists
        else:
            self.prefix_hists = None
            hists = []
            for lbs, off in p["meta"]:
                lbs, off = int(lbs), int(off)
                alphabet = 1 << (ANS_PRECISION_BITS - lbs)
                h = AnsHistogram.__new__(AnsHistogram)
                h.log_bucket_size = lbs
                h.bucket_mask = (1 << lbs) - 1
                # packed AnsBucket wire layout (see native DecoderTables):
                # one u64 per bucket, cutoff[0:13) | alias_symbol[13:25) |
                # alias_offset[25:37) | dist_self[37:50) |
                # dist_alias[50:63). dist[i] of symbol i == dist_self of
                # bucket i, so the per-symbol dist array is recovered.
                w = blob[off : off + 2 * alphabet].view(np.uint32)
                v = w[0::2].astype(np.uint64) | (
                    w[1::2].astype(np.uint64) << 32
                )
                h.dist = ((v >> 37) & 0x1FFF).astype(np.int32)
                h.alias_symbol = ((v >> 13) & 0xFFF).astype(np.int32)
                h.alias_cutoff = (v & 0x1FFF).astype(np.int32)
                h.alias_offset = ((v >> 25) & 0xFFF).astype(np.int32)
                full = np.nonzero(h.dist == (1 << ANS_PRECISION_BITS))[0]
                h.single_symbol = int(full[0]) if full.size else None
                hists.append(h)
            self.ans_hists = hists

    def _init_python(self, bs: Bitstream, num_dist: int, allow_lz77: bool):
        lz77_enabled = bs.read_bool()
        if lz77_enabled and not allow_lz77:
            raise JxlBitstreamError("LZ77 not allowed in this stream")
        if lz77_enabled:
            self.lz77_min_symbol = bs.read_u32(224, 512, 4096, 8 + U(15))
            self.lz77_min_length = bs.read_u32(3, 4, 5 + U(2), 9 + U(8))
            len_config = IntegerConfig.parse(bs, 8)
            self.lz77 = _Lz77State(len_config)
            num_dist += 1
        else:
            self.lz77 = None
            self.lz77_min_symbol = 0
            self.lz77_min_length = 0

        self.num_clusters, self.clusters = read_clusters(bs, num_dist)
        self.use_prefix_code = bs.read_bool()
        if self.use_prefix_code:
            log_alphabet_size = 15
        else:
            log_alphabet_size = bs.read_bits(2) + 5
        self.log_alphabet_size = log_alphabet_size
        self.configs = [
            IntegerConfig.parse(bs, log_alphabet_size) for _ in range(self.num_clusters)
        ]
        if self.use_prefix_code:
            counts = []
            for _ in range(self.num_clusters):
                if bs.read_bool():
                    n = bs.read_bits(4)
                    count = 1 + (1 << n) + bs.read_bits(n)
                else:
                    count = 1
                if count > (1 << 15):
                    raise JxlBitstreamError("invalid prefix histogram count")
                counts.append(count)
            self.prefix_hists = [
                PrefixHistogram.parse(bs, count) for count in counts
            ]
            self.ans_hists = None
        else:
            self.prefix_hists = None
            self.ans_hists = [
                AnsHistogram(bs, log_alphabet_size) for _ in range(self.num_clusters)
            ]
        self.state = 0
        self._initial = True

    # -- symbol/varint interface -------------------------------------------

    def begin(self, bs: Bitstream) -> None:
        if not self.use_prefix_code:
            self.state = bs.read_bits(32)
            self._initial = False

    def restart(self) -> None:
        """Reset decode state so this decoder can be reused for another
        independent stream that shares the parsed histograms (the reference
        clones the Decoder per pass-group; we reuse serially)."""
        self.state = 0
        self._initial = True
        if self.lz77 is not None:
            self.lz77 = _Lz77State(self.lz77.len_config)

    def _read_symbol(self, bs: Bitstream, cluster: int) -> int:
        if self.use_prefix_code:
            return self.prefix_hists[cluster].read_symbol(bs)
        if self._initial:
            self.state = bs.read_bits(32)
            self._initial = False
        sym, self.state = self.ans_hists[cluster].read_symbol(bs, self.state)
        return sym

    def read_varint(self, bs: Bitstream, ctx: int, dist_multiplier: int = 0) -> int:
        return self.read_varint_clustered(bs, self.clusters[ctx], dist_multiplier)

    def read_varint_clustered(
        self, bs: Bitstream, cluster: int, dist_multiplier: int = 0
    ) -> int:
        if self.lz77 is not None:
            return self._read_varint_lz77(bs, cluster, dist_multiplier)
        token = self._read_symbol(bs, cluster)
        return read_uint(bs, self.configs[cluster], token)

    def _read_varint_lz77(
        self, bs: Bitstream, cluster: int, dist_multiplier: int
    ) -> int:
        st = self.lz77
        if st.num_to_copy > 0:
            r = int(st.window[st.copy_pos & _LZ_WINDOW_MASK])
            st.copy_pos += 1
            st.num_to_copy -= 1
        else:
            token = self._read_symbol(bs, cluster)
            if token >= self.lz77_min_symbol:
                if st.num_decoded == 0:
                    raise JxlBitstreamError("LZ77 repeat before any symbol")
                lz_cluster = int(self.clusters[-1])
                num_to_copy = read_uint(bs, st.len_config, token - self.lz77_min_symbol)
                num_to_copy += self.lz77_min_length
                if num_to_copy > 0xFFFFFFFF:
                    raise JxlBitstreamError("LZ77 num_to_copy overflow")
                st.num_to_copy = num_to_copy
                dtoken = self._read_symbol(bs, lz_cluster)
                distance = read_uint(bs, self.configs[lz_cluster], dtoken)
                if dist_multiplier == 0:
                    pass
                elif distance < 120:
                    off, d = _SPECIAL_DISTANCES[distance]
                    distance = max(0, off + dist_multiplier * d - 1)
                else:
                    distance -= 120
                distance = min(min(distance, _LZ_WINDOW_MASK) + 1, st.num_decoded)
                st.copy_pos = st.num_decoded - distance
                r = int(st.window[st.copy_pos & _LZ_WINDOW_MASK])
                st.copy_pos += 1
                st.num_to_copy -= 1
            else:
                r = read_uint(bs, self.configs[cluster], token)
        st.window[st.num_decoded & _LZ_WINDOW_MASK] = r
        st.num_decoded += 1
        return r

    def single_token(self, cluster: int) -> int | None:
        """If this cluster always emits one literal token, return it."""
        if self.lz77 is not None:
            return None
        if self.use_prefix_code:
            sym = self.prefix_hists[cluster].single_symbol_value()
        else:
            sym = self.ans_hists[cluster].single_symbol
        if sym is None:
            return None
        return sym if sym < self.configs[cluster].split else None

    def finalize(self) -> None:
        if not self.use_prefix_code and not self._initial:
            if self.state != ANS_FINAL_STATE:
                raise JxlBitstreamError(
                    f"ANS final state 0x{self.state:x} != 0x{ANS_FINAL_STATE:x}"
                )

    # RLE fast path probing (lib.rs:105-123): LZ77 on, distance cluster has a
    # single symbol == 1, and its config split_exponent == 0.
    def rle_mode(self) -> bool:
        if self.lz77 is None:
            return False
        lz_cluster = int(self.clusters[-1])
        conf = self.configs[lz_cluster]
        if self.use_prefix_code:
            sym = self.prefix_hists[lz_cluster].single_symbol_value()
        else:
            sym = self.ans_hists[lz_cluster].single_symbol
        return sym == 1 and conf.split_exponent == 0


# ---------------------------------------------------------------------------
# Cluster map


def read_clusters(bs: Bitstream, num_dist: int) -> tuple[int, list[int]]:
    if num_dist == 1:
        return 1, [0]
    if bs.read_bool():
        # simple: direct nbits-coded cluster ids
        nbits = bs.read_bits(2)
        clusters = [bs.read_bits(nbits) for _ in range(num_dist)]
    else:
        use_mtf = bs.read_bool()
        dec = Decoder(bs, 1, allow_lz77=num_dist > 2)
        dec.begin(bs)
        clusters = []
        for _ in range(num_dist):
            b = dec.read_varint(bs, 0)
            if b > 255:
                raise JxlBitstreamError(f"invalid cluster id {b}")
            clusters.append(b)
        dec.finalize()
        if use_mtf:
            mtf = list(range(256))
            for i, c in enumerate(clusters):
                v = mtf[c]
                clusters[i] = v
                del mtf[c]
                mtf.insert(0, v)
    num_clusters = max(clusters) + 1
    if len(set(clusters)) != num_clusters:
        raise JxlBitstreamError("distribution cluster map has a hole")
    return num_clusters, clusters


# ---------------------------------------------------------------------------
# Permutation (Lehmer coded)


def read_permutation(
    bs: Bitstream, decoder: Decoder, size: int, skip: int
) -> list[int]:
    def ctx(x: int) -> int:
        return min(add_log2_ceil(x), 7)

    end = decoder.read_varint(bs, ctx(size))
    if end > size - skip:
        raise JxlBitstreamError("invalid permutation length")
    lehmer = []
    prev = 0
    for idx in range(end):
        v = decoder.read_varint(bs, ctx(prev))
        if v >= size - skip - idx:
            raise JxlBitstreamError("invalid permutation element")
        lehmer.append(v)
        prev = v
    temp = list(range(skip, size))
    permutation = list(range(skip))
    for v in lehmer:
        permutation.append(temp.pop(v))
    permutation.extend(temp)
    return permutation
