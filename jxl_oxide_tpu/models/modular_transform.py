"""Modular transforms: RCT, Palette, Squeeze — parsing, channel-list
bookkeeping, and bit-exact inverse application.

Behavioral parity: jxl-modular/src/transform.rs (parse + channel info),
transform/rct.rs (42 RCT types = 6 permutations x 7 kinds, wrapping i32),
transform/palette.rs (synthetic + delta palette, kDeltaPalette table),
transform/squeeze.rs (tendency smoothing, default param schedule).

The numpy implementations here are the bit-exactness oracle; the device path
(jxl_oxide_tpu.ops.modular_tail) implements the same math as XLA int32
programs (squeeze rows via lax.scan) and is tested against these.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.bitstream import Bitstream, U
from ..utils.errors import JxlValidationError
from .modular_predict import PredictorState, WpHeader

__all__ = ["TransformInfo", "parse_transform", "ChannelInfo", "Slot"]


class Slot:
    """A channel grid slot: a numpy view plus transform bookkeeping.

    Mirrors TransformedGrid (image.rs:15-95): palette merges member grids into
    a leader; squeeze splits a view and remembers the parent for the in-place
    merge at inverse time.
    """

    __slots__ = ("arr", "members", "squeeze_parent")

    def __init__(self, arr: np.ndarray, squeeze_parent: np.ndarray | None = None):
        self.arr = arr
        self.members: list[Slot] = []
        self.squeeze_parent = squeeze_parent


@dataclass
class ChannelInfo:
    width: int
    height: int
    hshift: int = 0
    vshift: int = 0
    original_width: int = 0
    original_height: int = 0

    def __post_init__(self):
        if self.original_width == 0:
            self.original_width = self.width
        if self.original_height == 0:
            self.original_height = self.height

    @classmethod
    def unshiftable(cls, width: int, height: int) -> "ChannelInfo":
        return cls(width, height, hshift=-1, vshift=-1)


# ---------------------------------------------------------------------------
# RCT


@dataclass
class Rct:
    begin_c: int
    rct_type: int

    @classmethod
    def parse(cls, bs: Bitstream) -> "Rct":
        begin_c = bs.read_u32(U(3), 8 + U(6), 72 + U(10), 1096 + U(13))
        rct_type = bs.read_u32(6, U(2), 2 + U(4), 10 + U(6))
        return cls(begin_c, rct_type)

    def check(
        self,
        channels: list[ChannelInfo],
        nb_meta: int,
        slots: list | None = None,
        meta_queue: list | None = None,
    ) -> int:
        end = self.begin_c + 3
        if end > len(channels):
            raise JxlValidationError("RCT channel range out of bounds")
        c0 = channels[self.begin_c]
        for info in channels[self.begin_c + 1 : end]:
            if (info.width, info.height) != (c0.width, c0.height):
                raise JxlValidationError("RCT channels differ in size")
        return nb_meta

    def inverse(self, slots: list, bit_depth: int) -> None:
        perm = self.rct_type // 7
        ty = self.rct_type % 7
        b = self.begin_c
        a_, b_, c_ = slots[b].arr, slots[b + 1].arr, slots[b + 2].arr
        # wrapping int32 arithmetic via numpy int32 (wraps on overflow)
        with np.errstate(over="ignore"):
            a = a_.astype(np.int32, copy=False)
            bb = b_.astype(np.int32, copy=False)
            c = c_.astype(np.int32, copy=False)
            if ty == 6:  # YCoCg
                tmp = a - (c >> 1)
                e = c + tmp
                f = tmp - (bb >> 1)
                d = f + bb
            else:
                d = a
                f = c + a if (ty & 1) else c
                if (ty >> 1) == 1:
                    e = bb + a
                elif (ty >> 1) == 2:
                    e = bb + ((a + f) >> 1)
                else:
                    e = bb
        out = [d, e, f]
        # inverse permutation (rct.rs inverse_permute): sequence of swaps
        if perm == 1:
            out[0], out[1] = out[1], out[0]
            out[0], out[2] = out[2], out[0]
        elif perm == 2:
            out[0], out[1] = out[1], out[0]
            out[1], out[2] = out[2], out[1]
        elif perm == 3:
            out[1], out[2] = out[2], out[1]
        elif perm == 4:
            out[0], out[1] = out[1], out[0]
        elif perm == 5:
            out[0], out[2] = out[2], out[0]
        # Write back through the views (in place). Pass-through kinds leave
        # out[i] ALIASING an input array; a permutation can then make a
        # later write read an input this loop already overwrote (found by
        # the float64 oracle cross-check, tests/test_oracle.py) — copy any
        # output that still shares memory with a slot written before it.
        arrs = (a_, b_, c_)
        for i in range(1, 3):
            if any(np.shares_memory(out[i], arrs[j]) for j in range(i)):
                out[i] = out[i].copy()
        a_[:, :] = out[0]
        b_[:, :] = out[1]
        c_[:, :] = out[2]


# ---------------------------------------------------------------------------
# Palette

# kDeltaPalette (transform/palette.rs DELTA_PALETTE) — spec constant table.
DELTA_PALETTE = np.array(
    [
        [0, 0, 0], [4, 4, 4], [11, 0, 0], [0, 0, -13], [0, -12, 0], [-10, -10, -10],
        [-18, -18, -18], [-27, -27, -27], [-18, -18, 0], [0, 0, -32], [-32, 0, 0],
        [-37, -37, -37], [0, -32, -32], [24, 24, 45], [50, 50, 50], [-45, -24, -24],
        [-24, -45, -45], [0, -24, -24], [-34, -34, 0], [-24, 0, -24], [-45, -45, -24],
        [64, 64, 64], [-32, 0, -32], [0, -32, 0], [-32, 0, 32], [-24, -45, -24],
        [45, 24, 45], [24, -24, -45], [-45, -24, 24], [80, 80, 80], [64, 0, 0],
        [0, 0, -64], [0, -64, -64], [-24, -24, 45], [96, 96, 96], [64, 64, 0],
        [45, -24, -24], [34, -34, 0], [112, 112, 112], [24, -45, -45], [45, 45, -24],
        [0, -32, 32], [24, -24, 45], [0, 96, 96], [45, -24, 24], [24, -45, -24],
        [-24, -45, 24], [0, -64, 0], [96, 0, 0], [128, 128, 128], [64, 0, 64],
        [144, 144, 144], [96, 96, 0], [-36, -36, 36], [45, -24, -45], [45, -45, -24],
        [0, 0, -96], [0, 128, 128], [0, 96, 0], [45, 24, -45], [-128, 0, 0],
        [24, -45, 24], [-45, 24, -45], [64, 0, -64], [64, -64, -64], [96, 0, 96],
        [45, -45, 24], [24, 45, -45], [64, 64, -64], [128, 128, 0], [0, 0, -128],
        [-24, 45, -45],
    ],
    dtype=np.int32,
)


@dataclass
class Palette:
    begin_c: int
    num_c: int
    nb_colours: int
    nb_deltas: int
    d_pred: int
    wp_header: WpHeader | None

    @classmethod
    def parse(cls, bs: Bitstream, wp_header: WpHeader) -> "Palette":
        begin_c = bs.read_u32(U(3), 8 + U(6), 72 + U(10), 1096 + U(13))
        num_c = bs.read_u32(1, 3, 4, 1 + U(13))
        nb_colours = bs.read_u32(U(8), 256 + U(10), 1280 + U(12), 5376 + U(16))
        nb_deltas = bs.read_u32(0, 1 + U(8), 257 + U(10), 1281 + U(16))
        d_pred = bs.read_bits(4)
        if d_pred > 13:
            raise JxlValidationError("invalid palette predictor")
        return cls(
            begin_c, num_c, nb_colours, nb_deltas, d_pred,
            wp_header if d_pred == 6 else None,
        )

    def check(
        self,
        channels: list[ChannelInfo],
        nb_meta: int,
        slots: list | None = None,
        meta_queue: list | None = None,
    ) -> int:
        begin, end = self.begin_c, self.begin_c + self.num_c
        if end > len(channels):
            raise JxlValidationError("palette channel range out of bounds")
        if begin < nb_meta:
            if end > nb_meta:
                raise JxlValidationError("palette spans meta/non-meta channels")
            nb_meta = nb_meta + 2 - self.num_c
        else:
            nb_meta += 1
        c0 = channels[begin]
        for info in channels[begin + 1 : end]:
            if (info.width, info.height) != (c0.width, c0.height):
                raise JxlValidationError("palette channels differ in size")
        del channels[begin + 1 : end]
        channels.insert(0, ChannelInfo.unshiftable(self.nb_colours, self.num_c))
        if slots is not None:
            members = slots[begin + 1 : end]
            del slots[begin + 1 : end]
            slots[begin].members.extend(members)
            slots.insert(0, Slot(meta_queue.pop(0)))
        return nb_meta

    def inverse(self, slots: list, bit_depth: int) -> None:
        palette = slots.pop(0).arr  # (num_c, nb_colours)
        begin = self.begin_c
        leader = slots[begin]
        members = leader.members[len(leader.members) - (self.num_c - 1):]
        del leader.members[len(leader.members) - (self.num_c - 1):]
        targets = [leader.arr] + [m.arr for m in members]
        index_grid = leader.arr
        h, w = index_grid.shape
        nb_colors = self.nb_colours
        nb_deltas = self.nb_deltas
        num_c = self.num_c
        idx32 = index_grid.astype(np.int64)  # copy before overwriting the leader

        outputs = [np.zeros((h, w), dtype=np.int32) for _ in range(num_c)]
        in_pal = (idx32 >= 0) & (idx32 < nb_colors)
        hi = idx32 >= nb_colors
        neg = idx32 < 0

        safe_idx = np.clip(idx32, 0, nb_colors - 1).astype(np.int64)
        for c in range(num_c):
            out = outputs[c]
            # palette lookup
            out[in_pal] = palette[c][safe_idx[in_pal]]
            if hi.any():
                hidx = idx32[hi] - nb_colors
                small = hidx < 64
                vals = np.zeros(hidx.shape, dtype=np.int64)
                # synthetic small palette (transform/palette.rs:79-86)
                hs = hidx[small]
                vals[small] = ((hs >> (2 * c)) % 4) * ((1 << bit_depth) - 1) // 4 + (
                    1 << max(0, bit_depth - 3)
                )
                hb = hidx[~small] - 64
                vals[~small] = ((hb // (5**c)) % 5) * ((1 << bit_depth) - 1) // 4
                out[hi] = vals.astype(np.int32)
            if neg.any():
                if c >= 3:
                    out[neg] = 0
                else:
                    nidx = (-(idx32[neg] + 1)) % 143
                    v = DELTA_PALETTE[((nidx + 1) >> 1).astype(np.int64), c].astype(
                        np.int64
                    )
                    v = np.where(nidx & 1 == 0, -v, v)
                    if bit_depth > 8:
                        v = v << (min(bit_depth, 24) - 8)
                    out[neg] = v.astype(np.int32)

        # delta positions: indices < nb_deltas get predictor-assisted deltas
        need_delta = idx32 < nb_deltas
        if need_delta.any():
            positions = np.argwhere(need_delta)
            pos_set = [(int(x), int(y)) for y, x in positions]
            pos_iter = sorted(pos_set, key=lambda t: (t[1], t[0]))
            for out in outputs:
                state = PredictorState()
                state.reset(
                    w, [], self.wp_header if self.d_pred == 6 else None
                )
                k = 0
                done = False
                for y in range(h):
                    if done:
                        break
                    for x in range(w):
                        state.compute_properties()
                        val = int(out[y, x])
                        if k < len(pos_iter) and pos_iter[k] == (x, y):
                            diff = state.predict(self.d_pred)
                            val = ((val + diff + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)
                            out[y, x] = val
                            k += 1
                            if k >= len(pos_iter):
                                done = True
                                break
                        state.record(val)

        for target, out in zip(targets, outputs):
            target[:, :] = out
        for i, m in enumerate(members):
            slots.insert(begin + 1 + i, m)


# ---------------------------------------------------------------------------
# Squeeze


@dataclass
class SqueezeParams:
    horizontal: bool
    in_place: bool
    begin_c: int
    num_c: int


@dataclass
class Squeeze:
    sp: list[SqueezeParams] = field(default_factory=list)

    @classmethod
    def parse(cls, bs: Bitstream) -> "Squeeze":
        num_sq = bs.read_u32(0, 1 + U(4), 9 + U(6), 41 + U(8))
        sp = []
        for _ in range(num_sq):
            horizontal = bs.read_bool()
            in_place = bs.read_bool()
            begin_c = bs.read_u32(U(3), 8 + U(6), 72 + U(10), 1096 + U(13))
            num_c = bs.read_u32(1, 2, 3, 4 + U(4))
            sp.append(SqueezeParams(horizontal, in_place, begin_c, num_c))
        return cls(sp)

    def set_default_params(self, channels: list[ChannelInfo], nb_meta: int) -> None:
        """Default squeeze schedule from channel dims (transform.rs:285-341)."""
        if self.sp:
            return
        first = nb_meta
        w = channels[first].width
        h = channels[first].height
        if len(channels) - first >= 3:
            nxt = channels[first + 1]
            if nxt.width == w and nxt.height == h:
                base = dict(begin_c=first + 1, num_c=2, in_place=False)
                self.sp.append(SqueezeParams(horizontal=True, **base))
                self.sp.append(SqueezeParams(horizontal=False, **base))
        base = dict(begin_c=first, num_c=len(channels) - first, in_place=True)
        if h >= w and h > 8:
            self.sp.append(SqueezeParams(horizontal=False, **base))
            h = (h + 1) // 2
        while w > 8 or h > 8:
            if w > 8:
                self.sp.append(SqueezeParams(horizontal=True, **base))
                w = (w + 1) // 2
            if h > 8:
                self.sp.append(SqueezeParams(horizontal=False, **base))
                h = (h + 1) // 2

    def check(
        self,
        channels: list[ChannelInfo],
        nb_meta: int,
        slots: list | None = None,
        meta_queue: list | None = None,
    ) -> int:
        for sp in self.sp:
            begin, end = sp.begin_c, sp.begin_c + sp.num_c
            if end > len(channels):
                raise JxlValidationError("squeeze channel range out of bounds")
            if begin < nb_meta:
                if not sp.in_place or end > nb_meta:
                    raise JxlValidationError("invalid meta-channel squeeze")
                nb_meta += sp.num_c
            residu_channels = []
            residu_slots = [] if slots is not None else None
            for idx, ch in enumerate(channels[begin:end]):
                if ch.width == 0 or ch.height == 0:
                    raise JxlValidationError("cannot squeeze zero-sized channel")
                if ch.hshift > 30 or ch.vshift > 30:
                    raise JxlValidationError("channel squeezed too much")
                residu = ChannelInfo(
                    ch.width, ch.height, ch.hshift, ch.vshift,
                    ch.original_width, ch.original_height,
                )
                if sp.horizontal:
                    w = ch.width
                    ch.width = (w + 1) // 2
                    residu.width = w // 2
                    if ch.hshift >= 0:
                        ch.hshift += 1
                        residu.hshift += 1
                else:
                    h = ch.height
                    ch.height = (h + 1) // 2
                    residu.height = h // 2
                    if ch.vshift >= 0:
                        ch.vshift += 1
                        residu.vshift += 1
                residu_channels.append(residu)
                if slots is not None:
                    slot = slots[begin + idx]
                    parent = slot.arr
                    if sp.horizontal:
                        cw = (parent.shape[1] + 1) // 2
                        slot.arr = parent[:, :cw]
                        residu_slots.append(Slot(parent[:, cw:], squeeze_parent=parent))
                    else:
                        chh = (parent.shape[0] + 1) // 2
                        slot.arr = parent[:chh, :]
                        residu_slots.append(Slot(parent[chh:, :], squeeze_parent=parent))
            if sp.in_place:
                residu_channels.extend(channels[end:])
                del channels[end:]
                if slots is not None:
                    residu_slots.extend(slots[end:])
                    del slots[end:]
            channels.extend(residu_channels)
            if slots is not None:
                slots.extend(residu_slots)
        return nb_meta

    def inverse(self, slots: list, bit_depth: int) -> None:
        for sp in reversed(self.sp):
            begin = sp.begin_c
            n = sp.num_c
            end = begin + n
            if sp.in_place:
                residuals = slots[end : end + n]
                del slots[end : end + n]
            else:
                residuals = slots[len(slots) - n :]
                del slots[len(slots) - n :]
            for i in range(n):
                slot = slots[begin + i]
                residu = residuals[i]
                parent = residu.squeeze_parent
                assert parent is not None
                if sp.horizontal:
                    merged = inverse_squeeze_h(slot.arr, residu.arr)
                else:
                    merged = inverse_squeeze_v(slot.arr, residu.arr)
                parent[:, :] = merged
                slot.arr = parent


def _wrap_i32_arr(v: np.ndarray) -> np.ndarray:
    return v.astype(np.uint64).astype(np.uint32).view(np.int32).astype(np.int64)


def _trunc_div(num: np.ndarray, d: int) -> np.ndarray:
    return np.sign(num) * (np.abs(num) // d)


def _tendency(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized tendency (squeeze.rs tendency_i32): every multiply/add
    wraps at i32 exactly like the reference's Wrapping<i32>, division
    truncates toward zero."""
    a64 = a.astype(np.int64)
    b64 = b.astype(np.int64)
    c64 = c.astype(np.int64)
    two_ab = _wrap_i32_arr(2 * (a64 - b64))
    two_bc = _wrap_i32_arr(2 * (b64 - c64))

    # case 1: a >= b >= c
    num1 = _wrap_i32_arr(4 * a64 - 3 * c64 - b64 + 6)
    x1 = _trunc_div(num1, 12)
    cond1a = _wrap_i32_arr(x1 - (x1 & 1)) > two_ab
    x1 = np.where(cond1a, _wrap_i32_arr(two_ab + 1), x1)
    cond1b = _wrap_i32_arr(x1 + (x1 & 1)) > two_bc
    x1 = np.where(cond1b, two_bc, x1)

    # case 2: a <= b <= c
    num2 = _wrap_i32_arr(4 * a64 - 3 * c64 - b64 - 6)
    x2 = _trunc_div(num2, 12)
    cond2a = _wrap_i32_arr(x2 + (x2 & 1)) < two_ab
    x2 = np.where(cond2a, _wrap_i32_arr(two_ab - 1), x2)
    cond2b = _wrap_i32_arr(x2 - (x2 & 1)) < two_bc
    x2 = np.where(cond2b, two_bc, x2)

    out = np.where(
        (a64 >= b64) & (b64 >= c64),
        x1,
        np.where((a64 <= b64) & (b64 <= c64), x2, 0),
    )
    return out.astype(np.int32)


def inverse_squeeze_h(avg: np.ndarray, residu: np.ndarray) -> np.ndarray:
    """Horizontal un-squeeze (squeeze.rs inverse_h_i32_base). avg is the
    downsampled channel (w+1)//2 wide, residu w//2 wide; returns width w.

    The recurrence is sequential in x (out[2x+1] feeds tendency at x+1) but
    fully parallel across rows — the device version scans over x and
    vectorizes rows on the VPU. Here: plain numpy loop over x."""
    h, aw = avg.shape
    rw = residu.shape[1]
    w = aw + rw
    out = np.zeros((h, w), dtype=np.int32)
    if rw == 0:
        return avg.astype(np.int32, copy=True)
    avg64 = avg.astype(np.int32)
    res = residu.astype(np.int32)

    from .. import native as _native

    if _native.available():
        return _native.inverse_squeeze_h(avg64, res, h, aw, rw)

    left = avg64[:, 0].copy()
    with np.errstate(over="ignore"):
        for x in range(rw):
            a = avg64[:, x]
            next_avg = avg64[:, x + 1] if x + 1 < aw else a
            diff = res[:, x] + _tendency(left, a, next_avg)
            # trunc div by 2 in i64 (np.abs of i32 min wraps)
            half = _trunc_div(diff.astype(np.int64), 2).astype(np.int32)
            first = a + half
            second = first - diff
            out[:, 2 * x] = first
            out[:, 2 * x + 1] = second
            left = second
    if w % 2 == 1:
        out[:, w - 1] = avg64[:, aw - 1]
    return out


def inverse_squeeze_v(avg: np.ndarray, residu: np.ndarray) -> np.ndarray:
    return inverse_squeeze_h(
        np.ascontiguousarray(avg.T), np.ascontiguousarray(residu.T)
    ).T.copy()


# ---------------------------------------------------------------------------
# TransformInfo dispatcher

TransformInfo = Rct | Palette | Squeeze


def parse_transform(bs: Bitstream, wp_header: WpHeader) -> TransformInfo:
    tr = bs.read_bits(2)
    if tr == 0:
        return Rct.parse(bs)
    if tr == 1:
        return Palette.parse(bs, wp_header)
    if tr == 2:
        return Squeeze.parse(bs)
    raise JxlValidationError(f"invalid transform id {tr}")
