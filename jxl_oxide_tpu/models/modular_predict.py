"""Modular predictors: the 14 sample predictors and the self-correcting
(weighted) predictor, plus the per-sample property vector.

Behavioral parity: jxl-modular/src/predictor.rs (WpHeader defaults, DIV_LOOKUP
1/24 fixed-point division, error carries, property cache layout) and
sample.rs grad_clamped. All arithmetic is i32 wrapping / i64 intermediate,
mirrored here with Python ints + explicit masking where wrapping matters.

This is the host-side slow path; the C++ host runtime implements the same
state machine for throughput, and channels whose trees avoid neighbor
properties skip it entirely.
"""

from __future__ import annotations

__all__ = ["WpHeader", "PredictorState", "PREDICTORS"]

_I32_MIN = -(1 << 31)
_I32_MAX = (1 << 31) - 1


def _wrap_i32(v: int) -> int:
    return ((v + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)


def _div_trunc(a: int, b: int) -> int:
    """Truncating (round-toward-zero) division, matching Rust i64 `/`."""
    q = abs(a) // b
    return q if a >= 0 else -q


def grad_clamped(n: int, w: int, nw: int) -> int:
    lo, hi = (w, n) if n > w else (n, w)
    g = n + w - nw
    return lo if g < lo else (hi if g > hi else g)


class WpHeader:
    __slots__ = ("p1", "p2", "p3a", "p3b", "p3c", "p3d", "p3e", "w")

    def __init__(self, bs=None):
        if bs is None or bs.read_bool():  # default_wp
            self.p1, self.p2 = 16, 10
            self.p3a = self.p3b = self.p3c = 7
            self.p3d = self.p3e = 0
            self.w = (13, 12, 12, 12)
        else:
            self.p1 = bs.read_bits(5)
            self.p2 = bs.read_bits(5)
            self.p3a = bs.read_bits(5)
            self.p3b = bs.read_bits(5)
            self.p3c = bs.read_bits(5)
            self.p3d = bs.read_bits(5)
            self.p3e = bs.read_bits(5)
            self.w = tuple(bs.read_bits(4) for _ in range(4))


DIV_LOOKUP = [0] + [(1 << 24) // i for i in range(1, 65)]


class _SelfCorrecting:
    """Weighted predictor state (predictor.rs SelfCorrectingPredictor)."""

    __slots__ = (
        "width", "x", "y", "wp", "true_err_row", "subpred_err_row",
        "true_err_w", "true_err_nw", "true_err_n", "true_err_ne",
        "subpred_err_nw_ww", "subpred_err_n_w", "subpred_err_ne",
        "prediction", "max_error", "subpred",
    )

    def __init__(self, width: int, wp: WpHeader):
        self.width = width
        self.x = 0
        self.y = 0
        self.wp = wp
        self.true_err_row = [0] * width
        self.subpred_err_row = [(0, 0, 0, 0)] * width
        self.true_err_w = 0
        self.true_err_nw = 0
        self.true_err_n = 0
        self.true_err_ne = 0
        self.subpred_err_nw_ww = (0, 0, 0, 0)
        self.subpred_err_n_w = (0, 0, 0, 0)
        self.subpred_err_ne = (0, 0, 0, 0)
        self.prediction = 0
        self.max_error = 0
        self.subpred = (0, 0, 0, 0)

    def predict(self, n: int, nw: int, ne: int, w: int, nn: int) -> None:
        wp = self.wp
        te_w, te_nw, te_n, te_ne = (
            self.true_err_w, self.true_err_nw, self.true_err_n, self.true_err_ne,
        )
        n3, nw3, ne3, w3, nn3 = n << 3, nw << 3, ne << 3, w << 3, nn << 3

        subpred = (
            w3 + ne3 - n3,
            n3 - (((te_w + te_n + te_ne) * wp.p1) >> 5),
            w3 - (((te_w + te_n + te_nw) * wp.p2) >> 5),
            n3
            - (
                (
                    te_nw * wp.p3a
                    + te_n * wp.p3b
                    + te_ne * wp.p3c
                    + (nn3 - n3) * wp.p3d
                    + (nw3 - w3) * wp.p3e
                )
                >> 5
            ),
        )

        e_nwww = self.subpred_err_nw_ww
        e_nw = self.subpred_err_n_w
        e_ne = self.subpred_err_ne
        weight = [0, 0, 0, 0]
        for i in range(4):
            err_sum = (e_nwww[i] + e_nw[i] + e_ne[i]) & 0xFFFFFFFF
            shift = max(((err_sum + 1) >> 5).bit_length() - 1, 0)
            weight[i] = 4 + ((wp.w[i] * DIV_LOOKUP[(err_sum >> shift) + 1]) >> shift)

        sum_weights = sum(weight)
        log_weight = (sum_weights >> 4).bit_length() - 1
        weight = [wv >> log_weight for wv in weight]
        sum_weights = sum(weight)
        s = (sum_weights >> 1) - 1
        for sp, wv in zip(subpred, weight):
            s += sp * wv
        prediction = (s * DIV_LOOKUP[sum_weights]) >> 24

        if ((te_n ^ te_w) | (te_n ^ te_nw)) <= 0:
            lo = min(n3, w3, ne3)
            hi = max(n3, w3, ne3)
            prediction = min(max(prediction, lo), hi)

        max_error = te_w
        for err in (te_n, te_nw, te_ne):
            if abs(err) > abs(max_error):
                max_error = err

        self.prediction = prediction
        self.max_error = _wrap_i32(max_error)
        self.subpred = subpred

    def record(self, sample: int) -> None:
        true_err = self.prediction - (sample << 3)
        s8 = sample << 3
        subpred_err = tuple(
            ((abs(sp - s8) + 3) >> 3) & 0xFFFFFFFF for sp in self.subpred
        )
        true_err = _wrap_i32(true_err)

        x = self.x
        self.true_err_row[x] = true_err
        self.subpred_err_row[x] = subpred_err
        self.x = x + 1

        if self.x >= self.width:
            self.y += 1
            self.x = 0
            self.true_err_w = 0
            self.true_err_n = self.true_err_row[0]
            self.true_err_nw = self.true_err_n
            self.subpred_err_n_w = self.subpred_err_row[0]
            self.subpred_err_nw_ww = self.subpred_err_n_w
            if self.width <= 1:
                self.true_err_ne = self.true_err_n
                self.subpred_err_ne = self.subpred_err_n_w
            else:
                self.true_err_ne = self.true_err_row[1]
                self.subpred_err_ne = self.subpred_err_row[1]
        else:
            self.true_err_w = true_err
            self.true_err_nw = self.true_err_n
            self.true_err_n = self.true_err_ne
            self.subpred_err_nw_ww = self.subpred_err_n_w
            self.subpred_err_n_w = tuple(
                (a + b) & 0xFFFFFFFF for a, b in zip(self.subpred_err_ne, subpred_err)
            )
            if self.x + 1 >= self.width:
                self.true_err_ne = self.true_err_n
                self.subpred_err_ne = self.subpred_err_n_w
            elif self.y != 0:
                self.true_err_ne = self.true_err_row[self.x + 1]
                self.subpred_err_ne = self.subpred_err_row[self.x + 1]


class PredictorState:
    """Per-channel scan state holding W/N/NW neighbors, two-row history, and
    the 16-entry property cache (predictor.rs Properties::new)."""

    __slots__ = (
        "width", "prev_row", "curr_row", "prev_channels", "sc",
        "y", "x", "w", "n", "nw", "prev_grad", "props",
    )

    def __init__(self):
        self.width = 0
        self.prev_row: list[int] = []
        self.curr_row: list[int] = []
        self.prev_channels = []
        self.sc: _SelfCorrecting | None = None
        self.y = 0
        self.x = 0
        self.w = 0
        self.n = 0
        self.nw = 0
        self.prev_grad = 0
        self.props = [0] * 16

    def reset(self, width: int, prev_channels, wp_header: WpHeader | None):
        self.width = width
        self.prev_row = []
        self.curr_row = []
        self.prev_channels = prev_channels  # list of 2-D arrays, most recent first
        self.sc = _SelfCorrecting(width, wp_header) if wp_header is not None else None
        self.y = 0
        self.x = 0
        self.w = 0
        self.n = 0
        self.nw = 0
        self.prev_grad = 0

    # neighbor access with edge handling (predictor.rs nn/ne/nee/ww)
    def _nn(self) -> int:
        cr = self.curr_row
        x = self.x
        return cr[x] if x < len(cr) else self.n

    def _ne(self) -> int:
        x = self.x
        if not self.prev_row or x + 1 >= self.width:
            return self.n
        return self.prev_row[x + 1]

    def _nee(self) -> int:
        x = self.x
        if not self.prev_row or x + 2 >= self.width:
            return self._ne()
        return self.prev_row[x + 2]

    def _ww(self) -> int:
        x = self.x
        if x >= 2:
            return self.curr_row[x - 2]
        return self.w

    def compute_properties(self) -> list[int]:
        """Fill and return the 16-entry property cache; runs WP if enabled."""
        if self.sc is not None:
            self.sc.predict(self.n, self.nw, self._ne(), self.w, self._nn())
        w, n, nw = self.w, self.n, self.nw
        w_nw = _wrap_i32(w - nw)
        p = self.props
        p[0] = 0
        p[1] = 0
        p[2] = self.y
        p[3] = self.x
        p[4] = abs(n)
        p[5] = abs(w)
        p[6] = n
        p[7] = w
        p[8] = _wrap_i32(w - self.prev_grad)
        p[9] = _wrap_i32(w_nw + n)
        p[10] = w_nw
        p[11] = _wrap_i32(nw - n)
        p[12] = _wrap_i32(n - self._ne())
        p[13] = _wrap_i32(n - self._nn())
        p[14] = _wrap_i32(w - self._ww())
        p[15] = self.sc.max_error if self.sc is not None else 0
        return p

    def get_extra(self, prop_extra: int) -> int:
        """Properties >= 16: previously-decoded channel references."""
        idx = prop_extra // 4
        kind = prop_extra % 4
        if idx >= len(self.prev_channels):
            return 0
        ch = self.prev_channels[idx]
        x, y = self.x, self.y
        c = int(ch[y, x])
        if kind == 0:
            return abs(c)
        if kind == 1:
            return c
        if x == 0 and y == 0:
            g = 0
        elif x == 0:
            g = int(ch[y - 1, 0])
        elif y == 0:
            g = int(ch[0, x - 1])
        else:
            g = grad_clamped(int(ch[y - 1, x]), int(ch[y, x - 1]), int(ch[y - 1, x - 1]))
        return abs(c - g) if kind == 2 else _wrap_i32(c - g)

    def get_property(self, prop: int) -> int:
        if prop >= 16:
            return self.get_extra(prop - 16)
        return self.props[prop]

    def predict(self, predictor: int) -> int:
        """Evaluate one of the 14 predictors (predictor.rs Predictor::predict)."""
        w, n, nw = self.w, self.n, self.nw
        if predictor == 0:
            return 0
        if predictor == 1:
            return w
        if predictor == 2:
            return n
        if predictor == 3:
            return _div_trunc(w + n, 2)
        if predictor == 4:  # Select
            return w if abs(n - nw) < abs(w - nw) else n
        if predictor == 5:  # Gradient (clamped)
            return grad_clamped(n, w, nw)
        if predictor == 6:  # SelfCorrecting
            return (self.sc.prediction + 3) >> 3
        if predictor == 7:
            return self._ne()
        if predictor == 8:
            return nw
        if predictor == 9:
            return self._ww()
        if predictor == 10:
            return _div_trunc(w + nw, 2)
        if predictor == 11:
            return _div_trunc(n + nw, 2)
        if predictor == 12:
            return _div_trunc(n + self._ne(), 2)
        if predictor == 13:
            return _div_trunc(
                6 * n - 2 * self._nn() + 7 * w + self._ww() + self._nee()
                + 3 * self._ne() + 8,
                16,
            )
        raise ValueError(f"invalid predictor {predictor}")

    def record(self, sample: int) -> None:
        if self.sc is not None:
            self.sc.record(sample)
        cr = self.curr_row
        if self.x < len(cr):
            cr[self.x] = sample
        else:
            cr.append(sample)
        self.x += 1
        if self.x >= self.width:
            self.y += 1
            self.x = 0
            self.prev_row, self.curr_row = self.curr_row, self.prev_row
            self.prev_grad = 0
            n = self.prev_row[0]
            self.n = n
            self.w = n
            self.nw = n
        else:
            self.prev_grad = self.props[9]
            self.w = sample
            if not self.prev_row:
                self.nw = sample
                self.n = sample
            else:
                self.nw = self.n
                self.n = self.prev_row[self.x]


PREDICTORS = tuple(range(14))
