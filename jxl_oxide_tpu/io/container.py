"""Incremental JPEG XL container (ISO-BMFF-like) parser.

Behavioral parity with the reference container state machine
(jxl-bitstream/src/container.rs:10-96, container/parse.rs:37-183,
container/box_header.rs:85-118): detects bare codestream (FF 0A) vs boxed
container, enforces jxlc/jxlp ordering, and emits events for codestream bytes
and auxiliary boxes (Exif / xml / jbrd / brob / jxll / jxli / jhgm).

Host-side only. Designed push-based so streaming/progressive decode works: feed
arbitrary byte chunks, receive a list of events per feed.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from ..utils.errors import JxlBitstreamError

__all__ = [
    "BitstreamKind",
    "BoxEvent",
    "ContainerParser",
    "CODESTREAM_SIG",
    "CONTAINER_SIG",
]

CODESTREAM_SIG = b"\xff\x0a"
CONTAINER_SIG = b"\x00\x00\x00\x0cJXL \x0d\x0a\x87\x0a"

# Box type 4CCs (container/box_header.rs:85-118)
BOX_JXL = b"JXL "
BOX_FTYP = b"ftyp"
BOX_JXLL = b"jxll"
BOX_JXLC = b"jxlc"
BOX_JXLP = b"jxlp"
BOX_JBRD = b"jbrd"
BOX_EXIF = b"Exif"
BOX_XML = b"xml "
BOX_BROB = b"brob"
BOX_JXLI = b"jxli"
BOX_JHGM = b"jhgm"
BOX_JUMB = b"jumb"


class BitstreamKind(enum.Enum):
    UNKNOWN = 0
    BARE_CODESTREAM = 1
    CONTAINER = 2
    INVALID = 3


@dataclass
class BoxEvent:
    """One parse event.

    kind: 'codestream' (data = codestream bytes), 'aux_start' (box_type set),
    'aux_data', 'aux_end', or 'kind' (bitstream kind determined).
    """

    kind: str
    data: bytes = b""
    box_type: bytes = b""
    brotli: bool = False
    last_box: bool = False


@dataclass
class _BoxHeader:
    box_type: bytes
    content_size: int | None  # None = extends to EOF
    header_size: int


def _parse_box_header(buf: memoryview) -> _BoxHeader | None:
    """Parse one box header from buf, or None if more bytes are needed."""
    if len(buf) < 8:
        return None
    sbox = int.from_bytes(buf[0:4], "big")
    tbox = bytes(buf[4:8])
    if sbox == 1:
        if len(buf) < 16:
            return None
        xlbox = int.from_bytes(buf[8:16], "big")
        if xlbox < 16:
            raise JxlBitstreamError("invalid XLBox size")
        return _BoxHeader(tbox, xlbox - 16, 16)
    if sbox == 0:
        return _BoxHeader(tbox, None, 8)
    if sbox < 8:
        raise JxlBitstreamError("invalid box size")
    return _BoxHeader(tbox, sbox - 8, 8)


class ContainerParser:
    """Push-based container parser.

    feed(bytes) -> list[BoxEvent]. Unconsumed bytes are buffered internally.
    """

    def __init__(self) -> None:
        self._buf = bytearray()
        self.kind = BitstreamKind.UNKNOWN
        self._state = "signature"
        self._aux: _BoxHeader | None = None
        self._aux_brotli_type: bytes | None = None
        self._aux_left: int | None = None
        self._cs_left: int | None = None  # bytes left in current codestream box
        self._jxlp_state: str | int = "initial"  # 'initial' | 'single' | int(next idx) | 'done'
        self._finished = False

    # ------------------------------------------------------------------

    def feed(self, data: bytes) -> list[BoxEvent]:
        self._buf += data
        events: list[BoxEvent] = []
        progress = True
        while progress:
            progress = self._step(events)
        return events

    def finish(self) -> list[BoxEvent]:
        """Signal EOF; closes an open to-EOF aux box."""
        events: list[BoxEvent] = []
        self._finished = True
        if self._state == "aux" and self._aux_left is None:
            if self._buf:
                events.append(
                    BoxEvent("aux_data", data=bytes(self._buf), box_type=self._aux_box_type())
                )
                self._buf.clear()
            events.append(BoxEvent("aux_end", box_type=self._aux_box_type()))
            self._state = "box_header"
        return events

    # ------------------------------------------------------------------

    def _aux_box_type(self) -> bytes:
        assert self._aux is not None
        return self._aux_brotli_type or self._aux.box_type

    def _step(self, events: list[BoxEvent]) -> bool:
        buf = self._buf
        st = self._state

        if st == "signature":
            if len(buf) >= 2 and buf[:2] == CODESTREAM_SIG:
                self.kind = BitstreamKind.BARE_CODESTREAM
                events.append(BoxEvent("kind"))
                self._state = "bare"
                return True
            if len(buf) >= len(CONTAINER_SIG):
                if buf[: len(CONTAINER_SIG)] == CONTAINER_SIG:
                    self.kind = BitstreamKind.CONTAINER
                    events.append(BoxEvent("kind"))
                    del buf[: len(CONTAINER_SIG)]
                    self._state = "box_header"
                    return True
                self.kind = BitstreamKind.INVALID
                raise JxlBitstreamError("not a JPEG XL bitstream")
            if buf and buf[0] not in (0xFF, 0x00):
                self.kind = BitstreamKind.INVALID
                raise JxlBitstreamError("not a JPEG XL bitstream")
            if len(buf) >= 2 and buf[0] == 0xFF and buf[1] != 0x0A:
                self.kind = BitstreamKind.INVALID
                raise JxlBitstreamError("not a JPEG XL bitstream")
            return False

        if st == "bare":
            # Everything is codestream.
            if buf:
                events.append(BoxEvent("codestream", data=bytes(buf)))
                buf.clear()
            return False

        if st == "box_header":
            try:
                header = _parse_box_header(memoryview(buf))
            except JxlBitstreamError:
                raise
            if header is None:
                return False
            del buf[: header.header_size]
            bt = header.box_type
            if bt == BOX_JXLC:
                if self._jxlp_state not in ("initial",):
                    raise JxlBitstreamError("duplicate or misplaced jxlc box")
                self._jxlp_state = "single"
                self._cs_left = header.content_size
                self._state = "codestream"
                return True
            if bt == BOX_JXLP:
                self._state = "jxlp_index"
                self._aux = header
                return True
            if bt in (BOX_FTYP, BOX_JXL):
                # Signature / ftyp content skipped as opaque.
                self._aux = header
                self._aux_brotli_type = None
                self._aux_left = header.content_size
                self._state = "skip_box"
                return True
            if bt == BOX_BROB:
                self._state = "brob_type"
                self._aux = header
                return True
            # Generic aux box (Exif, xml , jbrd, jxll, jxli, jhgm, jumb, unknown)
            self._aux = header
            self._aux_brotli_type = None
            self._aux_left = header.content_size
            events.append(
                BoxEvent(
                    "aux_start",
                    box_type=bt,
                    last_box=header.content_size is None,
                )
            )
            self._state = "aux"
            return True

        if st == "brob_type":
            assert self._aux is not None
            if len(buf) < 4:
                return False
            inner = bytes(buf[:4])
            del buf[:4]
            if inner in (BOX_JXLC, BOX_JXLP, BOX_BROB):
                raise JxlBitstreamError("brob box cannot wrap codestream/brob")
            self._aux_brotli_type = inner
            size = self._aux.content_size
            self._aux_left = None if size is None else size - 4
            events.append(
                BoxEvent(
                    "aux_start",
                    box_type=inner,
                    brotli=True,
                    last_box=size is None,
                )
            )
            self._state = "aux"
            return True

        if st == "jxlp_index":
            assert self._aux is not None
            if len(buf) < 4:
                return False
            index = int.from_bytes(buf[:4], "big")
            del buf[:4]
            is_last = bool(index & 0x80000000)
            index &= 0x7FFFFFFF
            expected = self._jxlp_state
            if expected == "initial":
                expected = 0
            if not isinstance(expected, int) or index != expected:
                raise JxlBitstreamError(f"out-of-order jxlp index {index}")
            self._jxlp_state = "done" if is_last else index + 1
            size = self._aux.content_size
            self._cs_left = None if size is None else size - 4
            self._state = "codestream"
            return True

        if st in ("codestream", "aux", "skip_box"):
            left = self._cs_left if st == "codestream" else self._aux_left
            if left is None:
                take = len(buf)
                done = False
            else:
                take = min(left, len(buf))
                done = take == left
            chunk = bytes(buf[:take])
            del buf[:take]
            if st == "codestream":
                if chunk:
                    events.append(BoxEvent("codestream", data=chunk))
                if left is not None:
                    self._cs_left = left - take
            elif st == "aux":
                if chunk:
                    events.append(
                        BoxEvent("aux_data", data=chunk, box_type=self._aux_box_type(),
                                 brotli=self._aux_brotli_type is not None)
                    )
                if left is not None:
                    self._aux_left = left - take
            else:
                if left is not None:
                    self._aux_left = left - take
            if done:
                if st == "aux":
                    events.append(BoxEvent("aux_end", box_type=self._aux_box_type()))
                self._state = "box_header"
                self._aux = None
                self._aux_brotli_type = None
                return True
            return False

        raise AssertionError(f"bad state {st}")
