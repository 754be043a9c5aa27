"""Public API facade: JxlImage, Render, pixel output.

Behavioral parity: jxl-oxide/src/lib.rs (JxlImage/JxlImageBuilder/Render)
and fb.rs (sample conversion). Push-based: feed bytes through the
container parser; headers/ICC parse eagerly, frame decode is lazy per
render call. Device work (filters, color transforms, VarDCT math) runs
under jax; the entropy stage is host-side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .color.icc import decode_icc, read_icc
from .headers.frame import Encoding
from .headers.image import ColourEncoding, ColourSpace, ExtraChannelType, ImageHeader
from .io.bitstream import Bitstream
from .io.container import BitstreamKind, ContainerParser
from .render.context import KeyframeRender, RenderContext
from .render.frame import Frame
from .utils.errors import JxlError, JxlNotSupportedError, JxlValidationError

__all__ = ["JxlImage", "Render"]


@dataclass
class Render:
    """A rendered keyframe in the requested color encoding."""

    planes: list  # color planes after color transform, image-sized
    extra: list  # extra channel planes
    ec_info: list
    orientation: int
    name: str
    duration: int

    def image_planar(self) -> list:
        """Color planes with orientation applied."""
        return [_apply_orientation(p, self.orientation) for p in self.planes]

    def image_all_channels(self) -> np.ndarray:
        """[H, W, C] interleaved color + extra channels."""
        chans = [
            _apply_orientation(p, self.orientation)
            for p in (*self.planes, *self.extra)
        ]
        return np.stack(chans, axis=-1)

    def image(self) -> np.ndarray:
        """[H, W, C] color (+ alpha if present)."""
        chans = [_apply_orientation(p, self.orientation) for p in self.planes]
        for info, ec in zip(self.ec_info, self.extra):
            if info.ty == ExtraChannelType.ALPHA:
                chans.append(_apply_orientation(ec, self.orientation))
                break
        return np.stack(chans, axis=-1)

    def to_u8(self) -> np.ndarray:
        return np.clip(np.round(self.image() * 255.0), 0, 255).astype(np.uint8)

    def to_u16(self) -> np.ndarray:
        return np.clip(np.round(self.image() * 65535.0), 0, 65535).astype(np.uint16)


def _apply_orientation(plane: np.ndarray, orientation: int) -> np.ndarray:
    """EXIF orientation 1-8 (region.rs apply_orientation)."""
    if orientation == 1:
        return plane
    if orientation == 2:
        return plane[:, ::-1]
    if orientation == 3:
        return plane[::-1, ::-1]
    if orientation == 4:
        return plane[::-1, :]
    if orientation == 5:
        return plane.T
    if orientation == 6:
        return plane.T[:, ::-1]
    if orientation == 7:
        return plane.T[::-1, ::-1]
    if orientation == 8:
        return plane.T[::-1, :]
    raise JxlValidationError(f"invalid orientation {orientation}")


class JxlImage:
    """Streaming JPEG XL decoder."""

    def __init__(self):
        self._parser = ContainerParser()
        self._codestream = bytearray()
        self._aux_boxes: list[tuple[bytes, bytes]] = []
        self._aux_current: list[bytes] | None = None
        self._aux_type: bytes = b""
        self.image_header: ImageHeader | None = None
        self.embedded_icc: bytes | None = None
        self._frames: list[Frame] = []
        self._frames_complete = False
        self._header_bs: Bitstream | None = None
        self._ctx: RenderContext | None = None
        self._keyframes: list[KeyframeRender] | None = None
        self.requested_encoding: ColourEncoding | None = None

    # -- construction -------------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes) -> "JxlImage":
        img = cls()
        img.feed_bytes(data)
        img.finish()
        return img

    @classmethod
    def open(cls, path) -> "JxlImage":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    def feed_bytes(self, data: bytes) -> None:
        for ev in self._parser.feed(data):
            self._handle_event(ev)

    def finish(self) -> None:
        for ev in self._parser.finish():
            self._handle_event(ev)
        self._try_init()
        self._load_frames()

    def _handle_event(self, ev) -> None:
        if ev.kind == "codestream":
            self._codestream += ev.data
        elif ev.kind == "aux_start":
            self._aux_current = []
            self._aux_type = ev.box_type
        elif ev.kind == "aux_data":
            if self._aux_current is not None:
                self._aux_current.append(ev.data)
        elif ev.kind == "aux_end":
            if self._aux_current is not None:
                self._aux_boxes.append(
                    (self._aux_type, b"".join(self._aux_current))
                )
                self._aux_current = None

    def _try_init(self) -> None:
        if self.image_header is not None:
            return
        bs = Bitstream(bytes(self._codestream))
        self.image_header = ImageHeader.parse(bs)
        if self.image_header.metadata.colour_encoding.want_icc:
            self.embedded_icc = decode_icc(read_icc(bs))
        self._header_bs = bs

    def _load_frames(self) -> None:
        if self._frames_complete or self.image_header is None:
            return
        bs = self._header_bs
        data = bytes(self._codestream)
        while True:
            frame = Frame(self.image_header, bs)
            end = frame.start_byte + frame.total_bytes
            if end > len(data):
                raise JxlValidationError("truncated codestream")
            frame.feed_bytes(data[frame.start_byte + frame.data_start : end])
            self._frames.append(frame)
            bs.pos = end * 8
            if frame.header.is_last:
                break
        self._frames_complete = True

    # -- metadata -----------------------------------------------------------

    @property
    def width(self) -> int:
        w = self.image_header.size.width
        return (
            self.image_header.size.height
            if self.image_header.metadata.orientation >= 5
            else w
        )

    @property
    def height(self) -> int:
        h = self.image_header.size.height
        return (
            self.image_header.size.width
            if self.image_header.metadata.orientation >= 5
            else h
        )

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    @property
    def num_keyframes(self) -> int:
        return sum(1 for f in self._frames if f.header.is_keyframe)

    @property
    def is_animation(self) -> bool:
        return self.image_header.metadata.animation is not None

    def request_color_encoding(self, encoding: ColourEncoding) -> None:
        self.requested_encoding = encoding
        self._keyframes = None

    # -- rendering ----------------------------------------------------------

    def _render_all(self) -> list[KeyframeRender]:
        if self._keyframes is None:
            ctx = RenderContext(self.image_header)
            for frame in self._frames:
                ctx.add_frame(frame)
            self._ctx = ctx
            self._keyframes = ctx.keyframes
        return self._keyframes

    def render_frame(self, keyframe_idx: int = 0) -> Render:
        kf = self._render_all()[keyframe_idx]
        return self._postprocess(kf)

    def _postprocess(self, kf: KeyframeRender) -> Render:
        """postprocess_keyframe (render/lib.rs:884-994): YCbCr -> RGB,
        then color transform to the requested encoding."""
        meta = self.image_header.metadata
        frame_header = kf.frame.header
        color = [np.asarray(p, dtype=np.float32) for p in kf.color]

        if frame_header.do_ycbcr:
            from .ops.color import ycbcr_to_rgb

            cb, y, cr = color[0], color[1], color[2]
            r, g, b = ycbcr_to_rgb(cb, y, cr)
            color = [np.asarray(r), np.asarray(g), np.asarray(b)]

        source = (
            ColourEncoding(colour_space=ColourSpace.XYB)
            if meta.xyb_encoded
            else meta.colour_encoding
        )
        target = self.requested_encoding
        if target is None:
            if meta.xyb_encoded or not meta.colour_encoding.want_icc:
                target = (
                    ColourEncoding()
                    if not meta.grayscale or meta.xyb_encoded
                    else meta.colour_encoding
                )
                if not meta.xyb_encoded:
                    target = meta.colour_encoding
            else:
                target = None  # keep ICC-described samples as-is

        if target is not None and not source.want_icc:
            from .color.convert import ColorTransform

            tr = ColorTransform.build(
                source, target, meta.opsin_inverse_matrix, meta.tone_mapping
            )
            if not tr.is_noop:
                color = [np.asarray(p) for p in tr.run(color)]

        return Render(
            planes=color,
            extra=[np.asarray(p, dtype=np.float32) for p in kf.extra],
            ec_info=list(meta.ec_info),
            orientation=meta.orientation,
            name=kf.name,
            duration=kf.duration,
        )
