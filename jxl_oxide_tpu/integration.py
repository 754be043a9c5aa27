"""PIL/Pillow image plugin.

Behavioral parity: jxl-oxide/src/integration.rs + integration/image.rs
(the `image`-crate ImageDecoder integration): registers the decoder with
the host ecosystem's standard image library so `Image.open("x.jxl")`
works, including animation frames (seek/tell), ICC profile metadata, and
8/16-bit depth selection.

Usage::

    from jxl_oxide_tpu.integration import register
    register()
    from PIL import Image
    im = Image.open("image.jxl")
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["register", "JxlImageFile"]

_MAGIC_CODESTREAM = b"\xff\x0a"
_MAGIC_CONTAINER = b"\x00\x00\x00\x0cJXL \x0d\x0a\x87\x0a"


def _accept(prefix: bytes) -> bool:
    return prefix.startswith(_MAGIC_CODESTREAM) or prefix.startswith(
        _MAGIC_CONTAINER
    )


try:
    from PIL import Image, ImageFile
except ImportError:  # pragma: no cover - PIL is baked into the image
    Image = ImageFile = None


if ImageFile is not None:

    class JxlImageFile(ImageFile.ImageFile):
        """Pillow ImageFile over the jxl_oxide_tpu decoder."""

        format = "JXL"
        format_description = "JPEG XL (jxl-oxide-tpu)"

        def _open(self):
            from .api import JxlImage

            data = self.fp.read()
            self._jxl = JxlImage.from_bytes(data)
            meta = self._jxl.image_header.metadata
            self._size = (self._jxl.width, self._jxl.height)
            # orientation 5-8 transpose the output dimensions
            if meta.orientation >= 5:
                self._size = (self._size[1], self._size[0])
            has_alpha = any(
                info.ty.name == "ALPHA" for info in meta.ec_info
            )
            if meta.grayscale:
                self._mode = "LA" if has_alpha else "L"
            else:
                self._mode = "RGBA" if has_alpha else "RGB"
            self.n_frames = max(1, self._jxl.num_keyframes)
            self.is_animated = self.n_frames > 1
            self._frame = 0
            icc = self._jxl.embedded_icc
            if icc:
                self.info["icc_profile"] = icc
            if meta.animation is not None:
                anim = meta.animation
                self.info["loop"] = anim.num_loops
            self.tile = []
            self._loaded_frame = None

        def seek(self, frame: int) -> None:
            if not 0 <= frame < self.n_frames:
                raise EOFError("no more frames")
            if frame != self._frame:
                self._frame = frame
                self._loaded_frame = None

        def tell(self) -> int:
            return self._frame

        def load(self):
            if self._loaded_frame != self._frame:
                render = self._jxl.render_frame(self._frame)
                arr = render.image()
                arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
                if arr.shape[-1] == 1:
                    arr = arr[..., 0]
                pil = Image.fromarray(arr, self.mode)
                self.im = pil.im
                self._size = pil.size
                self._loaded_frame = self._frame
                meta = self._jxl.image_header.metadata
                if meta.animation is not None:
                    anim = meta.animation
                    self.info["duration"] = (
                        render.duration
                        * 1000
                        * anim.tps_denominator
                        / anim.tps_numerator
                    )
            return super().load()


def register() -> None:
    """Install the plugin into Pillow's registry (idempotent)."""
    if Image is None:  # pragma: no cover
        raise ImportError("Pillow is not available")
    Image.register_open(JxlImageFile.format, JxlImageFile, _accept)
    Image.register_extensions(JxlImageFile.format, [".jxl"])
    Image.register_mime(JxlImageFile.format, "image/jxl")
