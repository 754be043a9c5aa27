"""jxl_oxide_tpu: TPU-native JPEG XL decoder (JAX/XLA/Pallas).

Same capabilities as tirr-c/jxl-oxide, redesigned TPU-first: host-side
entropy decode feeding batched device tensors; DCTs as MXU matmuls;
filters/color as whole-plane XLA ops; group-sharded multi-chip decode
via jax.sharding.
"""

from .api import JxlImage, Render
from .utils.errors import JxlError

__all__ = ["JxlImage", "Render", "JxlError"]
__version__ = "0.1.0"
