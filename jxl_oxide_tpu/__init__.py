"""jxl_oxide_tpu: TPU-native JPEG XL decoder (JAX/XLA/Pallas).

Same capabilities as tirr-c/jxl-oxide, redesigned TPU-first: host-side
entropy decode feeding batched device tensors; DCTs as MXU matmuls;
filters/color as whole-plane XLA ops; group-sharded multi-chip decode
via jax.sharding.
"""

import os as _os


def _init_compilation_cache() -> None:
    """Persistent XLA compilation cache: decode pipelines are compiled
    per frame geometry, so repeat processes (CLI runs, benchmarks) reuse
    compiled programs instead of paying 20-40 s TPU compile each time.
    Opt out with JXL_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("JXL_TPU_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        path = _os.environ.get(
            "JXL_TPU_COMPILE_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "jxl_oxide_tpu", "xla"
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_init_compilation_cache()

from .api import JxlImage, Render, clear_program_caches
from .parallel import decode_mesh, set_decode_mesh
from .serving import decode_batch, decode_iter
from .utils.errors import JxlError

__all__ = [
    "JxlImage", "Render", "JxlError", "decode_mesh", "set_decode_mesh",
    "decode_batch", "decode_iter", "clear_program_caches",
]
__version__ = "0.2.0"
