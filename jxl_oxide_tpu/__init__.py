"""tpu-jxl: TPU-native JPEG XL decode engine (JAX/XLA/Pallas).

Capability reference: tirr-c/jxl-oxide (pure-Rust decoder). Architecture is
TPU-first, not a port: byte-granular parsing and entropy decode run on the
host; all grid-shaped math (inverse transforms, IDCT, filters, color) runs on
device as XLA/Pallas programs, sharded over a `jax.sharding.Mesh` for
multi-chip decode.

Public API facade mirrors the reference's `JxlImage` surface
(jxl-oxide/src/lib.rs:199-795); see `jxl_oxide_tpu.api`.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import keeps `import jxl_oxide_tpu` light (no jax import) for
    # host-only tooling; the facade pulls in device modules.
    if name == "JxlImage":
        from .api import JxlImage

        return JxlImage
    raise AttributeError(name)
