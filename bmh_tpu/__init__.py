"""bmh_tpu — TPU-native BWT->MTF->Huffman block compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`komour/bwt-mtf-huffman-compressor` (reference mounted at /root/reference):
block-parallel lossless codec with prefix-doubling BWT, parallel MTF,
canonical Huffman with scan-based bit packing and gap-composition parallel
decode, sharded across TPU meshes via shard_map.
"""

def _enable_compile_cache() -> None:
    """Persistent XLA compile cache shared by every entry point (CLI, bench,
    tests).  First compiles of the big fused pipelines take minutes on TPU;
    the cache makes every later process start warm.  BMH_CACHE_DIR overrides;
    BMH_CACHE_DIR=0 disables."""
    import os

    d = os.environ.get("BMH_CACHE_DIR")
    if d == "0":
        return
    if not d:
        d = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob


_enable_compile_cache()

from .api import (  # noqa: E402
    compress_bytes,
    compress_file,
    decompress_bytes,
    decompress_file,
    get_backend,
)
from .utils.container import DEFAULT_BLOCK_SIZE  # noqa: E402

__version__ = "0.5.0"

__all__ = [
    "compress_bytes",
    "decompress_bytes",
    "compress_file",
    "decompress_file",
    "get_backend",
    "DEFAULT_BLOCK_SIZE",
    "__version__",
]
