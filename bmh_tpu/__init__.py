"""bmh_tpu — TPU-native BWT->MTF->Huffman block compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`komour/bwt-mtf-huffman-compressor` (reference mounted at /root/reference):
block-parallel lossless codec with prefix-doubling BWT, parallel MTF,
canonical Huffman with scan-based bit packing and gap-composition parallel
decode, sharded across TPU meshes via shard_map.
"""

from .api import (
    compress_bytes,
    compress_file,
    decompress_bytes,
    decompress_file,
    get_backend,
)
from .utils.container import DEFAULT_BLOCK_SIZE

__version__ = "0.1.0"

__all__ = [
    "compress_bytes",
    "decompress_bytes",
    "compress_file",
    "decompress_file",
    "get_backend",
    "DEFAULT_BLOCK_SIZE",
    "__version__",
]
