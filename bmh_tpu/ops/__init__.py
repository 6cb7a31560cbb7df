"""TPU-native codec stages: BWT, MTF, Huffman — pure jittable JAX functions."""
