"""TPU compute kernels: distance, bitsliced AES PRF, XOR parity scans."""

from pacmann_tpu.ops.distance import inner_product_xla, l2_distance  # noqa: F401
