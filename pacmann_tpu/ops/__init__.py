from pacmann_tpu.ops import aes, aes_host, bitops, gf2  # noqa: F401
