"""Platform helpers: decide whether Pallas kernels run compiled or interpreted.

Tests run on CPU (with a virtual 8-device mesh); real benches run on TPU.
Pallas TPU kernels only compile on TPU, so every kernel wrapper consults
``default_interpret()`` to pick interpreter mode off-TPU.
"""

import functools

import jax


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def default_interpret() -> bool:
    """True when Pallas kernels must run in interpreter mode (non-TPU)."""
    return not on_tpu()
