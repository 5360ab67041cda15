"""Verify device-engine preprocessing really recomputes state (checksums)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from pacmann_tpu.pir.device_engine import DevicePianoEngine

import os
n = int(os.environ.get("VP_N", "262144"))
eb, batch = 640, 32
rng = np.random.default_rng(0)
import sys
sys.path.insert(0, '/root/repo')
from bench import synth_raw
raw = synth_raw(n, 160)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
pir = DevicePianoEngine(n, eb, batch, raw, 8)
jax.block_until_ready(pir.db)

@jax.jit
def checksum(state):
    return (jnp.sum(state["primary_parity"], dtype=jnp.uint32)
            ^ jnp.sum(state["backup_parity"], dtype=jnp.uint32)
            ^ jnp.sum(state["table"], dtype=jnp.uint32))

sums = []
for i in range(3):
    t0 = time.time()
    pir.preprocessing(rng=np.random.default_rng(i))
    dt = time.time() - t0
    cs = int(np.asarray(checksum(pir.state)))
    print(f"prep{i}: {dt:.3f}s checksum={cs:#x}", flush=True)
    sums.append(cs)
assert len(set(sums)) == 3, "checksums identical -> prep not recomputing!"
# exactness after latest prep
c = pir.config
ids = [int(i * c.partition_size + rng.integers(0, c.partition_size)) for i in range(16)]
out = pir.query(ids)
ok = sum(np.array_equal(out[r], raw[idx]) for r, idx in enumerate(ids))
print(f"exact after re-preps: {ok}/16", flush=True)
