"""Bisect the SIFT100M-shard _prep_fused compile failure: which offline
phase produces the 70 GB padded copy (u32[...,16,2,1]{2,1,0,3:T(8,128)})?

Runs each phase as its own jit at the exact shard shapes with a SMALL
surrogate where the phase doesn't touch the big DB. Usage:
  python scripts/probe_prep_100m_phases.py [--phase tables|slotcol|slotcol32|skip|scan]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

P, C, S = 2, 8192, 764
Hp, R = 57344, 160
T = Hp + S * R            # 179584
K = 2


def sync(x):
    return np.asarray(jnp.asarray(x).reshape(-1)[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=str, nargs="+",
                    default=["tables", "slotcol", "slotcol32", "skip"])
    args = ap.parse_args()

    from pacmann_tpu.ops import aes as aes_ops

    rng = np.random.default_rng(0)

    for ph in args.phase:
        t0 = time.time()
        try:
            if ph == "tables":
                from pacmann_tpu.ops.aes_pallas import prf_tables_pallas
                masks = jnp.asarray(np.stack(
                    [aes_ops.expand_key_planes(rng.bytes(16))
                     for _ in range(P)]))
                tab = prf_tables_pallas(masks, T, S, C - 1)
                sync(tab)
            elif ph in ("slotcol", "slotcol32"):
                tab = jnp.asarray(rng.integers(
                    0, C, size=(P, T, S), dtype=np.uint32))

                @jax.jit
                def sc16(t):
                    t16 = t.astype(jnp.uint16)
                    return t16, jnp.swapaxes(t16[:, :Hp, :], 1, 2)

                @jax.jit
                def sc32(t):
                    sc = jnp.swapaxes(t[:, :Hp, :], 1, 2)
                    return t.astype(jnp.uint16), sc.astype(jnp.uint16)

                f = sc16 if ph == "slotcol" else sc32
                a, b = f(tab)
                sync(a); sync(b)
            elif ph == "skip":
                from pacmann_tpu.pir.device_engine import _build_skip
                sk = _build_skip(P, T, Hp, R, S)
                sync(sk)
            elif ph == "scan":
                from pacmann_tpu.ops.xor_scan import xor_hintgen_mm
                db4 = jax.random.bits(
                    jax.random.PRNGKey(1), (S, P, C * K, 128), jnp.uint32)
                tab = jnp.asarray(rng.integers(
                    0, C, size=(P, T, S), dtype=np.uint32))
                skip = jnp.zeros((P, T, S), bool)
                out = xor_hintgen_mm(db4, tab, skip, K)
                sync(out)
            print(f"{ph}: OK in {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{ph}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
