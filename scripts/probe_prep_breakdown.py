"""Per-phase timing of DevicePianoEngine.preprocessing at SIFT1M shape.

Replicates the preprocessing body with a forced D2H sync between phases so
each phase's true device time is visible (block_until_ready returns early
on axon — see CLAUDE.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(jnp.ravel(x)[-1])


def main():
    from bench import synth_raw
    from pacmann_tpu.pir.device_engine import (
        DevicePianoEngine, _build_skip, _gather_repl)
    from pacmann_tpu.ops import aes
    from pacmann_tpu.ops.xor_scan import xor_hintgen_mm

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw(n, entry_bytes // 4, float_cols=dim)
    t0 = time.perf_counter()
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    sync(eng.db)
    print(f"db pack+upload: {time.perf_counter()-t0:.2f}s", flush=True)

    p, c = eng.params, eng.config
    P = c.partition_num
    S, R, Hp, C = p.set_size, p.max_query_per_chunk, p.primary_hint_num, p.chunk_size
    T = Hp + S * R
    print(f"P={P} S={S} C={C} Hp={Hp} R={R} T={T}", flush=True)
    rng = np.random.default_rng(1)

    for rep in range(3):
        t0 = time.perf_counter()
        tables = [
            aes.prf_offset_table_device(rng.bytes(16), T, S, p.chunk_mask)
            for _ in range(P)
        ]
        table = jnp.stack(tables)
        sync(table)
        t_prf = time.perf_counter() - t0

        t0 = time.perf_counter()
        skip = _build_skip(P, T, Hp, R, S).reshape(P, T, S)
        parities = xor_hintgen_mm(eng.db, table, skip, eng.k)
        sync(parities)
        t_scan = time.perf_counter() - t0

        t0 = time.perf_counter()
        repl_off = (rng.integers(0, 2**32, size=(P, S, R), dtype=np.uint64)
                    & np.uint64(p.chunk_mask)).astype(np.uint32)
        repl_val = _gather_repl(eng.db, jnp.asarray(repl_off), k=eng.k,
                                Ep=eng.Ep)
        sync(repl_val)
        t_repl = time.perf_counter() - t0

        t0 = time.perf_counter()
        slot_col = jnp.swapaxes(table[:, :Hp, :], 1, 2).copy()
        sync(slot_col)
        t_slot = time.perf_counter() - t0

        tot = t_prf + t_scan + t_repl + t_slot
        print(f"rep{rep}: prf={t_prf:.3f} scan={t_scan:.3f} "
              f"repl={t_repl:.3f} slotcol={t_slot:.3f} total={tot:.3f}",
              flush=True)

    # and the engine's own preprocessing for the composite number
    for rep in range(2):
        t0 = time.perf_counter()
        eng.preprocessing(rng=np.random.default_rng(5 + rep))
        print(f"engine.preprocessing: {time.perf_counter()-t0:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
