"""Time the three PRF-table generators at SIFT1M shape on TPU and check
bit-equality:

  A. lax.map over the XLA circuit (the shipped _prep_fused path)
  B. _prf_tables_fused (all partitions in one XLA circuit)
  C. prf_tables_pallas (one Pallas kernel, VMEM-resident rounds)

The table phase is ~0.13 s of the 0.23 s hint refresh (RESULTS.md); the
refresh time is the maintenance floor, so a faster table phase lowers
amortized per-query maintenance directly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from pacmann_tpu.ops import aes
    from pacmann_tpu.ops.aes import _prf_tables_fused
    from pacmann_tpu.ops.aes_pallas import prf_tables_pallas
    from pacmann_tpu.pir.params import derive_batch_params, derive_piano_params

    n, entry_bytes, batch = 1_000_000, 640, 32
    cfg = derive_batch_params(n, entry_bytes, batch, 8)
    p = derive_piano_params(cfg.partition_size, entry_bytes, 8)
    P = cfg.partition_num
    T = p.primary_hint_num + p.set_size * p.max_query_per_chunk
    S, cm = p.set_size, p.chunk_mask
    print(f"P={P} T={T} S={S} evals={P*T*S/1e6:.1f}M", flush=True)

    rng = np.random.default_rng(5)
    keys = [rng.bytes(16) for _ in range(P)]
    masks = jnp.asarray(np.stack([aes.expand_key_planes(k) for k in keys]))

    def timed(tag, fn):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out[-1, -1, -1])     # forced D2H sync
        t_cold = time.perf_counter() - t0
        best = np.inf
        for _i in range(3):
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(out[-1, -1, -1])
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: warm {best*1000:.1f} ms (cold {t_cold:.1f} s, "
              f"{P*T*S/best/1e6:.0f} M evals/s)", flush=True)
        return np.asarray(out)

    map_fn = jax.jit(lambda m: jax.lax.map(
        lambda mk: aes._prf_table_on_device(mk, T, S, cm), m))
    a = timed("A lax.map xla", lambda: map_fn(masks))
    b = timed("B fused-P xla", lambda: _prf_tables_fused(masks, T, S, cm))
    print("A == B:", np.array_equal(a, b), flush=True)
    c = timed("C pallas", lambda: prf_tables_pallas(masks, T, S, cm))
    print("A == C:", np.array_equal(a, c), flush=True)

    # table-free online PRF at the per-step shape (2 sheets of (Q, S) per
    # partition): xla circuit vs the pallas kernel
    from pacmann_tpu.ops import aes as aes_ops
    from pacmann_tpu.ops.aes_pallas import prf_eval_fused_pallas

    Q = 96
    L0 = 2 * Q * S
    tags = jnp.asarray(rng.integers(0, T, size=(P, L0), dtype=np.uint32))
    xsv = jnp.asarray(rng.integers(0, S, size=(P, L0), dtype=np.uint32))

    def timed2(tag, fn):
        out = fn()
        _ = np.asarray(out[-1, -1])
        best = np.inf
        for _i in range(5):
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(out[-1, -1])
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: warm {best*1000:.2f} ms", flush=True)
        return np.asarray(out)

    d = timed2("D step-PRF xla", lambda: aes_ops.prf_eval_fused(
        masks, tags, xsv, cm))
    e = timed2("E step-PRF pallas", lambda: prf_eval_fused_pallas(
        masks, tags, xsv, cm))
    print("D == E:", np.array_equal(d, e), flush=True)


if __name__ == "__main__":
    main()
