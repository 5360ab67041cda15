"""Time the one-hot-matmul server-scan variants at SIFT1M shapes (TPU).

The online MM scan measures 2.07 ms/step against a ~1.25 ms HBM-stream
bound (RESULTS.md roofline). Suspects: the per-grid-step byte-plane
extraction chain (~16 wide VPU ops) and fixed per-step grid/DMA overhead
at ~1 us steps. Variants:

  A. shipped s8 kernel (extract planes in-kernel)            [baseline]
  B. plane-major s8 DB, sc=1 (no extraction)
  C. plane-major s8 DB, sc=2 and sc=4 (fewer, bigger steps)

at both the ONLINE shape (T = 96 sub-queries) and the HINT-GEN shape
(T = 12512), plus bit-equality. A win here cuts every fused-search step
(the scan term is fixed in group size) and the refresh floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import synth_raw_auto
    from pacmann_tpu.pir.device_engine import DevicePianoEngine
    from pacmann_tpu.ops.attic import to_plane_major_s8, xor_hintgen_mm_s8p
    from pacmann_tpu.ops.xor_scan import xor_hintgen_mm

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw_auto(n, entry_bytes // 4, float_cols=dim)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    print("db up", flush=True)
    p, c = eng.params, eng.config
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    Tfull = p.primary_hint_num + S * p.max_query_per_chunk
    k = eng.k

    t0 = time.perf_counter()
    dbp = to_plane_major_s8(eng.db, k)
    np.asarray(dbp[-1, -1, -1, -1, -1])
    print(f"plane-major conversion: {time.perf_counter()-t0:.2f} s "
          f"({dbp.nbytes/2**30:.2f} GiB extra)", flush=True)

    rng = np.random.default_rng(6)

    def bench_shape(T, tag):
        table = jnp.asarray(
            rng.integers(0, C, size=(P, T, S), dtype=np.uint32))
        skip = jnp.asarray(np.zeros((P, T, S), bool))

        def timed(name, fn, check=None):
            out = fn()
            _ = np.asarray(out[-1, -1, -1])
            best = np.inf
            for _i in range(5):
                t0 = time.perf_counter()
                out = fn()
                _ = np.asarray(out[-1, -1, -1])
                best = min(best, time.perf_counter() - t0)
            eq = ""
            if check is not None:
                eq = f"  eq={np.array_equal(np.asarray(out), check)}"
            print(f"  {name}: {best*1000:.2f} ms{eq}", flush=True)
            return np.asarray(out)

        print(f"[{tag}] T={T}", flush=True)
        a = timed("A s8 in-kernel extract",
                  lambda: xor_hintgen_mm(eng.db, table, skip, k))
        timed("B s8p sc=1",
              lambda: xor_hintgen_mm_s8p(dbp, table, skip, k, sc=1), a)
        timed("C s8p sc=2",
              lambda: xor_hintgen_mm_s8p(dbp, table, skip, k, sc=2), a)
        timed("D s8p sc=4",
              lambda: xor_hintgen_mm_s8p(dbp, table, skip, k, sc=4), a)

    bench_shape(96, "online")
    bench_shape(Tfull, "hintgen")


if __name__ == "__main__":
    main()
