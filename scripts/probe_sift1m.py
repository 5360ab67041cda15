"""Manual probe: SIFT1M-scale device-engine prep + online on the live chip."""

import time

import numpy as np
import jax

from pacmann_tpu.pir.device_engine import DevicePianoEngine


def main():
    n, eb, batch = 1_000_000, 640, 32
    rng = np.random.default_rng(0)
    t0 = time.time()
    raw = rng.integers(0, 2**32, size=(n, 160), dtype=np.uint32)
    print("gen raw", round(time.time() - t0, 1), flush=True)
    t0 = time.time()
    pir = DevicePianoEngine(n, eb, batch, raw, 8)
    jax.block_until_ready(pir.db)
    print("ctor+H2D", round(time.time() - t0, 1), flush=True)
    p = pir.params
    print("params: chunk", p.chunk_size, "set", p.set_size,
          "Hp", p.primary_hint_num, "R", p.max_query_per_chunk,
          "maxq", p.max_query_num, flush=True)
    for i in range(3):
        t0 = time.time()
        pir.preprocessing(rng=np.random.default_rng(i))
        print(f"prep{i} {time.time()-t0:.2f}s", flush=True)
    ids = [int(rng.integers(0, n)) for _ in range(96)]
    t0 = time.time()
    pir.query(ids)
    print("batch96 first (compile)", round(time.time() - t0, 2), flush=True)
    ok = 0
    t0 = time.time()
    iters = 20
    for _ in range(iters):
        ids = [int(rng.integers(0, n)) for _ in range(96)]
        out = pir.query(ids)
        for r, idx in enumerate(ids):
            ok += int(np.array_equal(out[r], raw[idx]))
    print(f"online96: {(time.time()-t0)/iters*1000:.1f} ms/batch, "
          f"success {ok}/{iters*96}", flush=True)


if __name__ == "__main__":
    main()
