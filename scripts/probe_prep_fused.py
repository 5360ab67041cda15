"""Fused-prep timing at SIFT1M shape on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax

def main():
    from bench import synth_raw
    from pacmann_tpu.pir.device_engine import DevicePianoEngine
    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw(n, entry_bytes // 4, float_cols=dim)
    t0 = time.perf_counter()
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    print(f"db pack+upload: {time.perf_counter()-t0:.2f}s", flush=True)
    for rep in range(4):
        t0 = time.perf_counter()
        eng.preprocessing(rng=np.random.default_rng(5 + rep))
        print(f"preprocessing: {time.perf_counter()-t0:.3f}s", flush=True)
    # sanity: a spread batch decodes exactly
    rng = np.random.default_rng(3)
    ids = [int(i) for i in rng.integers(0, n, 96)]
    out = eng.query(ids)
    ok = sum(int(np.array_equal(out[r], raw[idx])) for r, idx in enumerate(ids))
    print(f"query ok {ok}/96", flush=True)

main()
