"""Fused private-search latency at SIFT1M shape (TPU): group 16 and 32.

Group 16 fits one budget window (20 steps x quota 96 = 1920 < 2758);
group 32 exercises the segmented path (segments 14+6 with one mid-group
hint refresh). Prints ms/query for both. Phase-level bisection lives in
probe_select_finish.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import synth_raw
    from pacmann_tpu.pir.device_engine import DevicePianoEngine
    from pacmann_tpu.private.fused_search import FusedPrivateSearch

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw(n, entry_bytes // 4, float_cols=dim, nbr_cols=m)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    print("db up", flush=True)
    eng.preprocessing(rng=np.random.default_rng(1))
    print(f"prep {eng.preprocessing_time:.3f}s", flush=True)

    rng = np.random.default_rng(2)
    graph = raw[:, dim:dim + m].astype(np.int64) % n
    sids = rng.choice(n, 1000, replace=False)
    svecs = np.ascontiguousarray(raw[sids, :dim]).view("<f4")
    fs = FusedPrivateSearch(eng, sids, svecs, graph[sids], dim=dim, m=m, n=n)

    for G, tag in ((16, "C fused16"), (32, "D fused32"), (64, "E fused64")):
        q = rng.random((G, dim), dtype=np.float32)
        t0 = time.perf_counter()
        fs.search(q, k=10, max_step=20, parallel=3, seed=40 + G)  # compile
        print(f"{tag} compile+run: {time.perf_counter()-t0:.1f}s "
              f"(next plan "
              f"{fs.segment_plan(20, G * 3 * m // 16, use_leftover=True)}, "
              f"fresh-window plan {fs.segment_plan(20, G * 3 * m // 16)})",
              flush=True)
        comp = []
        fs.maintenance_s = 0.0
        fs.fetch_stats[:] = 0
        used = []
        for rep in range(5):
            fs.ensure_budget(20, G, 3)
            t0 = time.perf_counter()
            fs.search(q, k=10, max_step=20, parallel=3, seed=50 + G + rep)
            comp.append(time.perf_counter() - t0 - fs.last_maintenance_s)
            used.append(eng.queries_made_in_partition)
        best = min(comp)
        print(f"{tag} compute: {best*1000:.1f} ms ({best*1000/G:.2f} "
              f"ms/query) | maint {fs.maintenance_s*1000/(5*G):.2f} ms/query"
              f" | success {fs.fetch_success_rate():.4f} "
              f"(want/kept/served {fs.fetch_stats.tolist()})"
              f" | used/window {used} (budget "
              f"{eng.params.max_query_num})", flush=True)


if __name__ == "__main__":
    main()
