"""Manual probe: full private-search quality at n=65536 with a real graph.

Builds (or loads from /tmp/graph_65k.npy) the Vamana-style graph, then runs
the plaintext engine and the fused private search against brute-force ground
truth. The scale-up counterpart of tests/test_fused_search.py.
"""

import os
import time

import numpy as np


def main():
    import sys
    clustered = "--clustered" in sys.argv
    n, d, m = 65536, 128, 32
    rng = np.random.default_rng(0)
    if clustered:
        # SIFT-like structure: mixture of Gaussians
        n_c = 1024
        centers = rng.standard_normal((n_c, d)).astype(np.float32)
        lab = rng.integers(0, n_c, n)
        vectors = (centers[lab]
                   + 0.35 * rng.standard_normal((n, d)).astype(np.float32))
        gpath = "/tmp/graph_65k_clustered.npy"
    else:
        vectors = rng.random((n, d), dtype=np.float32)
        gpath = "/tmp/graph_65k.npy"
    from pacmann_tpu.graph.build import build_graph

    if os.path.exists(gpath):
        graph = np.load(gpath).astype(np.int64)
        print("graph loaded", flush=True)
    else:
        t0 = time.time()
        graph = np.asarray(build_graph(vectors, m, rounds=5, seed=0,
                                       verbose=True), np.int64)
        print("graph built", round(time.time() - t0, 1), flush=True)
        np.save(gpath, graph.astype(np.int32))

    from pacmann_tpu.graph.recall import brute_force_knn, compute_recall

    if clustered:
        queries = vectors[rng.choice(n, 64, replace=False)] \
            + 0.1 * rng.standard_normal((64, d)).astype(np.float32)
    else:
        queries = rng.random((64, d), dtype=np.float32)
    t0 = time.time()
    gnd = brute_force_knn(vectors, queries, 10)
    print("gnd", round(time.time() - t0, 1), flush=True)

    from pacmann_tpu.graph.beam import PlaintextEngine

    eng = PlaintextEngine(vectors, graph)
    ids, _ = eng.search(queries, 10, 20, 3, seed=1)
    print("plaintext recall@10:", compute_recall(gnd, ids, 10), flush=True)

    from pacmann_tpu.pir.device_engine import DevicePianoEngine
    from pacmann_tpu.private.fused_search import FusedPrivateSearch
    from pacmann_tpu.private.oracle import pack_vertex_db

    raw = pack_vertex_db(vectors, graph)
    engine = DevicePianoEngine(n, 4 * (d + m), m, raw, 8)
    t0 = time.time()
    engine.preprocessing(rng=np.random.default_rng(1))
    print("prep", round(time.time() - t0, 1), flush=True)
    sids = rng.choice(n, int(np.sqrt(n)), replace=False)
    fs = FusedPrivateSearch(engine, sids, vectors[sids], graph[sids],
                            dim=d, m=m, n=n)
    t0 = time.time()
    fs.search(queries[:4], k=10, max_step=20, parallel=3, seed=2)
    print("fused compile", round(time.time() - t0, 1), flush=True)
    out = np.zeros((64, 10), np.int64)
    t0 = time.time()
    for i in range(0, 64, 4):
        out[i : i + 4] = fs.search(queries[i : i + 4], k=10, max_step=20,
                                   parallel=3, seed=3 + i)
    dt = time.time() - t0
    print(f"fused private: {dt/64*1000:.1f} ms/query, "
          f"recall@10: {compute_recall(gnd, out, 10)}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
