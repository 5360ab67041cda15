"""1M continuum: build (rounds/keep tuned, AOT compiles) + start-selection
diagnostic — random sqrt(n) starts vs centroid starts, recall@1 vs @10.

The 262k probe showed recall@1=1.0 / recall@10=0.905-0.946 (local harvest
is the limiter there); the old 1M run scored 0.719 — this separates how
much of the 1M deficit is descent depth (start coverage) vs local edges.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.e2e_scale import synth_continuum  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--keep", type=int, default=16)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    n, d, m = args.n, 128, 32
    rng = np.random.default_rng(0)
    t0 = time.time()
    vectors = synth_continuum(n, d, rng, latent=16)
    print(f"vectors: {time.time()-t0:.1f}s", flush=True)

    from pacmann_tpu.graph.build import build_graph, choose_start_ids
    from pacmann_tpu.graph.recall import brute_force_knn, compute_recall
    from pacmann_tpu.graph.beam import PlaintextEngine

    gpath = f"/tmp/graph_{n}_continuum_l16_r{args.rounds}k{args.keep}.npy"
    if os.path.exists(gpath) and not args.rebuild:
        graph = np.load(gpath).astype(np.int64)
        print("graph loaded", flush=True)
    else:
        t0 = time.time()
        graph = np.asarray(
            build_graph(vectors, m, rounds=args.rounds, seed=0, verbose=True,
                        keep_nearest=args.keep), np.int64)
        print(f"graph built: {time.time()-t0:.1f}s", flush=True)
        np.save(gpath, graph.astype(np.int32))

    Q = args.queries
    queries = vectors[rng.choice(n, Q, replace=False)] \
        + 0.1 * rng.standard_normal((Q, d)).astype(np.float32)
    t0 = time.time()
    gnd = brute_force_knn(vectors, queries, 10)
    print(f"gnd: {time.time()-t0:.1f}s", flush=True)

    ns = int(np.sqrt(n))
    t0 = time.time()
    cids = choose_start_ids(vectors, ns, seed=0)
    print(f"centroid starts: {time.time()-t0:.1f}s "
          f"({len(np.unique(cids))} distinct)", flush=True)
    rids = rng.choice(n, ns, replace=False)

    for name, sids in [("random", rids), ("centroid", cids)]:
        eng = PlaintextEngine(vectors, graph, start_ids=sids)
        for step, par in [(20, 3)] + ([(20, 6)] if name == "centroid"
                                      else []):
            ids, steps = eng.search(queries, 10, step, par, seed=1)
            r10 = compute_recall(gnd, ids, 10)
            r1 = compute_recall(gnd[:, :1], ids[:, :1], 1)
            ms = float(np.mean(np.where(steps >= 0, steps, 0).max(axis=1)))
            print(f"{name} starts step={step} par={par}: recall@10 {r10:.4f}"
                  f" recall@1 {r1:.4f} mean-last-improve-step {ms:.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
