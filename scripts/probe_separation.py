"""Separation-workload tuning sweep (VERDICT r2 task 3).

Goal: a synthetic regime where the nearest-centroid (Tiptoe) baseline
collapses (< 0.6) while canonical-beam graph search holds (>= 0.93) — the
split real SIFT exhibits (0.94 vs 0.391). Pure continuum data collapses
the cluster baseline to ~0.34 but also drags canonical-beam graph recall
to ~0.79 at 1M (denser NN balls = step-starved harvest). This sweep probes
the judge-suggested middle ground: clustered latent-16 with LARGER
intra-cluster spread, so clusters overlap (queries' NN sets straddle
k-means cells -> cluster baseline wrong) while local density stays
navigable.

Usage: python scripts/probe_separation.py --n 65536 --spread 0.6 0.9 1.3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.e2e_scale import synth_vectors  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--spread", type=float, nargs="+",
                    default=[0.6, 0.9, 1.3])
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--keep", type=int, default=16)
    ap.add_argument("--queries", type=int, default=200)
    args = ap.parse_args()

    n, d, m, Q = args.n, 128, 32, args.queries

    from pacmann_tpu.graph.build import build_graph, choose_start_ids
    from pacmann_tpu.graph.recall import brute_force_knn, compute_recall
    from pacmann_tpu.graph.beam import PlaintextEngine
    from pacmann_tpu.graph.cluster import ClusterSearcher

    for spread in args.spread:
        rng = np.random.default_rng(0)
        vectors = synth_vectors(n, d, True, rng, latent=16, spread=spread)
        queries = vectors[rng.choice(n, Q, replace=False)] \
            + 0.1 * rng.standard_normal((Q, d)).astype(np.float32)
        gnd = brute_force_knn(vectors, queries, 10)

        t0 = time.time()
        graph = np.asarray(
            build_graph(vectors, m, rounds=args.rounds, seed=0,
                        keep_nearest=args.keep, verbose=False,
                        quality_gate=False), np.int64)
        build_s = time.time() - t0
        sids = choose_start_ids(vectors, int(np.sqrt(n)), seed=0)
        eng = PlaintextEngine(vectors, graph, start_ids=sids)
        ids, _ = eng.search(queries, 10, 20, 3, seed=1)
        r_graph = compute_recall(gnd, ids, 10)

        cs = ClusterSearcher(vectors, n_clusters=int(np.sqrt(n)),
                             n_iter=10, seed=0)
        ids_c = cs.search(queries, 10)
        r_cluster = compute_recall(gnd, ids_c, 10)
        print(f"spread={spread}: graph {r_graph:.4f} vs cluster "
              f"{r_cluster:.4f}  (build {build_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
