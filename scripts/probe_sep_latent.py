"""Continuum latent-dim sweep for the separation workload: graph recall
rises as intrinsic dimension falls (denser mutual-NN structure, easier
harvest) while the nearest-centroid baseline stays collapsed (NN sets
straddle Voronoi cells regardless). Finds the latent where canonical-beam
graph recall >= 0.93 at scale with cluster << 0.6.

Usage: python scripts/probe_sep_latent.py --n 262144 --latent 8 12 16
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
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--latent", type=int, nargs="+", default=[8, 12, 16])
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--keep", type=int, default=16)
    ap.add_argument("--queries", type=int, default=200)
    args = ap.parse_args()

    n, d, m, Q = args.n, 128, 32, args.queries

    from pacmann_tpu.graph.build import build_graph, choose_start_ids
    from pacmann_tpu.graph.recall import brute_force_knn, compute_recall
    from pacmann_tpu.graph.beam import PlaintextEngine
    from pacmann_tpu.graph.cluster import ClusterSearcher

    for latent in args.latent:
        rng = np.random.default_rng(0)
        vectors = synth_continuum(n, d, rng, latent=latent)
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
        r1 = compute_recall(gnd[:, :1], ids[:, :1], 1)

        cs = ClusterSearcher(vectors, n_clusters=int(np.sqrt(n)),
                             n_iter=10, seed=0)
        ids_c = cs.search(queries, 10)
        r_cluster = compute_recall(gnd, ids_c, 10)
        print(f"latent={latent}: graph {r_graph:.4f} (r@1 {r1:.3f}) vs "
              f"cluster {r_cluster:.4f}  (build {build_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
