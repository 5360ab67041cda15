"""Diagnose the 1M-continuum recall deficit at probe scale (n=262144).

Round-3 question: plaintext recall@10 on the continuum workload is 0.978
at 65k but 0.719 at 1M (canonical step=20/parallel=3). Is the limiter
(a) local graph completeness (NN-descent under-converged on the dense
manifold), or (b) the beam budget? This probe builds one graph per
descent-round setting and sweeps beam configs + recall@1 vs recall@10.

Usage: python scripts/probe_continuum_recall.py [--n 262144] [--rounds 5 8]
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
    ap.add_argument("--rounds", type=int, nargs="+", default=[5, 8])
    ap.add_argument("--keep", type=int, nargs="+", default=[0])
    ap.add_argument("--corridor", type=str, nargs="+", default=["16:2"],
                    help="corridor beam budgets as max_step:parallel")
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--latent", type=int, default=16)
    ap.add_argument("--beams", type=str, nargs="+",
                    default=["20:3", "20:6", "32:3"],
                    help="query beam budgets as step:parallel")
    args = ap.parse_args()

    n, d, m = args.n, 128, 32
    rng = np.random.default_rng(0)
    t0 = time.time()
    vectors = synth_continuum(n, d, rng, latent=args.latent)
    print(f"vectors: {time.time()-t0:.1f}s", flush=True)

    from pacmann_tpu.graph.build import build_graph
    from pacmann_tpu.graph.recall import brute_force_knn, compute_recall
    from pacmann_tpu.graph.beam import PlaintextEngine

    Q = args.queries
    queries = vectors[rng.choice(n, Q, replace=False)] \
        + 0.1 * rng.standard_normal((Q, d)).astype(np.float32)
    t0 = time.time()
    gnd = brute_force_knn(vectors, queries, 10)
    print(f"gnd: {time.time()-t0:.1f}s", flush=True)

    for rounds in args.rounds:
      for keep in args.keep:
       for corr in args.corridor:
        f = [int(x) for x in corr.split(":")]
        cs, cp, cn = f[0], f[1], (f[2] if len(f) > 2 else 1)
        t0 = time.time()
        graph = np.asarray(
            build_graph(vectors, m, rounds=rounds, seed=0, verbose=True,
                        keep_nearest=keep, corridor_step=cs,
                        corridor_par=cp, corridor_passes=cn),
            np.int64)
        print(f"== rounds={rounds} keep={keep} corridor={cs}:{cp}:{cn}: "
              f"build {time.time()-t0:.1f}s", flush=True)
        eng = PlaintextEngine(vectors, graph)
        for beam in args.beams:
            step, par = (int(x) for x in beam.split(":"))
            ids, _ = eng.search(queries, 10, step, par, seed=1)
            r10 = compute_recall(gnd, ids, 10)
            r1 = compute_recall(gnd[:, :1], ids[:, :1], 1)
            print(f"   step={step} par={par}: recall@10 {r10:.4f} "
                  f"recall@1 {r1:.4f}", flush=True)


if __name__ == "__main__":
    main()
