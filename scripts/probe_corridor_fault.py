"""Isolate the 1M corridor-phase TPU fault (search_paths_all at
corridor 24:3 reproducibly dies with UNAVAILABLE at n=1M while the same
budget runs clean at 262k). Random graph + device-synth vectors: no build.

Usage: python scripts/probe_corridor_fault.py [--n 1000000] [--block 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--configs", type=str, nargs="+",
                    default=["16:2", "24:2", "20:3", "24:3"])
    args = ap.parse_args()
    n, d, m = args.n, 128, 32

    from pacmann_tpu.graph.beam import search_paths_all

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    blk = 2048
    npad = -(-n // blk) * blk
    vectors = jax.random.normal(k1, (npad, d), jnp.float32)
    graph = jax.random.randint(k2, (npad, m), 0, n, jnp.int32)
    starts = jnp.asarray(
        np.random.default_rng(0).choice(n, int(np.sqrt(n)), replace=False),
        jnp.int32)
    vectors.block_until_ready()
    print("inputs ready", flush=True)

    for cfg in args.configs:
        ms, par = (int(x) for x in cfg.split(":"))
        t0 = time.time()
        try:
            paths = search_paths_all(
                vectors, graph, starts, k3, n=n, m=m, max_step=ms,
                parallel=par, block=args.block)
            s = int(np.asarray(jnp.sum(paths >= 0)))
            print(f"{cfg} block={args.block}: OK in {time.time()-t0:.1f}s "
                  f"(nonneg {s})", flush=True)
        except Exception as e:
            print(f"{cfg} block={args.block}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
