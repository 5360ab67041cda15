"""Minimize the 4M wide-round TPU worker crash (round-5 4M build fault).

At n=4M the build's WIDE candidate round (`_nn_round_device` with
wide=True, out_m=64 → candidate width m + m^2 + n_random = 1072 per
vertex) crashes the TPU worker (UNAVAILABLE, kernel fault) at the
default block 2048, while the narrow descent rounds (width ~130) run
fine at the same n — attributed by the synced verbose prints
(e2e_4m_probe, 2026-08-19). Same libtpu fault class as the corridor
visited-table crash (probe_corridor_fault.py), whose remedy was scaling
the per-program block down.

This probe calls the wide round DIRECTLY over a random graph (the fault
cannot depend on graph content — descent-converged vs random changes
values, not shapes) so one attempt costs ~2 min instead of a build's
~15: device-synth vectors, randint graph, one wide round at the given
block, forced D2H read. Subprocess per attempt, block ladder descending
until it passes.

Usage: python scripts/probe_wide_fault.py [--n 4000000] [--blocks 2048,1024,512]
       python scripts/probe_wide_fault.py --one 1024 [--n ...]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(n: int, block: int, m: int, route: str = "single") -> dict:
    import jax
    import jax.numpy as jnp

    from pacmann_tpu.graph.build import _nn_round_device
    from scripts.e2e_scale import synth_continuum_device

    blk = min(block, n)
    npad = -(-n // blk) * blk
    rec = {"n": n, "block": blk, "m": m, "npad": npad}
    print(f"shape: {rec}", flush=True)

    t0 = time.perf_counter()
    vectors = synth_continuum_device(npad, 128, seed=0, latent=12)
    sqn = jnp.sum(vectors * vectors, axis=1)
    key = jax.random.PRNGKey(1)
    graph = jax.random.randint(key, (npad, m), 0, n, jnp.int32)
    np.asarray(graph[-1, -1])
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    n_far = max(8, m // 2)
    cand_local = int(1.5 * m) + m - n_far        # build_graph's pool width
    t0 = time.perf_counter()
    try:
        if route == "sliced":
            from pacmann_tpu.graph.build import _wide_round_sliced
            wide_ids, wide_d = _wide_round_sliced(
                vectors, sqn, graph, jax.random.PRNGKey(2), n_random=16,
                block=blk, n_real=n, out_m=cand_local, parts=8,
                verbose=True)
        else:
            wide_ids, wide_d = _nn_round_device(
                vectors, sqn, graph, jax.random.PRNGKey(2), nsn=2,
                n_random=16, block=blk, n_real=n, out_m=cand_local,
                wide=True)
        _ = np.asarray(wide_d[-1, -1])
        rec["wide"] = "ok"
        print(f"wide: ok ({time.perf_counter()-t0:.1f}s incl compile)",
              flush=True)
    except Exception as e:
        rec["wide"] = f"FAULT {type(e).__name__}: {str(e)[:200]}"
        print(f"wide: FAULT after {time.perf_counter()-t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--blocks", default="2048,1024,512")
    ap.add_argument("--one", type=int, default=0)
    ap.add_argument("--route", default="single", choices=["single", "sliced"])
    args = ap.parse_args()

    if args.one:
        rec = run_one(args.n, args.one, args.m, args.route)
        print("RESULT " + json.dumps(rec), flush=True)
        sys.exit(0 if rec.get("wide") == "ok" else 2)

    results = []
    for blk in [int(b) for b in args.blocks.split(",")]:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", str(blk),
               "--n", str(args.n), "--m", str(args.m), "--route", args.route]
        print(f"=== block={blk}", flush=True)
        try:
            cp = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=900)
        except subprocess.TimeoutExpired as e:
            results.append({"block": blk, "wide": "TIMEOUT",
                            "tail": (e.stdout or "")[-300:]})
            print(f"block={blk}: TIMEOUT", flush=True)
            continue
        line = next((ln for ln in cp.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        results.append(json.loads(line[len("RESULT "):]) if line else
                       {"block": blk, "wide": f"DIED rc={cp.returncode}",
                        "tail": (cp.stdout + cp.stderr)[-300:]})
        print(cp.stdout[-400:], flush=True)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
