"""Probe: does xor_hintgen_mm compile on the real TPU, and how fast is it
at the SIFT1M partition shape?  Writes raw output (no pipes — see CLAUDE.md).

Usage: python scripts/probe_hintgen_mm.py [--small-only]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from pacmann_tpu.ops.xor_scan import xor_hintgen_mm, xor_scan_parts


def sync_read(x):
    """Force a real D2H sync (block_until_ready returns early on axon)."""
    return np.asarray(x.reshape(-1)[-1])


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    # -- correctness at a small shape (compiled, not interpreted) ----------
    rng = np.random.default_rng(0)
    S, P, C, k = 8, 2, 128, 2
    T = 300
    db4 = rng.integers(0, 2**32, size=(S, P, C * k, 128), dtype=np.uint64
                       ).astype(np.uint32)
    table = rng.integers(0, C, size=(P, T, S), dtype=np.uint64
                         ).astype(np.uint32)
    skip = rng.random((P, T, S)) < 0.1

    want = np.asarray(xor_scan_parts(db4, table, skip, k)).reshape(
        P, T, k * 128)
    for dot in ("bf16", "s8"):
        t0 = time.perf_counter()
        got = xor_hintgen_mm(jnp.asarray(db4), jnp.asarray(table),
                             jnp.asarray(skip), k, interpret=False, dot=dot)
        got = np.asarray(got)
        print(f"small {dot} compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        assert got.shape == want.shape, (got.shape, want.shape)
        ok = np.array_equal(got, want)
        print(f"small {dot} correctness:", "PASS" if ok else "FAIL",
              flush=True)
        if not ok:
            bad = np.argwhere(got != want)
            print("first mismatches:", bad[:5], flush=True)
            print("got:", got[tuple(bad[0])], "want:", want[tuple(bad[0])])
            sys.exit(1)
    if "--small-only" in sys.argv:
        return

    # -- SIFT1M shape timing ------------------------------------------------
    # n=1e6, 16 partitions, 640B entries -> k=2, C=512, S=123, T~=11892
    S, P, C, k = 123, 16, 512, 2
    T = 11892
    key = jax.random.PRNGKey(0)
    db4 = jax.random.randint(key, (S, P, C * k, 128), 0, 1 << 30,
                             dtype=jnp.int32).astype(jnp.uint32)
    table = jax.random.randint(jax.random.PRNGKey(1), (P, T, S), 0, C,
                               dtype=jnp.int32).astype(jnp.uint32)
    skip = jnp.zeros((P, T, S), bool)
    sync_read(db4)
    print("db ready:", db4.shape, db4.nbytes / 1e9, "GB", flush=True)

    outs = {}
    for dot in ("bf16", "s8"):
        t0 = time.perf_counter()
        out = xor_hintgen_mm(db4, table, skip, k, interpret=False, dot=dot)
        sync_read(out)
        print(f"mm[{dot}] compile+first run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = xor_hintgen_mm(db4, table, skip, k, interpret=False,
                                 dot=dot)
            sync_read(out)
            times.append(time.perf_counter() - t0)
        print(f"mm[{dot}] kernel times: {[f'{t:.3f}' for t in times]}",
              flush=True)
        outs[dot] = out
    same = np.array_equal(np.asarray(outs["bf16"]), np.asarray(outs["s8"]))
    print("bf16 vs s8 agreement:", "PASS" if same else "FAIL", flush=True)
    out = outs["s8"]

    t0 = time.perf_counter()
    out2 = xor_scan_parts(db4, table, skip, k)
    sync_read(out2)
    print(f"xla compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out2 = xor_scan_parts(db4, table, skip, k)
        sync_read(out2)
        times.append(time.perf_counter() - t0)
    print(f"xla scan times: {[f'{t:.3f}' for t in times]}", flush=True)

    same = np.array_equal(np.asarray(out),
                          np.asarray(out2).reshape(P, T, k * 128))
    print("large agreement:", "PASS" if same else "FAIL", flush=True)


if __name__ == "__main__":
    main()
