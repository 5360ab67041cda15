"""Where do group-16 fused-search milliseconds go? (SIFT1M shape, TPU)

Times three nested slices, 20 reps each (one per beam step equivalent):
  A. server scan alone (xor_gather_multi at Q=96)
  B. full PIR batch (_online_step: select + scan + finish) at Q=96
  C. the fused 20-step beam+PIR search (group 16)
C - 20*B ~ beam-side cost; B - A ~ client protocol cost per step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import synth_raw
    from pacmann_tpu.ops.xor_scan import xor_gather_multi
    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw(n, entry_bytes // 4, float_cols=dim)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    print("db up", flush=True)
    eng.preprocessing(rng=np.random.default_rng(1))
    print(f"prep {eng.preprocessing_time:.3f}s", flush=True)

    p, c = eng.params, eng.config
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    Q = 96
    rng = np.random.default_rng(2)

    # A: server scan alone
    offs = jnp.asarray((rng.integers(0, 2**31, size=(Q, P, S), dtype=np.int64)
                        % C).astype(np.uint32))
    r = xor_gather_multi(eng.db, offs, eng.k)  # compile
    np.asarray(r[-1, -1, -1])
    t0 = time.perf_counter()
    acc = None
    for i in range(20):
        r = xor_gather_multi(eng.db, offs, eng.k)
        acc = r if acc is None else acc ^ r
    np.asarray(acc[-1, -1, -1])
    tA = (time.perf_counter() - t0) / 20
    print(f"A server scan Q=96: {tA*1000:.2f} ms/call", flush=True)

    # B: full PIR batch at the group-16 fused quota (96 rounds/partition)
    quota = Q
    idx = rng.integers(0, c.partition_size, size=(quota, P)).astype(np.int32)
    rnd = (rng.integers(0, 2**31, size=(quota, P, S), dtype=np.int64)
           % C).astype(np.uint32)
    st, e, ok = eng._online(jnp.asarray(idx), jnp.asarray(rnd))  # compile
    eng.state = st   # the call donates the state buffers; must reassign
    t0 = time.perf_counter()
    for i in range(20):
        st, e, ok = eng._online(jnp.asarray(idx), jnp.asarray(rnd))
        eng.state = st
    np.asarray(e[-1, -1, -1])
    tB = (time.perf_counter() - t0) / 20
    print(f"B pir batch Q={quota}x{P}: {tB*1000:.2f} ms/call", flush=True)

    # C: fused group-16 search
    from pacmann_tpu.private.fused_search import FusedPrivateSearch

    graph = raw[:, dim:dim + m].astype(np.int64) % n
    sids = rng.choice(n, 1000, replace=False)
    svecs = np.ascontiguousarray(raw[sids, :dim]).view("<f4")
    fs = FusedPrivateSearch(eng, sids, svecs, graph[sids], dim=dim, m=m, n=n)
    q16 = rng.random((16, dim), dtype=np.float32)
    fs.search(q16, k=10, max_step=20, parallel=3, seed=5)  # compile
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        fs.search(q16, k=10, max_step=20, parallel=3, seed=6 + rep)
        ts.append(time.perf_counter() - t0)
    tC = min(ts)
    print(f"C fused16 total: {tC*1000:.1f} ms "
          f"({tC*1000/16:.2f} ms/query); per step {tC*1000/20:.2f} ms",
          flush=True)
    print(f"per-step split: scan {tA*1000:.2f} + client "
          f"{max(tB - tA, 0)*1000:.2f} + beam "
          f"{max(tC/20 - tB, 0)*1000:.2f} ms", flush=True)
    group32(fs, rng, dim)


def group32(fs, rng, dim):
    import time as _t
    q32 = rng.random((32, dim), dtype=np.float32)
    fs.search(q32, k=10, max_step=20, parallel=3, seed=40)  # compile
    ts = []
    for rep in range(3):
        t0 = _t.perf_counter()
        fs.search(q32, k=10, max_step=20, parallel=3, seed=41 + rep)
        ts.append(_t.perf_counter() - t0)
    print(f"D fused32 total: {min(ts)*1000:.1f} ms "
          f"({min(ts)*1000/32:.2f} ms/query)", flush=True)


if __name__ == "__main__":
    main()
