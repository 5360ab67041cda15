"""Group-1 fused private-query latency decomposition at SIFT1M shape (TPU).

VERDICT r4 item 1: the group-1 fused query measures 72 ms wall vs the
reference's 55.9 ms compute — the one shape where the build loses. This
probe separates, at the group-1 quota (Q=6, P=16):

  S1/S2/S3  select / +server-scan / +finish as 20-step lax.scan chains
            (probe_select_finish's method) on both protocol routes —
            where the fixed per-step client op chain goes at SMALL Q;
  F1        the real _fused_segment (beam + PIR, 20 steps, Qn=1):
            wall per search vs DEVICE-AMORTIZED (R back-to-back
            dispatches, one dependent D2H sync) — the tunnel RTT
            (~27 ms) is wall-only and vanishes from the amortized form.

Uses REAL preprocessing (value-dependent pass counts in the claim
fixpoint are realistic). Writes raw lines to stdout; run redirected.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import synth_raw_auto
    from pacmann_tpu.pir.device_engine import (
        DevicePianoEngine, _pir_select, _pir_batch)
    from pacmann_tpu.ops.xor_scan import xor_server_scan
    from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw_auto(n, entry_bytes // 4, float_cols=dim, nbr_cols=m)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8,
                            kernel_route=os.environ.get("PROBE_KROUTE"))
    np.asarray(eng.db[-1, -1, -1])
    print("db up", flush=True)
    eng.preprocessing(rng=np.random.default_rng(1))
    print(f"prep {eng.preprocessing_time:.2f}s", flush=True)

    p, c = eng.params, eng.config
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    R, Hp = p.max_query_per_chunk, p.primary_hint_num
    parallel = 3
    Q = 1 * parallel * m // P          # group-1 quota = 6
    NSTEP = 20
    kw = dict(C=C, R=R, Hp=Hp, S=S, k=eng.k, max_q=p.max_query_num,
              dpp=DEFAULT_PROGRAM_POINT)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(
        rng.integers(0, c.partition_size, size=(Q, P)).astype(np.int32))
    rnd = jnp.asarray((rng.integers(0, 2**31, size=(Q, P, S), dtype=np.int64)
                       % C).astype(np.uint32))
    st = eng.state
    print(f"Q={Q} P={P} S={S} C={C} Hp={Hp}", flush=True)

    def carry_of(state):
        return (state["tag"], state["prog"], state["primary_parity"],
                state["slot_col"], state["hist"], state["finished"])

    def scan_probe(step_body, tag):
        @jax.jit
        def run(state, idx, rnd, db):
            carry = carry_of(state)

            def body(carry, i):
                idx_i = (idx + i) % np.int32(c.partition_size)
                rnd_i = (rnd + jnp.uint32(i)) % np.uint32(C)
                out = step_body(state, carry, idx_i, rnd_i, db)
                return out, None

            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(NSTEP, dtype=jnp.int32))
            acc = jnp.uint32(0)
            for leaf in jax.tree.leaves(carry):
                acc ^= jnp.asarray(leaf).reshape(-1)[-1].astype(jnp.uint32) \
                    if leaf.dtype != jnp.bool_ else jnp.uint32(0)
            return acc

        r = run(st, idx, rnd, eng.db)
        np.asarray(r)          # warm compile + sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = run(st, idx, rnd, eng.db)
            np.asarray(r)
            best = min(best, (time.perf_counter() - t0) / NSTEP)
        print(f"{tag}: {best*1000:.3f} ms/step", flush=True)
        return best

    routes = tuple(os.environ.get("PROBE_ROUTES", "xla,pallas").split(","))
    for route in routes:
        kwr = dict(kw, route=route)

        def sel_only(state, carry, idx, rnd, db):
            sel, qs = _pir_select(state["table"], state["repl_idx"], carry,
                                  idx, rnd, **kwr)
            tag_, prog, ppar, slot_col, hist, fin = carry
            fin = fin + qs[0, :, 0].astype(jnp.int32) + sel[0][0]
            return (tag_, prog, ppar, slot_col, hist, fin)

        def sel_scan(state, carry, idx, rnd, db):
            sel, qs = _pir_select(state["table"], state["repl_idx"], carry,
                                  idx, rnd, **kwr)
            resp = xor_server_scan(db, qs, eng.k).reshape(Q, P, eng.k * 128)
            tag_, prog, ppar, slot_col, hist, fin = carry
            fin = fin + resp[0, :, 0].astype(jnp.int32) + sel[0][0]
            return (tag_, prog, ppar, slot_col, hist, fin)

        def full(state, carry, idx, rnd, db):
            carry, entries, oks = _pir_batch(
                db, state["table"], state["repl_idx"], state["repl_val"],
                state["backup_parity"], carry, idx, rnd, **kwr)
            return carry

        t1 = scan_probe(sel_only, f"S1 select [{route}]")
        t2 = scan_probe(sel_scan, f"S2 select+scan [{route}]")
        t3 = scan_probe(full, f"S3 full batch [{route}]")
        print(f"split [{route}]: select {t1*1000:.3f} | "
              f"scan {(t2-t1)*1000:.3f} | "
              f"finish {(t3-t2)*1000:.3f} ms/step", flush=True)

    # ---- F1: the real group-1 fused segment --------------------------------
    from pacmann_tpu.private.fused_search import (
        FusedPrivateSearch, _fused_segment, _seed_beam)

    eng.preprocessing(rng=np.random.default_rng(3))   # fresh budget window
    sids = rng.choice(n, 1000, replace=False)
    srows = np.asarray(eng.db[0, 0, :1])  # dummy fetch to keep shapes warm
    svecs = rng.random((1000, dim), dtype=np.float32)
    snbrs = rng.integers(0, n, (1000, m)).astype(np.int64)
    fs = FusedPrivateSearch(eng, sids, svecs, snbrs, dim=dim, m=m, n=n)
    q1 = rng.random((1, dim), dtype=np.float32)

    fs.search(q1, k=10, max_step=NSTEP, parallel=parallel, seed=7)  # compile
    walls = []
    for rep in range(3):
        fs.ensure_budget(NSTEP, 1, parallel)
        t0 = time.perf_counter()
        fs.search(q1, k=10, max_step=NSTEP, parallel=parallel, seed=8 + rep)
        walls.append(time.perf_counter() - t0 - fs.last_maintenance_s)
    print(f"F1 wall/search: {min(walls)*1000:.2f} ms", flush=True)

    # device-amortized: R back-to-back raw segment dispatches, one sync.
    eng.preprocessing(rng=np.random.default_rng(4))
    fkw = dict(psize=c.partition_size, C=C, R=R, Hp=Hp, S=S, k=eng.k,
               max_q=p.max_query_num, dpp=DEFAULT_PROGRAM_POINT, dim=dim,
               m=m, P=P, parallel=parallel, quota=Q, n=n,
               route=eng.kernel_route)
    keys = jax.random.split(jax.random.PRNGKey(11), NSTEP)
    queries_d = jnp.asarray(q1)

    def one_search(state, seed):
        beam = _seed_beam(queries_d, fs.start_ids, fs.start_vecs,
                          fs.start_nbrs, parallel=parallel,
                          cap=parallel + NSTEP * parallel * m, m=m)
        state, beam, stats = _fused_segment(
            eng.db, state, beam, queries_d,
            jax.random.split(jax.random.PRNGKey(seed), NSTEP),
            jnp.int32(0), jnp.int32(NSTEP), **fkw)
        return state, stats

    state = eng.state
    state, stats = one_search(state, 20)      # warm (compile already done)
    np.asarray(stats)
    # single-dispatch wall (isolates the tunnel RTT)
    t0 = time.perf_counter()
    state, stats = one_search(state, 21)
    np.asarray(stats)
    one = time.perf_counter() - t0
    # R back-to-back dispatches, one dependent sync at the end
    REPS = 8
    t0 = time.perf_counter()
    for rp in range(REPS):
        state, stats = one_search(state, 30 + rp)
    np.asarray(stats)
    amort = (time.perf_counter() - t0) / REPS
    print(f"F1 single-dispatch wall: {one*1000:.2f} ms | "
          f"device-amortized ({REPS} reps): {amort*1000:.2f} ms "
          f"({amort*1000/NSTEP:.3f} ms/step)", flush=True)
    eng.state = state


if __name__ == "__main__":
    main()
