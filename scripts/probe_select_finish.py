"""Bisect the fused-search per-step client cost at SIFT1M shape (TPU).

The group-16 fused step is ~17 ms of which the MM server scan is ~2 ms;
this probe times each protocol phase as a 20-iteration lax.scan chain (so
per-op dispatch overhead amortizes exactly like inside the fused program):

  S1. select only            (_pir_select)
  S2. select + server scan   (MM route)
  S3. full batch             (_pir_batch = select + scan + finish)

Each variant runs as ONE jitted scan over 20 steps with the pir state as
carry, then a forced D2H sync; (t[i+1]-t[i]) isolates each phase. Uses
dummy_preprocessing (zeroed hints): timing is shape-dependent only.
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
        DevicePianoEngine, _pir_select, _pir_batch, _pir_finish)
    from pacmann_tpu.ops.xor_scan import xor_server_scan
    from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw_auto(n, entry_bytes // 4, float_cols=dim)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    print("db up", flush=True)
    eng.dummy_preprocessing(rng=np.random.default_rng(1))

    p, c = eng.params, eng.config
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    R, Hp = p.max_query_per_chunk, p.primary_hint_num
    Q = 96
    NSTEP = 20
    kw = dict(C=C, R=R, Hp=Hp, S=S, k=eng.k, max_q=p.max_query_num,
              dpp=DEFAULT_PROGRAM_POINT)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(
        rng.integers(0, c.partition_size, size=(Q, P)).astype(np.int32))
    rnd = jnp.asarray((rng.integers(0, 2**31, size=(Q, P, S), dtype=np.int64)
                       % C).astype(np.uint32))
    st = eng.state

    def carry_of(state):
        return (state["tag"], state["prog"], state["primary_parity"],
                state["slot_col"], state["hist"], state["finished"])

    def scan_probe(step_body, tag):
        @jax.jit
        def run(state, idx, rnd, db):
            carry = carry_of(state)

            def body(carry, i):
                # vary inputs per step: WhileLoopInvariantCodeMotion would
                # otherwise hoist the whole phase out of the loop body
                idx_i = (idx + i) % np.int32(c.partition_size)
                rnd_i = (rnd + jnp.uint32(i)) % np.uint32(C)
                out = step_body(state, carry, idx_i, rnd_i, db)
                return out, None

            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(NSTEP, dtype=jnp.int32))
            # fold every carry leaf into one scalar so nothing is DCE'd
            acc = jnp.uint32(0)
            for leaf in jax.tree.leaves(carry):
                acc ^= jnp.asarray(leaf).reshape(-1)[-1].astype(jnp.uint32) \
                    if leaf.dtype != jnp.bool_ else jnp.uint32(0)
            return acc

        r = run(st, idx, rnd, eng.db)
        np.asarray(r)          # warm compile + sync
        t0 = time.perf_counter()
        r = run(st, idx, rnd, eng.db)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / NSTEP
        print(f"{tag}: {dt*1000:.2f} ms/step", flush=True)
        return dt

    # measure both client-protocol routes: "xla" (dense repair + gather
    # refresh) vs "pallas" (sequential claim kernel + in-place parity
    # store, ops/protocol_kernels.py)
    for route in ("xla", "pallas"):
        kwr = dict(kw, route=route)

        # S1: select only (mutate a cheap carry leaf so the scan isn't
        # constant)
        def sel_only(state, carry, idx, rnd, db):
            sel, qs = _pir_select(state["table"], state["repl_idx"], carry,
                                  idx, rnd, **kwr)
            tag_, prog, ppar, slot_col, hist, fin = carry
            fin = fin + qs[0, :, 0].astype(jnp.int32) + sel[0][0]
            return (tag_, prog, ppar, slot_col, hist, fin)

        # S2: select + MM server scan
        def sel_scan(state, carry, idx, rnd, db):
            sel, qs = _pir_select(state["table"], state["repl_idx"], carry,
                                  idx, rnd, **kwr)
            resp = xor_server_scan(db, qs, eng.k).reshape(Q, P, eng.k * 128)
            tag_, prog, ppar, slot_col, hist, fin = carry
            fin = fin + resp[0, :, 0].astype(jnp.int32) + sel[0][0]
            return (tag_, prog, ppar, slot_col, hist, fin)

        # S3: the full batch (select + scan + finish)
        def full(state, carry, idx, rnd, db):
            carry, entries, oks = _pir_batch(
                db, state["table"], state["repl_idx"], state["repl_val"],
                state["backup_parity"], carry, idx, rnd, **kwr)
            return carry

        t1 = scan_probe(sel_only, f"S1 select [{route}]")
        t2 = scan_probe(sel_scan, f"S2 select+scan [{route}]")
        t3 = scan_probe(full, f"S3 full batch [{route}]")
        print(f"split [{route}]: select {t1*1000:.2f} | "
              f"scan {(t2-t1)*1000:.2f} | "
              f"finish {(t3-t2)*1000:.2f} ms/step", flush=True)

    # S4: table-free client cost — the per-step PRF evaluations that
    # replace every (T, S)-table / slot_col read (VERDICT r2 task 5,
    # reference model pir.go:404-427). Three reads per step:
    #   eligibility columns  (Q, P, Hp)  <- slot_col gather
    #   hit-set expansion    (Q, P, S)   <- table[hit_tag]
    #   refresh columns      (Q, P, S)   <- table[btag]
    # Evaluated online via the per-partition-keyed bitsliced circuit.
    from pacmann_tpu.ops import aes as aes_ops

    masks = jnp.asarray(np.stack(
        [aes_ops.expand_key_planes(rng.bytes(16)) for _ in range(P)]))

    def pad32(x):
        return -(-x // 32) * 32

    L_exp = pad32(2 * Q * S)       # qs expansion + refresh columns
    L_elig = pad32(Q * Hp)         # eligibility cols IF slot_col dropped too
    print(f"prf lanes/step: expand {P}x{L_exp} "
          f"({P*L_exp/1e6:.2f} M evals); +elig {P}x{L_elig} "
          f"({P*L_elig/1e6:.2f} M evals)", flush=True)

    def time_prf(L, tag):
        @jax.jit
        def run(masks, seed):
            def body(acc, i):
                tg = (jax.lax.broadcasted_iota(jnp.uint32, (P, L), 1)
                      + seed + i) % np.uint32(Hp + 2)
                xs = (jax.lax.broadcasted_iota(jnp.uint32, (P, L), 1)
                      * 7 + i) % np.uint32(S)
                o = aes_ops.prf_eval_fused(masks, tg, xs, C - 1)
                return acc ^ o[0, 0], None

            acc, _ = jax.lax.scan(body, jnp.uint32(seed),
                                  jnp.arange(NSTEP, dtype=jnp.uint32))
            return acc

        np.asarray(run(masks, jnp.uint32(1)))     # compile
        t0 = time.perf_counter()
        np.asarray(run(masks, jnp.uint32(2)))
        dt = (time.perf_counter() - t0) / NSTEP
        print(f"{tag}: {dt*1000:.2f} ms/step", flush=True)
        return dt

    # S4a: the table-free design that KEEPS the small (P,S,Hp) slot_col
    # cache — only the hit expansion + refresh columns go online
    t4a = time_prf(L_exp, "S4a table-free (slot_col cached) PRF add-on")
    # S4b: fully stateless offsets (eligibility columns online too)
    t4b = time_prf(L_elig, "S4b no-cache eligibility add-on")
    print(f"table-free step ~= {(t3+t4a)*1000:.2f} ms; "
          f"stateless step ~= {(t3+t4a+t4b)*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
