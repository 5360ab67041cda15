"""Per-step fused-batch cost vs sub-query count Q at SIFT1M shape (TPU).

The per-query compute falls superlinearly with group size (8.15 / 2.53 /
1.46 ms at groups 16/32/64): a PIR step has a large FIXED cost — the MM
server scan streams every hinted byte-plane once per step and the Phase-C
refresh rewrites the full (P, Hp, Ep) parity state — plus a small marginal
cost per sub-query. This probe measures _pir_batch ms/step at Q in
{24..384} (group sizes 4..64 at step/parallel=20/3, m=32) to quantify the
fixed/marginal split that makes larger groups near-free.

Run on TPU (one process at a time). ~5 compiled programs, shapes reused.
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
    from pacmann_tpu.pir.device_engine import DevicePianoEngine, _pir_batch
    from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw(n, entry_bytes // 4, float_cols=dim)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    print("db up", flush=True)
    eng.dummy_preprocessing(rng=np.random.default_rng(1))

    p, c = eng.params, eng.config
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    kw = dict(C=C, R=p.max_query_per_chunk, Hp=p.primary_hint_num, S=S,
              k=eng.k, max_q=p.max_query_num, dpp=DEFAULT_PROGRAM_POINT)
    NSTEP = 20
    st = eng.state

    def carry_of(state):
        return (state["tag"], state["prog"], state["primary_parity"],
                state["slot_col"], state["hist"], state["finished"])

    rng = np.random.default_rng(2)
    rows = []
    for Q in (24, 48, 96, 192, 384):
        idx = jnp.asarray(
            rng.integers(0, c.partition_size, size=(Q, P)).astype(np.int32))
        rnd = jnp.asarray(
            (rng.integers(0, 2**31, size=(Q, P, S), dtype=np.int64)
             % C).astype(np.uint32))

        @jax.jit
        def run(state, idx, rnd, db):
            carry = carry_of(state)

            def body(carry, i):
                idx_i = (idx + i) % np.int32(c.partition_size)
                rnd_i = (rnd + jnp.uint32(i)) % np.uint32(C)
                carry, entries, oks = _pir_batch(
                    db, state["table"], state["repl_idx"],
                    state["repl_val"], state["backup_parity"],
                    carry, idx_i, rnd_i, **kw)
                return carry, None

            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(NSTEP, dtype=jnp.int32))
            acc = jnp.uint32(0)
            for leaf in jax.tree.leaves(carry):
                if leaf.dtype != jnp.bool_:
                    acc ^= jnp.asarray(
                        leaf).reshape(-1)[-1].astype(jnp.uint32)
            return acc

        np.asarray(run(st, idx, rnd, eng.db))   # compile + sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(st, idx, rnd, eng.db))
            best = min(best, (time.perf_counter() - t0) / NSTEP)
        rows.append((Q, best * 1000))
        print(f"Q={Q:4d}: {best*1000:7.2f} ms/step "
              f"({best*1000/Q*1000:6.1f} us/sub-query)", flush=True)

    # least-squares fixed + marginal split
    qs = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    A = np.stack([np.ones_like(qs), qs], axis=1)
    (fixed, marg), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(f"fit: fixed {fixed:.2f} ms/step + {marg*1000:.1f} us/sub-query "
          f"(r2 {1 - np.var(ts - A @ [fixed, marg]) / np.var(ts):.3f})",
          flush=True)


if __name__ == "__main__":
    main()
