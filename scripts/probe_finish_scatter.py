"""A/B probe: scatter-based Phase-C refresh vs the dense rewrite (TPU).

The group-1 roofline (probe_group1) puts finish at 1.64 ms/step of which
data traffic is worth ~0.35 ms — the dense gather+select rewrite streams
the full parity/slot-col state every step. This probe times, at the
group-1 quota (Q=6) over 20-step scans:

  F0  current dense _pir_finish                      (baseline)
  F1  scatter ppar/tag/prog via .at[].set(mode=drop) (slot_col dense)
  F2  F1 + slot_col column scatter (.at[pg, :, idx])

plus select diagnostics:

  S0  current _pir_select (owner fixpoint while_loop)
  S1  fixpoint replaced by a FIXED 2-pass fori (DIAGNOSTIC ONLY — not
      semantics-safe) — bounds the while_loop's control overhead

and asserts the scatter variants are bit-identical to dense on-device
(entries, ok, and every carry leaf) over several real steps first.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _fin_scatter(repl_val, bpar, table, carry, sel, resp,
                 *, C, R, Hp, S, k, dpp, col_dense: bool):
    tag, prog, ppar, slot_col, hist, finished = carry
    hit_q, ok_q, ok_r, ig_q, chunk_q, idxu_q, free_col = sel
    Q, P = hit_q.shape
    p_ix = jnp.arange(P)[None, :]
    r_val = repl_val[p_ix, chunk_q, ig_q]
    par = ppar[p_ix, hit_q]
    entries = jnp.where(ok_q[..., None], resp ^ r_val ^ par, 0)
    btag = Hp + chunk_q * R + ig_q
    bp = bpar[p_ix, btag - Hp]
    new_par = bp ^ entries
    idx3 = jnp.where(ok_q, hit_q, Hp)          # Hp is OOB -> dropped
    pg = jnp.broadcast_to(jnp.arange(P)[None, :], (Q, P))
    ppar = ppar.at[pg, idx3].set(new_par, mode="drop", unique_indices=True)
    tag = tag.at[pg, idx3].set(btag.astype(tag.dtype), mode="drop",
                               unique_indices=True)
    prog = prog.at[pg, idx3].set(idxu_q, mode="drop", unique_indices=True)
    new_col = (free_col if free_col is not None
               else table[p_ix, btag]).astype(slot_col.dtype)  # (Q, P, S)
    if col_dense:
        hit_v = jnp.where(ok_q, hit_q, -1)
        h_iota = jnp.arange(Hp, dtype=jnp.int32)
        m3 = hit_v[:, :, None] == h_iota[None, None, :]
        upd = jnp.any(m3, axis=0)
        src = jnp.argmax(m3, axis=0).astype(jnp.int32)
        p_grid = jnp.broadcast_to(jnp.arange(P)[:, None], (P, Hp))
        sc_new = jnp.swapaxes(new_col[src, p_grid], 1, 2)
        slot_col = jnp.where(upd[:, None, :], sc_new, slot_col)
    else:
        slot_col = slot_col.at[pg, :, idx3].set(
            new_col, mode="drop", unique_indices=True)
    hist = hist + jnp.sum(
        ok_r[..., None]
        & (chunk_q[..., None] == jnp.arange(S, dtype=jnp.int32)[None, None, :]),
        axis=0, dtype=hist.dtype)
    finished = finished + jnp.sum(ok_q, axis=0, dtype=finished.dtype)
    return (tag, prog, ppar, slot_col, hist, finished), entries, ok_q


def main():
    from bench import synth_raw_auto
    from pacmann_tpu.pir.device_engine import (
        DevicePianoEngine, _pir_select, _pir_finish)
    from pacmann_tpu.ops.xor_scan import xor_server_scan
    from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

    n, dim, m = 1_000_000, 128, 32
    entry_bytes = 4 * dim + 4 * m
    raw = synth_raw_auto(n, entry_bytes // 4, float_cols=dim, nbr_cols=m)
    eng = DevicePianoEngine(n, entry_bytes, m, raw, 8)
    np.asarray(eng.db[-1, -1, -1])
    eng.preprocessing(rng=np.random.default_rng(1))
    print(f"prep {eng.preprocessing_time:.2f}s", flush=True)

    p, c = eng.params, eng.config
    P, S, C = c.partition_num, p.set_size, p.chunk_size
    R, Hp = p.max_query_per_chunk, p.primary_hint_num
    Q = int(os.environ.get("PROBE_Q", "6"))
    NSTEP = 20
    kw = dict(C=C, R=R, Hp=Hp, S=S, k=eng.k, max_q=p.max_query_num,
              dpp=DEFAULT_PROGRAM_POINT)
    fkw = dict(C=C, R=R, Hp=Hp, S=S, k=eng.k, dpp=DEFAULT_PROGRAM_POINT)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(
        rng.integers(0, c.partition_size, size=(Q, P)).astype(np.int32))
    rnd = jnp.asarray((rng.integers(0, 2**31, size=(Q, P, S), dtype=np.int64)
                       % C).astype(np.uint32))
    st = eng.state

    def carry_of(state):
        return (state["tag"], state["prog"], state["primary_parity"],
                state["slot_col"], state["hist"], state["finished"])

    # ---- bit-identity of the scatter variants over 3 real chained steps
    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("which",))
    def run3(state, idx, rnd, db, which: str):
        carry = carry_of(state)
        ents = []
        for i in range(3):
            idx_i = (idx + i) % np.int32(c.partition_size)
            rnd_i = (rnd + jnp.uint32(i)) % np.uint32(C)
            sel, qs = _pir_select(state["table"], state["repl_idx"],
                                  carry, idx_i, rnd_i, **kw)
            resp = xor_server_scan(db, qs, eng.k).reshape(Q, P, eng.k * 128)
            if which == "dense":
                carry, e, ok = _pir_finish(
                    state["repl_val"], state["backup_parity"],
                    state["table"], carry, sel, resp, **fkw)
            else:
                carry, e, ok = _fin_scatter(
                    state["repl_val"], state["backup_parity"],
                    state["table"], carry, sel, resp,
                    col_dense=(which == "colden"), **fkw)
            ents.append((e, ok))
        return carry, ents

    base = jax.device_get(run3(st, idx, rnd, eng.db, "dense"))
    for which in ("colden", "scatter"):
        got = jax.device_get(run3(st, idx, rnd, eng.db, which))
        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got)):
            assert np.array_equal(a, b), which
        print(f"{which}: bit-identical to dense over 3 steps", flush=True)

    # ---- timing scans
    def scan_probe(step_body, tag):
        @jax.jit
        def run(state, idx, rnd, db):
            carry = carry_of(state)

            def body(carry, i):
                idx_i = (idx + i) % np.int32(c.partition_size)
                rnd_i = (rnd + jnp.uint32(i)) % np.uint32(C)
                return step_body(state, carry, idx_i, rnd_i, db), None

            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(NSTEP, dtype=jnp.int32))
            acc = jnp.uint32(0)
            for leaf in jax.tree.leaves(carry):
                acc ^= jnp.asarray(leaf).reshape(-1)[-1].astype(jnp.uint32) \
                    if leaf.dtype != jnp.bool_ else jnp.uint32(0)
            return acc

        r = run(st, idx, rnd, eng.db)
        np.asarray(r)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(st, idx, rnd, eng.db))
            best = min(best, (time.perf_counter() - t0) / NSTEP)
        print(f"{tag}: {best*1000:.3f} ms/step", flush=True)
        return best

    def mk_full(which):
        def full(state, carry, idx, rnd, db):
            sel, qs = _pir_select(state["table"], state["repl_idx"], carry,
                                  idx, rnd, **kw)
            resp = xor_server_scan(db, qs, eng.k).reshape(Q, P, eng.k * 128)
            if which == "dense":
                carry, e, ok = _pir_finish(
                    state["repl_val"], state["backup_parity"],
                    state["table"], carry, sel, resp, **fkw)
            else:
                carry, e, ok = _fin_scatter(
                    state["repl_val"], state["backup_parity"],
                    state["table"], carry, sel, resp,
                    col_dense=(which == "colden"), **fkw)
            return carry
        return full

    t0 = scan_probe(mk_full("dense"), "F0 sel+scan+finish dense")
    t1 = scan_probe(mk_full("colden"), "F1 scatter par/tag/prog, col dense")
    t2 = scan_probe(mk_full("scatter"), "F2 all scatter")

    # ---- select diagnostics: while_loop control overhead bound
    from pacmann_tpu.pir import device_engine as de

    def sel_fixed_passes(state, carry, idx, rnd, db, npass):
        """_pir_select's Phase A with the while replaced by fixed passes
        (DIAGNOSTIC: identical graphs per pass, no convergence check)."""
        tag_, prog, ppar, slot_col, hist, finished = carry
        Qq, Pp = idx.shape
        real_q = idx >= 0
        idxu_q = jnp.where(real_q, idx, 0).astype(jnp.uint32)
        chunk_q = (idxu_q // C).astype(jnp.int32)
        off_q = idxu_q % C
        p_ix2 = jnp.broadcast_to(jnp.arange(Pp)[None, :], (Qq, Pp))
        prog_set = prog != DEFAULT_PROGRAM_POINT
        prog_chunk = (prog // C).astype(jnp.int32)
        col_all = slot_col[p_ix2, chunk_q]
        elig = (col_all == off_q[..., None].astype(col_all.dtype)) & (
            ~prog_set[None] | (prog_chunk[None] != chunk_q[..., None]))
        elig &= real_q[..., None]
        q_iota = jnp.arange(Qq, dtype=jnp.int32)
        h_iota = jnp.arange(Hp, dtype=jnp.int32)
        big = jnp.int32(Qq)

        def _pass(st_, _):
            owner = st_[0]
            open_s = owner[None] >= q_iota[:, None, None]
            elig_eff = elig & open_s
            cand = jnp.argmax(elig_eff, axis=2).astype(jnp.int32)
            found = jnp.any(elig_eff, axis=2)
            match = found[:, :, None] & (
                cand[:, :, None] == h_iota[None, None, :])
            new_owner = jnp.where(
                jnp.any(match, axis=0),
                jnp.argmax(match, axis=0).astype(jnp.int32), big)
            return (new_owner, cand, found), None

        st0 = (jnp.full((Pp, Hp), big), jnp.zeros((Qq, Pp), jnp.int32),
               jnp.zeros((Qq, Pp), bool))
        (owner, hit_q, found_q), _ = jax.lax.scan(
            _pass, st0, None, length=npass)
        fin = finished + hit_q[0].astype(jnp.int32) + owner[:, 0]
        return (tag_, prog, ppar, slot_col, hist, fin)

    def sel_current(state, carry, idx, rnd, db):
        sel, qs = _pir_select(state["table"], state["repl_idx"], carry,
                              idx, rnd, **kw)
        tag_, prog, ppar, slot_col, hist, fin = carry
        fin = fin + qs[0, :, 0].astype(jnp.int32) + sel[0][0]
        return (tag_, prog, ppar, slot_col, hist, fin)

    s0 = scan_probe(sel_current, "S0 select current")
    s1 = scan_probe(
        lambda *a: sel_fixed_passes(*a, npass=2), "S1 claim fixed-2-pass")
    s2 = scan_probe(
        lambda *a: sel_fixed_passes(*a, npass=1), "S2 claim fixed-1-pass")
    print(f"finish dense->scatter: {(t0-t1)*1000:.3f} ms/step saved "
          f"(col scatter extra {(t2-t1)*1000:+.3f}); "
          f"select while overhead ~{(s0-s1)*1000:.3f} ms/step over fixed-2",
          flush=True)


if __name__ == "__main__":
    main()
