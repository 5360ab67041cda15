"""Pallas client-protocol kernels vs their NumPy semantic twins
(interpret mode off-TPU), plus engine-level exactness with the kernels
routed in."""

import jax
import numpy as np
import jax.numpy as jnp

from pacmann_tpu.ops.attic import refresh_parity, refresh_parity_np
from pacmann_tpu.ops.protocol_kernels import claim_select, claim_select_np


def _rand_claim_case(rng, Q, P, S, Hp, C, contention=False):
    dpp = 0x7FFFFFFF
    slot_col = rng.integers(0, C, size=(P, S, Hp)).astype(np.uint16)
    prog = rng.integers(0, S * C, size=(P, Hp)).astype(np.uint32)
    unset = rng.random((P, Hp)) < 0.5
    prog[unset] = dpp
    if contention:
        # every round asks the same (chunk, offset): all rounds contest
        # one eligible slot set per partition
        chunk_q = np.full((Q, P), rng.integers(0, S), np.int32)
        off_q = np.full((Q, P), rng.integers(0, C), np.uint32)
    else:
        chunk_q = rng.integers(0, S, size=(Q, P)).astype(np.int32)
        off_q = rng.integers(0, C, size=(Q, P)).astype(np.uint32)
    real_q = rng.random((Q, P)) < 0.9
    return slot_col, prog, chunk_q, off_q, real_q, dpp


def test_claim_select_matches_numpy_twin():
    rng = np.random.default_rng(7)
    for Q, P, S, Hp, C in [(16, 4, 8, 480, 32),    # Hp % 128 != 0 (pad path)
                           (8, 2, 4, 256, 64),
                           (24, 3, 5, 896, 128)]:
        for contention in (False, True):
            slot_col, prog, chunk_q, off_q, real_q, dpp = _rand_claim_case(
                rng, Q, P, S, Hp, C, contention)
            hit, found = claim_select(
                jnp.asarray(slot_col), jnp.asarray(prog),
                jnp.asarray(chunk_q), jnp.asarray(off_q),
                jnp.asarray(real_q), C=C, dpp=dpp)
            hit_np, found_np = claim_select_np(
                slot_col, prog, chunk_q, off_q, real_q, C=C, dpp=dpp)
            assert np.array_equal(np.asarray(found), found_np), (
                Q, P, S, Hp, C, contention)
            assert np.array_equal(np.asarray(hit), hit_np), (
                Q, P, S, Hp, C, contention)


def test_claim_select_claims_are_unique():
    rng = np.random.default_rng(8)
    slot_col, prog, chunk_q, off_q, real_q, dpp = _rand_claim_case(
        rng, 32, 2, 4, 256, 16, contention=True)
    hit, found = claim_select(
        jnp.asarray(slot_col), jnp.asarray(prog), jnp.asarray(chunk_q),
        jnp.asarray(off_q), jnp.asarray(real_q), C=16, dpp=dpp)
    hit, found = np.asarray(hit), np.asarray(found)
    for p in range(2):
        taken = hit[found[:, p], p]
        assert len(set(taken.tolist())) == len(taken)


def test_refresh_parity_matches_numpy_twin():
    rng = np.random.default_rng(9)
    for Q, P, Hp, Ep in [(16, 4, 480, 128),        # Hp % 8 == 0, odd split
                         (8, 2, 896, 256),
                         (12, 3, 64, 128)]:
        ppar = rng.integers(0, 2**32, size=(P, Hp, Ep), dtype=np.uint32)
        new_par = rng.integers(0, 2**32, size=(Q, P, Ep), dtype=np.uint32)
        # unique hit slots per partition (the claim invariant)
        hit = np.stack(
            [rng.choice(Hp, size=Q, replace=False) for _ in range(P)],
            axis=1).astype(np.int32)
        ok = rng.random((Q, P)) < 0.7
        out = refresh_parity(jnp.asarray(ppar), jnp.asarray(new_par),
                             jnp.asarray(hit), jnp.asarray(ok))
        ref = refresh_parity_np(ppar, new_par, hit, ok)
        assert np.array_equal(np.asarray(out), ref), (Q, P, Hp, Ep)


def test_select_full_matches_xla_route():
    """The one-program 'fused' selection kernel is bit-identical to the
    XLA _pir_select on the full contract — hit, ok_q, ok_r, ig, and every
    qs row — fuzzed over random protocol state, dummy rounds, in-batch
    contention, and budget denial."""
    import functools

    from pacmann_tpu.pir.device_engine import _pir_select

    rng = np.random.default_rng(13)
    for Q, P, S, Hp, C, R, max_q in [
            (6, 4, 8, 480, 32, 5, 1000),   # Hp pad path, group-1-like Q
            (8, 2, 4, 256, 64, 3, 4),      # tight budget -> denials
            (16, 3, 5, 896, 128, 7, 9)]:
        T = Hp + S * R
        dpp = 0x7FFFFFFF
        for contention in (False, True):
            slot_col = rng.integers(0, C, size=(P, S, Hp)).astype(np.uint16)
            prog = rng.integers(0, S * C, size=(P, Hp)).astype(np.uint32)
            prog[rng.random((P, Hp)) < 0.5] = dpp
            tag = rng.integers(0, T, size=(P, Hp)).astype(np.int32)
            table = rng.integers(0, C, size=(P, T, S)).astype(np.uint16)
            repl_idx = rng.integers(0, S * C, size=(P, S, R)).astype(
                np.uint32)
            hist = rng.integers(0, R, size=(P, S)).astype(np.int32)
            finished = rng.integers(0, max(max_q - 2, 1), size=(P,)).astype(
                np.int32)
            if contention:
                idx_q = np.full((Q, P), int(rng.integers(0, S * C)),
                                np.int32)
            else:
                idx_q = rng.integers(0, S * C, size=(Q, P)).astype(np.int32)
            idx_q[rng.random((Q, P)) < 0.2] = -1
            rnd = rng.integers(0, C, size=(Q, P, S)).astype(np.uint32)
            carry = (jnp.asarray(tag), jnp.asarray(prog),
                     jnp.zeros((P, 1, 1), jnp.uint32),
                     jnp.asarray(slot_col), jnp.asarray(hist),
                     jnp.asarray(finished))
            call = functools.partial(
                _pir_select, jnp.asarray(table), jnp.asarray(repl_idx),
                carry, jnp.asarray(idx_q), jnp.asarray(rnd),
                C=C, R=R, Hp=Hp, S=S, k=1, max_q=max_q, dpp=dpp)
            sel_x, qs_x = call(route="xla")
            sel_f, qs_f = call(route="fused")
            tagn = (Q, P, S, Hp, C, R, max_q, contention)
            assert np.array_equal(np.asarray(qs_x), np.asarray(qs_f)), tagn
            for i, name in enumerate(("hit", "ok_q", "ok_r", "ig",
                                      "chunk", "idxu")):
                assert np.array_equal(
                    np.asarray(sel_x[i]), np.asarray(sel_f[i])), (name, tagn)


def test_engine_state_identical_fused_route():
    """Full engine state evolves identically with the fused selection
    kernel routed in (interpret off-TPU), including contended batches."""
    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    rng = np.random.default_rng(14)
    n, entry_bytes, batch = 8192, 32, 32
    raw = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    engines = []
    for route in ("xla", "fused"):
        pir = DevicePianoEngine(n, entry_bytes, batch, raw, 20,
                                kernel_route=route)
        pir.preprocessing(rng=np.random.default_rng(100))
        ids = [int(i * pir.config.partition_size + 7)
               for i in range(pir.config.partition_num)]
        out = pir.query(ids)
        for r, idx in enumerate(ids):
            assert np.array_equal(out[r], raw[idx]), (route, r)
        Q = 8
        idx_q = np.full((Q, pir.config.partition_num), 17, np.int32)
        p = pir.params
        rand_offs = (np.random.default_rng(12).integers(
            0, 2**32, size=(Q, pir.config.partition_num, p.set_size),
            dtype=np.uint64) & np.uint64(p.chunk_mask)).astype(np.uint32)
        pir.state = pir._online(idx_q, rand_offs)[0]
        engines.append(pir)
    a, b = engines
    for key in ("tag", "prog", "primary_parity", "slot_col", "hist",
                "finished"):
        assert np.array_equal(np.asarray(a.state[key]),
                              np.asarray(b.state[key])), key


def test_finish_scatter_matches_dense():
    """The row-targeted scatter refresh and the dense streaming rewrite
    produce identical carries and entries — fuzzed over random state,
    unique hit slots, denial masks, and OOB-dropped failures."""
    import os

    from pacmann_tpu.pir.device_engine import _pir_finish

    rng = np.random.default_rng(15)
    for Q, P, S, Hp, C, R, k in [(6, 4, 8, 480, 32, 5, 1),
                                 (16, 3, 5, 896, 128, 7, 2)]:
        T = Hp + S * R
        Ep = k * 128
        tag = rng.integers(0, T, size=(P, Hp)).astype(np.int32)
        prog = rng.integers(0, S * C, size=(P, Hp)).astype(np.uint32)
        ppar = rng.integers(0, 2**32, size=(P, Hp, Ep), dtype=np.uint32)
        slot_col = rng.integers(0, C, size=(P, S, Hp)).astype(np.uint16)
        hist = rng.integers(0, R, size=(P, S)).astype(np.int32)
        finished = rng.integers(0, 50, size=(P,)).astype(np.int32)
        repl_val = rng.integers(0, 2**32, size=(P, S, R, Ep),
                                dtype=np.uint32)
        bpar = rng.integers(0, 2**32, size=(P, S * R, Ep), dtype=np.uint32)
        table = rng.integers(0, C, size=(P, T, S)).astype(np.uint16)
        # unique hit slots per partition (the reservation invariant)
        hit = np.stack(
            [rng.choice(Hp, size=Q, replace=False) for _ in range(P)],
            axis=1).astype(np.int32)
        ok_q = rng.random((Q, P)) < 0.7
        ok_r = ok_q | (rng.random((Q, P)) < 0.2)
        ig = rng.integers(0, R, size=(Q, P)).astype(np.int32)
        chunk = rng.integers(0, S, size=(Q, P)).astype(np.int32)
        idxu = rng.integers(0, S * C, size=(Q, P)).astype(np.uint32)
        resp = rng.integers(0, 2**32, size=(Q, P, Ep), dtype=np.uint32)
        carry = tuple(jnp.asarray(x) for x in
                      (tag, prog, ppar, slot_col, hist, finished))
        sel = (jnp.asarray(hit), jnp.asarray(ok_q), jnp.asarray(ok_r),
               jnp.asarray(ig), jnp.asarray(chunk), jnp.asarray(idxu),
               None)
        outs = {}
        for which in ("dense", "scatter"):
            os.environ["PACMANN_REFRESH_ROUTE"] = which
            try:
                outs[which] = jax.device_get(_pir_finish(
                    jnp.asarray(repl_val), jnp.asarray(bpar),
                    jnp.asarray(table), carry, sel, jnp.asarray(resp),
                    C=C, R=R, Hp=Hp, S=S, k=k, dpp=0x7FFFFFFF))
            finally:
                del os.environ["PACMANN_REFRESH_ROUTE"]
        for a, b in zip(jax.tree.leaves(outs["dense"]),
                        jax.tree.leaves(outs["scatter"])):
            assert np.array_equal(a, b), (Q, P)


def test_engine_exact_with_pallas_route():
    """Full engine answers stay exact with both protocol kernels routed in
    (interpret mode): the kernel path is protocol-equivalent to the XLA
    path even where contended slot choices differ."""
    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    rng = np.random.default_rng(10)
    n, entry_bytes, batch = 8192, 32, 32
    raw = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    pir = DevicePianoEngine(n, entry_bytes, batch, raw, 20,
                            kernel_route="pallas")
    pir.preprocessing(rng=np.random.default_rng(100))
    c = pir.config
    for _ in range(3):
        ids = [int(i * c.partition_size + rng.integers(0, c.partition_size))
               for i in range(c.partition_num)] * 2
        out = pir.query(ids)
        for r, idx in enumerate(ids):
            assert np.array_equal(out[r], raw[idx]), (r, idx)


def test_engine_state_identical_across_routes():
    """The pallas kernel is strictly sequential and the xla owner-fixpoint
    converges to the same sequential outcome, so the full client state must
    evolve IDENTICALLY on both routes — including under heavy slot
    contention (a batch whose rounds all ask the same index)."""
    from pacmann_tpu.pir.device_engine import DevicePianoEngine

    rng = np.random.default_rng(11)
    n, entry_bytes, batch = 8192, 32, 32
    raw = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    engines = []
    for route in ("xla", "pallas"):
        pir = DevicePianoEngine(n, entry_bytes, batch, raw, 20,
                                kernel_route=route)
        pir.preprocessing(rng=np.random.default_rng(100))
        ids = [int(i * pir.config.partition_size + 7)
               for i in range(pir.config.partition_num)]
        pir.query(ids)
        # contended batch: every round of every partition asks index 17
        Q = 8
        idx_q = np.full((Q, pir.config.partition_num), 17, np.int32)
        p = pir.params
        rand_offs = (np.random.default_rng(12).integers(
            0, 2**32, size=(Q, pir.config.partition_num, p.set_size),
            dtype=np.uint64) & np.uint64(p.chunk_mask)).astype(np.uint32)
        pir.state = pir._online(idx_q, rand_offs)[0]
        engines.append(pir)
    a, b = engines
    for key in ("tag", "prog", "primary_parity", "slot_col", "hist",
                "finished"):
        assert np.array_equal(np.asarray(a.state[key]),
                              np.asarray(b.state[key])), key
