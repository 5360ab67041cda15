"""Pallas kernels for the PianoPIR client's per-step protocol phases.

The online client protocol (device_engine._pir_select/_pir_finish) is
op-count-bound on TPU: at SIFT1M group-16 shapes the select+finish XLA
graphs lower to ~60-100 fused kernels whose launch overhead (~15-30 us
each) costs ~3.5 ms/step while the actual data traffic is worth ~0.5 ms
(RESULTS.md roofline).

`claim_select` — Phase A slot selection (pir.go:404-419). Replaces the
(Q, P, Hp) eligibility tensor + owner-fixpoint repair passes with a
per-partition SEQUENTIAL greedy claim loop — the reference's exact
semantics: round q takes the first eligible primary slot not consumed
by an earlier round of the same batch. Sequential-over-Q is cheap here
because each round is ~30 vector ops on a (Hh, 128) tile; it is the
dense repair algebra and its kernel launches that cost. The XLA path
(device_engine._pir_select) iterates the owner map to fixpoint, which
converges to this same sequential outcome — identical hit slots AND
identical failure sets at any contention depth, so the two routes are
bit-identical in every output. Runs interpreted off-TPU (tests) and
compiled on TPU; the NumPy twin below defines the semantics.

MEASURED VERDICT (real v5e, probe_select_finish, 2026-08-18, SIFT1M
shapes Q=96 P=16): claim_select 2.00 ms/step vs the XLA owner-fixpoint's
2.06 — a tie (the XLA select is no longer op-count-bound after the
round-4 fixpoint rewrite). The production route stays "xla"
(device_engine._DEFAULT_ROUTE); the kernel remains as the
route-equivalence stress surface for the claim fixpoint. The companion
Phase-C `refresh_parity` kernel measured 7x SLOWER than the XLA
gather+select form and now lives in ops/attic.py with its verdict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pacmann_tpu.utils.platform import default_interpret


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Kernel 1: sequential greedy slot claim (Phase A)


def _claim_kernel(cq_ref, oq_ref, rq_ref, pc_ref, col_ref,
                  hit_ref, fnd_ref, *, Hp: int, Q: int):
    """Grid (P,). Per partition: for q in [0, Q): take the first eligible
    unclaimed primary slot.

    cq/oq/rq (P, Q) i32 SMEM (full array — Mosaic forbids (1, Q) SMEM
    blocks unless Q-axis tiles align; scalars index by program_id);
    pc (1, Hh, 128) i32 VMEM: programmed chunk per slot (-1 = unset);
    col (1, S, Hh, 128) VMEM: cached PRF offset per (chunk, slot);
    hit/fnd (P, Q) i32 SMEM outputs (full array, row p written here).
    Slot index h = hh*128 + lane (the (Hp,) order of the XLA path).
    """
    p = pl.program_id(0)
    Hh = pc_ref.shape[1]
    h2 = (jax.lax.broadcasted_iota(jnp.int32, (Hh, 128), 0) * 128
          + jax.lax.broadcasted_iota(jnp.int32, (Hh, 128), 1))
    pc = pc_ref[0]
    big = jnp.int32(Hh * 128)

    def body(q, claimed):
        # `claimed` rides the loop as i32 0/1: Mosaic cannot legalize
        # scf.for with loop-carried i1 vectors (vector<8x128xi1> carries
        # fail "failed to legalize operation 'scf.for'" on the real
        # toolchain — measured 2026-08-18; interpret mode accepted bools)
        ck = cq_ref[p, q]
        off = oq_ref[p, q]
        real = rq_ref[p, q]
        col = col_ref[0, pl.ds(ck, 1)][0].astype(jnp.int32)   # (Hh, 128)
        elig = (col == off) & (pc != ck) & (claimed == 0)
        cand = jnp.where(elig, h2, big)
        m = jnp.min(cand)
        fnd = jnp.logical_and(m < big, real != 0)
        mv = jnp.where(fnd, m, big)
        claimed = claimed | (h2 == mv).astype(jnp.int32)
        hit_ref[p, q] = jnp.where(fnd, m, 0)
        fnd_ref[p, q] = fnd.astype(jnp.int32)
        return claimed

    # padded slots (h >= Hp) start claimed so they are never eligible
    jax.lax.fori_loop(0, Q, body, (h2 >= Hp).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("C", "dpp", "interpret"))
def _claim_select_impl(slot_col, prog, chunk_q, off_q, real_q,
                       *, C: int, dpp: int, interpret: bool):
    Q, P = chunk_q.shape
    S, Hp = slot_col.shape[1], slot_col.shape[2]
    Hpp = _ceil_to(Hp, 128)
    Hh = Hpp // 128

    # programmed-chunk per slot; -1 = unprogrammed (matches the XLA path's
    # ~prog_set | (prog_chunk != chunk) since chunk ids are >= 0)
    pc = jnp.where(prog != jnp.uint32(dpp),
                   (prog // jnp.uint32(C)).astype(jnp.int32),
                   jnp.int32(-1))
    if Hpp != Hp:
        pc = jnp.pad(pc, ((0, 0), (0, Hpp - Hp)), constant_values=-1)
        slot_col = jnp.pad(slot_col, ((0, 0), (0, 0), (0, Hpp - Hp)))
    pc = pc.reshape(P, Hh, 128)
    col4 = slot_col.reshape(P, S, Hh, 128)

    cq = chunk_q.T.astype(jnp.int32)     # (P, Q)
    oq = off_q.T.astype(jnp.int32)
    rq = real_q.T.astype(jnp.int32)

    kernel = functools.partial(_claim_kernel, Hp=Hp, Q=Q)
    hit, fnd = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((P, Q), jnp.int32),
                   jax.ShapeDtypeStruct((P, Q), jnp.int32)),
        grid=(P,),
        in_specs=[
            # full-array SMEM: Mosaic requires the last two block dims to
            # tile (8, 128) or equal the array dims — (1, Q) rows don't
            pl.BlockSpec((P, Q), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P, Q), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P, Q), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hh, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hh, 128), lambda p: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((P, Q), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P, Q), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(cq, oq, rq, pc, col4)
    return hit.T, fnd.T != 0


def claim_select(slot_col, prog, chunk_q, off_q, real_q,
                 *, C: int, dpp: int, interpret: bool | None = None):
    """Phase-A slot selection, sequential-greedy per partition.

    slot_col (P, S, Hp) uint: cached PRF offsets per primary slot;
    prog (P, Hp) u32 programmed points (dpp = unset); chunk_q/off_q (Q, P);
    real_q (Q, P) bool. Returns (hit (Q, P) i32, found (Q, P) bool):
    round q's claimed slot (0 when not found). Exactly one round claims
    any given slot (pir.go:404-419 scanned per round, first hit wins).
    """
    if interpret is None:
        interpret = default_interpret()
    # VMEM bound: the kernel stages one partition's full (S, Hh, 128)
    # slot-column block (plus the (Hh, 128) programmed-chunk map) in VMEM
    # per grid step — there is no chunk-axis blocking. ~0.9 MB at SIFT1M
    # shapes; fail loudly before Mosaic OOMs if a config outgrows it.
    S, Hp = slot_col.shape[1], slot_col.shape[2]
    Hpp = _ceil_to(Hp, 128)
    vmem_bytes = S * Hpp * slot_col.dtype.itemsize + Hpp * 4
    if vmem_bytes > 12 * 2**20:
        raise ValueError(
            f"claim_select VMEM block {vmem_bytes/2**20:.1f} MB "
            f"(S={S}, Hp={Hp}) exceeds the 12 MB bound; add S-axis "
            "blocking or route 'xla'")
    return _claim_select_impl(slot_col, prog, chunk_q, off_q, real_q,
                              C=C, dpp=dpp, interpret=interpret)


# ---------------------------------------------------------------------------
# Kernel 2: the ENTIRE client selection (Phase A + budgets + Phase B-prep)
# as ONE Pallas program — the group-1 latency kernel.


def _select_full_kernel(cq_ref, oq_ref, rq_ref, ho_ref, fin_ref,
                        pg_ref, tg_ref, col_ref, tab_ref, rp_ref, rnd_ref,
                        qs_ref, hit_ref, okq_ref, okr_ref, ig_ref,
                        *, Hp: int, Q: int, S: int, R: int, C: int,
                        max_q: int, dpp: int):
    """Grid (P,). Per partition: Q statically-unrolled protocol rounds —
    greedy claim, replacement budgets, and the (S,) query-set build — all
    in one program. ~25 small vector ops per round replace the XLA
    select's ~390-op graph whose per-kernel launch overhead dominates the
    fused step at small Q (RESULTS.md group-1 roofline).

    SMEM: cq/oq/rq/ho (P, Q) i32 (chunk, offset, real, hist[chunk] per
    round), fin (P, 1) i32. VMEM blocks per partition: pg/tg (1, Hh, 128)
    prog/tag sheets, col (1, S, Hh, 128) slot columns, tab (1, T, S)
    offset table, rp (1, S, R) replacement offsets, rnd (1, Q, S) dummy
    rows. Outputs: qs (1, Q, S) i32 VMEM; hit/okq/okr/ig (P, Q) i32 SMEM.
    Bit-equivalence contract vs the XLA route: hit, ok_q, ok_r, ig and
    EVERY qs row match exactly (non-served rows are the same rnd dummies;
    value differences on masked internal terms never escape)."""
    p = pl.program_id(0)
    Hh = pg_ref.shape[1]
    h2 = (jax.lax.broadcasted_iota(jnp.int32, (Hh, 128), 0) * 128
          + jax.lax.broadcasted_iota(jnp.int32, (Hh, 128), 1))
    big = jnp.int32(Hh * 128)
    progv = pg_ref[0]                                   # (Hh, 128) i32
    tagv = tg_ref[0]                                    # (Hh, 128) i32
    pc = jnp.where(progv != dpp, progv // C, -1)        # programmed chunk
    claimed = h2 >= Hp
    fin = fin_ref[p, 0]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    rankp = jnp.int32(0)
    cks, fnds = [], []

    for q in range(Q):
        ck = cq_ref[p, q]
        off = oq_ref[p, q]
        real = rq_ref[p, q]
        # --- claim (pir.go:404-419): first eligible unclaimed slot
        col = col_ref[0, pl.ds(ck, 1)][0].astype(jnp.int32)   # (Hh, 128)
        elig = (col == off) & (pc != ck) & (~claimed)
        mh = jnp.min(jnp.where(elig, h2, big))
        fnd = jnp.logical_and(mh < big, real != 0)
        mv = jnp.where(fnd, mh, big)
        hitm = h2 == mv
        claimed = claimed | hitm
        hit_tag = jnp.sum(jnp.where(hitm, tagv, 0))
        hp = jnp.sum(jnp.where(hitm, progv, 0))
        # --- budgets (order-of-round semantics, device_engine lines)
        cnt = jnp.int32(0)
        for ck_p, fnd_p in zip(cks, fnds):
            cnt = cnt + jnp.where(fnd_p & (ck_p == ck), 1, 0)
        ig = ho_ref[p, q] + cnt + jnp.where(fnd, 0, -1)
        okr = fnd & (ig < R)
        okq = okr & (rankp < max_q - fin)
        rankp = rankp + okr.astype(jnp.int32)
        igc = jnp.minimum(ig, R - 1)
        # --- Phase B-prep: the (S,) offset row (client->server message)
        row = tab_ref[0, pl.ds(hit_tag, 1), :].astype(jnp.int32)  # (1, S)
        hp_set = hp != dpp
        row = jnp.where((s_iota == hp // C) & hp_set, hp % C, row)
        rrow = rp_ref[0, pl.ds(ck, 1), :].astype(jnp.int32)       # (1, R)
        r_sel = jnp.sum(jnp.where(r_iota == igc, rrow, 0))
        row = jnp.where(s_iota == ck, r_sel % C, row)
        row = jnp.where(okq, row, rnd_ref[0, q:q + 1, :].astype(jnp.int32))
        qs_ref[0, q:q + 1, :] = row
        hit_ref[p, q] = jnp.where(fnd, mh, 0)
        okq_ref[p, q] = okq.astype(jnp.int32)
        okr_ref[p, q] = okr.astype(jnp.int32)
        ig_ref[p, q] = igc
        cks.append(ck)
        fnds.append(fnd)


@functools.partial(
    jax.jit,
    static_argnames=("C", "R", "Hp", "S", "max_q", "dpp", "interpret"))
def _select_full_impl(slot_col, prog, tag, table, repl_idx, hist, finished,
                      idx_q, rnd_q, *, C, R, Hp, S, max_q, dpp, interpret):
    Q, P = idx_q.shape
    T = table.shape[1]
    Hpp = _ceil_to(Hp, 128)
    Hh = Hpp // 128

    real_q = idx_q >= 0
    idxu_q = jnp.where(real_q, idx_q, 0).astype(jnp.uint32)
    chunk_q = (idxu_q // C).astype(jnp.int32)
    off_q = (idxu_q % C).astype(jnp.int32)
    p_ix2 = jnp.broadcast_to(jnp.arange(P)[None, :], (Q, P))
    hist_own = hist[p_ix2, chunk_q]                    # (Q, P) i32

    progp, tagp, colp = prog, tag, slot_col
    if Hpp != Hp:
        progp = jnp.pad(progp, ((0, 0), (0, Hpp - Hp)))
        tagp = jnp.pad(tagp, ((0, 0), (0, Hpp - Hp)))
        colp = jnp.pad(colp, ((0, 0), (0, 0), (0, Hpp - Hp)))
    pg4 = progp.astype(jnp.int32).reshape(P, Hh, 128)
    tg4 = tagp.astype(jnp.int32).reshape(P, Hh, 128)
    col4 = colp.reshape(P, S, Hh, 128)

    smem = lambda: pl.BlockSpec((P, Q), lambda p: (0, 0),
                                memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _select_full_kernel, Hp=Hp, Q=Q, S=S, R=R, C=C, max_q=max_q,
        dpp=dpp)
    qsT, hit, okq, okr, ig = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((P, Q, S), jnp.int32),
                   jax.ShapeDtypeStruct((P, Q), jnp.int32),
                   jax.ShapeDtypeStruct((P, Q), jnp.int32),
                   jax.ShapeDtypeStruct((P, Q), jnp.int32),
                   jax.ShapeDtypeStruct((P, Q), jnp.int32)),
        grid=(P,),
        in_specs=[
            smem(), smem(), smem(), smem(),
            pl.BlockSpec((P, 1), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hh, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hh, 128), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hh, 128), lambda p: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, S), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, R), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, S), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Q, S), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            smem(), smem(), smem(), smem(),
        ),
        interpret=interpret,
    )(chunk_q.T, off_q.T, real_q.T.astype(jnp.int32), hist_own.T,
      finished.astype(jnp.int32)[:, None], pg4, tg4, col4,
      table, repl_idx, jnp.transpose(rnd_q, (1, 0, 2)))

    qs = jnp.transpose(qsT, (1, 0, 2)).astype(jnp.uint32)
    sel = (hit.T, okq.T != 0, okr.T != 0, ig.T, chunk_q, idxu_q, None)
    return sel, qs


def select_full(slot_col, prog, tag, table, repl_idx, hist, finished,
                idx_q, rnd_q, *, C, R, Hp, S, max_q, dpp,
                interpret: bool | None = None):
    """The ENTIRE _pir_select as one Pallas program (+ a handful of glue
    ops): Phase-A greedy claim, replacement/budget accounting, and the
    query-set build. Route 'fused' of the client protocol — targets
    SMALL per-step batches (the group-1 serving shape) where the XLA
    select's kernel-launch overhead dominates. Requires the resident
    offset table (not table_free). Returns (sel, qs) exactly like
    _pir_select; outputs are bit-identical to the XLA route on hit,
    ok_q, ok_r, ig, and every qs row (tests pin this)."""
    if interpret is None:
        interpret = default_interpret()
    S_, Hp_ = slot_col.shape[1], slot_col.shape[2]
    Hpp = _ceil_to(Hp_, 128)
    T = table.shape[1]
    vmem = (S_ * Hpp * slot_col.dtype.itemsize + 2 * Hpp * 4
            + T * S_ * table.dtype.itemsize + S_ * R * 4
            + 2 * idx_q.shape[0] * S_ * 4)
    if vmem > 12 * 2**20:
        raise ValueError(
            f"select_full VMEM block {vmem/2**20:.1f} MB exceeds the "
            "12 MB bound; route 'xla'")
    return _select_full_impl(
        slot_col, prog, tag, table, repl_idx, hist, finished, idx_q, rnd_q,
        C=C, R=R, Hp=Hp, S=S, max_q=max_q, dpp=dpp, interpret=interpret)


def claim_select_np(slot_col, prog, chunk_q, off_q, real_q, *, C, dpp):
    """NumPy twin of claim_select (semantics oracle)."""
    Q, P = chunk_q.shape
    Hp = slot_col.shape[2]
    hit = np.zeros((Q, P), np.int32)
    found = np.zeros((Q, P), bool)
    prog_set = prog != np.uint32(dpp)
    prog_chunk = (prog // np.uint32(C)).astype(np.int64)
    for p in range(P):
        claimed = np.zeros(Hp, bool)
        for q in range(Q):
            if not real_q[q, p]:
                continue
            ck = int(chunk_q[q, p])
            elig = ((slot_col[p, ck].astype(np.int64) == int(off_q[q, p]))
                    & (~prog_set[p] | (prog_chunk[p] != ck)) & ~claimed)
            idx = np.flatnonzero(elig)
            if idx.size:
                hit[q, p] = idx[0]
                found[q, p] = True
                claimed[idx[0]] = True
    return hit, found
