"""Fully-fused private search: beam traversal + PianoPIR online protocol as
ONE device program per query group.

The host-orchestrated path (driver.py + DevicePianoEngine) still pays one
device dispatch per beam step (20+ round trips per query — dominant over any
real client/server link). Here the ENTIRE search runs inside a single jit:

  for step in 0..max_step (lax.scan):
    1. frontier pop: `parallel` best unexplored vertices per query
       (masked arg-min — the heap's extract-min, graphann/search.go:150-171)
    2. oblivious fetch routing: the Qn*parallel*m neighbor ids are ranked
       within their batch-PIR partitions (one-hot cumsum); the first
       `quota` per partition become sub-queries, overflow is dropped to
       zeros — the reference's FCFS lossy contract (batch-pir.go:194-216)
       as a fixed-shape scatter
    3. PIR: an inner lax.scan of `_pir_substep` serves quota sub-queries
       per partition (hit scan -> expansion -> server XOR scan -> unmask ->
       hint refresh), exactly the sequential protocol per partition
    4. entries decode to (vector ‖ neighbors) and update the visited table
       (dedup, all-zero-neighbor skip: search.go:187-207)

Concurrent queries share each step's PIR batch, so the per-partition quota
grows with the group size and the drop rate falls. Answers = top-k of each
query's visited table. Only (Qn, k) ids leave the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pacmann_tpu.pir.device_engine import DevicePianoEngine, _pir_batch
from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

NEG_ID = jnp.int32(-1)
INF = jnp.float32(np.inf)


def _pop_parallel_batch(dist, explored, parallel):
    """(Qn, cap) -> slots (Qn, parallel), valid (Qn, parallel)."""
    def one(dist_q, expl_q):
        picked, valid = [], []
        masked = jnp.where(expl_q, INF, dist_q)
        for _ in range(parallel):
            i = jnp.argmin(masked)
            ok = masked[i] < INF
            picked.append(jnp.where(ok, i, 0))
            valid.append(ok)
            masked = masked.at[i].set(INF)
        return jnp.stack(picked), jnp.stack(valid)

    return jax.vmap(one)(dist, explored)


def _first_occurrence(ids):
    B = ids.shape[0]
    eq = ids[:, None] == ids[None, :]
    lower = jnp.tril(jnp.ones((B, B), bool), k=-1)
    return ~jnp.any(eq & lower, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("psize", "C", "R", "Hp", "S", "k", "max_q", "dpp",
                     "dim", "m", "P", "topk", "max_step", "parallel",
                     "quota", "n"),
    donate_argnames=("pir_state",),
)
def _fused_search(db, pir_state, queries, start_ids, start_vecs, start_nbrs,
                  key, *, psize, C, R, Hp, S, k, max_q, dpp, dim, m, P,
                  topk, max_step, parallel, quota, n):
    Qn = queries.shape[0]
    F = Qn * parallel * m               # fetches per step
    Ep = k * 128
    cap = parallel + max_step * parallel * m

    # ---- seed beam state (search.go:129-148)
    sdist = jnp.sum(
        (start_vecs[None, :, :] - queries[:, None, :]) ** 2, axis=-1)
    negd, sidx = jax.lax.top_k(-sdist, parallel)        # (Qn, parallel)
    ids = jnp.full((Qn, cap), NEG_ID)
    dist = jnp.full((Qn, cap), INF)
    nbrs = jnp.zeros((Qn, cap, m), jnp.int32)
    explored = jnp.ones((Qn, cap), bool)
    sl = jnp.arange(parallel)
    ids = ids.at[:, sl].set(start_ids[sidx].astype(jnp.int32))
    dist = dist.at[:, sl].set(-negd)
    nbrs = nbrs.at[:, sl].set(start_nbrs[sidx].astype(jnp.int32))
    explored = explored.at[:, sl].set(False)

    bpar = pir_state["backup_parity"]

    def step_fn(carry, step_inp):
        (ids, dist, nbrs, explored, pir_carry) = carry
        step_idx, step_key = step_inp

        # 1. frontier pop
        slots, valid = _pop_parallel_batch(dist, explored, parallel)
        explored = jax.vmap(lambda e, s, v: e.at[s].max(v))(
            explored, slots, valid)
        popped = jnp.take_along_axis(
            nbrs, slots[:, :, None], axis=1)            # (Qn, parallel, m)
        rk1, rk2 = jax.random.split(step_key)
        rand_ids = jax.random.randint(
            rk1, (Qn, parallel, m), 0, n, dtype=jnp.int32)
        fid = jnp.where(valid[:, :, None], popped, rand_ids).reshape(F)
        fid = jnp.clip(fid, 0, n - 1)

        # 2. partition routing with FCFS quota (batch-pir.go:178-216)
        pa = fid // psize                                # (F,)
        onehot = (pa[:, None] == jnp.arange(P)[None, :])
        rank = jnp.take_along_axis(
            jnp.cumsum(onehot, axis=0), pa[:, None], axis=1)[:, 0] - 1
        keep = rank < quota
        slot = jnp.where(keep, rank * P + pa, quota * P)  # overflow bin
        local = (fid - pa * psize).astype(jnp.int32)
        buf = jnp.full(quota * P + 1, -1, jnp.int32)
        buf = buf.at[slot].set(jnp.where(keep, local, -1))
        idx_q = buf[: quota * P].reshape(quota, P)

        # 3. PIR protocol rounds — two-phase batched program (_pir_batch)
        # chunk_size is a power of two, so masking random bits is unbiased
        rnd = jax.random.bits(rk2, (quota, P, S), jnp.uint32) % np.uint32(C)

        pir_carry, entries, oks = _pir_batch(
            db, pir_state["table"],
            pir_state["repl_idx"], pir_state["repl_val"], bpar,
            pir_carry, idx_q, rnd,
            C=C, R=R, Hp=Hp, S=S, k=k, max_q=max_q, dpp=dpp)
        entries_flat = jnp.concatenate(
            [entries.reshape(quota * P, Ep),
             jnp.zeros((1, Ep), jnp.uint32)])
        ok_flat = jnp.concatenate(
            [oks.reshape(quota * P), jnp.zeros(1, bool)])
        res = entries_flat[slot]                         # (F, Ep)
        res_ok = ok_flat[slot] & keep

        # 4. decode + visited-table update (search.go:187-207)
        vec = jax.lax.bitcast_convert_type(
            res[:, :dim], jnp.float32)                   # (F, dim)
        nb = res[:, dim : dim + m].astype(jnp.int32)     # (F, m)

        q_of = jnp.repeat(jnp.arange(Qn), parallel * m)
        cdist = jnp.sum(
            (vec - queries[q_of]) ** 2, axis=-1)

        fid_q = fid.reshape(Qn, parallel * m)
        vec_q = vec.reshape(Qn, parallel * m, dim)
        nb_q = nb.reshape(Qn, parallel * m, m)
        d_q = cdist.reshape(Qn, parallel * m)
        ok_q = res_ok.reshape(Qn, parallel * m)

        known = jax.vmap(
            lambda f, i: jnp.any(f[:, None] == i[None, :], axis=1)
        )(fid_q, ids)
        firstocc = jax.vmap(_first_occurrence)(fid_q)
        nonzero = jnp.any(nb_q != 0, axis=2)
        accept = ~known & firstocc & nonzero & ok_q

        base = parallel + step_idx * parallel * m
        write = base + jnp.arange(parallel * m, dtype=jnp.int32)
        wcols = jnp.broadcast_to(write[None, :], (Qn, parallel * m))
        rows = jnp.arange(Qn)[:, None]
        ids = ids.at[rows, wcols].set(jnp.where(accept, fid_q, NEG_ID))
        dist = dist.at[rows, wcols].set(jnp.where(accept, d_q, INF))
        nbrs = nbrs.at[rows, wcols].set(
            jnp.where(accept[:, :, None], nb_q, 0))
        explored = explored.at[rows, wcols].set(~accept)

        return (ids, dist, nbrs, explored, pir_carry), None

    pir_carry = (pir_state["tag"], pir_state["prog"],
                 pir_state["primary_parity"], pir_state["slot_col"],
                 pir_state["hist"], pir_state["finished"])
    keys = jax.random.split(key, max_step)
    steps = jnp.arange(max_step, dtype=jnp.int32)
    (ids, dist, nbrs, explored, pir_carry), _ = jax.lax.scan(
        step_fn, (ids, dist, nbrs, explored, pir_carry), (steps, keys))

    tag, prog, ppar, slot_col, hist, finished = pir_carry
    new_state = dict(pir_state, tag=tag, prog=prog, primary_parity=ppar,
                     slot_col=slot_col, hist=hist, finished=finished)

    negd, slot = jax.lax.top_k(-dist, topk)
    out_ids = jnp.where(
        negd > -INF, jnp.take_along_axis(ids, slot, axis=1), NEG_ID)
    return new_state, out_ids, finished


class FusedPrivateSearch:
    """Host wrapper: fixed-size query groups through the fused program."""

    def __init__(self, engine: DevicePianoEngine, start_ids, start_vecs,
                 start_nbrs, dim: int, m: int, n: int):
        self.engine = engine
        self.dim, self.m, self.n = dim, m, n
        self.start_ids = jnp.asarray(start_ids, jnp.int32)
        self.start_vecs = jnp.asarray(start_vecs, jnp.float32)
        self.start_nbrs = jnp.asarray(start_nbrs, jnp.int32)

    def search(self, queries: np.ndarray, k: int, max_step: int,
               parallel: int, seed: int = 0) -> np.ndarray:
        """-> (Q, k) int64 answer ids (-1 padded)."""
        e = self.engine
        p = e.params
        P = e.config.partition_num
        Qn = queries.shape[0]
        F = Qn * parallel * self.m
        quota = F // P
        if quota < 1:
            raise ValueError("group too small: need Qn*parallel*m >= P")
        need = max_step * quota
        if need > p.max_query_num - 2:
            raise ValueError(
                f"group consumes {need} sub-queries/partition but the budget "
                f"is {p.max_query_num}; use a smaller group/max_step")
        # proactive hint refresh (private-search.go:224-230)
        if e.queries_made_in_partition + need + 10 >= p.max_query_num:
            e.preprocessing()

        new_state, out_ids, finished = _fused_search(
            e.db, e.state, jnp.asarray(queries, jnp.float32),
            self.start_ids, self.start_vecs, self.start_nbrs,
            jax.random.PRNGKey(seed),
            psize=e.config.partition_size, C=p.chunk_size,
            R=p.max_query_per_chunk, Hp=p.primary_hint_num,
            S=p.set_size, k=e.k, max_q=p.max_query_num,
            dpp=DEFAULT_PROGRAM_POINT, dim=self.dim, m=self.m, P=P,
            topk=k, max_step=max_step, parallel=parallel, quota=quota,
            n=self.n)
        e.state = new_state
        # budget bookkeeping mirrors engine.query (batch-pir.go:239-245)
        e.queries_made_in_partition += max_step * quota
        e.finished_batch_num += max_step * (F // e.config.batch_size)
        return np.asarray(out_ids).astype(np.int64)

    def budget_left(self) -> int:
        return self.engine.params.max_query_num \
            - self.engine.queries_made_in_partition
