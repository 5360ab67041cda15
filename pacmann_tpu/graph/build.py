"""Vamana-style constant-degree graph construction, TPU-native.

Replaces the reference's cgo/C++ NGT candidate generation + scalar
robustPrune (/root/reference/graphann/build_graph.go:96-511) with in-house
batched passes:

  1. Candidate generation: NN-descent rounds — each vertex scores its current
     neighbors, sampled neighbors-of-neighbors, sampled reverse edges, and a
     few random vertices with one MXU distance pass per vertex block, keeping
     the closest (the role NGT's 1.5*m search plays at build_graph.go:384).
  2. Robust alpha-prune (DiskANN rule, alpha=1.2): the reference's greedy
     triangle test (build_graph.go:156-223) vectorized — per-vertex candidate
     pairwise-distance tiles + a masked sequential accept loop over the
     (sorted) candidate axis, vmapped over vertices.
  3. Degree regularization, exactly the reference pipeline
     (build_graph.go:414-484): bidirectionalize, keep edge u->v w.p.
     min(1.5m/inbound[v], 1), re-prune if > m, random-fill to exactly m.

Output: (n, m) int32 adjacency, every row exactly m distinct non-self edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ALPHA = 1.2  # build_graph.go:357


def _pad_ids(ids: np.ndarray, block: int) -> np.ndarray:
    """Pad a partial id block to the fixed block length (repeat last id) so
    every device call shares one compiled shape; callers slice [:len(ids)]."""
    if len(ids) == block:
        return ids
    return np.concatenate([ids, np.full(block - len(ids), ids[-1], ids.dtype)])


# ---------------------------------------------------------------------------
# batched candidate scoring


@functools.partial(jax.jit, static_argnames=("m",))
def _score_and_select(vectors, block_ids, cand_ids, m):
    """For each vertex in block: top-m distinct candidates by L2 (no self)."""
    q = vectors[block_ids]                             # (B, d)
    cv = vectors[cand_ids]                             # (B, C, d)
    d = jnp.sum((cv - q[:, None, :]) ** 2, axis=-1)    # (B, C)
    # mask self and duplicates (keep first occurrence)
    C = cand_ids.shape[1]
    eq = cand_ids[:, :, None] == cand_ids[:, None, :]
    lower = jnp.tril(jnp.ones((C, C), bool), k=-1)
    dup = jnp.any(eq & lower, axis=2)
    bad = dup | (cand_ids == block_ids[:, None])
    d = jnp.where(bad, jnp.inf, d)
    negd, idx = jax.lax.top_k(-d, m)
    return jnp.take_along_axis(cand_ids, idx, axis=1), -negd


def _nn_descent_round(vectors_dev, graph: np.ndarray, rng, m: int,
                      n_samples_nbr: int, n_random: int,
                      block: int) -> np.ndarray:
    n, m_cur = graph.shape
    new_graph = np.empty_like(graph)
    # reverse-edge sample: for each directed edge u->v, v gets up to
    # n_samples_nbr random u's as candidates. Vectorized: sort edges by
    # target with a random tiebreak, then take each target group's first
    # n_samples_nbr entries by within-group rank (no per-edge Python loop).
    src = np.repeat(np.arange(n), m_cur)
    dst = graph.reshape(-1)
    order = np.lexsort((rng.random(n * m_cur), dst))
    dst_s, src_s = dst[order], src[order]
    starts = np.searchsorted(dst_s, np.arange(n))
    rank = np.arange(n * m_cur) - starts[dst_s]
    sel = rank < n_samples_nbr
    rev = np.full((n, n_samples_nbr), -1, np.int64)
    rev[dst_s[sel], rank[sel]] = src_s[sel]
    rev[rev < 0] = rng.integers(0, n, size=int(np.sum(rev < 0)))

    for b0 in range(0, n, block):
        ids = np.arange(b0, min(b0 + block, n))
        idp = _pad_ids(ids, min(block, n))
        nbrs = graph[idp]                                        # (B, m)
        # sample neighbors-of-neighbors
        pick = rng.integers(0, m_cur, size=(len(idp), m_cur, n_samples_nbr))
        nn = np.take_along_axis(
            graph[nbrs.reshape(-1)].reshape(len(idp), m_cur, m_cur),
            pick, axis=2,
        ).reshape(len(idp), -1)
        rnd = rng.integers(0, n, size=(len(idp), n_random))
        cand = np.concatenate([nbrs, nn, rev[idp], rnd], axis=1)
        sel, _ = _score_and_select(
            vectors_dev, jnp.asarray(idp), jnp.asarray(cand), m_cur
        )
        new_graph[ids] = np.asarray(sel)[: len(ids)]
    return new_graph


# ---------------------------------------------------------------------------
# vectorized robust prune


@functools.partial(jax.jit, static_argnames=("m",))
def _robust_prune_batch(vectors, u_ids, cand_ids, cand_valid, m):
    """Greedy alpha-accept per vertex (build_graph.go:156-223), vectorized.

    cand_ids: (B, C) candidate ids (padded); cand_valid: (B, C) mask.
    Returns (B, m) accepted ids, -1 padded, plus accept count.
    """
    B, C = cand_ids.shape
    q = vectors[u_ids]                                   # (B, d)
    cv = vectors[cand_ids]                               # (B, C, d)
    d_u = jnp.sum((cv - q[:, None, :]) ** 2, axis=-1)    # dist to u
    d_u = jnp.where(cand_valid, d_u, jnp.inf)
    order = jnp.argsort(d_u, axis=1)                     # ascending
    cand_sorted = jnp.take_along_axis(cand_ids, order, axis=1)
    du_sorted = jnp.take_along_axis(d_u, order, axis=1)
    cv_sorted = jnp.take_along_axis(cv, order[:, :, None], axis=1)
    # pairwise distances among candidates via the MXU dot identity —
    # materializing the (B, C, C, d) difference tensor OOMs at scale
    sq = jnp.sum(cv_sorted * cv_sorted, axis=-1)         # (B, C)
    cross = jnp.einsum("bcd,bed->bce", cv_sorted, cv_sorted,
                       preferred_element_type=jnp.float32)
    pd = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * cross, 0.0)

    def body(i, carry):
        accepted, n_acc = carry                          # (B, C) bool, (B,)
        pd_i = jnp.take(pd, i, axis=2)                   # (B, C)
        du_i = jnp.take(du_sorted, i, axis=1)            # (B,)
        # blocked if any accepted w has alpha*d(w, v_i) < d(u, v_i)
        blocked = jnp.any(accepted & (ALPHA * pd_i < du_i[:, None]), axis=1)
        ok = (~blocked) & (n_acc < m) & jnp.isfinite(du_i)
        accepted = accepted.at[:, i].set(ok)
        return accepted, n_acc + ok.astype(jnp.int32)

    accepted, n_acc = jax.lax.fori_loop(
        0, C, body, (jnp.zeros((B, C), bool), jnp.zeros(B, jnp.int32))
    )

    # backfill from discarded, in distance order (build_graph.go:199-213)
    discarded = (~accepted) & jnp.isfinite(du_sorted)
    need = m - n_acc
    disc_rank = jnp.cumsum(discarded, axis=1) - 1         # rank among discarded
    take_disc = discarded & (disc_rank < need[:, None])
    final = accepted | take_disc

    # compact accepted-first ordering: accepted in distance order, then backfill
    key = jnp.where(accepted, 0, jnp.where(take_disc, 1, 2)) * C \
        + jnp.arange(C)[None, :]
    sel = jnp.argsort(jnp.where(final, key, 3 * C + jnp.arange(C)[None, :]),
                      axis=1)[:, :m]
    out = jnp.take_along_axis(cand_sorted, sel, axis=1)
    cnt = jnp.sum(final, axis=1)
    out = jnp.where(jnp.arange(m)[None, :] < cnt[:, None], out, -1)
    return out, cnt


# ---------------------------------------------------------------------------
# full pipeline


def build_graph(vectors: np.ndarray, m: int, *, rounds: int = 6,
                seed: int = 0, block: int = 8192,
                verbose: bool = False) -> np.ndarray:
    """vectors (n, d) float32 -> graph (n, m) int32."""
    rng = np.random.default_rng(seed)
    vectors = np.asarray(vectors, np.float32)
    n, d = vectors.shape
    vectors_dev = jnp.asarray(vectors)

    # phase 1: NN-descent from a random graph
    graph = rng.integers(0, n, size=(n, m), dtype=np.int64)
    self_rows = graph == np.arange(n)[:, None]
    graph[self_rows] = (graph[self_rows] + 1) % n
    for r in range(rounds):
        graph = _nn_descent_round(
            vectors_dev, graph, rng, m,
            n_samples_nbr=2, n_random=8, block=block,
        ).astype(np.int64)
        if verbose:
            print(f"nn-descent round {r} done")

    # phase 2: candidate pool = 1.5m nearest (self excluded) + robust prune
    cand_size = int(1.5 * m) + m  # current m + extra from a final wide round
    wide = _nn_descent_wide(vectors_dev, graph, rng, cand_size, block)
    pruned = np.empty((n, m), np.int64)
    for b0 in range(0, n, block):
        ids = np.arange(b0, min(b0 + block, n))
        idp = _pad_ids(ids, min(block, n))
        cand = wide[idp]
        valid = cand >= 0
        out, _ = _robust_prune_batch(
            vectors_dev, jnp.asarray(idp), jnp.asarray(np.maximum(cand, 0)),
            jnp.asarray(valid), m,
        )
        pruned[ids] = np.asarray(out)[: len(ids)]

    # phase 3: reference degree regularization (build_graph.go:414-484)
    graph = _degree_regularize(vectors_dev, pruned, m, rng, block, verbose)
    return graph.astype(np.int32)


def _nn_descent_wide(vectors_dev, graph, rng, cand_size, block):
    """One widened scoring round: keep top cand_size as the prune pool."""
    n, m = graph.shape
    out = np.empty((n, cand_size), np.int64)
    for b0 in range(0, n, block):
        ids = np.arange(b0, min(b0 + block, n))
        idp = _pad_ids(ids, min(block, n))
        nbrs = graph[idp]
        nn = graph[nbrs.reshape(-1)].reshape(len(idp), -1)
        rnd = rng.integers(0, n, size=(len(idp), 16))
        cand = np.concatenate([nbrs, nn, rnd], axis=1)
        sel, dist = _score_and_select(
            vectors_dev, jnp.asarray(idp), jnp.asarray(cand), cand_size
        )
        sel = np.asarray(sel).copy()
        sel[~np.isfinite(np.asarray(dist))] = -1  # fewer than cand_size distinct
        out[ids] = sel[: len(ids)]
    return out


def _degree_regularize(vectors_dev, graph: np.ndarray, m: int, rng,
                       block: int, verbose: bool = False) -> np.ndarray:
    n = graph.shape[0]
    valid = graph >= 0

    # bidirectionalize (build_graph.go:414-424): u keeps its out-edges and
    # gains an in-edge from every v it points to.
    src = np.repeat(np.arange(n), m)[valid.reshape(-1)]
    dst = graph.reshape(-1)[valid.reshape(-1)]
    bi_src = np.concatenate([src, dst])
    bi_dst = np.concatenate([dst, src])
    inbound = np.bincount(bi_dst, minlength=n).astype(np.float64)

    # keep edge u->v with prob min(1.5m/inbound[v], 1) (build_graph.go:442-452)
    prob = np.minimum(1.5 * m / np.maximum(inbound[bi_dst], 1.0), 1.0)
    keep = rng.random(bi_src.shape[0]) < prob
    bi_src, bi_dst = bi_src[keep], bi_dst[keep]

    # per-vertex connection lists, fully vectorized: sort (src, dst) pairs,
    # drop duplicate edges and self loops via consecutive-diff masks, then
    # scatter each vertex's survivors by within-group rank
    order = np.lexsort((bi_dst, bi_src))
    bi_src, bi_dst = bi_src[order], bi_dst[order]
    uniq = np.ones(len(bi_src), bool)
    uniq[1:] = (bi_src[1:] != bi_src[:-1]) | (bi_dst[1:] != bi_dst[:-1])
    keep_e = uniq & (bi_src != bi_dst)
    bi_src, bi_dst = bi_src[keep_e], bi_dst[keep_e]
    starts = np.searchsorted(bi_src, np.arange(n))
    rank = np.arange(len(bi_src)) - starts[bi_src]
    counts = np.bincount(bi_src, minlength=n)
    max_c = max(int(counts.max()) if len(counts) else m, m)
    conn = np.full((n, max_c), -1, np.int64)
    conn[bi_src, rank] = bi_dst

    out = np.full((n, m), -1, np.int64)
    over = np.flatnonzero((conn >= 0).sum(1) > m)
    under = np.flatnonzero((conn >= 0).sum(1) <= m)

    # Hub vertices can have thousands of inbound edges; cap the prune pool
    # at the CAP nearest candidates first (the greedy alpha-accept for m
    # slots virtually never reaches past the ~4m closest), otherwise the
    # (B, C, C) pairwise tensors blow up device memory at scale.
    CAP = max(4 * m, 64)
    if conn.shape[1] > CAP and len(over):
        narrowed = np.full((len(over), CAP), -1, np.int64)
        # memory-bounded block size for the (B, max_c, d) gather
        nb = max(256, min(block, (1 << 30) // max(conn.shape[1] * 512, 1)))
        for b0 in range(0, len(over), nb):
            ids = over[b0 : b0 + nb]
            idp = _pad_ids(ids, min(nb, len(over)))
            cand = conn[idp]
            cand = np.where(cand >= 0, cand, idp[:, None])  # self = masked
            sel, dist = _score_and_select(
                vectors_dev, jnp.asarray(idp), jnp.asarray(cand), CAP)
            sel = np.asarray(sel).copy()
            sel[~np.isfinite(np.asarray(dist))] = -1
            narrowed[b0 : b0 + len(ids)] = sel[: len(ids)]
        conn_over = narrowed
    else:
        conn_over = conn[over] if len(over) else conn[:0]

    # over-degree: robust prune down to m (build_graph.go:453-455)
    C_over = conn_over.shape[1] if len(over) else m
    blk = max(256, min(block, n, (1 << 30) // max(C_over * C_over * 4, 1)))
    for b0 in range(0, len(over), blk):
        ids = over[b0 : b0 + blk]
        idp = _pad_ids(ids, min(blk, len(over)))
        cand = conn_over[b0 : b0 + blk]
        if len(cand) < len(idp):
            cand = np.concatenate(
                [cand, np.full((len(idp) - len(cand), cand.shape[1]), -1,
                               np.int64)])
        valid_c = cand >= 0
        res, _ = _robust_prune_batch(
            vectors_dev, jnp.asarray(idp), jnp.asarray(np.maximum(cand, 0)),
            jnp.asarray(valid_c), m,
        )
        out[ids] = np.asarray(res)[: len(ids)]

    out[under, :] = conn[under, :m]

    # random fill to exactly m (build_graph.go:457-475), vectorized:
    # resample empty slots, invalidate self/duplicates, retry (converges in
    # a couple of rounds when n >> m); a scalar fallback mops up stragglers
    need_rows = np.flatnonzero((out >= 0).sum(1) < m)
    if len(need_rows):
        sub = out[need_rows].copy()
        ids_col = need_rows[:, None]
        for _ in range(16):
            miss = sub < 0
            if not miss.any():
                break
            sub[miss] = rng.integers(0, n, size=int(miss.sum()))
            sub[sub == ids_col] = -1
            ordv = np.argsort(sub, axis=1, kind="stable")
            sv = np.take_along_axis(sub, ordv, axis=1)
            dup_s = np.zeros_like(sv, bool)
            dup_s[:, 1:] = (sv[:, 1:] == sv[:, :-1]) & (sv[:, 1:] >= 0)
            dup = np.zeros_like(dup_s)
            np.put_along_axis(dup, ordv, dup_s, axis=1)
            sub[dup] = -1
        out[need_rows] = sub
    for u in np.flatnonzero((out >= 0).sum(1) < m):  # rare stragglers
        have = set(int(x) for x in out[u] if x >= 0)
        while len(have) < m:
            v = int(rng.integers(0, n))
            if v != u:
                have.add(v)
        out[u] = sorted(have)[:m] if len(have) == m else list(have)[:m]

    if verbose:
        inb = np.bincount(out.reshape(-1), minlength=n)
        print(f"Min inbound: {inb.min()}, Max inbound: {inb.max()}")
    return out
