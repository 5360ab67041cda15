"""Host-tier beam search over an abstract vertex oracle.

Faithful functional twin of GraphANNFrontend.SearchKNN
(/root/reference/graphann/search.go:114-245): min-heap frontier keyed by L2
distance, `parallel` pops per round, batched neighbor fetch through the
oracle, dedup via a known-vertices map, random-id padding when the frontier
is empty (fixed access pattern), all-zero-neighbor skip, final answer = k
closest visited. Used for reference-parity tests and as the driver for the
host-orchestrated private path; the vectorized TPU engine lives in beam.py.
"""

from __future__ import annotations

import heapq

import numpy as np


class VertexOracle:
    """GetGraphInfo equivalent (search.go:20-25)."""

    def preprocess(self):  # pragma: no cover - interface
        raise NotImplementedError

    def get_metadata(self) -> tuple[int, int, int]:
        raise NotImplementedError

    def get_vertex_info(self, ids):
        """ids -> (vectors (B, dim) f32, neighbors (B, m) i64)"""
        raise NotImplementedError

    def get_start_vertices(self):
        """-> (ids (s,), vectors (s, dim), neighbors (s, m))"""
        raise NotImplementedError


class BasicGraphOracle(VertexOracle):
    """Plaintext in-memory oracle (BasicGraphInfo, search.go:29-65)."""

    def __init__(self, vectors: np.ndarray, graph: np.ndarray):
        self.vectors = np.asarray(vectors, np.float32)
        self.graph = np.asarray(graph, np.int64)

    def preprocess(self):
        pass

    def get_metadata(self):
        n, dim = self.vectors.shape
        return n, dim, self.graph.shape[1]

    def get_vertex_info(self, ids):
        ids = np.asarray(ids, np.int64)
        return self.vectors[ids], self.graph[ids]

    def get_start_vertices(self):
        n = self.vectors.shape[0]
        s = int(np.sqrt(n))
        ids = np.arange(s)  # first sqrt(n) ids (search.go:51-65)
        return ids, self.vectors[ids], self.graph[ids]


def _l2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = a.astype(np.float32) - b.astype(np.float32)
    return np.sum(d * d, axis=-1)


class BeamSearcher:
    """Frontend holding an oracle + start vertices (search.go:69-81)."""

    def __init__(self, oracle: VertexOracle, rng: np.random.Generator | None = None):
        self.oracle = oracle
        self.rng = rng or np.random.default_rng()
        self.start = None

    def preprocess(self):
        self.oracle.preprocess()
        self.start = self.oracle.get_start_vertices()

    def search_knn(self, query: np.ndarray, k: int, max_step: int,
                   parallel: int, benchmarking: bool = False):
        """-> (ids (k,), reach_steps (k,)); -1 padding (search.go:222-233)."""
        n, dim, m = self.oracle.get_metadata()
        query = np.asarray(query, np.float32)

        known: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # id -> (vec, nbrs)
        dist: dict[int, float] = {}
        reach: dict[int, int] = {}
        frontier: list[tuple[float, int]] = []

        if not benchmarking:
            sids, svecs, snbrs = self.start
            sdist = _l2(svecs, query[None, :])
            order = np.argsort(sdist, kind="stable")
            count = 0
            for j in order:
                if count >= parallel:
                    break
                vid = int(sids[j])
                if vid in known:
                    continue
                known[vid] = (svecs[j], snbrs[j])
                dist[vid] = float(sdist[j])
                reach[vid] = 0
                heapq.heappush(frontier, (float(sdist[j]), vid))
                count += 1

        for step in range(max_step):
            batch: list[int] = []
            for _ in range(parallel):
                if not frontier or benchmarking:
                    batch.extend(
                        int(x) for x in self.rng.integers(0, n, size=m)
                    )
                else:
                    _, v = heapq.heappop(frontier)
                    batch.extend(int(x) for x in known[v][1])

            vecs, nbrs = self.oracle.get_vertex_info(batch)
            if benchmarking:
                continue

            cdist = _l2(vecs, query[None, :])
            for i, vid in enumerate(batch):
                if vid in known:
                    continue
                if not np.any(nbrs[i] != 0):  # all-zero = failed PIR fetch
                    continue
                known[vid] = (vecs[i], nbrs[i])
                dist[vid] = float(cdist[i])
                reach[vid] = step
                heapq.heappush(frontier, (float(cdist[i]), vid))

        ranked = sorted(dist.items(), key=lambda kv: kv[1])
        ids = np.full(k, -1, np.int64)
        steps = np.full(k, -1, np.int64)
        for i in range(min(k, len(ranked))):
            ids[i] = ranked[i][0]
            steps[i] = reach[ranked[i][0]]
        return ids, steps

    def search_knn_batch(self, queries, k, max_step, parallel,
                         benchmarking=False):
        out_ids, out_steps = [], []
        for q in np.asarray(queries, np.float32):
            i, s = self.search_knn(q, k, max_step, parallel, benchmarking)
            out_ids.append(i)
            out_steps.append(s)
        return np.stack(out_ids), np.stack(out_steps)
