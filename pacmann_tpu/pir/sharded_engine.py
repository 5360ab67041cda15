"""Multi-chip batch PIR: partition-parallel sharding of the device engine.

Scale tier (SURVEY.md §7 step 9 / BASELINE config 5): the batch-PIR layer's
natural parallel axis is its partitions — each is an independent PianoPIR
with its own sub-DB, keys, hints, and budget (batch-pir.go:62-85). So the
multi-chip engine shards the partition axis of EVERYTHING (DB, tag tables,
parities, replacements, budgets) across a 1-D jax.sharding.Mesh:

    db           (S, P, C*k, 128)   sharded on axis 1
    state leaves (P, ...)           sharded on axis 0
    idx_q        (Q, P)             sharded on axis 1

The online batch runs the SAME `_online_core` as the single-chip engine
under shard_map — every chip serves its own partitions' sub-queries with
ZERO collectives in the hot path (the reference's goroutine-per-partition
parallelism, reborn as SPMD). Only the decoded entries are gathered.

A v5e-8 with 16 partitions holds 2 partitions per chip: a 64 GB SIFT100M
DB fits at 8 GB/chip, and hint generation scales linearly with chips.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P_

from pacmann_tpu.pir.device_engine import DevicePianoEngine, _online_core

AXIS = "shard"


class ShardedPianoEngine(DevicePianoEngine):
    """DevicePianoEngine with the partition axis sharded over a mesh."""

    def __init__(self, db_size: int, entry_bytes: int, batch_size: int,
                 raw: np.ndarray, failure_prob_log2: int, mesh,
                 verbose: bool = False):
        self.mesh = mesh
        n_dev = mesh.shape[AXIS]
        super().__init__(db_size, entry_bytes, batch_size, raw,
                         failure_prob_log2, verbose=verbose)
        P = self.config.partition_num
        assert P % n_dev == 0, (P, n_dev)
        # reshard the DB: (S, P, C*k, 128) split on the partition axis
        self.db = jax.device_put(
            self.db, NamedSharding(mesh, P_(None, AXIS, None, None)))
        self._state_sharding = {
            "table": P_(AXIS, None, None),
            "slot_col": P_(AXIS, None, None),
            "tag": P_(AXIS, None),
            "prog": P_(AXIS, None),
            "primary_parity": P_(AXIS, None, None),
            "backup_parity": P_(AXIS, None, None),
            "hist": P_(AXIS, None),
            "finished": P_(AXIS),
            "repl_idx": P_(AXIS, None, None),
            "repl_val": P_(AXIS, None, None, None),
        }
        self._sharded_step = None

    def _shard_state(self):
        m = self.mesh
        self.state = {
            k: jax.device_put(v, NamedSharding(m, self._state_sharding[k]))
            for k, v in self.state.items()
        }

    def preprocessing(self, rng=None):
        # single-chip prep builds the state (XLA executes it sharded where
        # the inputs are; tables/parities are per-partition anyway), then
        # state is placed with explicit partition-axis shardings
        super().preprocessing(rng=rng)
        self._shard_state()

    def dummy_preprocessing(self, rng=None):
        super().dummy_preprocessing(rng=rng)
        self._shard_state()

    def _make_sharded_step(self, consts):
        mesh = self.mesh
        state_specs = self._state_sharding

        core = functools.partial(_online_core, **consts)
        smapped = jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(P_(None, AXIS, None, None),       # db
                      {k: state_specs[k] for k in state_specs},
                      P_(None, AXIS),                   # idx_q
                      P_(None, AXIS, None)),            # rand_offs
            out_specs=({k: state_specs[k] for k in state_specs},
                       P_(None, AXIS, None),            # entries
                       P_(None, AXIS)),                 # oks
            check_vma=False,
        )
        return jax.jit(smapped, donate_argnums=(1,))

    def _online(self, idx_q, rand_offs):
        """Shard-mapped batch step (overrides the single-chip jit)."""
        from pacmann_tpu.pir.params import DEFAULT_PROGRAM_POINT

        if self._sharded_step is None:
            p = self.params
            self._sharded_step = self._make_sharded_step(dict(
                C=p.chunk_size, R=p.max_query_per_chunk,
                Hp=p.primary_hint_num, S=p.set_size, k=self.k,
                max_q=p.max_query_num, dpp=DEFAULT_PROGRAM_POINT))
        return self._sharded_step(self.db, self.state, idx_q, rand_offs)
