"""Pallas bitsliced AES: circuit correctness via the XLA twin (the
interpret-mode pallas path pays a multi-minute compile, so it is opt-in),
plus the perm-primitive equivalence that makes twin coverage transfer to
the kernel."""

import os

import numpy as np
import jax.numpy as jnp

from pacmann_tpu.ops import aes
from pacmann_tpu.ops.aes_pallas import (
    _perm_concat, _perm_take, masks_to_mask16, prf_tables_bytefirst_xla,
    prf_tables_pallas)
from pacmann_tpu.ops.aes import _SHIFT_ROWS, _ROT1, _ROT2, _ROT3


def test_perm_primitives_equivalent():
    """The kernel's concat-based byte permutation == the twin's gather."""
    rng = np.random.default_rng(1)
    plane = jnp.asarray(
        rng.integers(0, 2**32, size=(16, 8, 128), dtype=np.uint32))
    for perm in (_SHIFT_ROWS, _ROT1, _ROT2, _ROT3):
        assert np.array_equal(np.asarray(_perm_concat(plane, perm)),
                              np.asarray(_perm_take(plane, perm))), perm


def test_masks_to_mask16_roundtrip():
    rng = np.random.default_rng(2)
    keys = [rng.bytes(16) for _ in range(3)]
    masks = np.stack([aes.expand_key_planes(k) for k in keys])
    m16 = np.asarray(masks_to_mask16(jnp.asarray(masks)))
    # bit j of m16[p, r, b] == plane mask bit for byte j
    bits = (masks & 1).astype(np.uint32)
    ref = np.zeros(m16.shape, np.uint32)
    for j in range(16):
        ref |= bits[..., j] << j
    assert np.array_equal(m16, ref)


def test_transpose32_cols_matches_rowmajor():
    """Column-major butterfly == transpose32 on swapped axes (the 100M
    table unpack runs the cols form so the huge axis stays lane-minor)."""
    from pacmann_tpu.ops.bitops import transpose32_cols, transpose32_np

    rng = np.random.default_rng(5)
    a = rng.integers(0, 2**32, size=(3, 32, 17), dtype=np.uint32)
    got = np.asarray(transpose32_cols(jnp.asarray(a)))
    want = transpose32_np(a.swapaxes(-1, -2)).swapaxes(-1, -2)
    assert np.array_equal(got, want)


def test_circuit_twin_matches_host_oracle():
    """The byte-leading circuit (shared verbatim with the Pallas kernel,
    modulo the tested perm primitive) is bit-exact against the
    FIPS-validated host AES oracle on the PRF table lattice."""
    rng = np.random.default_rng(3)
    keys = [rng.bytes(16) for _ in range(2)]
    T, S, cm = 40, 12, 31
    masks = jnp.asarray(np.stack([aes.expand_key_planes(k) for k in keys]))
    out = np.asarray(prf_tables_bytefirst_xla(masks, T, S, cm))
    ref = np.stack([
        np.asarray(aes.prf_offset_table_device(k, T, S, cm)) for k in keys])
    assert np.array_equal(out, ref)


def test_prf_tables_pallas_interpret_slow():
    """Full pallas-call path under the interpreter (opt-in: the interpret
    compile of the 10-round kernel takes minutes on CPU)."""
    if not os.environ.get("PACMANN_SLOW_TESTS"):
        import pytest

        pytest.skip("set PACMANN_SLOW_TESTS=1 to run")
    rng = np.random.default_rng(4)
    keys = [rng.bytes(16) for _ in range(2)]
    T, S, cm = 40, 12, 31
    masks = jnp.asarray(np.stack([aes.expand_key_planes(k) for k in keys]))
    out = np.asarray(prf_tables_pallas(masks, T, S, cm))
    ref = np.stack([
        np.asarray(aes.prf_offset_table_device(k, T, S, cm)) for k in keys])
    assert np.array_equal(out, ref)


def test_prf_tables_multiblock_plumbing():
    """The lattice-blocked table driver (lax.map over ~256 MB input-plane
    blocks, the 100M-tier memory fix) must reproduce the host oracle
    across block seams. Kernel body swapped for the XLA-twin circuit;
    _TABLE_BLOCK_WORDS shrunk so a small lattice spans 3 blocks with a
    padded tail."""
    import jax.numpy as jnp2
    from pacmann_tpu.ops import aes_pallas
    from pacmann_tpu.ops.aes_pallas import (
        _mmo_low32_planes, _perm_take, prf_tables_pallas)

    def twin_blocks(m16, s0, *, ws, interpret):
        _, _, Ls, _ = s0.shape
        P = m16.shape[0]
        outs = []
        for p in range(P):
            blocks = []
            for ib in range(Ls // ws):
                planes = [s0[b, :, ib * ws : (ib + 1) * ws]
                          for b in range(8)]
                o = _mmo_low32_planes(
                    planes, lambda r, b: m16[p, r, b], _perm_take)
                blocks.append(jnp2.stack(o))
            outs.append(jnp2.concatenate(blocks, axis=2))
        return jnp2.stack(outs)

    orig_blocks = aes_pallas._aes_mmo_low32_blocks
    orig_words = aes_pallas._TABLE_BLOCK_WORDS
    aes_pallas._aes_mmo_low32_blocks = twin_blocks
    aes_pallas._TABLE_BLOCK_WORDS = 1024      # 32768 evals per block
    try:
        rng = np.random.default_rng(7)
        keys = [rng.bytes(16) for _ in range(2)]
        masks = jnp.asarray(np.stack(
            [aes.expand_key_planes(k) for k in keys]))
        T, S, cm = 600, 128, 255              # n = 76800 -> 3 blocks
        out = np.asarray(prf_tables_pallas(masks, T, S, cm))
        ref = np.stack([
            np.asarray(aes.prf_offset_table_device(k, T, S, cm))
            for k in keys])
        assert np.array_equal(out, ref)
    finally:
        aes_pallas._aes_mmo_low32_blocks = orig_blocks
        aes_pallas._TABLE_BLOCK_WORDS = orig_words


def test_prf_eval_fused_pallas_plumbing():
    """prf_eval_fused_pallas's packing/padding/unpacking plumbing, with the
    kernel body swapped for the XLA-twin circuit (the kernel's own
    correctness is pinned by test_circuit_twin_matches_host_oracle +
    test_perm_primitives_equivalent). Compared against the validated
    aes.prf_eval_fused."""
    import jax.numpy as jnp2
    from pacmann_tpu.ops import aes_pallas
    from pacmann_tpu.ops.aes_pallas import (
        _mmo_low32_planes, _perm_take, prf_eval_fused_pallas)

    def twin_blocks(m16, s0, *, ws, interpret):
        P, _, _, Ls, _ = s0.shape
        outs = []
        for p in range(P):
            blocks = []
            for ib in range(Ls // ws):
                planes = [s0[p, b, :, ib * ws : (ib + 1) * ws]
                          for b in range(8)]
                o = _mmo_low32_planes(
                    planes, lambda r, b: m16[p, r, b], _perm_take)
                blocks.append(jnp2.stack(o))
            outs.append(jnp2.concatenate(blocks, axis=2))
        return jnp2.stack(outs)

    orig = aes_pallas._aes_mmo_low32_blocks_perp
    aes_pallas._aes_mmo_low32_blocks_perp = twin_blocks
    try:
        rng = np.random.default_rng(5)
        keys = [rng.bytes(16) for _ in range(2)]
        masks = jnp.asarray(np.stack(
            [aes.expand_key_planes(k) for k in keys]))
        P, L0, cm = 2, 100, 63          # L0 % 32 != 0: pad path
        tags = jnp.asarray(
            rng.integers(0, 500, size=(P, L0), dtype=np.uint32))
        xs = jnp.asarray(
            rng.integers(0, 2**20, size=(P, L0), dtype=np.uint32))
        out = np.asarray(prf_eval_fused_pallas(masks, tags, xs, cm))
        ref = np.asarray(aes.prf_eval_fused(masks, tags, xs, cm))
        assert np.array_equal(out, ref)
    finally:
        aes_pallas._aes_mmo_low32_blocks_perp = orig
