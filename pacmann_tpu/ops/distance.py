"""Batched L2 / inner-product distance kernels.

TPU-native replacement for the reference's SIMD assembly:
  L2DistanceSIMD (AVX2, 8 floats/iter)  -> MXU-tiled (Q,B) distance kernel
      /root/reference/graphann/l2_distance_amd64.s:4-36, build_graph.go:106-121
  InnerProduct (AVX-512 u32 dot)        -> int32 matmul (linear-scan baseline)
      l2_distance_amd64.s:39-68, graphann_test.go:221-284

Instead of one scalar distance per call, everything is batched: beam search
evaluates a (Q, B) tile of query x candidate distances in one MXU pass using
||q - c||^2 = ||q||^2 + ||c||^2 - 2 q.c. A Pallas kernel covers the tiled
HBM-resident case; the XLA path (identical math) is used off-TPU and for
small shapes where kernel launch overhead dominates.

f32 accumulation matches the Go implementation's float32 arithmetic.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pacmann_tpu.utils.platform import default_interpret


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad2(a, rows: int, cols: int):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


# ---------------------------------------------------------------------------
# XLA path


@jax.jit
def l2_distance_xla(queries, points):
    """(Q, D) x (B, D) -> (Q, B) squared L2 distances, f32."""
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)
    qn = jnp.sum(queries * queries, axis=-1, keepdims=True)      # (Q, 1)
    pn = jnp.sum(points * points, axis=-1, keepdims=True).T      # (1, B)
    cross = jax.lax.dot_general(
        queries,
        points,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # match the reference's exact f32
    )
    return jnp.maximum(qn + pn - 2.0 * cross, 0.0)


@jax.jit
def inner_product_xla(a, b):
    """(Q, D) x (B, D) -> (Q, B) dot products, int32 (wraps mod 2^32 like the
    reference's uint32 accumulation)."""
    return jax.lax.dot_general(
        a.astype(jnp.int32),
        b.astype(jnp.int32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


# ---------------------------------------------------------------------------
# Pallas kernel


def _l2_kernel(q_ref, p_ref, out_ref):
    q = q_ref[:]
    p = p_ref[:]
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    pn = jnp.sum(p * p, axis=1, keepdims=True)
    cross = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = jnp.maximum(qn + pn.T - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_b", "interpret"))
def _l2_pallas_padded(queries, points, tile_q, tile_b, interpret):
    Q, D = queries.shape
    B = points.shape[0]
    grid = (Q // tile_q, B // tile_b)
    return pl.pallas_call(
        _l2_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_b), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(queries, points)


def l2_distance_pallas(queries, points, tile_q=256, tile_b=512, interpret=None):
    """Tiled Pallas L2: pads to tile/lane multiples, then strips the padding."""
    if interpret is None:
        interpret = default_interpret()
    queries = jnp.asarray(queries, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    Q, D = queries.shape
    B = points.shape[0]
    tq = min(tile_q, _round_up(Q, 8))
    tb = min(tile_b, _round_up(B, 128))
    Dp = _round_up(D, 128)
    qp = _pad2(queries, _round_up(Q, tq), Dp)
    pp = _pad2(points, _round_up(B, tb), Dp)
    out = _l2_pallas_padded(qp, pp, tq, tb, interpret)
    return out[:Q, :B]


def l2_distance(queries, points, use_pallas: bool | None = None):
    """Public entry: (Q, D) queries x (B, D) points -> (Q, B) squared L2."""
    if use_pallas is None:
        use_pallas = False  # XLA path already MXU-tiled; pallas opt-in for perf runs
    if use_pallas:
        return l2_distance_pallas(queries, points)
    return l2_distance_xla(queries, points)


def l2_distance_single(v1, v2):
    """Scalar twin of the reference's L2Dist (build_graph.go:106-114)."""
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    d = v1 - v2
    return jnp.sum(d * d)
