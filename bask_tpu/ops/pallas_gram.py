"""Pallas TPU kernel: fused masked Matern/RBF gram construction.

The per-walker gram build is one of the two hot ops of the MCMC loop
(the other being the batched Cholesky). The XLA path materializes several
(B, n, n) intermediates (squared distances, scaled distance, polynomial,
exponential, mask products) through HBM; this kernel computes each
(walker, tile_i, tile_j) block entirely in VMEM:

    load X_i (T, d), X_j (T, d), walker theta row
    d2    = |x|^2 + |y|^2 - 2 x y^T          (MXU dot, f32)
    K     = amplitude * matern_nu(d2)         (VPU transcendentals)
    K     = mask-fused: zero padded rows/cols, unit padded diagonal,
            alpha/noise added on the real diagonal

so HBM traffic is one write of the output block and tiny reads.

Only the canonical BO kernel structure is fused —
``Constant * (Matern|RBF) [+ White]`` (the default kernel family,
reference ``bask/utils.py:127-151``); anything else falls back to the
generic kernel-tree evaluation. Structure matching happens at trace time
(:func:`match_fusable`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels as bk

__all__ = [
    "match_fusable",
    "fused_masked_gram_batch",
    "fused_masked_gram_lower_batch",
    "FusedSpec",
]

# Lower-triangle-only gram ("symmetric-half", VERDICT r2 #5). The fused
# gram's only consumer in the chain is the batched Cholesky, whose HLO
# semantics read ONLY the lower triangle — so the strictly-upper tiles
# need never be computed. The lower variant uses square 128-tiles with a
# pl.when skip: upper tiles are written as zeros (no distance matmul,
# no transcendentals), lower tiles are bit-identical to the full
# kernel's values. Requires n_pad % 128 == 0 (Mosaic square-tile minor
# dim); other buckets stay on the full row-strip kernel. The default is
# chosen by hardware measurement — see BASELINE.md "symmetric-half
# gram" — because square tiles pay more per-program overhead than the
# 256-row strips (the reason strips won in round 2).
LOWER_GRAM = "off"
_SQ_TILE = 128

# Preferred row-strip height. Each grid program computes a full
# (rows x n_pad) strip: the minor block dimension equals the array
# dimension, which Mosaic accepts for ANY n_pad (a square tile's minor
# dim must be a 128-multiple, which 192/320/576-style buckets fail).
# Fewer, fatter programs also amortize per-program overhead: 256-row
# strips measure 33%+ faster than the old 128x128 square tiles at the
# (50, 512, 512) hot shape (benchmarks/bench_gram_tile.py).
_TILE = 256


def _pick_tile(n_pad: int) -> int:
    # VMEM budget: the (tile x n_pad) f32 output strip is double-
    # buffered, so its block must stay well under half of the ~16 MB
    # VMEM. Cap it at ~4 MB — at n_pad=8192 that shrinks the strip to
    # 128 rows (256-row strips OOMed scoped vmem: 2 x 8 MB + inputs).
    # At n_pad=16384 even the 64-row strip OOMs (measured 18.95 MB:
    # the distance-matmul temps live alongside the double-buffered
    # output), so very large rows drop to 32 (Mosaic min sublane is 8).
    if n_pad >= 16384:
        return 32
    max_tile = max(64, (4 * 1024 * 1024 // (4 * n_pad)) // 64 * 64)
    for t in (_TILE, 256, 128, 64):
        if t <= _TILE and t <= max_tile and n_pad % t == 0:
            return t
    return 64


def _pack_params(spec: "FusedSpec", thetas, B: int, d: int):
    """Pre-exponentiate per-walker params into one packed row
    [amp, noise, 1/ls...] so kernel bodies do fixed-offset vector reads.
    Shared by the full-strip and lower-triangle kernels."""
    off = 1 if spec.has_const else 0
    amp = (
        jnp.exp(thetas[:, 0]) if spec.has_const else jnp.ones(B, thetas.dtype)
    )
    noise = (
        jnp.exp(thetas[:, off + spec.n_ls])
        if spec.has_white
        else jnp.zeros(B, thetas.dtype)
    )
    inv_ls = jnp.exp(-thetas[:, off : off + spec.n_ls])
    if spec.n_ls == 1:
        inv_ls = jnp.broadcast_to(inv_ls, (B, d))
    return jnp.concatenate(
        [amp[:, None], noise[:, None], inv_ls], axis=1
    ).astype(jnp.float32)[:, None, :]  # (B, 1, d+2)


def _tile_values(spec, params_row, xi, xj, alpha_rows, n_real, rows, cols):
    """One masked gram tile: distance matmul + Matern/RBF transcendental
    + mask/diagonal fusion. Shared verbatim by both kernels — the
    lower-triangle variant's bit-parity contract ('lower tiles identical
    to the full kernel') rides on this single implementation."""
    amp = params_row[0]
    noise = params_row[1]
    inv_ls = params_row[2:]

    Xi = xi * inv_ls[None, :]
    Xj = xj * inv_ls[None, :]
    d2 = (
        jnp.sum(Xi * Xi, axis=1)[:, None]
        + jnp.sum(Xj * Xj, axis=1)[None, :]
        - 2.0
        * jax.lax.dot_general(
            Xi,
            Xj,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    )
    d2 = jnp.maximum(d2, 0.0)
    if spec.nu == math.inf:
        K = jnp.exp(-0.5 * d2)
    else:
        r = jnp.sqrt(d2 + 1e-36)
        if spec.nu == 0.5:
            K = jnp.exp(-r)
        elif spec.nu == 1.5:
            s = math.sqrt(3.0) * r
            K = (1.0 + s) * jnp.exp(-s)
        else:
            s = math.sqrt(5.0) * r
            K = (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    K = amp * K

    real = (rows < n_real) & (cols < n_real)
    diag = rows == cols
    K = jnp.where(real, K, 0.0)
    diag_val = K + noise + alpha_rows[:, None]
    K = jnp.where(diag & real, diag_val, K)
    K = jnp.where(diag & ~real, 1.0, K)
    return K


class FusedSpec(NamedTuple):
    """Trace-time description of a fusable kernel tree."""

    nu: float  # 0.5 / 1.5 / 2.5 / inf (inf = RBF)
    n_ls: int  # number of lengthscales (1 = isotropic)
    has_const: bool  # leading ConstantKernel amplitude param
    has_white: bool  # trailing WhiteKernel noise param


def match_fusable(kernel) -> Optional[FusedSpec]:
    """Match ``Constant * (Matern|RBF) [+ White]`` (free params only)."""
    base = kernel
    has_white = False
    # NB: Product subclasses Sum in the kernel algebra; use exact type.
    if type(base) is bk.Sum:
        if not (
            isinstance(base.k2, bk.WhiteKernel) and base.k2.n_theta == 1
        ):
            return None
        has_white = True
        base = base.k1
    has_const = False
    if type(base) is bk.Product:
        if not (
            isinstance(base.k1, bk.ConstantKernel) and base.k1.n_theta == 1
        ):
            return None
        has_const = True
        base = base.k2
    if not isinstance(base, bk.RBF) or base.n_theta == 0:
        return None
    nu = base.nu if isinstance(base, bk.Matern) else math.inf
    if nu not in (0.5, 1.5, 2.5, math.inf):
        return None
    return FusedSpec(
        nu=nu, n_ls=base.n_theta, has_const=has_const, has_white=has_white
    )


@partial(jax.jit, static_argnames=("spec",))
def fused_masked_gram_batch(spec: FusedSpec, thetas, X, alpha_diag, n_real):
    """Masked grams for a batch of walkers: (B, n_pad, n_pad).

    ``thetas``: (B, n_theta) log-params in the fused layout
    ``X``: (n_pad, d) shared inputs or (B, n_pad, d) per-walker inputs
    (the warped case); ``alpha_diag``: (n_pad,) real-point jitter;
    ``n_real``: scalar int (number of unpadded points).

    The per-walker parameters are pre-exponentiated on the host side of
    the kernel into one packed row  [amp, noise, 1/ls...]  so the kernel
    body does only fixed-offset vector reads.
    """
    B, _ = thetas.shape
    if X.ndim == 2:
        X = jnp.broadcast_to(X[None], (B,) + X.shape)
    _, n_pad, d = X.shape
    tile = _pick_tile(n_pad)
    assert n_pad % tile == 0, f"n_pad={n_pad} not a multiple of {tile}"
    tiles = n_pad // tile

    packed = _pack_params(spec, thetas, B, d)
    n_real_arr = jnp.asarray(n_real, dtype=jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, tiles),
        in_specs=[
            # (B, 1, d+2) packed params with a (1, 1, d+2) block: the
            # trailing two block dims equal the array dims, satisfying
            # the TPU tiling rule for the ragged parameter axis.
            pl.BlockSpec(
                (1, 1, d + 2),
                lambda b, i, n: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # row strip of queried points
            pl.BlockSpec(
                (1, tile, d),
                lambda b, i, n: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            # ALL points (the strip's columns span the whole gram row)
            pl.BlockSpec(
                (1, n_pad, d),
                lambda b, i, n: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # alpha as (n_pad, 1): a (T, 1) block keeps Mosaic's layout
            # rules happy where 1-D dynamic slices cannot be aligned
            pl.BlockSpec(
                (tile, 1), lambda b, i, n: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, n_pad),
            lambda b, i, n: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def body(n_ref, theta_ref, x_ref, y_ref, alpha_ref, out_ref):
        _gram_tile(spec, n_ref, theta_ref, x_ref, y_ref, alpha_ref, out_ref)

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, n_pad), jnp.float32),
        grid_spec=grid_spec,
    )(n_real_arr, packed, X, X, alpha_diag[:, None])


@partial(jax.jit, static_argnames=("spec",))
def fused_masked_gram_lower_batch(spec: FusedSpec, thetas, X, alpha_diag, n_real):
    """Masked grams, LOWER triangle only: (B, n_pad, n_pad).

    Strictly-upper 128-tiles are zeros; the lower triangle (including
    the full diagonal tiles' lower halves... the diagonal tiles are
    computed in full) carries exactly the values of
    :func:`fused_masked_gram_batch`. Safe wherever the consumer is a
    Cholesky factorization (XLA reads the lower triangle only).
    """
    B, _ = thetas.shape
    if X.ndim == 2:
        X = jnp.broadcast_to(X[None], (B,) + X.shape)
    _, n_pad, d = X.shape
    tile = _SQ_TILE
    assert n_pad % tile == 0, f"n_pad={n_pad} not a multiple of {tile}"
    tiles = n_pad // tile

    packed = _pack_params(spec, thetas, B, d)
    n_real_arr = jnp.asarray(n_real, dtype=jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, tiles, tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, d + 2),
                lambda b, i, j, n: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, d),
                lambda b, i, j, n: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, d),
                lambda b, i, j, n: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 1),
                lambda b, i, j, n: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile),
            lambda b, i, j, n: (b, i, j),
            memory_space=pltpu.VMEM,
        ),
    )

    def body(n_ref, theta_ref, x_ref, y_ref, alpha_ref, out_ref):
        _gram_tile_lower(
            spec, n_ref, theta_ref, x_ref, y_ref, alpha_ref, out_ref
        )

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, n_pad), jnp.float32),
        grid_spec=grid_spec,
    )(n_real_arr, packed, X, X, alpha_diag[:, None])


def _gram_tile_lower(spec, n_ref, params_ref, x_ref, y_ref, alpha_ref, out_ref):
    i = pl.program_id(1)
    j = pl.program_id(2)
    T, C = out_ref.shape[1], out_ref.shape[2]

    @pl.when(j > i)
    def _skip():
        out_ref[0, :, :] = jnp.zeros((T, C), jnp.float32)

    @pl.when(j <= i)
    def _compute():
        rows = i * T + jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
        cols = j * C + jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
        out_ref[0, :, :] = _tile_values(
            spec,
            params_ref[0, 0, :],
            x_ref[0, :, :],
            y_ref[0, :, :],
            alpha_ref[:, 0],
            n_ref[0],
            rows,
            cols,
        )


def _gram_tile(spec, n_ref, params_ref, x_ref, y_ref, alpha_ref, out_ref):
    i = pl.program_id(1)
    T, C = out_ref.shape[1], out_ref.shape[2]  # strip rows x all cols
    rows = i * T + jax.lax.broadcasted_iota(jnp.int32, (T, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    out_ref[0, :, :] = _tile_values(
        spec,
        params_ref[0, 0, :],
        x_ref[0, :, :],
        y_ref[0, :, :],
        alpha_ref[:, 0],
        n_ref[0],
        rows,
        cols,
    )
