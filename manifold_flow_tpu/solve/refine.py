"""Mixed-precision iterative refinement for the batched velocity solve.

The reference solves each frame exactly with SuperLU in float64
(utils/compute_optical_flow.py:143-147). On TPU the fast path is float32
(MXU/VPU native); plain f32 PCG stalls at a normalized error around
cond(A) * eps_f32 ~ 1e-3 on the ill-conditioned a1 + lambda a2 systems.
Classic fix: iterate

    r = f - A x          (high precision)
    d = PCG_f32(A, r)    (float32 — hundreds of matvecs at full speed)
    x = x + d            (high-precision accumulate)

which converges to direct-solver accuracy as long as cond(A) << 1/eps_f32.

The high-precision pieces use compensated two-float32 arithmetic
(fem.df_operator / kernels.df32) — native-f32 VPU kernels, ~2^-48 effective
precision — instead of XLA's ~20x-slower float64 emulation; only the initial
input splits touch f64. Requires x64 mode for the f64 inputs/outputs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from manifold_flow_tpu.fem.df_operator import make_df_operator
from manifold_flow_tpu.fem.operator import FlowOperator, block_jacobi_inverse
from manifold_flow_tpu.kernels import df32
from manifold_flow_tpu.solve.cg import solve_cg


class RefineResult(NamedTuple):
    x: jnp.ndarray           # (T, 2N) float64 solution
    iterations: jnp.ndarray  # () int32 — total inner CG iterations
    residual: jnp.ndarray    # (T,) final |f - A x|
    converged: jnp.ndarray   # (T,) bool
    # numpy (not jnp) default: a concrete device array evaluated at class
    # creation would initialize the XLA backend at import time, breaking
    # jax.distributed.initialize ordering for multi-host runs.
    outer_steps: jnp.ndarray = np.int32(0)  # () refinement steps executed


@partial(jax.jit, static_argnames=("lambda_", "max_iter", "refine_steps",
                                   "coarse_a1"))
def solve_refined(mesh, potentials: jnp.ndarray, times: jnp.ndarray,
                  lambda_: float = 0.01, tol: float = 1e-8,
                  inner_tol: float = 1e-5, max_iter: int = 2000,
                  refine_steps: int = 8,
                  potentials_next: jnp.ndarray | None = None,
                  coarse_tables=None, coarse_a1: str = "full") -> RefineResult:
    """Solve (a1_k + lambda a2) x_k = f_k for all frames to f64-grade accuracy.

    Args:
      mesh: TriMesh built in float64.
      potentials: (T, N) float64 movie.
      times: (T,) float64 frame times.
      tol: outer relative residual target |f - A x| / |f|.
      inner_tol: relative tolerance of each float32 PCG correction solve.
      max_iter: per-inner-solve iteration cap (static).
      refine_steps: outer iteration cap (static); the loop exits as soon as
        every frame passes `tol`.
    """
    if potentials.dtype != jnp.float64:
        raise ValueError(
            f"solve_refined needs float64 inputs (enable x64); got "
            f"{potentials.dtype}")
    op_df, f_df = make_df_operator(mesh, potentials, times, lambda_,
                                   potentials_next=potentials_next)
    return refine_loop(mesh, op_df, f_df, tol=tol, inner_tol=inner_tol,
                       max_iter=max_iter, refine_steps=refine_steps,
                       coarse_tables=coarse_tables, coarse_a1=coarse_a1)


def refine_loop(mesh, op_df, f_df, tol: float = 1e-8,
                inner_tol: float = 1e-5, max_iter: int = 2000,
                refine_steps: int = 8, coarse_tables=None,
                coarse_a1: str = "full") -> RefineResult:
    """The refinement iteration given a prebuilt DF operator + RHS.

    Factored out so parallel.partition can run it inside a shard_map with
    the frame axis sharded (frames are independent systems — each shard
    iterates until its own frames converge)."""
    # Float32 operator + block-Jacobi preconditioner for the inner solves:
    # the hi components ARE the rounded-to-f32 operator.
    op32 = FlowOperator(
        dof=op_df.dof, blocks2=op_df.blocks2.hi, g=op_df.g.hi,
        w_scale=op_df.w_scale.hi, lambda_=op_df.lambda_.hi,
        gather_base=op_df.gather_base, n_dof=op_df.n_dof)
    if coarse_tables is not None:
        from manifold_flow_tpu.solve.coarse import make_two_level

        pre32 = make_two_level(mesh, op32.g, op32.lambda_, coarse_tables,
                               a1_mode=coarse_a1)
    else:
        pre32 = block_jacobi_inverse(mesh, op32.g, op32.lambda_)

    fnorm = jnp.linalg.norm(f_df.hi, axis=-1)
    target = (tol * jnp.maximum(fnorm, jnp.finfo(jnp.float32).tiny)
              ).astype(jnp.float32)

    def cond(state):
        _, r, _, step = state
        rn = jnp.linalg.norm(r.hi, axis=-1)
        return (step < refine_steps) & jnp.any(rn > target)

    def body(state):
        x, r, total_iters, step = state
        inner = solve_cg(op32, r.hi, precond=pre32, tol=inner_tol,
                         max_iter=max_iter)
        x = df32.add(x, df32.from_f32(inner.x))
        r = op_df.residual(f_df, x)
        return x, r, total_iters + inner.iterations, step + 1

    zero = df32.DF(jnp.zeros_like(f_df.hi), jnp.zeros_like(f_df.hi))
    x, r, total_iters, steps = jax.lax.while_loop(
        cond, body, (zero, f_df, jnp.int32(0), jnp.int32(0)))

    rn = jnp.linalg.norm(df32.to_f64(r), axis=-1)
    return RefineResult(x=df32.to_f64(x), iterations=total_iters, residual=rn,
                        converged=rn <= target.astype(jnp.float64),
                        outer_steps=steps)
