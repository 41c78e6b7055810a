"""Mixed-precision iterative refinement for the batched velocity solve.

The reference solves each frame exactly with SuperLU in float64
(utils/compute_optical_flow.py:143-147). On TPU the fast path is float32
(MXU/VPU native); plain f32 PCG stalls at a normalized error around
cond(A) * eps_f32 ~ 1e-3 on the ill-conditioned a1 + lambda a2 systems.
Classic fix: iterate

    r = f - A x          (float64 — software-emulated on TPU, but only
                          refine_steps matvecs, a tiny fraction of the work)
    d = PCG_f32(A, r)    (float32 — hundreds of matvecs at full speed)
    x = x + d            (float64 accumulate)

which converges to ~cond(A) * eps_f64 as long as cond(A) << 1/eps_f32.
Requires x64 mode (jax.config.update("jax_enable_x64", True)).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manifold_flow_tpu.fem.operator import FlowOperator, block_jacobi_inverse
from manifold_flow_tpu.solve.cg import solve_cg


class RefineResult(NamedTuple):
    x: jnp.ndarray           # (T, 2N) float64 solution
    iterations: jnp.ndarray  # () int32 — total inner CG iterations
    residual: jnp.ndarray    # (T,) final |f - A x| in float64
    converged: jnp.ndarray   # (T,) bool


def _cast_operator(op: FlowOperator, dtype) -> FlowOperator:
    return dataclasses.replace(
        op,
        blocks2=op.blocks2.astype(dtype),
        g=op.g.astype(dtype),
        w_scale=op.w_scale.astype(dtype),
        lambda_=op.lambda_.astype(dtype),
    )


def solve_refined(mesh, op64: FlowOperator, f64: jnp.ndarray,
                  tol: float = 1e-8, inner_tol: float = 1e-5,
                  max_iter: int = 2000, refine_steps: int = 8
                  ) -> RefineResult:
    """Solve A x = f to float64 accuracy using float32 inner PCG solves.

    Args:
      mesh: TriMesh (for preconditioner assembly).
      op64: FlowOperator built in float64.
      f64: (T, 2N) float64 right-hand sides.
      tol: outer relative residual target |f - A x| / |f|.
      inner_tol: relative tolerance of each float32 PCG correction solve.
      max_iter: per-inner-solve iteration cap (static).
      refine_steps: number of refinement iterations (static).
    """
    if f64.dtype != jnp.float64:
        raise ValueError(
            f"solve_refined needs float64 inputs (enable x64); got {f64.dtype}")
    op32 = _cast_operator(op64, jnp.float32)
    # Preconditioner quality only affects inner-CG iteration count, not the
    # refined solution, so assemble it entirely in f32 (the (T, N, 2, 2)
    # diag-block build is a large share of emulated-f64 assembly time).
    pre32 = block_jacobi_inverse(mesh, op32.g, op32.lambda_)

    fnorm = jnp.linalg.norm(f64, axis=-1)
    target = tol * jnp.maximum(fnorm, jnp.finfo(jnp.float64).tiny)

    def cond(state):
        _, r, _, step = state
        rn = jnp.linalg.norm(r, axis=-1)
        return (step < refine_steps) & jnp.any(rn > target)

    def body(state):
        x, r, total_iters, step = state
        inner = solve_cg(op32, r.astype(jnp.float32), precond=pre32,
                         tol=inner_tol, max_iter=max_iter)
        x = x + inner.x.astype(jnp.float64)
        r = f64 - op64.matvec(x)
        return x, r, total_iters + inner.iterations, step + 1

    x, r, total_iters, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros_like(f64), f64, jnp.int32(0), jnp.int32(0)))

    rn = jnp.linalg.norm(r, axis=-1)
    return RefineResult(x=x, iterations=total_iters, residual=rn,
                        converged=rn <= target)
