"""Performance kernels: two-float32 compensated arithmetic (kernels.df32)
and, as they land, Pallas TPU kernels for the FEM hot path."""

from manifold_flow_tpu.kernels import df32

__all__ = ["df32"]
