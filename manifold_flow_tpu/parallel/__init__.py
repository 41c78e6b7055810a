"""Multi-device parallelism over a ('frames', 'mesh') device mesh.

The reference's only parallelism is a single-host multiprocessing.Pool over
frames (utils/compute_optical_flow.py:152-194, SURVEY.md §2 P1). Here:

  * 'frames' axis — pure data parallelism: frames are independent linear
    systems; zero communication.
  * 'mesh' axis — the FEM triangle set is partitioned across devices; each
    matvec computes local triangle contributions and combines them with one
    `psum` over the axis (replicated-vector / partitioned-elements SpMD).
    ICI-friendly: the psum payload is the (T_local, 2N) DOF block.
"""

from manifold_flow_tpu.parallel.partition import (
    make_device_mesh,
    sharded_compute_velocity_fields,
)

__all__ = ["make_device_mesh", "sharded_compute_velocity_fields"]
