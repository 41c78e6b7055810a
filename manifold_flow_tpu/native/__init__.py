"""Native (C++) host-side runtime components.

The device compute path is JAX/XLA/Pallas; the host-side runtime around it —
mesh-topology preprocessing that runs once per surface — is C++ for large
subdivided meshes. Build happens lazily on first use (g++, cached by source
mtime); every consumer falls back to the pure-Python implementation when no
compiler is available, so the package works everywhere.
"""

from manifold_flow_tpu.native.bindings import (
    available,
    build_topology,
)

__all__ = ["available", "build_topology"]
