"""Visualization (C19): matplotlib field/streamline/mode plots + GIF
animation, with optional interactive PyVista passthrough (viz.fields)."""

from manifold_flow_tpu.viz.fields import (
    animate_velocity_fields,
    load_pial_surfaces,
    plot_spatial_modes,
    plot_streamlines,
    plot_temporal_modes,
    plot_velocity_frame,
)

__all__ = ["animate_velocity_fields", "load_pial_surfaces",
           "plot_spatial_modes", "plot_streamlines",
           "plot_temporal_modes", "plot_velocity_frame"]
