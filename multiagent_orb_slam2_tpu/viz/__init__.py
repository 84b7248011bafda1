"""Offline visualization: map renders and frame overlays.

Replaces the reference's L8 Pangolin/OpenGL layer (src/Viewer.cc,
src/FrameDrawer.cc, src/MapDrawer.cc) with offline matplotlib/PNG rendering —
there is no display in the target environment, and a rerun-style offline
visualizer covers the same debugging needs (SURVEY.md §7 stage 9 note).
"""
from .plot import draw_frame, plot_map, plot_trajectories  # noqa: F401
