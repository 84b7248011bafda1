"""Struct-of-arrays map state: keyframes, map points, observations, covisibility.

Replaces the reference's L3 pointer-graph data model (src/{Map,MapPoint,
KeyFrame,KeyFrameDatabase}.cc) with fixed-capacity arrays + validity masks so
every map operation is a pure jitted function. One MapState can hold several
logical maps (kf_map_id / mp_map_id), which is how the multi-agent server's
MultiMap registry is represented before fusion.
"""
from .state import MapState, empty_map_state  # noqa: F401
