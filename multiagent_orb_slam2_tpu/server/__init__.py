"""Multi-agent server layer: the centralized map-fusion service.

Replaces the fork's novel L6 layer (SURVEY.md §2a): MultiAgentServer
(src/MultiAgentServer.cc), MapFusion (src/MapFusion.cc) and MultiMap
(src/MultiMap.cc). Architectural difference from the reference: all agents'
maps live in ONE shared MapState partitioned by the kf_map/mp_map id columns,
so "moving every KF/MP from the current map into the matched map"
(src/MapFusion.cc:477-493) is a relabel + batched Sim3 correction instead of
pointer surgery, and the stop/release control plane (RequestStopMapping,
src/MultiAgentServer.cc:97-120) vanishes — fusion is a synchronous phase
between tracking steps.
"""
from .server import MultiAgentServer  # noqa: F401
from .multimap import MultiMap  # noqa: F401
