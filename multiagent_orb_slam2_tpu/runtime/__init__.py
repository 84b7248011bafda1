"""Per-agent SLAM runtime: tracking, local mapping, keyframe management.

Replaces the reference's thread-per-subsystem L5 runtime
(src/{Tracking,LocalMapping,System}.cc) with phase-structured execution: each
pipeline stage (track / insert-KF / local-BA) is a pure jitted step over the
shared MapState, sequenced by a thin host orchestrator. The stop/release
mutex control plane of the reference (SURVEY.md §2g) has no equivalent —
phases cannot race by construction.
"""
