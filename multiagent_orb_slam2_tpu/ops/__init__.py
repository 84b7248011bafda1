"""Feature front-end kernels: pyramid, FAST, rBRIEF, Hamming matching, stereo.

TPU-first replacement for the reference's L2 front-end (src/ORBextractor.cc,
src/ORBmatcher.cc, src/Frame.cc). Everything is fixed-shape and batched:
keypoint sets are capacity-padded arrays with validity masks, and all 12
ORBmatcher entry points reduce to masked candidate generation + batched packed
Hamming argmin.
"""
