"""Bag-of-binary-words place recognition on TPU.

Replaces DBoW2 (reference Thirdparty/DBoW2, ORBVocabulary typedef
include/ORBVocabulary.h:31) and KeyFrameDatabase (src/KeyFrameDatabase.cc).
The vocabulary is a k-ary tree of binary centroids stored as flat arrays;
descriptor->word transform is L levels of batched Hamming argmin; keyframe
scores are dense L1 similarities computed as one masked matrix product
against the whole database — the inverted file becomes a dense score matrix
with the reference's common-word and covisibility-accumulation rules applied
as masks (SURVEY.md §7 stage 5).

The reference's ORBvoc.txt (10^6 words trained on independent imagery) is a
missing blob in the snapshot; vocabularies here are trained with the same
hierarchical binary k-medians algorithm on sample descriptors, at
configurable branching/depth.
"""
from .bow import Vocabulary, train_vocabulary  # noqa: F401
