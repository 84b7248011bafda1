"""Keyframe database: loop / relocalization / covisibility candidate queries.

Replaces KeyFrameDatabase (reference src/KeyFrameDatabase.cc). The inverted
index becomes a SPARSE per-keyframe word table maintained alongside MapState:

- words: [K, M] int32   unique word ids of each keyframe (-1 padded)
- wts:   [K, M] float32 L1-normalized tf-idf weight per unique word
- active:[K] bool       registered keyframes

with M = the per-frame feature capacity (a frame can contribute at most one
unique word per feature). Queries scatter the QUERY once into a dense [W]
vector, then gather it at every row's word ids — O(K*M) work and memory
regardless of vocabulary size. The earlier dense [K, W] design collided
head-on with real vocabularies: at the reference's 10^6 words
(Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:241) it would need GBs per
replica, while this form is ~8 bytes per (keyframe, word) occurrence.

L1 scoring uses the min-form identity: for L1-normalized non-negative
vectors, 1 - 0.5*|v - w|_1 == sum_i min(v_i, w_i) — the same quantity DBoW2
accumulates over the sparse intersection (TemplatedVocabulary.h:162).

The reference's DetectCovisibilityCandidates bug (mCovisScore accumulated
but never assigned, src/KeyFrameDatabase.cc:275 — SURVEY.md §2d) is
deliberately not replicated: scores here are always assigned before
accumulation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bow as bow_mod
from .bow import Vocabulary


class KFDatabase(NamedTuple):
    words: jnp.ndarray      # [K, M] int32 unique word ids (-1 = empty slot)
    wts: jnp.ndarray        # [K, M] float32 tf-idf weights (L1-normalized row)
    active: jnp.ndarray     # [K] bool — registered keyframes


def empty_database(max_kf: int, vocab: Vocabulary,
                   max_words_per_kf: int = 1024) -> KFDatabase:
    M = max_words_per_kf
    return KFDatabase(words=jnp.full((max_kf, M), -1, jnp.int32),
                      wts=jnp.zeros((max_kf, M), jnp.float32),
                      active=jnp.zeros(max_kf, bool))


@jax.jit
def add_keyframe(db: KFDatabase, vocab: Vocabulary, kf_slot, desc, valid):
    """Insert a keyframe's descriptors (KeyFrameDatabase::add).

    Returns (db, words [F] per-feature word ids, dense tf-idf vector [W]) —
    callers reuse the dense query vector for their own Detect* query."""
    words = bow_mod.transform_words(vocab, desc, valid)
    v = bow_mod.bow_vector(vocab, words, valid)          # dense [W]
    M = db.words.shape[1]
    F = words.shape[0]
    W = vocab.n_words
    # unique word ids of this frame, padded to M with -1
    ws = jnp.sort(jnp.where(valid & (words >= 0), words, W))     # [F]
    first = jnp.concatenate([jnp.ones(1, bool), ws[1:] != ws[:-1]]) & (ws < W)
    # rank of each first-occurrence among firsts -> compact to M slots
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    row_w = jnp.full((M,), -1, jnp.int32).at[
        jnp.where(first & (rank < M), rank, M)].set(
            jnp.where(first, ws, -1), mode="drop")
    row_wt = jnp.where(row_w >= 0, v[jnp.clip(row_w, 0, W - 1)], 0.0)
    return db._replace(words=db.words.at[kf_slot].set(row_w),
                       wts=db.wts.at[kf_slot].set(row_wt),
                       active=db.active.at[kf_slot].set(True)), words, v


def erase_keyframe(db: KFDatabase, kf_slot):
    return db._replace(words=db.words.at[kf_slot].set(-1),
                       wts=db.wts.at[kf_slot].set(0.0),
                       active=db.active.at[kf_slot].set(False))


def _query_dense(query_words, query_valid, query_bow):
    """Dense [W+1] presence/weight views of the query (one scatter each).

    Slot W is the shared sentinel for BOTH invalid query features and db-row
    padding; it must stay False/0 — an earlier version scattered the invalid
    features' True into it, which made every padded db entry count as a
    common word (~460 phantom common words per query at F=1024/M~560,
    silently disabling the 0.8*max common-word gate and flooding loop and
    fusion detection with candidates)."""
    W = query_bow.shape[0]
    w_safe = jnp.where(query_valid & (query_words >= 0), query_words, W)
    q_pres = jnp.zeros((W + 1,), bool).at[w_safe].set(True).at[W].set(False)
    q_wt = jnp.concatenate([query_bow, jnp.zeros(1, query_bow.dtype)])
    return q_pres, q_wt


@jax.jit
def score_and_common(db: KFDatabase, query_words, query_valid, query_bow):
    """(scores [K], common-word counts [K]) of the query against every row:
    the reference's inverted-file walk (src/KeyFrameDatabase.cc:84-117)
    reduced to one gather over the sparse word table."""
    q_pres, q_wt = _query_dense(query_words, query_valid, query_bow)
    W = query_bow.shape[0]
    idx = jnp.where(db.words >= 0, db.words, W)              # [K, M]
    hit = q_pres[idx]                                        # [K, M]
    common = jnp.sum(hit, axis=-1).astype(jnp.int32)
    scores = jnp.sum(jnp.minimum(q_wt[idx], db.wts) * hit, axis=-1)
    return scores, common


def score_kfs(db: KFDatabase, query_bow, rows):
    """L1 similarity of the query against selected rows [R] (the minScore
    scan over the query's covisible keyframes, src/LoopClosing.cc:153-173)."""
    W = query_bow.shape[0]
    q_wt = jnp.concatenate([query_bow, jnp.zeros(1, query_bow.dtype)])
    idx = jnp.where(db.words[rows] >= 0, db.words[rows], W)  # [R, M]
    return jnp.sum(jnp.minimum(q_wt[idx], db.wts[rows])
                   * (db.words[rows] >= 0), axis=-1)


def _grouped_candidates(scores, cand, covis, top_covis: int = 10,
                        rel_acc: float = 0.75):
    """Covisibility-group accumulation (src/KeyFrameDatabase.cc:137-177):
    each candidate's score is accumulated over its top-10 covisible
    neighbors that are also candidates; groups below 0.75x the best
    accumulated score are dropped; the best member of each surviving group
    is returned."""
    K = scores.shape[0]
    # group members: each candidate's top-10 covisible neighbors that are
    # themselves candidates
    w = jnp.where(cand[None, :], covis, 0)
    topw, topi = jax.lax.top_k(w, min(top_covis, K))  # [K, <=10]
    member_ok = topw > 0
    acc = jnp.where(cand,
                    scores + jnp.sum(jnp.where(member_ok, scores[topi], 0.0),
                                     axis=-1), 0.0)
    best_acc = jnp.max(acc)
    group_pass = cand & (acc >= rel_acc * best_acc) & (best_acc > 0)
    # best-scoring member of each group (reference pBestKF)
    member_scores = jnp.where(member_ok, scores[topi], -jnp.inf)
    best_member_score = jnp.max(member_scores, axis=-1)
    best_kf = jnp.where(scores >= best_member_score, jnp.arange(K),
                        topi[jnp.arange(K), jnp.argmax(member_scores, -1)])
    return jnp.zeros(K, bool).at[
        jnp.where(group_pass, best_kf, K)].set(True, mode="drop")


@functools.partial(jax.jit, static_argnames=("min_common_rel",))
def detect_candidates(db: KFDatabase, query_words, query_valid, query_bow,
                      exclude, covis, min_score=None,
                      min_common_rel: float = 0.8):
    """Shared query core for the three Detect* entry points.

    exclude: [K] bool — KFs never returned (the query's covisibility set for
    loop detection, the supplied set for covisibility discovery, empty for
    relocalization).
    Returns (candidate_mask [K], scores [K]).
    """
    scores, common = score_and_common(db, query_words, query_valid, query_bow)
    eligible = db.active & ~exclude & (common > 0)
    max_common = jnp.max(jnp.where(eligible, common, 0))
    min_common = (min_common_rel * max_common).astype(common.dtype)
    cand = eligible & (common > min_common)
    if min_score is not None:
        cand &= scores >= min_score
    cand = _grouped_candidates(scores, cand, covis)
    return cand, scores


def detect_loop_candidates(db, vocab, query_words, query_valid, query_bow,
                           query_covis_row, query_slot, covis, min_score):
    """DetectLoopCandidates (src/KeyFrameDatabase.cc:76-197): exclude the
    query itself and its covisibility neighborhood; require score>=minScore
    (minScore = lowest score against directly covisible KFs, computed by the
    caller as in src/LoopClosing.cc:153-173)."""
    exclude = (query_covis_row > 0)
    exclude = exclude.at[query_slot].set(True)
    return detect_candidates(db, query_words, query_valid, query_bow,
                             exclude, covis, min_score=min_score)


def detect_reloc_candidates(db, query_words, query_valid, query_bow, covis):
    """DetectRelocalizationCandidates (src/KeyFrameDatabase.cc:310-421):
    same pipeline, no exclusion, no minScore gate."""
    K = db.active.shape[0]
    return detect_candidates(db, query_words, query_valid, query_bow,
                             jnp.zeros(K, bool), covis)


def detect_covisibility_candidates(db, query_words, query_valid, query_bow,
                                   ignore_mask, covis):
    """DetectCovisibilityCandidates (fork addition,
    src/KeyFrameDatabase.cc:199-308): like loop detection but the caller
    supplies the ignore set (the KFs moved during map fusion)."""
    return detect_candidates(db, query_words, query_valid, query_bow,
                             ignore_mask, covis)
