"""Keyframe database: loop / relocalization / covisibility candidate queries.

Replaces KeyFrameDatabase (reference src/KeyFrameDatabase.cc). The inverted
index becomes two dense device arrays maintained alongside MapState:

- bow:      [K, W] float32 L1-normalized tf-idf rows
- presence: [K, W] bool word occupancy

Each query is a handful of masked reductions over [K] instead of an
inverted-file walk; the covisibility-group accumulation uses the dense covis
matrix directly. The reference's DetectCovisibilityCandidates bug
(mCovisScore accumulated but never assigned, src/KeyFrameDatabase.cc:275 —
SURVEY.md §2d) is deliberately not replicated: scores here are always
assigned before accumulation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bow as bow_mod
from .bow import Vocabulary


class KFDatabase(NamedTuple):
    bow: jnp.ndarray        # [K, W] tf-idf rows (zero rows = absent)
    presence: jnp.ndarray   # [K, W] bool
    active: jnp.ndarray     # [K] bool — registered keyframes


def empty_database(max_kf: int, vocab: Vocabulary) -> KFDatabase:
    W = vocab.n_words
    return KFDatabase(bow=jnp.zeros((max_kf, W), jnp.float32),
                      presence=jnp.zeros((max_kf, W), bool),
                      active=jnp.zeros(max_kf, bool))


@jax.jit
def add_keyframe(db: KFDatabase, vocab: Vocabulary, kf_slot, desc, valid):
    """Insert a keyframe's descriptors (KeyFrameDatabase::add)."""
    words = bow_mod.transform_words(vocab, desc, valid)
    v = bow_mod.bow_vector(vocab, words, valid)
    W = vocab.n_words
    pres = jnp.zeros((W + 1,), bool).at[
        jnp.where(words >= 0, words, W)].set(True)[:W]
    return db._replace(bow=db.bow.at[kf_slot].set(v),
                       presence=db.presence.at[kf_slot].set(pres),
                       active=db.active.at[kf_slot].set(True)), words, v


def erase_keyframe(db: KFDatabase, kf_slot):
    return db._replace(bow=db.bow.at[kf_slot].set(0.0),
                       presence=db.presence.at[kf_slot].set(False),
                       active=db.active.at[kf_slot].set(False))


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
    common = bow_mod.common_words(query_words, query_valid, db.presence)
    eligible = db.active & ~exclude & (common > 0)
    max_common = jnp.max(jnp.where(eligible, common, 0))
    min_common = (min_common_rel * max_common).astype(common.dtype)
    scores = bow_mod.l1_score(query_bow, db.bow)
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
