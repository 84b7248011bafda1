"""Batched ORB feature extraction: pyramid + FAST + IC-angle + rBRIEF.

TPU-first re-design of the reference ORBextractor (src/ORBextractor.cc):

- 8-level image pyramid (scale 1.2), built with jax.image.resize
  (reference ComputePyramid, src/ORBextractor.cc:1107-1132);
- FAST-9/16 corner scoring as a dense vectorized score map over the whole
  level (reference runs cv::FAST per 30x30 cell with threshold fallback
  20 -> 7, src/ORBextractor.cc:808-816; here the dual threshold is applied
  per cell on one dense score map);
- spatial balancing via per-cell rank keys + global top-K, replacing the
  sequential quadtree DistributeOctTree (src/ORBextractor.cc:539-763) with an
  order-equivalent data-parallel rule: cell-rank-0 candidates (best per cell)
  win over rank-1, ties broken by score — same budget semantics, per-level
  geometric budgets (src/ORBextractor.cc:430-446 -> OrbConfig.level_budgets);
- intensity-centroid orientation over a circular patch (IC_Angle,
  src/ORBextractor.cc:77-104);
- 7x7 sigma=2 Gaussian blur before descriptor sampling (operator(),
  src/ORBextractor.cc:1043-1105);
- 256-bit rotated-BRIEF descriptors, packed as [8] uint32. The point-pair
  pattern is generated from a fixed-seed Gaussian (sigma = patch/5), NOT the
  reference's learned table: this engine builds its own vocabulary, so there
  is no binary-compatibility constraint (reference pattern at
  src/ORBextractor.cc:150-408 is deliberately not copied).

All outputs are fixed-capacity arrays with validity masks; every shape is
static so the whole extractor jits into one XLA program.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OrbConfig
from . import hamming

# 16-point Bresenham circle of radius 3, clockwise from 12 o'clock (dy, dx).
_FAST_RING = np.array(
    [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
     (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    dtype=np.int32,
)
_ARC = 9  # FAST-9: corner needs 9 contiguous ring pixels brighter/darker


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one frame (replaces vector<cv::KeyPoint>)."""
    xy: jnp.ndarray        # [N, 2] float32, level-0 (full-res) pixel coords
    response: jnp.ndarray  # [N] float32 FAST score
    level: jnp.ndarray     # [N] int32 pyramid level
    angle: jnp.ndarray     # [N] float32 radians
    desc: jnp.ndarray      # [N, 8] uint32 packed 256-bit rBRIEF
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Pattern generation (replaces the learned bit_pattern_31_ table)
# ---------------------------------------------------------------------------

@functools.lru_cache()
def brief_pattern(n_bits: int = 256, radius: int = 13, seed: int = 42):
    """Deterministic Gaussian BRIEF point-pair pattern [n_bits, 4] = (x1,y1,x2,y2)."""
    rng = np.random.default_rng(seed)
    sigma = radius / 2.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    pts = np.clip(pts, -radius, radius)
    # cached values must be numpy, not jnp: an lru_cache first populated
    # inside a jit trace would otherwise capture (and leak) a tracer
    return np.asarray(pts, dtype=np.float32)


# ---------------------------------------------------------------------------
# Pyramid + blur
# ---------------------------------------------------------------------------

@functools.lru_cache()
def _gauss_kernel7(sigma: float = 2.0):
    x = np.arange(7) - 3
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return np.asarray(k / k.sum(), dtype=np.float32)  # numpy: see brief_pattern


def gaussian_blur7(img):
    """Separable 7x7 Gaussian, sigma=2 (reference GaussianBlur(..., Size(7,7), 2, 2))."""
    k = _gauss_kernel7()
    pad = jnp.pad(img, ((3, 3), (0, 0)), mode="edge")
    img = jnp.einsum("k,khw->hw", k, jnp.stack([pad[i:i + img.shape[0]] for i in range(7)]))
    pad = jnp.pad(img, ((0, 0), (3, 3)), mode="edge")
    img = jnp.einsum("k,khw->hw", k, jnp.stack([pad[:, i:i + img.shape[1]] for i in range(7)]))
    return img


def pyramid_shapes(h: int, w: int, cfg: OrbConfig):
    return [(max(int(round(h / s)), 64), max(int(round(w / s)), 64))
            for s in cfg.scale_factors]


def build_pyramid(img, cfg: OrbConfig):
    """[H, W] float32 -> list of per-level images (static shapes)."""
    h, w = img.shape
    levels = [img]
    for (lh, lw) in pyramid_shapes(h, w, cfg)[1:]:
        levels.append(jax.image.resize(img, (lh, lw), method="linear"))
    return levels


# ---------------------------------------------------------------------------
# FAST-9/16 dense corner score
# ---------------------------------------------------------------------------

def fast_score(img):
    """Dense FAST-9 corner score map.

    score(p) = max over the 16 length-9 contiguous arcs of
               min_i |ring_i - center| such that the whole arc is brighter
               (or darker) than the center. Equals the classic "max threshold
    for which p remains a corner" definition used by cv::FAST's score.
    """
    h, w = img.shape
    pad = jnp.pad(img, 3, mode="edge")
    ring = jnp.stack([pad[3 + dy:3 + dy + h, 3 + dx:3 + dx + w]
                      for dy, dx in _FAST_RING])          # [16, H, W]
    d = ring - img[None]                                   # brighter: d > t
    d_ext = jnp.concatenate([d, d[:_ARC - 1]], axis=0)     # wraparound arcs
    bright = jnp.full((h, w), jnp.inf, dtype=img.dtype)
    dark = jnp.full((h, w), jnp.inf, dtype=img.dtype)
    score_b = jnp.full((h, w), -jnp.inf, dtype=img.dtype)
    score_d = jnp.full((h, w), -jnp.inf, dtype=img.dtype)
    # sliding window min over 9 contiguous ring offsets, 16 start positions
    for a in range(16):
        arc = d_ext[a:a + _ARC]
        score_b = jnp.maximum(score_b, jnp.min(arc, axis=0))
        score_d = jnp.maximum(score_d, jnp.min(-arc, axis=0))
    del bright, dark
    return jnp.maximum(score_b, score_d)


def _cell_ids(h, w, cell):
    ncx = -(-w // cell)
    cy = jnp.arange(h) // cell
    cx = jnp.arange(w) // cell
    return cy[:, None] * ncx + cx[None, :]


def detect_level(img, budget: int, cfg: OrbConfig, border: int):
    """One pyramid level -> (xy [budget, 2] int32 level coords, score, valid).

    Pipeline: dense FAST score -> per-cell dual threshold (ini 20 else 7,
    reference src/ORBextractor.cc:808-816) -> 3x3 NMS -> global candidate
    top-M -> per-cell rank keys -> top-`budget` selection (spatial balance).
    """
    h, w = img.shape
    score = fast_score(img)

    # border mask (reference EDGE_THRESHOLD=19 minus the FAST radius)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)

    cell = cfg.cell_size
    cid = _cell_ids(h, w, cell)

    # per-cell dual threshold: use ini_th where the cell has any ini-strength
    # corner, else fall back to min_th. Cells are a REGULAR grid, so the
    # per-cell reduction is a block reduce (pad + reshape + any) and the
    # per-pixel broadcast-back is a reshape — the earlier
    # segment_max/gather pair lowered to a scatter-max plus a full-image
    # gather, ~2-4 ms per level per image on TPU (r5 device trace).
    strong = (score > cfg.ini_th_fast) & inb
    hc, wc = -(-h // cell), -(-w // cell)
    sp = jnp.pad(strong, ((0, hc * cell - h), (0, wc * cell - w)))
    blk = jnp.any(sp.reshape(hc, cell, wc, cell), axis=(1, 3))  # [hc, wc]
    blk_th = jnp.where(blk, float(cfg.ini_th_fast), float(cfg.min_th_fast))
    th_map = jnp.broadcast_to(
        blk_th[:, None, :, None], (hc, cell, wc, cell)
    ).reshape(hc * cell, wc * cell)[:h, :w]
    valid_px = (score > th_map) & inb

    # 3x3 non-max suppression
    neg = jnp.where(valid_px, score, -jnp.inf)
    pooled = jax.lax.reduce_window(neg, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                   "SAME")
    is_max = valid_px & (neg >= pooled)

    # global candidate pool (bounded): top-M by raw score. approx_max_k is
    # the TPU-native selection (binned partial reduction) — exact top_k
    # lowers to a full sort of the H*W score map, one multi-ms `while`
    # loop PER LEVEL (the dominant tracking cost in the r4 device trace,
    # tools/PROFILE_FINDINGS.md). NMS already thinned the map, so the
    # approximate selection loses almost nothing at recall_target=0.95.
    m = min(max(4 * budget, 256), h * w)
    flat_score = jnp.where(is_max, score, -jnp.inf).reshape(-1)
    cand_score, cand_idx = jax.lax.approx_max_k(flat_score, m,
                                                recall_target=0.95)
    cand_valid = jnp.isfinite(cand_score)
    cand_cid = cid.reshape(-1)[cand_idx]

    # rank within cell: sort candidates by (cell, -score); rank = pos - first(cell)
    order = jnp.lexsort((-cand_score, cand_cid))
    s_cid = cand_cid[order]
    pos = jnp.arange(m)
    is_new = jnp.concatenate([jnp.array([True]), s_cid[1:] != s_cid[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_new, pos, 0))
    rank_sorted = pos - seg_start
    rank = jnp.zeros(m, jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    # selection key: lower cell-rank first, then higher score
    key = jnp.where(cand_valid,
                    rank.astype(jnp.float32) * 1e6 - cand_score,
                    jnp.inf)
    _, sel = jax.lax.top_k(-key, budget)
    sel_idx = cand_idx[sel]
    sel_score = cand_score[sel]
    sel_valid = jnp.isfinite(-jnp.take_along_axis(key, sel, 0)) & (sel_score > 0)
    xy = jnp.stack([sel_idx % w, sel_idx // w], axis=-1).astype(jnp.int32)
    return xy, sel_score, sel_valid


# ---------------------------------------------------------------------------
# Patch gather + orientation + descriptor
# ---------------------------------------------------------------------------

def extract_patches_rect(img, xy, ry: int, rx: int):
    """Gather (2*ry+1) x (2*rx+1) patches around integer keypoints.
    xy: [N, 2] int32 (x, y) centers.

    One flat gather instead of a vmapped dynamic_slice: per-keypoint
    dynamic slices lower to N serialized update-slice ops on TPU
    (~2 ms per 2048 keypoints EACH, x8 pyramid levels — measured in
    tools/PROFILE_FINDINGS.md 'tracking attribution')."""
    pad = jnp.pad(img, ((ry, ry), (rx, rx)), mode="edge")
    w = pad.shape[1]
    # dynamic_slice semantics clamp the START so the window stays in
    # bounds; clamp identically before the gather
    y0 = jnp.clip(xy[:, 1], 0, pad.shape[0] - (2 * ry + 1))
    x0 = jnp.clip(xy[:, 0], 0, w - (2 * rx + 1))
    oy = jnp.arange(2 * ry + 1, dtype=jnp.int32)
    ox = jnp.arange(2 * rx + 1, dtype=jnp.int32)
    yy = y0[:, None, None] + oy[None, :, None]            # [N, Py, 1]
    xx = x0[:, None, None] + ox[None, None, :]            # [N, 1, Px]
    idx = yy * w + xx                                      # [N, Py, Px]
    return jnp.take(pad.reshape(-1), idx.reshape(-1),
                    mode="clip").reshape(idx.shape)


def extract_patches(img, xy, radius: int):
    """Gather (2r+1)^2 square patches around integer keypoints (see
    extract_patches_rect)."""
    return extract_patches_rect(img, xy, radius, radius)


@functools.lru_cache()
def _circular_mask(patch: int, radius: int):
    c = patch // 2
    y, x = np.mgrid[:patch, :patch]
    m = ((y - c) ** 2 + (x - c) ** 2) <= radius ** 2
    return (np.asarray(m, dtype=np.float32),     # numpy: see brief_pattern
            np.asarray(x - c, dtype=np.float32),
            np.asarray(y - c, dtype=np.float32))


def ic_angle(patches, radius: int):
    """Intensity-centroid orientation (reference IC_Angle,
    src/ORBextractor.cc:77-104): angle = atan2(m01, m10) over a circular patch."""
    mask, xrel, yrel = _circular_mask(patches.shape[-1], radius)
    m10 = jnp.sum(patches * xrel * mask, axis=(-2, -1))
    m01 = jnp.sum(patches * yrel * mask, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _bilinear(patches, yx):
    """Sample patches [N, P, P] at float coords yx [N, S, 2] (y, x)."""
    p = patches.shape[-1]
    y = jnp.clip(yx[..., 0], 0.0, p - 1.001)
    x = jnp.clip(yx[..., 1], 0.0, p - 1.001)
    y0, x0 = jnp.floor(y).astype(jnp.int32), jnp.floor(x).astype(jnp.int32)
    fy, fx = y - y0, x - x0
    flat = patches.reshape(patches.shape[0], -1)

    # one fused gather for all four bilinear corners: four separate
    # take_along_axis calls cost ~1.1 ms EACH per level per image on TPU
    # (mostly fixed gather overhead, r5 device trace); concatenating the
    # index sets makes it one op with identical values
    base = y0 * p + x0
    idx4 = jnp.concatenate([base, base + 1, base + p, base + p + 1], axis=-1)
    v4 = jnp.take_along_axis(flat, idx4, axis=-1)
    v00, v01, v10, v11 = jnp.split(v4, 4, axis=-1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def brief_descriptors(patches, angles, pattern=None):
    """Rotated-BRIEF: rotate the pattern by each keypoint's angle, sample
    bilinearly from the blurred patch, compare pairs, pack to [N, 8] uint32.
    (reference computeOrbDescriptor src/ORBextractor.cc:108-147, with our own
    pattern — see module docstring.)"""
    if pattern is None:
        pattern = brief_pattern()
    c = patches.shape[-1] // 2
    ca, sa = jnp.cos(angles), jnp.sin(angles)         # [N]
    # pattern points: [256, 2] each for p1, p2 (x, y)
    p1 = pattern[:, :2]
    p2 = pattern[:, 2:]

    def rot(p):  # [256, 2] -> [N, 256, 2] (y, x) patch coords
        x = p[None, :, 0] * ca[:, None] - p[None, :, 1] * sa[:, None]
        y = p[None, :, 0] * sa[:, None] + p[None, :, 1] * ca[:, None]
        return jnp.stack([y + c, x + c], axis=-1)

    v1 = _bilinear(patches, rot(p1))
    v2 = _bilinear(patches, rot(p2))
    bits = (v1 < v2).astype(jnp.uint32)               # [N, 256]
    return hamming.pack_bits(bits)


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def extract(img, cfg: OrbConfig) -> Keypoints:
    """Full ORB extraction on one grayscale image [H, W] float32 (0..255).

    Returns a fixed-capacity Keypoints with sum(level_budgets) slots
    (reference ORBextractor::operator(), src/ORBextractor.cc:1043-1105).
    """
    levels = build_pyramid(img, cfg)
    budgets = cfg.level_budgets
    scales = cfg.scale_factors
    border = cfg.patch_radius + 1

    outs = []
    for lvl, (limg, budget, scale) in enumerate(zip(levels, budgets, scales)):
        if budget <= 0:
            continue
        xy, score, valid = detect_level(limg, budget, cfg, border)
        blurred = gaussian_blur7(limg)
        patches = extract_patches(blurred, xy, cfg.patch_radius)
        ang = ic_angle(patches, cfg.angle_radius)
        desc = brief_descriptors(patches, ang)
        outs.append(Keypoints(
            xy=(xy.astype(jnp.float32) * scale),
            response=score,
            level=jnp.full((budget,), lvl, jnp.int32),
            angle=ang,
            desc=desc,
            valid=valid,
        ))
    return Keypoints(*[jnp.concatenate([o[i] for o in outs]) for i in range(6)])


def pad_keypoints(kp: Keypoints, capacity: int) -> Keypoints:
    """Pad/truncate a Keypoints set to a fixed capacity (map-state slots)."""
    n = kp.xy.shape[0]
    if n == capacity:
        return kp

    def fix(a):
        if a.shape[0] >= capacity:
            return a[:capacity]
        pad = [(0, capacity - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad)

    return Keypoints(*[fix(a) for a in kp])
