"""Bundle adjustment with explicit Schur-complement point marginalization.

Replaces Optimizer::BundleAdjustment / GlobalBundleAdjustemnt [sic] /
LocalBundleAdjustment (reference src/Optimizer.cc:41-239, :455-783), which
build g2o graphs with marginalized point vertices (setMarginalized(true),
src/Optimizer.cc:100) and run sparse-Cholesky LM.

TPU formulation: observations are stored grouped by point, [P, M] with
M = max observations per point — exactly the layout Schur reduction wants.
One LM iteration is:

  1. batched residuals + analytic Jacobians over all observations      (VPU)
  2. point blocks Hpp [P,3,3] inverted in parallel (batched 3x3)       (VPU)
  3. pose blocks + Schur cross terms W Hpp^-1 W^T scatter-added into a
     dense block matrix S [K,6,K,6] via segment_sum over P-chunks      (MXU)
  4. dense Cholesky solve of the reduced camera system                 (MXU)
  5. point back-substitution, LM accept/reject with true robust cost

No dynamic sparsity: fixed poses keep their observation contributions (they
constrain points) but get identity rows in S, so their update is zero —
the reference's setFixed semantics. The whole solver jits to one program;
problem size is static (capacity-padded), validity is carried in masks.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics
from . import residuals as res


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem, observations grouped by point."""
    q: jnp.ndarray            # [K, 4] world-to-camera rotations
    t: jnp.ndarray            # [K, 3]
    pose_valid: jnp.ndarray   # [K] bool
    pose_fixed: jnp.ndarray   # [K] bool (gauge anchors / boundary poses)
    pw: jnp.ndarray           # [P, 3] world points
    point_valid: jnp.ndarray  # [P] bool
    obs_kf: jnp.ndarray       # [P, M] int32 observing pose index (-1 invalid)
    obs_uvr: jnp.ndarray      # [P, M, 3] (u, v, u_right)
    obs_inv_sigma2: jnp.ndarray  # [P, M]
    obs_stereo: jnp.ndarray   # [P, M] bool
    obs_mask: jnp.ndarray     # [P, M] bool


class BAResult(NamedTuple):
    q: jnp.ndarray
    t: jnp.ndarray
    pw: jnp.ndarray
    cost: jnp.ndarray         # final robust cost
    obs_chi2: jnp.ndarray     # [P, M] final per-observation chi2
    n_iters: jnp.ndarray
    band_ov: jnp.ndarray = None  # banded path: out-of-band point count


def _obs_terms(prob: BAProblem, q, t, pw, cam, delta2_m, delta2_s, use_huber):
    """Residuals, Jacobians and IRLS weights for every observation slot."""
    kf = jnp.clip(prob.obs_kf, 0, q.shape[0] - 1)
    qk = q[kf]                              # [P, M, 4]
    tk = t[kf]
    pw_b = jnp.broadcast_to(pw[:, None, :], prob.obs_uvr.shape)
    r, pc = res.project_residual(cam, qk, tk, pw_b, prob.obs_uvr,
                                 prob.obs_stereo)
    Jc, Jp, _ = res.jacobians(cam, qk, tk, pw_b, prob.obs_stereo)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_stereo, delta2_s, delta2_m)
    active = (prob.obs_mask & (prob.obs_kf >= 0)
              & prob.point_valid[:, None] & (pc[..., 2] > 0.01))
    if use_huber:
        w_rob = res.huber_weight(chi2, delta2)
        delta = jnp.sqrt(delta2)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta2)
    else:
        w_rob = jnp.ones_like(chi2)
        rho = chi2
    w = prob.obs_inv_sigma2 * w_rob * active
    cost = jnp.sum(rho * active)
    return r, Jc, Jp, w, chi2, cost


def _cost_only(prob, q, t, pw, cam, delta2_m, delta2_s, use_huber):
    _, _, _, _, _, cost = _obs_terms(prob, q, t, pw, cam, delta2_m, delta2_s,
                                     use_huber)
    return cost


def _build_and_solve(prob: BAProblem, q, t, pw, cam, lam, delta2_m, delta2_s,
                     use_huber, chunk: int):
    """One damped normal-equation build + Schur solve. Returns (dq/dt, dpw)."""
    K = q.shape[0]
    P, M = prob.obs_kf.shape
    r, Jc, Jp, w, chi2, cost0 = _obs_terms(prob, q, t, pw, cam, delta2_m,
                                           delta2_s, use_huber)

    # --- per-point blocks -------------------------------------------------
    Hpp = jnp.einsum("pmij,pmik,pm->pjk", Jp, Jp, w)        # [P, 3, 3]
    bp = -jnp.einsum("pmij,pmi,pm->pj", Jp, r, w)           # [P, 3]
    diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_d = Hpp.at[..., jnp.arange(3), jnp.arange(3)].add(lam * diag + 1e-8)
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    # --- Schur + pose-block assembly as one-hot MXU matmuls ---------------
    # TPU scatters serialize, so instead of segment_sum over (k1, k2) block
    # ids the cross term is factorized: with O the per-observation one-hot
    # keyframe assignment,  S_cross[k1,k2] = sum_p sum_m U[p,k1,:,m] V[p,k2,:,m]
    # where U = O^T Y and V = O^T Wb per point — pure matrix products.
    Wb = jnp.einsum("pmij,pmik,pm->pmjk", Jc, Jp, w)        # [P, M, 6, 3]
    Y = jnp.einsum("pmjk,pkl->pmjl", Wb, Hpp_inv)           # [P, M, 6, 3]

    hi = jax.lax.Precision.HIGHEST
    n_chunks = max(P // chunk, 1)
    kf_all = jnp.where(prob.obs_kf >= 0, prob.obs_kf, K)

    Wb_c = Wb.reshape(n_chunks, -1, M, 6, 3)
    Y_c = Y.reshape(n_chunks, -1, M, 6, 3)
    bp_c = bp.reshape(n_chunks, -1, 3)
    kf_c = kf_all.reshape(n_chunks, -1, M)
    Jc_c = Jc.reshape(n_chunks, -1, M, 3, 6)
    r_c = r.reshape(n_chunks, -1, M, 3)
    w_c = w.reshape(n_chunks, -1, M)

    KK = K + 1

    def chunk_body(carry, inp):
        S_acc, rhs_acc, Hcc_acc, bc_acc = carry
        Wb_i, Y_i, bp_i, kf_i, Jc_i, r_i, w_i = inp
        c = kf_i.shape[0]
        E = c * M
        Of = jax.nn.one_hot(kf_i.reshape(E), KK, dtype=Wb_i.dtype)  # [E, KK]

        # pose diagonal blocks + gradient: single [KK, E] @ [E, 36] matmuls
        Hcc_terms = jnp.einsum("caij,caik,ca->cajk", Jc_i, Jc_i,
                               w_i).reshape(E, 36)
        bc_terms = -jnp.einsum("caij,cai,ca->caj", Jc_i, r_i,
                               w_i).reshape(E, 6)
        Hcc_acc = Hcc_acc + jax.lax.dot_general(
            Of, Hcc_terms, (((0,), (0,)), ((), ())), precision=hi)
        bc_acc = bc_acc + jax.lax.dot_general(
            Of, bc_terms, (((0,), (0,)), ((), ())), precision=hi)

        # factorized Schur cross blocks:
        #   U[c,k,(i,m)] = O_c^T Y_c  (batched [KK,M] @ [M,18] matmul)
        O3 = Of.reshape(c, M, KK)
        U = jax.lax.dot_general(O3, Y_i.reshape(c, M, 18),
                                (((1,), (1,)), ((0,), (0,))), precision=hi)
        V = jax.lax.dot_general(O3, Wb_i.reshape(c, M, 18),
                                (((1,), (1,)), ((0,), (0,))), precision=hi)
        #   S[(k1,i),(k2,j)] += sum_{c,m} U[c,m',(k1,i)] V[c,m',(k2,j)]
        #   as ONE [6KK, 3c] @ [3c, 6KK] matmul
        U2 = U.reshape(c, KK, 6, 3).transpose(0, 3, 1, 2).reshape(
            c * 3, KK * 6)
        V2 = V.reshape(c, KK, 6, 3).transpose(0, 3, 1, 2).reshape(
            c * 3, KK * 6)
        S_acc = S_acc + jax.lax.dot_general(
            U2, V2, (((0,), (0,)), ((), ())), precision=hi)

        # Schur rhs: [KK, E] @ [E, 6]
        Ybp = jnp.einsum("cajk,ck->caj", Y_i, bp_i).reshape(E, 6)
        rhs_acc = rhs_acc + jax.lax.dot_general(
            Of, Ybp, (((0,), (0,)), ((), ())), precision=hi)
        return (S_acc, rhs_acc, Hcc_acc, bc_acc), None

    S0 = jnp.zeros((KK * 6, KK * 6))
    rhs0 = jnp.zeros((KK, 6))
    Hcc0 = jnp.zeros((KK, 36))
    (S_flat, rhs_p, Hcc_p, bc_p), _ = jax.lax.scan(
        chunk_body, (S0, rhs0, Hcc0, rhs0),
        (Wb_c, Y_c, bp_c, kf_c, Jc_c, r_c, w_c))
    Hcc = Hcc_p[:K].reshape(K, 6, 6)
    bc = bc_p[:K]

    # S_flat rows/cols are (k, i) blocks -> [KK, 6, KK, 6] -> [K, K, 6, 6]
    S_blocks = S_flat.reshape(KK, 6, KK, 6).transpose(0, 2, 1, 3)
    S = -S_blocks[:K, :K]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
    # LM damping on the pose-block diagonal entries
    hcc_diag = jnp.diagonal(Hcc, axis1=-2, axis2=-1)          # [K, 6]
    S = S.at[jnp.arange(K)[:, None], jnp.arange(K)[:, None],
             jnp.arange(6)[None, :], jnp.arange(6)[None, :]].add(
                 lam * hcc_diag + 1e-8)
    rhs = bc - rhs_p[:K]

    # --- fixed / invalid poses: identity rows, zero rhs -------------------
    free = prob.pose_valid & ~prob.pose_fixed                 # [K]
    S = jnp.where(free[:, None, None, None] & free[None, :, None, None], S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6))
    rhs = jnp.where(free[:, None], rhs, 0.0)

    # --- dense reduced solve ---------------------------------------------
    S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    dc = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S_dense + 1e-8 * jnp.eye(6 * K)),
        rhs.reshape(-1)).reshape(K, 6)
    dc = jnp.where(free[:, None], dc, 0.0)

    # --- point back-substitution ------------------------------------------
    kf_safe = jnp.clip(prob.obs_kf, 0, K - 1)
    dc_obs = dc[kf_safe]                                      # [P, M, 6]
    corr = jnp.einsum("pmjk,pmj->pk", Wb, dc_obs)             # [P, 3]
    dp = jnp.einsum("pkl,pl->pk", Hpp_inv, bp - corr)
    has_obs = jnp.any(prob.obs_mask & (prob.obs_kf >= 0), axis=-1)
    dp = jnp.where((prob.point_valid & has_obs)[:, None], dp, 0.0)
    return dc, dp, cost0, chi2


@functools.partial(jax.jit,
                   static_argnames=("cam", "n_iters", "use_huber", "chunk"))
def ba_solve(prob: BAProblem, cam: Intrinsics, n_iters: int = 10,
             use_huber: bool = True, chi2_mono: float = 5.991,
             chi2_stereo: float = 7.815, chunk: int = 2048) -> BAResult:
    """Levenberg-Marquardt BA (reference 10-iteration GBA / 5+10 local BA)."""

    def body(_, carry):
        q, t, pw, lam = carry
        dc, dp, cost0, _ = _build_and_solve(prob, q, t, pw, cam, lam,
                                            chi2_mono, chi2_stereo,
                                            use_huber, chunk)
        dq, dt = se3.se3_exp(dc)
        q_new, t_new = se3.compose(dq, dt, q, t)
        q_new = se3.quat_normalize(q_new)
        pw_new = pw + dp
        cost1 = _cost_only(prob, q_new, t_new, pw_new, cam, chi2_mono,
                           chi2_stereo, use_huber)
        accept = cost1 < cost0
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        pw = jnp.where(accept, pw_new, pw)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-8, 1e4)
        return q, t, pw, lam

    q, t, pw, _ = jax.lax.fori_loop(
        0, n_iters, body,
        (prob.q, prob.t, prob.pw, jnp.asarray(1e-4)))

    # final per-observation chi2 (for outlier erasure, reference
    # src/Optimizer.cc:718-740)
    _, _, _, _, chi2, cost = _obs_terms(prob, q, t, pw, cam, chi2_mono,
                                        chi2_stereo, use_huber)
    return BAResult(q=q, t=t, pw=pw, cost=cost, obs_chi2=chi2,
                    n_iters=jnp.asarray(n_iters))


def outlier_mask(result: BAResult, prob: BAProblem,
                 chi2_mono: float = 5.991, chi2_stereo: float = 7.815):
    """Post-BA observation culling mask (reference erases edges with
    chi2 > threshold or negative depth, src/Optimizer.cc:718-762)."""
    th = jnp.where(prob.obs_stereo, chi2_stereo, chi2_mono)
    return prob.obs_mask & (result.obs_chi2 <= th)


# ===========================================================================
# TPU-tuned fast path (E-major layout + MXU assembly + PCG) — see ba_kernels
# ===========================================================================

from . import ba_kernels as bk  # noqa: E402


def _prepare_e(prob: BAProblem):
    K = prob.q.shape[0]
    P, M = prob.obs_kf.shape
    E = P * M
    kf_e = jnp.clip(prob.obs_kf, 0, K - 1).reshape(E)
    active = (prob.obs_mask & (prob.obs_kf >= 0)
              & prob.point_valid[:, None]).reshape(E).astype(jnp.float32)
    obs_uvr_t = prob.obs_uvr.transpose(2, 0, 1).reshape(3, E)
    inv_sigma2_e = prob.obs_inv_sigma2.reshape(E)
    stereo_e = prob.obs_stereo.reshape(E)
    return kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e


def _full_chunk(carry, kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i, KK, cp, M):
    """One full-width (KK one-hot) assembly chunk: the round-2 MXU scheme.

    kf_i [ce] already maps inactive observations to the trash row K.
    Accumulates (S_flat [6KK,6KK] in (a,k)-major layout, rhs [6,KK],
    Hcc [36,KK], bc [6,KK]).
    """
    S_acc, rhs_acc, Hcc_acc, bc_acc = carry
    Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.float32)   # [ce, KK]
    Hcc_acc = Hcc_acc + jax.lax.dot_general(
        Ht_i, Of, (((1,), (0,)), ((), ())))
    bc_acc = bc_acc + jax.lax.dot_general(
        bt_i, Of, (((1,), (0,)), ((), ())))
    rhs_acc = rhs_acc + jax.lax.dot_general(
        Ybp_i, Of, (((1,), (0,)), ((), ())))
    # per-point factorized cross term:
    #   U[p, (mu,a), k] = sum_m Of[p*M+m, k] * Y[a, mu, p, m]
    # built in (mu, a) order so the post-matmul reshape to
    # [(p, mu), (a, k)] rows/cols is a free view (transposing the small
    # [cp, 18, M] inputs instead of the large [cp, 18, KK] outputs)
    O3 = Of.reshape(cp, M, KK)
    Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(cp, 18, M)
    W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(cp, 18, M)
    U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))))
    V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))))
    U2 = U.reshape(cp * 3, 6 * KK)
    V2 = V.reshape(cp * 3, 6 * KK)
    S_acc = S_acc + jax.lax.dot_general(
        U2, V2, (((0,), (0,)), ((), ())))              # [6KK, 6KK] (a,k)
    return (S_acc, rhs_acc, Hcc_acc, bc_acc)


def _classify_band(prob: BAProblem, chunk: int, R: int, OC: int, snap: int):
    """Banded-assembly classification, entirely on device (jit-safe).

    Sorts points by their minimum observing pose id so each chunk of
    consecutive points observes poses inside a narrow window; per-chunk
    window bases are snapped DOWN to a multiple of `snap` so the byte
    offset 6*base of the in-band S patch is lane-tile aligned on TPU
    (snap=64 -> 6*64=384 = 3 x 128 lanes: the dynamic-slice update needs
    no lane rotation). Points whose observations leave their chunk's
    window are routed to an exact full-width overflow pass of static
    capacity OC.

    Returns (perm, base_c [n_chunks], in_band [n_chunks, cp],
    ov_idx [OC], ov_count). If ov_count > OC the excess points' ASSEMBLY
    contributions are dropped (the LM cost/accept test still sees every
    observation, so steps can only be suboptimal, never divergent);
    non-traced callers re-solve full-width when that happens
    (ba_solve_fast)."""
    K = prob.q.shape[0]
    P, M = prob.obs_kf.shape
    mask = prob.obs_mask & (prob.obs_kf >= 0)
    kf_min = jnp.min(jnp.where(mask, prob.obs_kf, K + 1), axis=1)
    perm = jnp.argsort(kf_min, stable=True).astype(jnp.int32)
    n_chunks = max(P // chunk, 1)
    while P % n_chunks:
        n_chunks -= 1
    cp = P // n_chunks
    kf_min_s = jnp.clip(kf_min[perm], 0, K)
    kf_max_s = jnp.max(jnp.where(mask, prob.obs_kf, -1), axis=1)[perm]
    has_act = jnp.any(mask, axis=1)[perm]
    cmin = jnp.min(kf_min_s.reshape(n_chunks, cp), axis=1)
    # bases stay exact multiples of snap (the per-base patch stack relies on
    # base == bid * snap); the clamp can strand up to snap-1 top poses
    # outside every window — their points just take the exact overflow path
    b_max = (max(K - R, 0) // snap) * snap
    base_c = jnp.minimum((cmin // snap) * snap, b_max).astype(jnp.int32)
    base_p = jnp.repeat(base_c, cp)
    in_band = ((kf_min_s >= base_p) & (kf_max_s < base_p + R)) | ~has_act
    ov_idx = jnp.nonzero(~in_band, size=OC, fill_value=P)[0].astype(jnp.int32)
    ov_count = jnp.sum(~in_band)
    return perm, base_c, in_band.reshape(n_chunks, cp), ov_idx, ov_count


def _band_onehot(prob: BAProblem, base_c, inb_c, R: int):
    """Iteration-invariant banded one-hot [n_chunks, ce, R], built ONCE per
    solve and streamed by every LM iteration's assembly scan (rebuilding it
    per iteration measured ~2.8 ms/iter at bench scale). Rows of invalid /
    out-of-band observations are zeroed; their contributions come back via
    the exact overflow pass."""
    K = prob.q.shape[0]
    P, M = prob.obs_kf.shape
    active = prob.obs_mask & (prob.obs_kf >= 0) & prob.point_valid[:, None]
    kf = jnp.where(active, jnp.clip(prob.obs_kf, 0, K - 1), K)    # [P, M]
    n_chunks = inb_c.shape[0]
    cp = P // n_chunks
    kf_c = kf.reshape(n_chunks, cp * M)
    okp = jnp.repeat(inb_c, M, axis=1) & (kf_c < K)
    rel = jnp.clip(kf_c - base_c[:, None], 0, R - 1)
    return jax.nn.one_hot(rel, R, dtype=jnp.float32) \
        * okp[..., None].astype(jnp.float32)


def _build_and_solve_fast(prob, pre, q, t, pw, cam, lam, delta2_m, delta2_s,
                          use_huber, chunk, pcg_iters, psum_axis=None,
                          x0=None, band=None, band_data=None,
                          cross_bf16=False):
    K = q.shape[0]
    P, M = prob.obs_kf.shape
    E = P * M
    KK = K + 1
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre

    tm = bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                        q, t, pw, cam, delta2_m, delta2_s, use_huber)
    Jc, Jp, r, w = tm.Jc, tm.Jp, tm.r, tm.w

    # --- point blocks (all elementwise over [P] after M-reduction) --------
    JpP = Jp.reshape(3, 3, P, M)
    wP = w.reshape(P, M)
    rP = r.reshape(3, P, M)

    def hpp(a, b):
        return jnp.sum((JpP[0, a] * JpP[0, b] + JpP[1, a] * JpP[1, b]
                        + JpP[2, a] * JpP[2, b]) * wP, -1)

    H6 = (hpp(0, 0), hpp(0, 1), hpp(0, 2), hpp(1, 1), hpp(1, 2), hpp(2, 2))
    Hinv6 = bk.sym3_inv(H6, lam)
    bp = jnp.stack([
        -jnp.sum((JpP[0, b] * rP[0] + JpP[1, b] * rP[1]
                  + JpP[2, b] * rP[2]) * wP, -1) for b in range(3)])  # [3, P]

    # --- W = Jc^T W Jp and Y = W Hpp^-1 (componentwise over E) ------------
    Wb = jnp.stack([jnp.stack([
        (Jc[0, a] * Jp[0, c] + Jc[1, a] * Jp[1, c] + Jc[2, a] * Jp[2, c]) * w
        for c in range(3)]) for a in range(6)])          # [6, 3, E]
    Hfull = {(0, 0): Hinv6[0], (0, 1): Hinv6[1], (0, 2): Hinv6[2],
             (1, 0): Hinv6[1], (1, 1): Hinv6[3], (1, 2): Hinv6[4],
             (2, 0): Hinv6[2], (2, 1): Hinv6[4], (2, 2): Hinv6[5]}
    HinvE = {k: jnp.repeat(v, M) for k, v in Hfull.items()}
    Y = jnp.stack([jnp.stack([
        Wb[a, 0] * HinvE[(0, c)] + Wb[a, 1] * HinvE[(1, c)]
        + Wb[a, 2] * HinvE[(2, c)] for c in range(3)]) for a in range(6)])

    # --- pose-side terms for the MXU assembly -----------------------------
    Hterms = jnp.stack([
        (Jc[0, a] * Jc[0, b] + Jc[1, a] * Jc[1, b] + Jc[2, a] * Jc[2, b]) * w
        for a in range(6) for b in range(6)])             # [36, E]
    bterms = jnp.stack([
        -(Jc[0, a] * r[0] + Jc[1, a] * r[1] + Jc[2, a] * r[2]) * w
        for a in range(6)])                               # [6, E]
    Ybp_e = jnp.stack([
        Y[a, 0] * jnp.repeat(bp[0], M) + Y[a, 1] * jnp.repeat(bp[1], M)
        + Y[a, 2] * jnp.repeat(bp[2], M) for a in range(6)])  # [6, E]

    # --- chunked one-hot matmul assembly ----------------------------------
    n_chunks = max(P // chunk, 1)
    while P % n_chunks:            # static: chunk count must divide P
        n_chunks -= 1
    cp = P // n_chunks
    ce = cp * M

    # mask invalid obs into the KK-th (dropped) one-hot row
    kf_masked = jnp.where(active > 0, kf_e, K).reshape(n_chunks, ce)
    Y_c = jnp.moveaxis(Y.reshape(6, 3, n_chunks, ce), 2, 0)
    Ht_c = jnp.moveaxis(Hterms.reshape(36, n_chunks, ce), 1, 0)
    bt_c = jnp.moveaxis(bterms.reshape(6, n_chunks, ce), 1, 0)
    Ybp_c = jnp.moveaxis(Ybp_e.reshape(6, n_chunks, ce), 1, 0)
    Wb_c = jnp.moveaxis(Wb.reshape(6, 3, n_chunks, ce), 2, 0)

    carry0 = (jnp.zeros((6 * KK, 6 * KK)), jnp.zeros((6, KK)),
              jnp.zeros((36, KK)), jnp.zeros((6, KK)))

    def full_scan(_):
        def body(carry, inp):
            kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i = inp
            return _full_chunk(carry, kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i,
                               KK, cp, M), None

        (S_a, rhs_p, Hcc_f, bc_f), _ = jax.lax.scan(
            body, carry0, (kf_masked, Y_c, Wb_c, Ht_c, bt_c, Ybp_c))
        # (a, k)-major -> (k, a)-major
        S_flat = S_a.reshape(6, KK, 6, KK).transpose(1, 0, 3, 2).reshape(
            6 * KK, 6 * KK)
        return S_flat, rhs_p, Hcc_f, bc_f

    if band is None:
        S_flat, rhs_p, Hcc_f, bc_f = full_scan(None)
    else:
        # ------------------------------------------------------------------
        # Banded assembly: each chunk's points usually observe poses inside
        # a window of R consecutive ids (points are sorted by minimum
        # observing pose by _classify_band), so the dominant S cross-term
        # matmul runs at width R instead of KK — an (R/K)^2 FLOP cut.
        # Layout/precision choices (measured in tools/PROFILE_FINDINGS.md):
        #   - ONE R-wide one-hot per chunk serves the diag AND cross terms
        #     (out-of-band points contribute nothing here; the overflow
        #     pass below restores them exactly);
        #   - window bases are snapped so 6*base is lane-tile aligned — the
        #     earlier unaligned dynamic-slice updates cost more than the
        #     FLOPs they saved;
        #   - the cross product can run in bf16 with f32 accumulation
        #     (cross_bf16): the one-hot is exact in bf16 and LM's
        #     accept/reject guards descent against the rounding.
        # Exact classification; numerical divergence from the full path is
        # roundoff-level (permutation changes f32 summation order; bf16
        # rounds the cross terms) — see tests/test_ba_fast.py tolerances.
        # ------------------------------------------------------------------
        R, OC, snap = band
        base_c, inb_c, ov_idx, Of_all = band_data
        kfP = jnp.where(active > 0, kf_e, K).reshape(P, M)
        cross_dt = jnp.bfloat16 if cross_bf16 else jnp.float32
        # possible window bases: 0, snap, ..., <= K - R. The scan carries
        # NOTHING — per-chunk patches stream out as scan outputs and are
        # reduced per base by ONE one-hot segment matmul, then land in S
        # via NB STATIC placements. Any dynamic-index accumulation inside
        # the scan (dynamic_update_slice or .at[bid].add) measured
        # 1.6-3.6 ms/iter EACH on TPU — see tools/PROFILE_FINDINGS.md.
        NB = max(K - R, 0) // snap + 1
        bid_c = base_c // snap
        n_ch = kf_masked.shape[0]

        def banded(_):
            def body(_c, inp):
                Of, Y_i, Wb_i, Ht_i, bt_i, Ybp_i = inp
                h = jax.lax.dot_general(Ht_i, Of, (((1,), (0,)), ((), ())))
                b = jax.lax.dot_general(bt_i, Of, (((1,), (0,)), ((), ())))
                r = jax.lax.dot_general(Ybp_i, Of, (((1,), (0,)), ((), ())))

                O3 = Of.astype(cross_dt).reshape(cp, M, R)
                Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                    cp, 18, M).astype(cross_dt)
                W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                    cp, 18, M).astype(cross_dt)
                U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                U2 = U.reshape(cp * 3, 6 * R).astype(cross_dt)
                V2 = V.reshape(cp * 3, 6 * R).astype(cross_dt)
                S_l = jax.lax.dot_general(
                    U2, V2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (a, rel)-major
                return None, (S_l, h, b, r)

            _, (S_ls, h_s, b_s, r_s) = jax.lax.scan(
                body, None, (Of_all, Y_c, Wb_c, Ht_c, bt_c, Ybp_c))

            # per-base reduction: one [NB, n_ch] one-hot matmul per output
            Obid = jax.nn.one_hot(bid_c, NB, dtype=jnp.float32).T  # [NB, nc]
            S_b = jax.lax.dot_general(
                Obid, S_ls.reshape(n_ch, -1), (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST).reshape(NB, 6 * R, 6 * R)
            Hcc_b = jnp.einsum("bc,cij->bij", Obid, h_s)
            bc_b = jnp.einsum("bc,cij->bij", Obid, b_s)
            rhs_b = jnp.einsum("bc,cij->bij", Obid, r_s)

            # place per-base patches at STATIC offsets (windows may overlap;
            # sequential .add handles that)
            S_k = jnp.zeros((6 * KK, 6 * KK))
            rhs_p = jnp.zeros((6, KK))
            Hcc_f = jnp.zeros((36, KK))
            bc_f = jnp.zeros((6, KK))
            for b in range(NB):
                base = b * snap
                # (a, rel)-major -> (rel, a)-major for the (k, a) S layout
                patch = S_b[b].reshape(6, R, 6, R).transpose(
                    1, 0, 3, 2).reshape(6 * R, 6 * R)
                S_k = S_k.at[6 * base:6 * base + 6 * R,
                             6 * base:6 * base + 6 * R].add(patch)
                rhs_p = rhs_p.at[:, base:base + R].add(rhs_b[b])
                Hcc_f = Hcc_f.at[:, base:base + R].add(Hcc_b[b])
                bc_f = bc_f.at[:, base:base + R].add(bc_b[b])

            # exact overflow pass: full-width assembly over the <= OC
            # out-of-band points
            ovc = jnp.clip(ov_idx, 0, P - 1)
            ov_ok = ov_idx < P                              # [OC]
            kf_ov = jnp.where(ov_ok[:, None], kfP[ovc], K).reshape(OC * M)

            def takeP(arr, nlead):
                return jnp.take(arr.reshape(arr.shape[:nlead] + (P, M)),
                                ovc, axis=nlead).reshape(
                                    arr.shape[:nlead] + (OC * M,))

            S_ov, rhs_ov, Hcc_ov, bc_ov = _full_chunk(
                (jnp.zeros((6 * KK, 6 * KK)), jnp.zeros((6, KK)),
                 jnp.zeros((36, KK)), jnp.zeros((6, KK))),
                kf_ov, takeP(Y, 2), takeP(Wb, 2), takeP(Hterms, 1),
                takeP(bterms, 1), takeP(Ybp_e, 1), KK, OC, M)
            S_ov = S_ov.reshape(6, KK, 6, KK).transpose(1, 0, 3, 2).reshape(
                6 * KK, 6 * KK)
            return (S_k + S_ov, rhs_p + rhs_ov, Hcc_f + Hcc_ov,
                    bc_f + bc_ov)

        S_flat, rhs_p, Hcc_f, bc_f = banded(None)

    cost0 = tm.cost
    if psum_axis is not None:
        # distributed: each device holds a point shard; the reduced camera
        # system is the sum of per-shard contributions (ICI collective)
        S_flat = jax.lax.psum(S_flat, psum_axis)
        rhs_p = jax.lax.psum(rhs_p, psum_axis)
        Hcc_f = jax.lax.psum(Hcc_f, psum_axis)
        bc_f = jax.lax.psum(bc_f, psum_axis)
        cost0 = jax.lax.psum(cost0, psum_axis)

    Hcc = Hcc_f.reshape(6, 6, KK)[:, :, :K].transpose(2, 0, 1)  # [K, 6, 6]
    bc = bc_f[:, :K].T                                           # [K, 6]
    rhs_pose = rhs_p[:, :K].T

    S_blocks = S_flat.reshape(KK, 6, KK, 6).transpose(0, 2, 1, 3)[:K, :K]
    S = -S_blocks
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
    dd = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
    S = S.at[jnp.arange(K)[:, None], jnp.arange(K)[:, None],
             jnp.arange(6)[None, :], jnp.arange(6)[None, :]].add(
                 lam * dd + 1e-8)

    free = prob.pose_valid & ~prob.pose_fixed
    S = jnp.where(free[:, None, None, None] & free[None, :, None, None],
                  S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6))
    rhs = jnp.where(free[:, None], bc - rhs_pose, 0.0)

    S_dense = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    Dinv = jnp.linalg.inv(S[jnp.arange(K), jnp.arange(K)]
                          + 1e-8 * jnp.eye(6))
    # NOTE: bk.pcg_solve_pallas (whole CG loop in one VMEM-resident kernel)
    # is the intended production solver, but this environment's remote
    # Mosaic compile helper cannot build Pallas kernels (server-side 500 on
    # any pallas_call); enable via MAOS_PALLAS_PCG=1 on a normal TPU runtime.
    import os
    solver = (bk.pcg_solve_pallas
              if os.environ.get("MAOS_PALLAS_PCG") == "1"
              and jax.default_backend() != "cpu" else bk.pcg_solve)
    dc = solver(S_dense, rhs.reshape(-1), Dinv, n_iters=pcg_iters,
                x0=x0.reshape(-1) if x0 is not None else None).reshape(K, 6)
    dc = jnp.where(free[:, None], dc, 0.0)

    # --- back-substitution -------------------------------------------------
    dcT = dc.T                                             # [6, K]
    dcE = dcT[:, kf_e] * active                            # [6, E]
    corrE = jnp.stack([
        Wb[0, c] * dcE[0] + Wb[1, c] * dcE[1] + Wb[2, c] * dcE[2]
        + Wb[3, c] * dcE[3] + Wb[4, c] * dcE[4] + Wb[5, c] * dcE[5]
        for c in range(3)])                                # [3, E]
    corr = jnp.sum(corrE.reshape(3, P, M), -1)
    rhs_pt = bp - corr                                     # [3, P]
    dp = jnp.stack([
        Hfull[(0, 0)] * rhs_pt[0] + Hfull[(0, 1)] * rhs_pt[1]
        + Hfull[(0, 2)] * rhs_pt[2],
        Hfull[(1, 0)] * rhs_pt[0] + Hfull[(1, 1)] * rhs_pt[1]
        + Hfull[(1, 2)] * rhs_pt[2],
        Hfull[(2, 0)] * rhs_pt[0] + Hfull[(2, 1)] * rhs_pt[1]
        + Hfull[(2, 2)] * rhs_pt[2]], axis=-1)             # [P, 3]
    has_obs = jnp.any((prob.obs_mask & (prob.obs_kf >= 0)), axis=-1)
    dp = jnp.where((prob.point_valid & has_obs)[:, None], dp, 0.0)
    return dc, dp, cost0


def _prepare_m(prob: BAProblem):
    """M-major observation arrays [*, M, P] for the Pallas prep kernel
    (ba_pallas): points ride the lane dimension, so per-point reductions
    are sublane reductions. Built once per solve."""
    K = prob.q.shape[0]
    active = prob.obs_mask & (prob.obs_kf >= 0) & prob.point_valid[:, None]
    kf_m = jnp.where(active, jnp.clip(prob.obs_kf, 0, K - 1), K).T  # [M, P]
    uvr_m = prob.obs_uvr.transpose(2, 1, 0)                         # [3,M,P]
    isig_m = prob.obs_inv_sigma2.T
    stereo_m = prob.obs_stereo.T.astype(jnp.float32)
    active_m = active.T.astype(jnp.float32)
    return kf_m, uvr_m, isig_m, stereo_m, active_m


def _band_onehot_m(kf_m, base_c, inb_c, R: int, K: int):
    """m-major variant of _band_onehot: [n_chunks, M, cp, R].

    bf16 storage: the one-hot is exact in bf16 (0/1), every consumer is a
    DEFAULT-precision MXU product anyway, and the [nc, M, cp, R] buffer is
    the solve's single biggest HBM write (~268 MB at bench scale in f32 —
    once per solve, ~half the non-loop overhead)."""
    M, P = kf_m.shape
    n_chunks = inb_c.shape[0]
    cp = P // n_chunks
    kf_c = kf_m.reshape(M, n_chunks, cp).transpose(1, 0, 2)  # [nc, M, cp]
    okp = inb_c[:, None, :] & (kf_c < K)
    rel = jnp.clip(kf_c - base_c[:, None, None], 0, R - 1)
    return jax.nn.one_hot(rel, R, dtype=jnp.bfloat16) \
        * okp[..., None].astype(jnp.bfloat16)


def _pcg_solver():
    import os
    from . import ba_kernels as bk_
    if jax.default_backend() != "cpu" \
            and os.environ.get("MAOS_NO_PALLAS_PCG") != "1":
        return bk_.pcg_solve_pallas
    return bk_.pcg_solve


def _solve_consts_mk(K: int, pose_valid, pose_fixed):
    """Iteration-invariant [6K, 6K] masks for the fused reduced-system
    assembly in _build_and_solve_mk (built once per solve; the per-iteration
    version cost ~3 ms/iter of select/copy fusions at bench scale)."""
    D = 6 * K
    free = pose_valid & ~pose_fixed
    free6 = jnp.repeat(free, 6)
    maskf = (free6[:, None] & free6[None, :]).astype(jnp.float32)
    eyepat = jnp.kron(jnp.eye(K, dtype=jnp.float32),
                      jnp.ones((6, 6), jnp.float32))        # block-diag 1s
    eyeD = jnp.eye(D, dtype=jnp.float32)
    fixmat = jnp.diag(jnp.where(free6, 0.0, 1.0))
    return free, free6, maskf, eyepat, eyeD, fixmat


def _build_and_solve_mk(prob, mpre, q, t, pw, cam, lam, delta2_m, delta2_s,
                        use_huber, pcg_iters, band, band_data,
                        solve_consts, x0=None):
    """Banded Schur build via the fused Pallas prep kernel (m-major).

    Semantically identical to _build_and_solve_fast's banded path; the
    ~150-op XLA elementwise prep pile (measured ~12 ms/iter of pure op
    overhead at bench scale) collapses into one kernel, and the assembly
    consumes the kernel's layout directly through dot_general dimension
    numbers — no moveaxis/transpose copies. TPU-only (ba_pallas)."""
    from . import ba_pallas as bp_mod
    K = q.shape[0]
    P, M = prob.obs_kf.shape
    KK = K + 1
    kf_m, uvr_m, isig_m, stereo_m, active_m = mpre
    R, OC, snap = band
    base_c, inb_c, ov_idx, Of_all = band_data       # Of_all [nc, M, cp, R]
    n_chunks = Of_all.shape[0]
    cp = P // n_chunks
    NB = max(K - R, 0) // snap + 1
    bid_c = base_c // snap

    pose_t = jnp.concatenate([q.T, t.T], axis=0)                  # [7, K]
    kf_g = jnp.minimum(kf_m, K - 1)
    g = jnp.take(pose_t, kf_g.reshape(-1), axis=1).reshape(7, M, P)
    Wb, Y, Ht, bt, Ybp, hinv6, bp, cost0, _ = bp_mod.prep_terms(
        lam, g, uvr_m, isig_m, stereo_m, active_m, pw.T, cam,
        delta2_m, delta2_s, use_huber)

    # --- banded assembly, unrolled over chunks (static slices) -----------
    # Explicit DEFAULT (bf16-input MXU, f32 accumulation) on the Schur
    # cross-term products: the engine-wide float32 default
    # (package __init__) protects the GEOMETRY pipeline, but the U/V/S/h
    # matmuls only build the LM model Hessian — bf16 rounding there
    # perturbs the quadratic model, not the optimum, and the 3-pass f32
    # emulation would triple the dominant assembly cost. The RHS products
    # (bt/Ybp placements) carry the actual gradient and stay exact — their
    # FLOP count is negligible.
    lo = jax.lax.Precision.DEFAULT
    S_ls, h_ls, b_ls, r_ls = [], [], [], []
    dn_uv = (((1,), (0,)), ((2,), (1,)))     # contract M, batch cp
    dn_dg = (((1, 2), (0, 1)), ((), ()))     # contract (M, cp)
    bh = jnp.bfloat16
    for c in range(n_chunks):
        sl = slice(c * cp, (c + 1) * cp)
        Of = Of_all[c]                                   # [M, cp, R] bf16
        U = jax.lax.dot_general(Y[:, :, sl].astype(bh), Of, dn_uv,
                                precision=lo)            # [cp, 18, R]
        V = jax.lax.dot_general(Wb[:, :, sl].astype(bh), Of, dn_uv,
                                precision=lo)
        U2 = U.reshape(cp * 3, 6 * R)   # rows (p,c), cols (a,rel)
        V2 = V.reshape(cp * 3, 6 * R)
        S_ls.append(jax.lax.dot_general(
            U2, V2, (((0,), (0,)), ((), ())), precision=lo,
            preferred_element_type=jnp.float32))         # [(a,rel),(a,rel)]
        h_ls.append(jax.lax.dot_general(
            Ht[:, :, sl].astype(bh), Of, dn_dg, precision=lo,
            preferred_element_type=jnp.float32))         # [36, R]
        # rhs placements stay exact (f32): they carry the gradient
        Of32 = Of.astype(jnp.float32)
        b_ls.append(jax.lax.dot_general(bt[:, :, sl], Of32, dn_dg))
        r_ls.append(jax.lax.dot_general(Ybp[:, :, sl], Of32, dn_dg))

    Obid = jax.nn.one_hot(bid_c, NB, dtype=jnp.float32).T        # [NB, nc]
    S_b = jax.lax.dot_general(
        Obid, jnp.stack(S_ls).reshape(n_chunks, -1),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST).reshape(NB, 6 * R, 6 * R)
    Hcc_b = jnp.einsum("bc,cij->bij", Obid, jnp.stack(h_ls))
    bc_b = jnp.einsum("bc,cij->bij", Obid, jnp.stack(b_ls))
    rhs_b = jnp.einsum("bc,cij->bij", Obid, jnp.stack(r_ls))

    S_flat = jnp.zeros((6 * KK, 6 * KK))
    rhs_p = jnp.zeros((6, KK))
    Hcc_f = jnp.zeros((36, KK))
    bc_f = jnp.zeros((6, KK))
    for b in range(NB):
        base = b * snap
        patch = S_b[b].reshape(6, R, 6, R).transpose(
            1, 0, 3, 2).reshape(6 * R, 6 * R)            # (rel, a)-major
        S_flat = S_flat.at[6 * base:6 * base + 6 * R,
                           6 * base:6 * base + 6 * R].add(patch)
        rhs_p = rhs_p.at[:, base:base + R].add(rhs_b[b])
        Hcc_f = Hcc_f.at[:, base:base + R].add(Hcc_b[b])
        bc_f = bc_f.at[:, base:base + R].add(bc_b[b])

    # --- exact overflow pass (full width over the <= OC o.o.b. points) ---
    ovc = jnp.clip(ov_idx, 0, P - 1)
    ov_ok = ov_idx < P
    kf_ov = jnp.where(ov_ok[None, :], kf_m[:, ovc], K)   # [M, OC]
    Of_ov = jax.nn.one_hot(kf_ov, KK, dtype=jnp.float32)  # [M, OC, KK]
    U_ov = jax.lax.dot_general(Y[:, :, ovc], Of_ov, dn_uv,
                               precision=lo)             # [OC, 18, KK]
    V_ov = jax.lax.dot_general(Wb[:, :, ovc], Of_ov, dn_uv, precision=lo)
    S_ov = jax.lax.dot_general(
        U_ov.reshape(OC * 3, 6 * KK), V_ov.reshape(OC * 3, 6 * KK),
        (((0,), (0,)), ((), ())), precision=lo)          # (a,k)-major
    S_flat = S_flat + S_ov.reshape(6, KK, 6, KK).transpose(
        1, 0, 3, 2).reshape(6 * KK, 6 * KK)
    Hcc_f = Hcc_f + jax.lax.dot_general(Ht[:, :, ovc], Of_ov, dn_dg,
                                        precision=lo)
    bc_f = bc_f + jax.lax.dot_general(bt[:, :, ovc], Of_ov, dn_dg)
    rhs_p = rhs_p + jax.lax.dot_general(Ybp[:, :, ovc], Of_ov, dn_dg)

    # --- dense reduced system assembled flat in (k, a) space -------------
    # one fused elementwise expression over [D, D]: block-diagonal Hcc
    # placement (eyepat * tiled rows), damping on the diagonal, fixed-pose
    # masking, identity rows for fixed poses — the invariant masks come
    # precomputed from _solve_consts_mk
    D = 6 * K
    free, free6, maskf, eyepat, eyeD, fixmat = solve_consts
    Hcc_abk = Hcc_f.reshape(6, 6, KK)[:, :, :K]          # [a, b, K]
    Hrow6 = Hcc_abk.transpose(2, 0, 1).reshape(D, 6)     # [(k, a), b]
    dd = Hcc_abk[jnp.arange(6), jnp.arange(6)]           # [6, K] diag
    damp = (lam * dd.T.reshape(-1) + 1e-8)               # [(k, a)]
    S = (jnp.tile(Hrow6, (1, K)) * eyepat - S_flat[:D, :D]
         + eyeD * damp[None, :]) * maskf + fixmat
    bc = bc_f[:, :K].T
    rhs = jnp.where(free[:, None], bc - rhs_p[:, :K].T, 0.0).reshape(-1)

    # block-Jacobi preconditioner straight from the pose blocks (no big-S
    # reads): damped Hcc for free poses, identity for fixed/invalid
    blocks = Hcc_abk.transpose(2, 0, 1) \
        + (lam * dd.T)[:, :, None] * jnp.eye(6) + 1e-8 * jnp.eye(6)
    blocks = jnp.where(free[:, None, None], blocks, jnp.eye(6))
    Dinv = jnp.linalg.inv(blocks)
    solver = _pcg_solver()
    dc = solver(S, rhs, Dinv, n_iters=pcg_iters,
                x0=x0.reshape(-1) if x0 is not None else None).reshape(K, 6)
    dc = jnp.where(free[:, None], dc, 0.0)

    # --- back-substitution (m-major) -------------------------------------
    dcT = dc.T                                            # [6, K]
    dc_g = jnp.take(dcT, kf_g.reshape(-1), axis=1).reshape(6, M, P) \
        * active_m[None]
    corr = jnp.einsum("camp,amp->cp", Wb.reshape(3, 6, M, P), dc_g)
    rhs_pt = bp - corr                                    # [3, P]
    dp = jnp.stack([
        hinv6[0] * rhs_pt[0] + hinv6[1] * rhs_pt[1] + hinv6[2] * rhs_pt[2],
        hinv6[1] * rhs_pt[0] + hinv6[3] * rhs_pt[1] + hinv6[4] * rhs_pt[2],
        hinv6[2] * rhs_pt[0] + hinv6[4] * rhs_pt[1] + hinv6[5] * rhs_pt[2]],
        axis=-1)                                          # [P, 3]
    has_obs = jnp.any(active_m > 0, axis=0)
    dp = jnp.where((prob.point_valid & has_obs)[:, None], dp, 0.0)
    return dc, dp, cost0


def ba_solve_fast(prob: BAProblem, cam: Intrinsics, n_iters: int = 10,
                  use_huber: bool = True, chi2_mono: float = 5.991,
                  chi2_stereo: float = 7.815, chunk: int = 4096,
                  pcg_iters: int = 32, band="auto",
                  cross_bf16=None, use_pallas=None,
                  check_overflow: bool = True) -> BAResult:
    """TPU-tuned ba_solve: identical semantics, E-major kernels + PCG.

    band: None for the full-width one-hot assembly, an int R for banded
    assembly with pose-window R, or "auto" to pick from the static problem
    shape (banded only pays off once the pose count makes the KK-wide
    cross-term matmul dominant). Band classification (point sort by first
    observing pose, per-chunk window bases, overflow set) runs ON DEVICE
    inside the jitted program (_classify_band) — no host transfers, and
    the path works under an outer jit/shard_map (local BA, distributed BA).

    cross_bf16: run the dominant Schur cross-product matmuls in bf16 with
    f32 accumulation. Default OFF: at the XLA level the HBM cast traffic
    costs more than the MXU savings (measured, PROFILE_FINDINGS.md) — the
    option exists for the in-VMEM Pallas assembly where bf16 is free.

    The overflow capacity is static (max(256, P // 16)); in the rare case
    more points than that are out-of-band, the non-traced path detects it
    via the returned band_ov count and re-solves full-width (exact).
    Traced callers degrade gracefully instead: excess points drop out of
    the ASSEMBLY only, while the cost/accept test still sees every
    observation, so steps lose efficiency but never diverge.
    """
    K = prob.q.shape[0]
    P, M = prob.obs_kf.shape
    if cross_bf16 is None:
        cross_bf16 = False
    if band == "auto":
        band = (128, max(256, P // 64), 64) if (K >= 192 and P >= 8192) \
            else None
    elif isinstance(band, int):
        band = (band, max(256, P // 16), 1)
    elif isinstance(band, tuple) and len(band) == 2:
        band = (band[0], band[1], 1)

    if use_pallas is None:
        import os
        use_pallas = jax.default_backend() != "cpu" \
            and os.environ.get("MAOS_NO_PALLAS") != "1"
    use_mk = bool(use_pallas) and band is not None

    traced = isinstance(jnp.asarray(prob.obs_kf), jax.core.Tracer)
    res = _ba_fast_jit(prob, cam, n_iters, use_huber, chi2_mono,
                       chi2_stereo, chunk, pcg_iters, band,
                       bool(cross_bf16), use_mk)
    # check_overflow=False skips the band_ov readback so latency-critical
    # callers (bench) stay free of device->host transfers; they must
    # verify res.band_ov themselves afterwards.
    if band is not None and not traced and check_overflow \
            and int(res.band_ov) > band[1]:
        # overflow capacity exceeded: re-solve exactly with the capacity
        # grown to the next power-of-two bucket (recompiles once per
        # bucket; full-width only when banding is pointless)
        nov = int(res.band_ov)
        OC2 = 256
        while OC2 < nov:
            OC2 *= 2
        if OC2 >= max(P // 4, 256):
            res = _ba_fast_jit(prob, cam, n_iters, use_huber, chi2_mono,
                               chi2_stereo, chunk, pcg_iters, None, False,
                               False)
        else:
            res = _ba_fast_jit(prob, cam, n_iters, use_huber, chi2_mono,
                               chi2_stereo, chunk, pcg_iters,
                               (band[0], OC2, band[2]), bool(cross_bf16),
                               use_mk)
    return res


@functools.partial(jax.jit,
                   static_argnames=("cam", "n_iters", "use_huber", "chunk",
                                    "pcg_iters", "band", "cross_bf16",
                                    "use_mk", "chi2_mono", "chi2_stereo"))
def _ba_fast_jit(prob: BAProblem, cam: Intrinsics,
                 n_iters: int, use_huber: bool, chi2_mono: float,
                 chi2_stereo: float, chunk: int, pcg_iters: int,
                 band, cross_bf16: bool = False,
                 use_mk: bool = False) -> BAResult:
    perm = None
    band_data = None
    ov_count = jnp.asarray(0, jnp.int32)
    band2 = None
    mpre = None
    use_mk = use_mk and band is not None
    if band is not None:
        R, OC, snap = band
        perm, base_c, inb, ov_idx, ov_count = _classify_band(
            prob, chunk, R, OC, snap)
        prob = prob._replace(
            pw=prob.pw[perm], point_valid=prob.point_valid[perm],
            obs_kf=prob.obs_kf[perm], obs_uvr=prob.obs_uvr[perm],
            obs_inv_sigma2=prob.obs_inv_sigma2[perm],
            obs_stereo=prob.obs_stereo[perm], obs_mask=prob.obs_mask[perm])
        if use_mk:
            K = prob.q.shape[0]
            mpre = _prepare_m(prob)
            band_data = (base_c, inb, ov_idx,
                         _band_onehot_m(mpre[0], base_c, inb, R, K))
        else:
            band_data = (base_c, inb, ov_idx,
                         _band_onehot(prob, base_c, inb, R))
        band2 = (R, OC, snap)

    if use_mk:
        # final cost/chi2 also via the fused kernel: no p-major obs arrays
        # exist at all on this path
        from . import ba_pallas as bp_mod
        solve_consts = _solve_consts_mk(prob.q.shape[0], prob.pose_valid,
                                        prob.pose_fixed)
        kf_m = mpre[0]
        kf_g = jnp.minimum(kf_m, prob.q.shape[0] - 1)
        Mm, Pm = kf_m.shape

        def cost_fn(q, t, pw):
            pose_t = jnp.concatenate([q.T, t.T], axis=0)
            g = jnp.take(pose_t, kf_g.reshape(-1), axis=1).reshape(7, Mm, Pm)
            out = bp_mod.prep_terms(0.0, g, mpre[1], mpre[2], mpre[3],
                                    mpre[4], pw.T, cam, chi2_mono,
                                    chi2_stereo, use_huber)
            return out[7], out[8].T.reshape(-1)   # cost, chi2 (E p-major)
    else:
        pre = _prepare_e(prob)
        kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
        solve_consts = None

        def cost_fn(q, t, pw):
            return bk.cost_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e,
                             active, q, t, pw, cam, chi2_mono, chi2_stereo,
                             use_huber)

    # Deferred-accept LM: one observation pass per iteration. The build at
    # the current parameters yields the robust cost there, which doubles as
    # the accept test for the PREVIOUS step: if it increased the cost, revert
    # to the backup and raise lambda (the build at the bad point is
    # discarded — rejects are rare, so this halves steady-state obs work
    # vs. the classic build+evaluate scheme).
    def body(_, carry):
        q, t, pw, qb, tb, pwb, cost_prev, lam, dc_prev = carry
        if use_mk:
            dc, dp, cost_here = _build_and_solve_mk(
                prob, mpre, q, t, pw, cam, lam, chi2_mono, chi2_stereo,
                use_huber, pcg_iters, band2, band_data, solve_consts,
                x0=dc_prev)
        else:
            dc, dp, cost_here = _build_and_solve_fast(
                prob, pre, q, t, pw, cam, lam, chi2_mono, chi2_stereo,
                use_huber, chunk, pcg_iters, x0=dc_prev, band=band2,
                band_data=band_data, cross_bf16=cross_bf16)
        improved = cost_here <= cost_prev
        lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 5.0), 1e-8, 1e4)

        dq, dt = se3.se3_exp(dc)
        q_step, t_step = se3.compose(dq, dt, q, t)
        q_step = se3.quat_normalize(q_step)
        pw_step = pw + dp

        # improved: keep current as backup, apply the fresh step
        # regressed: discard the step, revert to backup
        q_next = jnp.where(improved, q_step, qb)
        t_next = jnp.where(improved, t_step, tb)
        pw_next = jnp.where(improved, pw_step, pwb)
        qb = jnp.where(improved, q, qb)
        tb = jnp.where(improved, t, tb)
        pwb = jnp.where(improved, pw, pwb)
        cost_prev = jnp.minimum(cost_here, cost_prev)
        return q_next, t_next, pw_next, qb, tb, pwb, cost_prev, lam, dc

    init = (prob.q, prob.t, prob.pw, prob.q, prob.t, prob.pw,
            jnp.asarray(jnp.inf), jnp.asarray(1e-4),
            jnp.zeros_like(prob.t[:, :1].repeat(6, 1)))
    q, t, pw, qb, tb, pwb, cost_prev, _, _ = jax.lax.fori_loop(
        0, n_iters, body, init)
    # final accept check for the last applied step
    cost_final, _ = cost_fn(q, t, pw)
    take_last = cost_final <= cost_prev
    q = jnp.where(take_last, q, qb)
    t = jnp.where(take_last, t, tb)
    pw = jnp.where(take_last, pw, pwb)

    cost, chi2 = cost_fn(q, t, pw)
    P, M = prob.obs_kf.shape
    chi2 = chi2.reshape(P, M)
    if perm is not None:
        inv = jnp.argsort(perm)
        pw = pw[inv]
        chi2 = chi2[inv]
    return BAResult(q=q, t=t, pw=pw, cost=cost,
                    obs_chi2=chi2, n_iters=jnp.asarray(n_iters),
                    band_ov=ov_count)
