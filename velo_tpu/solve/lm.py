"""Batched 6-DoF Levenberg-Marquardt on SE(3) (SURVEY.md C12).

Replaces Ceres: a dense-normal-equations LM with Jacobi scaling and an
accept/reject damping schedule, as a *fixed-iteration* masked loop — the
reference iterates "until converged", the TPU rebuild runs a static cap with
a convergence mask so the whole solve is one compiled region of constant
shape (SURVEY.md §7 hard-part 3).

The caller supplies ``build_system(T) -> (H, g, cost)`` where H = J^T W J
(6x6), g = J^T W r (6,), both already masked/robust-weighted.  Everything
here is tiny linear algebra; its cost on TPU is negligible next to the
correspondence gather, which is why re-linearizing every iteration (rather
than caching J on rejected steps) is the right trade.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from velo_tpu.config import SolverConfig
from velo_tpu.geom import linalg as lin3
from velo_tpu.geom import se3


class LMState(NamedTuple):
    T: jnp.ndarray  # (4,4) current pose estimate
    lam: jnp.ndarray  # damping
    cost: jnp.ndarray  # cost at T
    converged: jnp.ndarray  # bool mask: stop updating (delta below tol)
    last_delta: jnp.ndarray  # |delta| of the last accepted step
    n_accept: jnp.ndarray  # int32: accepted steps (iterations-to-converge
    # observability — SURVEY.md §5 metrics row; a solve that accepts 0 of
    # its budget was stuck, one that accepts all of it never converged)


def lm_solve(
    build_system: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    T0: jnp.ndarray,
    cfg: SolverConfig,
    iters: int | None = None,
    stage: "Callable | None" = None,
    deferred: bool = False,
) -> Tuple[jnp.ndarray, LMState]:
    """Run masked fixed-iteration LM from T0; returns (T_opt, final state).

    ``stage`` (optional, used by solves with the observability-scaled
    prior) replaces ``build_system``: ``stage(T, basis) -> (H, g, cost,
    trial_cost, basis)`` linearizes the full system at T — re-deriving the
    prior's eigenbasis from the Hessian at T when ``basis`` is None, else
    reusing it — and returns a ``trial_cost(T_try)`` that evaluates
    candidate steps under that SAME frozen basis.  Trial costs therefore
    carry no Hessian dependence, so XLA dead-code-eliminates their J^T W J
    einsums (the in-cost H dependence was the round-4 31-38 % throughput
    hole).  The basis refreshes for the first cfg.prior_obs_stage_iters
    iterations — where the pose moves most and a stale basis measurably
    regresses drift — then freezes (each re-derivation is a serial scalar
    chain on the critical path).  When ``stage`` is given, ``build_system``
    may be None.

    ``deferred`` selects the deferred-reject loop (prior_obs_impl =
    "deferred"): ``build_system`` must be the FULL dynamic system (prior
    inside, basis from its own Hessian).  Each iteration solves the step
    from the last accepted linearization, then evaluates the trial point
    with one full linearization whose cost decides accept/reject — so the
    accept sequence is exactly the classic dynamic LM's, at lm_iters+1
    system builds instead of 2*lm_iters+1 (a trial cost with an H-dependent
    prior cannot be dead-code-eliminated anyway, so the H/g computed with it
    are free; on accept they seed the next step, on reject they are the one
    wasted build classic LM also pays as a wasted cost probe).
    """
    iters = cfg.lm_iters if iters is None else iters
    if deferred:
        if stage is not None:  # prior_obs_impl="deferred_tail"
            return _lm_solve_deferred_tail(stage, T0, cfg, iters)
        return _lm_solve_deferred(build_system, T0, cfg, iters)

    def cost_only(T):
        return build_system(T)[2]

    # Degeneracy-aware solution remapping (Zhang-style): long corridors leave
    # one direction (travel) nearly unobservable; noise in the hundreds of
    # well-observed constraints then drags the solution along it.  Analyze
    # the translation and rotation 3x3 blocks of H at T0 *separately* (their
    # units differ, so joint eigenvalues are incomparable) with a gate
    # RELATIVE to each block's strongest eigenvalue — robust to global
    # rescaling by robust-loss weights — and project the weak directions out
    # of every step so the motion prior survives along them.
    if cfg.degen_rel_min > 0.0:
        H0 = stage(T0)[0] if stage is not None else build_system(T0)[0]
        # One batched closed-form eig for both blocks: jnp.linalg.eigh
        # lowers to an iterative routine that is serial on TPU and sits on
        # the solve's critical path (2 calls x 9 solves per frame).
        B = jnp.stack([H0[:3, :3], H0[3:, 3:]])
        evals, V = lin3.sym_eig3x3(0.5 * (B + jnp.swapaxes(B, -1, -2)))
        keep = (evals > cfg.degen_rel_min * evals[..., 2:3]).astype(H0.dtype)
        P_blk = jnp.einsum("bik,bk,bjk->bij", V, keep, V)
        P_keep = jax.scipy.linalg.block_diag(P_blk[0], P_blk[1])
    else:
        P_keep = jnp.eye(6, dtype=T0.dtype)

    basis = [None]  # threaded through the Python-unrolled loop

    def body(i, st: LMState) -> LMState:
        if stage is not None:
            reuse = basis[0] if i >= cfg.prior_obs_stage_iters else None
            H, g, cost, trial_cost, basis[0] = stage(st.T, reuse)
        else:
            H, g, cost = build_system(st.T)
            trial_cost = cost_only
        # Jacobi scaling: solve in units of sqrt(diag(H)) for conditioning
        # (float32-safe on near-degenerate geometry, SURVEY.md §7 hard-part 5).
        D = jnp.sqrt(jnp.diagonal(H) + 1e-8)
        Hs = H / (D[:, None] * D[None, :])
        gs = g / D
        A = Hs + st.lam * jnp.eye(6, dtype=H.dtype) + 1e-7 * jnp.eye(6, dtype=H.dtype)
        L = jnp.linalg.cholesky(A)
        delta_s = jax.scipy.linalg.cho_solve((L, True), -gs)
        delta = P_keep @ (delta_s / D)
        # Guard: a failed factorization (NaN) must not poison the pose.
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, 0.0, delta)

        T_try = se3.exp(delta) @ st.T
        cost_try = trial_cost(T_try)
        accept = (cost_try < cost) & ~bad & ~st.converged

        T_new = jnp.where(accept, T_try, st.T)
        lam_new = jnp.where(
            accept, st.lam * cfg.lm_lambda_down, st.lam * cfg.lm_lambda_up
        )
        lam_new = jnp.clip(lam_new, 1e-9, 1e6)
        step = jnp.linalg.norm(delta)
        converged = st.converged | (accept & (step < cfg.converge_tol))
        return LMState(
            T=T_new,
            lam=jnp.where(st.converged, st.lam, lam_new),
            cost=jnp.where(accept, cost_try, cost),
            converged=converged,
            last_delta=jnp.where(accept, step, st.last_delta),
            n_accept=st.n_accept + accept.astype(jnp.int32),
        )

    init = LMState(
        T=T0,
        lam=jnp.asarray(cfg.lm_lambda_init, T0.dtype),
        # body() never reads st.cost (it re-linearizes at st.T), so the
        # init value only matters for the degenerate iters=0 case; with a
        # stage the real cost lands in the first body iteration.
        cost=(jnp.asarray(jnp.inf, T0.dtype) if stage is not None
              else cost_only(T0)),
        converged=jnp.asarray(False),
        last_delta=jnp.asarray(jnp.inf, T0.dtype),
        n_accept=jnp.int32(0),
    )
    # Unrolled: each XLA while iteration costs ~30 us of loop bookkeeping on
    # TPU (device trace: 1.8 ms/frame across the ~52 LM trips of a full
    # step), dwarfing the 6x6 math inside.  The trip count is a small static
    # cap, so a Python loop inlines the iterations into the enclosing outer
    # ICP body at modest HLO growth.
    out = init
    for i in range(iters):
        out = body(i, out)
    return out.T, out


def _lm_solve_deferred(build_system, T0, cfg: SolverConfig, iters: int):
    """Deferred-reject LM: solve-then-evaluate with exact dynamic costs.

    State carries the last ACCEPTED linearization (T, H, g, cost).  Each
    iteration computes the damped step from it, then fully linearizes the
    trial point; the trial's cost decides accept/reject and, on accept, its
    (H, g) seed the next step — one system build per iteration plus the
    initial one.  Accept decisions match the classic loop on the same
    dynamic cost bit-for-bit (same linearization points, same costs); only
    the wasted work on a reject differs (a full build here vs a cost probe
    there — with an H-dependent prior the probe paid the Hessian einsums
    anyway).
    """
    H0, g0, c0 = build_system(T0)

    if cfg.degen_rel_min > 0.0:
        B = jnp.stack([H0[:3, :3], H0[3:, 3:]])
        evals, V = lin3.sym_eig3x3(0.5 * (B + jnp.swapaxes(B, -1, -2)))
        keep = (evals > cfg.degen_rel_min * evals[..., 2:3]).astype(H0.dtype)
        P_blk = jnp.einsum("bik,bk,bjk->bij", V, keep, V)
        P_keep = jax.scipy.linalg.block_diag(P_blk[0], P_blk[1])
    else:
        P_keep = jnp.eye(6, dtype=T0.dtype)

    def body(st):
        T, H, g, lam, cost, converged, last_delta, n_accept = st
        D = jnp.sqrt(jnp.diagonal(H) + 1e-8)
        Hs = H / (D[:, None] * D[None, :])
        gs = g / D
        A = (Hs + lam * jnp.eye(6, dtype=H.dtype)
             + 1e-7 * jnp.eye(6, dtype=H.dtype))
        L = jnp.linalg.cholesky(A)
        delta_s = jax.scipy.linalg.cho_solve((L, True), -gs)
        delta = P_keep @ (delta_s / D)
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, 0.0, delta)

        T_try = se3.exp(delta) @ T
        H_try, g_try, cost_try = build_system(T_try)
        # A non-finite trial linearization must not be accepted (its H/g
        # would poison every later step).
        bad_try = ~(jnp.isfinite(cost_try)
                    & jnp.all(jnp.isfinite(g_try)))
        accept = (cost_try < cost) & ~bad & ~bad_try & ~converged

        step = jnp.linalg.norm(delta)
        lam_new = jnp.where(
            accept, lam * cfg.lm_lambda_down, lam * cfg.lm_lambda_up
        )
        return (
            jnp.where(accept, T_try, T),
            jnp.where(accept, H_try, H),
            jnp.where(accept, g_try, g),
            jnp.where(converged, lam, jnp.clip(lam_new, 1e-9, 1e6)),
            jnp.where(accept, cost_try, cost),
            converged | (accept & (step < cfg.converge_tol)),
            jnp.where(accept, step, last_delta),
            n_accept + accept.astype(jnp.int32),
        )

    st = (T0, H0, g0, jnp.asarray(cfg.lm_lambda_init, T0.dtype), c0,
          jnp.asarray(False), jnp.asarray(jnp.inf, T0.dtype), jnp.int32(0))
    # Unrolled for the same ~30 us/while-trip reason as the classic loop.
    for _ in range(iters):
        st = body(st)
    T, _, _, lam, cost, converged, last_delta, n_accept = st
    return T, LMState(T=T, lam=lam, cost=cost, converged=converged,
                      last_delta=last_delta, n_accept=n_accept)


def _lm_solve_deferred_tail(stage, T0, cfg: SolverConfig, iters: int):
    """Deferred-reject LM with a staged FINAL accept (prior_obs_impl=
    "deferred_tail").

    Identical to :func:`_lm_solve_deferred` for the first ``iters - 1``
    steps — each trial point is fully linearized via ``stage(T_try)`` (basis
    re-derived at T_try, so costs are the true dynamic costs) and that
    linearization seeds the next step on accept.  The LAST iteration's
    trial is instead scored under the basis frozen at the current
    linearization (``stage(T_try, basis)``): the final build's H/g would be
    discarded anyway, but a dynamic prior cost keeps the Hessian einsums
    live just to derive its basis — freezing only this one accept decision
    lets XLA dead-code-eliminate the entire final system build (one full
    build saved per solve, i.e. the throughput gap between deferred and
    staged), at the cost of one staged accept out of lm_iters, on the
    smallest step of the solve.
    """
    H0, g0, c0, _, basis0 = stage(T0)

    if cfg.degen_rel_min > 0.0:
        B = jnp.stack([H0[:3, :3], H0[3:, 3:]])
        evals, V = lin3.sym_eig3x3(0.5 * (B + jnp.swapaxes(B, -1, -2)))
        keep = (evals > cfg.degen_rel_min * evals[..., 2:3]).astype(H0.dtype)
        P_blk = jnp.einsum("bik,bk,bjk->bij", V, keep, V)
        P_keep = jax.scipy.linalg.block_diag(P_blk[0], P_blk[1])
    else:
        P_keep = jnp.eye(6, dtype=T0.dtype)

    def body(i, st):
        T, H, g, lam, cost, basis, converged, last_delta, n_accept = st
        D = jnp.sqrt(jnp.diagonal(H) + 1e-8)
        Hs = H / (D[:, None] * D[None, :])
        gs = g / D
        A = (Hs + lam * jnp.eye(6, dtype=H.dtype)
             + 1e-7 * jnp.eye(6, dtype=H.dtype))
        L = jnp.linalg.cholesky(A)
        delta_s = jax.scipy.linalg.cho_solve((L, True), -gs)
        delta = P_keep @ (delta_s / D)
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, 0.0, delta)
        T_try = se3.exp(delta) @ T

        if i == iters - 1:
            # Frozen-basis trial: the carried basis belongs to the carried
            # linearization point, where the frozen cost coincides with the
            # dynamic cost — so the comparison is consistent.  H/g/basis of
            # this stage call are unused => their einsums are dead code.
            _, _, cost_try, _, _ = stage(T_try, basis)
            accept = (cost_try < cost) & ~bad \
                & jnp.isfinite(cost_try) & ~converged
            H_new, g_new, basis_new = H, g, basis
        else:
            H_t, g_t, cost_try, _, basis_t = stage(T_try)
            bad_try = ~(jnp.isfinite(cost_try)
                        & jnp.all(jnp.isfinite(g_t)))
            accept = (cost_try < cost) & ~bad & ~bad_try & ~converged
            H_new = jnp.where(accept, H_t, H)
            g_new = jnp.where(accept, g_t, g)
            basis_new = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), basis_t, basis)

        step = jnp.linalg.norm(delta)
        lam_new = jnp.where(
            accept, lam * cfg.lm_lambda_down, lam * cfg.lm_lambda_up
        )
        return (
            jnp.where(accept, T_try, T),
            H_new,
            g_new,
            jnp.where(converged, lam, jnp.clip(lam_new, 1e-9, 1e6)),
            jnp.where(accept, cost_try, cost),
            basis_new,
            converged | (accept & (step < cfg.converge_tol)),
            jnp.where(accept, step, last_delta),
            n_accept + accept.astype(jnp.int32),
        )

    st = (T0, H0, g0, jnp.asarray(cfg.lm_lambda_init, T0.dtype), c0,
          basis0, jnp.asarray(False), jnp.asarray(jnp.inf, T0.dtype),
          jnp.int32(0))
    for i in range(iters):
        st = body(i, st)
    T, _, _, lam, cost, _, converged, last_delta, n_accept = st
    return T, LMState(T=T, lam=lam, cost=cost, converged=converged,
                      last_delta=last_delta, n_accept=n_accept)


class LMStateCT(NamedTuple):
    T: jnp.ndarray  # (4,4)
    xi2: jnp.ndarray  # (6,) sweep-motion estimate
    lam: jnp.ndarray
    cost: jnp.ndarray
    converged: jnp.ndarray
    n_accept: jnp.ndarray  # int32 accepted steps (see LMState.n_accept)


def lm_solve_ct(
    build_system: Callable[[jnp.ndarray, jnp.ndarray],
                           Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    T0: jnp.ndarray,
    xi2_0: jnp.ndarray,
    cfg: SolverConfig,
    iters: int | None = None,
    stage: "Callable | None" = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, LMStateCT]:
    """12-DoF LM over (pose, sweep motion) — the continuous-time solve.

    ``build_system(T, xi2) -> (H (12,12), g (12,), cost)``; the state
    retraction is ``T <- exp(delta[:6]) T`` (left) and ``xi2 <- xi2 +
    delta[6:]`` (additive; the builder relinearizes the scaled-exp around
    the current xi2 each call, so first-order consistency suffices).
    """
    iters = cfg.lm_iters if iters is None else iters
    eye = jnp.eye(12, dtype=T0.dtype)

    def cost_only(T, xi2):
        return build_system(T, xi2)[2]

    basis = [None]  # threaded through the Python-unrolled loop

    def body(i, st: LMStateCT) -> LMStateCT:
        if stage is not None:
            reuse = basis[0] if i >= cfg.prior_obs_stage_iters else None
            H, g, cost, trial_cost, basis[0] = stage(st.T, st.xi2, reuse)
        else:
            H, g, cost = build_system(st.T, st.xi2)
            trial_cost = cost_only
        D = jnp.sqrt(jnp.diagonal(H) + 1e-8)
        Hs = H / (D[:, None] * D[None, :])
        gs = g / D
        A = Hs + (st.lam + 1e-7) * eye
        L = jnp.linalg.cholesky(A)
        delta = jax.scipy.linalg.cho_solve((L, True), -gs) / D
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, 0.0, delta)

        T_try = se3.exp(delta[:6]) @ st.T
        xi2_try = st.xi2 + delta[6:]
        cost_try = trial_cost(T_try, xi2_try)
        accept = (cost_try < cost) & ~bad & ~st.converged
        lam_new = jnp.where(
            accept, st.lam * cfg.lm_lambda_down, st.lam * cfg.lm_lambda_up
        )
        step = jnp.linalg.norm(delta)
        return LMStateCT(
            T=jnp.where(accept, T_try, st.T),
            xi2=jnp.where(accept, xi2_try, st.xi2),
            lam=jnp.where(st.converged, st.lam,
                          jnp.clip(lam_new, 1e-9, 1e6)),
            cost=jnp.where(accept, cost_try, cost),
            converged=st.converged | (accept & (step < cfg.converge_tol)),
            n_accept=st.n_accept + accept.astype(jnp.int32),
        )

    st = LMStateCT(
        T=T0, xi2=xi2_0,
        lam=jnp.asarray(cfg.lm_lambda_init, T0.dtype),
        cost=(jnp.asarray(jnp.inf, T0.dtype) if stage is not None
              else cost_only(T0, xi2_0)),
        converged=jnp.asarray(False),
        n_accept=jnp.int32(0),
    )
    for i in range(iters):
        st = body(i, st)
    return st.T, st.xi2, st
