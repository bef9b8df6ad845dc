"""JAX-accelerated fixture simulation (opt-in: VELO_FIX_ACCEL=1).

The numpy simulator in :mod:`fixtures` is the semantic reference, but its
slab raycast is pure memory-bound host work (~6 s per 64x2048 scan, ~10 s
per rendered camera frame on a 1-core host) — regenerating the full-scale
revalidation fixture set costs hours of wall clock.  This module runs the
identical slab algorithm under ``jax.jit`` so the whole sweep's rays go to
the accelerator in ONE dispatch per fixture (seconds instead of tens of
minutes), with all stochastic parts (range noise, dropout) left on the host
so the numpy RNG consumption pattern — and therefore the noise realization —
is bit-identical to the reference path.

Differences from the reference: ray-hit distances are computed in float32
(TPU has no f64), i.e. ~1e-5 m at 80 m range vs the numpy f64 path — three
orders of magnitude below the 2 cm sensor-noise floor and far below the
scan quantization the estimator sees.  A unit test pins the parity.

Used by ``fixtures.make_fixture`` when ``VELO_FIX_ACCEL=1`` (the TPU
revalidation queue sets it; unit tests and CI keep the numpy path).
"""
from __future__ import annotations

import numpy as np


def _sweep_hits(mins, maxs, origins, dirs, t_max, chunk=16384):
    """Device raycast: nearest-hit t for every (frame, ray).

    origins/dirs: (F, N, 3) float32 arrays (any leading F, N).  Returns
    (F, N) float32 t with +inf for miss.  Mirrors fixtures.raycast exactly
    (same epsilons, same gating) in f32.
    """
    import jax
    import jax.numpy as jnp

    B = int(mins.shape[0])
    F, N = origins.shape[0], origins.shape[1]
    # Pad rays to a chunk multiple so lax.map sees static shapes.
    n_pad = (-N) % chunk
    if n_pad:
        origins = np.concatenate(
            [origins, np.zeros((F, n_pad, 3), np.float32)], axis=1)
        dirs = np.concatenate(
            [dirs, np.ones((F, n_pad, 3), np.float32)], axis=1)
    n_chunks = origins.shape[1] // chunk
    o_c = origins.reshape(F * n_chunks, chunk, 3)
    d_c = dirs.reshape(F * n_chunks, chunk, 3)

    mins_d = jnp.asarray(mins, jnp.float32)
    maxs_d = jnp.asarray(maxs, jnp.float32)

    def one_chunk(od):
        o, d = od  # (chunk,3)
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        o_ = o[:, None, :]
        inv_ = inv_d[:, None, :]
        t1 = (mins_d[None] - o_) * inv_
        t2 = (maxs_d[None] - o_) * inv_
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1[..., 0], t2[..., 0]),
                                       jnp.minimum(t1[..., 1], t2[..., 1])),
                           jnp.minimum(t1[..., 2], t2[..., 2]))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1[..., 0], t2[..., 0]),
                                       jnp.maximum(t1[..., 1], t2[..., 1])),
                           jnp.maximum(t1[..., 2], t2[..., 2]))
        hit = (tmax >= tmin) & (tmax > 0) & (tmin < t_max)
        tmin = jnp.where(hit & (tmin > 1e-6), tmin, jnp.inf)
        return tmin.min(axis=1)  # (chunk,)

    del B
    fn = jax.jit(lambda od: jax.lax.map(one_chunk, od))
    t = np.asarray(fn((jnp.asarray(o_c), jnp.asarray(d_c))))
    return t.reshape(F, n_chunks * chunk)[:, :N]


def _render_frames(world, origins, dirs, albedo, chunk=16384):
    """Device render path: t + winning box + normal + procedural shade.

    origins/dirs: (F, N, 3) float32 (camera rays, unit dirs).  Returns
    (F, N) float32 shade values, 0.08 where no hit — mirroring
    fixtures.render_camera + _procedural_shade in f32.
    """
    import jax
    import jax.numpy as jnp

    F, N = origins.shape[0], origins.shape[1]
    n_pad = (-N) % chunk
    if n_pad:
        origins = np.concatenate(
            [origins, np.zeros((F, n_pad, 3), np.float32)], axis=1)
        dirs = np.concatenate(
            [dirs, np.ones((F, n_pad, 3), np.float32)], axis=1)
    n_chunks = origins.shape[1] // chunk
    o_c = origins.reshape(F * n_chunks, chunk, 3)
    d_c = dirs.reshape(F * n_chunks, chunk, 3)

    mins_d = jnp.asarray(world.mins, jnp.float32)
    maxs_d = jnp.asarray(world.maxs, jnp.float32)
    alb_d = jnp.asarray(albedo, jnp.float32)
    Bn = int(world.mins.shape[0])

    def one_chunk(od):
        o, d = od
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        o_ = o[:, None, :]
        inv_ = inv_d[:, None, :]
        t1 = (mins_d[None] - o_) * inv_
        t2 = (maxs_d[None] - o_) * inv_
        tmin_ax = jnp.minimum(t1, t2)  # (chunk,B,3)
        tmax_ax = jnp.maximum(t1, t2)
        tmin = tmin_ax.max(axis=2)
        tmax = tmax_ax.min(axis=2)
        hit = (tmax >= tmin) & (tmax > 0)
        tmin = jnp.where(hit & (tmin > 1e-6), tmin, jnp.inf)
        t = tmin.min(axis=1)
        has_hit = jnp.isfinite(t)
        # One-hot winner (ties -> first, like argmin) instead of a gather.
        is_min = (tmin <= t[:, None]) & has_hit[:, None]
        first = jnp.cumsum(is_min.astype(jnp.float32), axis=1) <= 1.0
        onehot = (is_min & first).astype(jnp.float32)  # (chunk,B)
        win_ax = jnp.einsum("cb,cba->ca", onehot, tmin_ax)  # (chunk,3)
        # The winning axis reproduces t bit-exactly (tmin is the max over
        # these same values), so a tiny epsilon suffices even in f32.
        ax = jnp.abs(win_ax - t[:, None]) < 1e-6
        ax_idx = jnp.argmax(ax, axis=1)
        normal = -jnp.sign(
            jnp.take_along_axis(d, ax_idx[:, None], axis=1))[:, 0]
        normals = jnp.zeros_like(d).at[
            jnp.arange(d.shape[0]), ax_idx].set(normal)
        normals = jnp.where(has_hit[:, None], normals, 0.0)
        alb = onehot @ alb_d  # (chunk,)
        p = o + d * jnp.where(has_hit, t, 0.0)[:, None]
        tex = (0.5
               + 0.18 * jnp.sin(2.1 * p[:, 0]) * jnp.sin(2.7 * p[:, 1])
               + 0.14 * jnp.sin(5.3 * p[:, 2] + 1.3 * p[:, 0])
               + 0.10 * jnp.sin(11.0 * p[:, 1] + 7.0 * p[:, 2]))
        light = jnp.asarray([0.4, 0.25, 0.88], jnp.float32)
        diffuse = jnp.clip((normals * light).sum(1), 0.0, 1.0)
        shade = jnp.clip(alb * tex * (0.45 + 0.55 * diffuse), 0.0, 1.0)
        return jnp.where(has_hit, shade, 0.08)

    del Bn
    fn = jax.jit(lambda od: jax.lax.map(one_chunk, od))
    out = np.asarray(fn((jnp.asarray(o_c), jnp.asarray(d_c))))
    return out.reshape(F, n_chunks * chunk)[:, :N]


def simulate_sweep_batch(world, poses, n_rings, n_azimuth, elev_max_deg,
                         elev_min_deg, max_range, beam_elev=None,
                         az_start=0.0):
    """All F distorted scans of a drive in one device dispatch.

    poses: (F+1, 4, 4).  Returns raw (F, R*C) hit distances t (inf = miss)
    plus the sensor-frame unit directions (R*C, 3) shared by all frames.
    The caller applies noise/min-range/intensity exactly like the numpy
    path (fixtures.simulate_velodyne:330-344).
    """
    from velo_tpu.io.fixtures import _interp_poses

    F = poses.shape[0] - 1
    if beam_elev is not None:
        elev = np.asarray(beam_elev, np.float64)
    else:
        elev = np.deg2rad(np.linspace(elev_max_deg, elev_min_deg, n_rings))
    phase = (np.arange(n_azimuth) + 0.5) / n_azimuth
    az_all = az_start - 2.0 * np.pi * phase
    ce, se = np.cos(elev)[:, None], np.sin(elev)[:, None]
    ca, sa = np.cos(az_all)[None, :], np.sin(az_all)[None, :]
    dirs_s = np.stack([ce * ca, ce * sa,
                       np.broadcast_to(se, (n_rings, n_azimuth))], axis=-1)
    origins = np.empty((F, n_rings * n_azimuth, 3), np.float32)
    dirs_w = np.empty((F, n_rings * n_azimuth, 3), np.float32)
    for i in range(F):
        R_c, t_c = _interp_poses(poses[i], poses[i + 1], phase)
        dirs_w[i] = np.einsum("cij,rcj->rci", R_c, dirs_s).reshape(-1, 3)
        origins[i] = np.broadcast_to(
            t_c[None], (n_rings, n_azimuth, 3)).reshape(-1, 3)
    t = _sweep_hits(world.mins, world.maxs, origins, dirs_w, max_range)
    return t, dirs_s.reshape(-1, 3).astype(np.float64)


def finish_scan(t, dirs_s, rng, noise_std, min_range=2.5, max_range=80.0):
    """Host tail of simulate_velodyne (fixtures.py:336-344), bit-matching:
    noise draw order, range gating, intensity fill, min-range filter."""
    t = np.asarray(t, np.float64)
    if noise_std > 0 and rng is not None:
        t = t + rng.normal(0.0, noise_std, t.shape)
    ok = np.isfinite(t) & (t <= max_range) & (t >= min_range)
    t = np.where(ok, t, 0.0)
    p = dirs_s * t[:, None]
    flat = np.concatenate([p, 0.5 * np.ones_like(t[:, None])], axis=1)
    flat[~ok] = 0.0
    flat = flat.astype(np.float32)
    return flat[np.linalg.norm(flat[:, :3], axis=1) >= min_range]


def render_batch(world, T_w_cams, P, height, width):
    """All F camera frames in one device dispatch -> (F, H, W) float32."""
    fx, fy = P[0, 0], P[1, 1]
    cx, cy = P[0, 2], P[1, 2]
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    rays_c = np.stack([(u - cx) / fx, (v - cy) / fy,
                       np.ones_like(u, np.float64)], axis=-1).reshape(-1, 3)
    F = len(T_w_cams)
    origins = np.empty((F, rays_c.shape[0], 3), np.float32)
    dirs = np.empty((F, rays_c.shape[0], 3), np.float32)
    for i, T in enumerate(T_w_cams):
        rw = rays_c @ T[:3, :3].T
        rw /= np.linalg.norm(rw, axis=1, keepdims=True)
        dirs[i] = rw
        origins[i] = np.broadcast_to(T[:3, 3], rw.shape)
    shade = _render_frames(world, origins, dirs, world.albedo)
    return shade.reshape(F, height, width).astype(np.float32)
