"""Long-fixture accuracy harness: drift on a 150+ frame synthetic drive.

Round-1's variant sweeps were ad hoc; this makes them reproducible:
generates (and disk-caches) a long canyon drive with exact ground truth,
runs the odometry device-resident, and prints the KITTI drift metric for a
set of named config variants.

Usage:
  python scripts/longrun.py                     # base config only
  python scripts/longrun.py --variants base,edges3,tm4
  python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_fixture(frames, rings, az, seed=0, distorted=True,
                with_images=False, noise_std=0.0, dropout=0.0,
                sixdof=False, world="canyon"):
    tag = ("" if distorted else "_nodist") + ("_img" if with_images else "")
    if noise_std:
        tag += f"_n{noise_std:g}"
    if dropout:
        tag += f"_d{dropout:g}"
    if sixdof:
        tag += "_6dof"
    if world != "canyon":
        tag += f"_{world}"
    # The GENERATOR is part of the cache key: the JAX-accelerated raycaster
    # (VELO_FIX_ACCEL=1) matches the numpy reference only to f32 tolerance
    # (up to 0.1 % of points differ), and 150 frames of odometry on a
    # chaotically-sensitive fixture amplify that into ±1-2 %/100m drift
    # differences.  Round 4's "same SHA, different results" mystery was two
    # generators silently sharing one cache file across rounds — never let
    # an accel-generated fixture masquerade as the numpy one or vice versa.
    if os.environ.get("VELO_FIX_ACCEL") == "1":
        import jax

        # Backend-qualified: the accel raycast's f32 argmins can resolve
        # differently on TPU vs CPU, so the realization is (generator,
        # backend)-specific.
        tag += f"_accel-{jax.default_backend()}"
    cache = f"/tmp/velo_longrun_{frames}_{rings}_{az}_{seed}{tag}.npz"
    from velo_tpu.io import fixtures, kitti

    # Bumpy-road excitation: ~1.7deg pitch, ~1.1deg roll, 6cm z bobbing.
    sixdof_kw = (dict(pitch_amp=0.03, roll_amp=0.02, z_amp=0.06)
                 if sixdof else {})
    if world == "suburban":
        # Held-out family: open terraced suburb, trajectory climbs the ~1%
        # grade with the terrain (fixtures.suburban_world).
        sixdof_kw.update(world=fixtures.suburban_world(seed), grade=0.01)
    n_max = rings * az
    if os.path.exists(cache):
        d = np.load(cache)
        return (d["scans"], d["masks"], d["gt_velo"], d["gt_cam"],
                d["T_cam_velo"],
                d["images"] if with_images else None,
                d["P"] if "P" in d else None)
    print(f"simulating {frames} frames at {rings}x{az}…", file=sys.stderr)
    if distorted:
        fx = fixtures.make_fixture(n_frames=frames, n_rings=rings,
                                   n_azimuth=az, with_images=with_images,
                                   height=128, width=384,
                                   speed=8.0, seed=seed,
                                   noise_std=noise_std, dropout=dropout,
                                   **sixdof_kw)
        raw, gt_velo, gt_cam, T_cv = (fx.scans, fx.gt_poses_velo,
                                      fx.gt_poses_cam, fx.T_cam_velo)
    else:
        # Undistorted oracle branch: split sixdof_kw into world/trajectory
        # pieces (make_trajectory doesn't take a world).
        box_world = sixdof_kw.pop("world", None) or fixtures.default_world(seed)
        rng = np.random.default_rng(seed + 1)
        poses = fixtures.make_trajectory(frames + 1, speed=8.0, seed=seed + 2,
                                         **sixdof_kw)
        raw = [fixtures.simulate_velodyne(box_world, poses[i], poses[i],
                                          n_rings=rings, n_azimuth=az,
                                          rng=rng) for i in range(frames)]
        _, T_cv = fixtures.default_calib(128, 384)
        gt_velo = poses[:frames]
        T0 = gt_velo[0] @ np.linalg.inv(T_cv)
        gt_cam = np.einsum("ij,fjk,kl->fil", np.linalg.inv(T0), gt_velo,
                           np.linalg.inv(T_cv))
    padded = [kitti.pad_scan(s, n_max) for s in raw]
    scans = np.stack([p[0] for p in padded])
    masks = np.stack([p[1] for p in padded])
    extra = ({"images": fx.images, "P": fx.P}
             if with_images and distorted else {})
    np.savez_compressed(cache, scans=scans, masks=masks,
                        gt_velo=gt_velo, gt_cam=gt_cam, T_cam_velo=T_cv,
                        **extra)
    return (scans, masks, gt_velo, gt_cam, T_cv,
            extra.get("images"), extra.get("P"))


def variant_cfg(name, rings, az):
    from velo_tpu.config import LidarConfig, VeloConfig

    lid = dict(n_rings=rings, n_azimuth=az)
    if name == "base":
        pass
    elif name == "edges3":
        lid.update(edges_per_sector=3)
    elif name == "tm4":
        lid.update(target_mult=4)
    elif name == "sectors6":
        lid.update(n_sectors=6)
    elif name == "planars6":
        lid.update(planars_per_sector=6)
    elif name[:2] in ("s:", "l:", "m:"):
        pass  # field-override variant, handled below
    elif name[:2] == "v:":
        pass  # vision-field override, applied in main() after the vision
        # config is installed (the --vision block replaces cfg.vision whole)
    else:
        raise SystemExit(f"unknown variant {name}")
    cfg = VeloConfig(lidar=LidarConfig(**lid), use_vision=False,
                     use_map=True, n_max_points=rings * az)
    if name[:2] in ("s:", "l:", "m:"):
        # e.g. "s:lm_iters=6+huber_delta_icp=0.2", "m:edge_capacity=32768"
        sub = {"s": "solver", "l": "lidar", "m": "map"}[name[0]]
        kv = dict(p.split("=") for p in name[2:].split("+"))
        fields = {f.name: f.type for f in
                  dataclasses.fields(getattr(cfg, sub))}
        def _c(k, v):
            ty = str(fields[k])
            if "bool" in ty:
                return v in ("1", "true", "True")
            if "int" in ty:
                return int(v)
            if "str" in ty:
                return v
            return float(v)

        conv = {k: _c(k, v) for k, v in kv.items()}
        cfg = dataclasses.replace(cfg, **{sub: dataclasses.replace(
            getattr(cfg, sub), **conv)})
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--rings", type=int, default=32)
    ap.add_argument("--azimuth", type=int, default=1024)
    ap.add_argument("--variants", default="base")
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--dump", default=None,
                    help="write per-frame diagnostics .npz here")
    ap.add_argument("--nodistort", action="store_true",
                    help="undistorted scans + deskew off (oracle ceiling)")
    ap.add_argument("--vision", action="store_true",
                    help="fused pipeline (config 4) with rendered images")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="Gaussian range noise std in meters (real ~0.02)")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="fraction of returns randomly dropped")
    ap.add_argument("--sixdof", action="store_true",
                    help="non-planar trajectory (pitch/roll/z excitation)")
    ap.add_argument("--prebin", action="store_true",
                    help="host-pre-binned grid input (production layout)")
    ap.add_argument("--smooth", action="store_true",
                    help="also report the non-causal smoother's refinement")
    ap.add_argument("--smooth-window", type=int, default=8)
    ap.add_argument("--smooth-passes", type=int, default=2)
    ap.add_argument("--world", default="canyon",
                    choices=("canyon", "suburban"),
                    help="world family (suburban = held-out terraced suburb)")
    ap.add_argument("--trail", default=None,
                    help="append result rows + run metadata to this JSONL "
                    "drift trail (the full-scale TPU revalidation queue "
                    "writes DRIFT_TRAIL.jsonl at the repo root, which CI "
                    "asserts against — the automated full-scale regression "
                    "net, since CI-scale fixtures diverge qualitatively "
                    "from full scale post-seam-fix)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from velo_tpu.evaluation import kitti_metric
    from velo_tpu.pipeline import odometry

    trail_meta = None
    if args.trail:
        import subprocess

        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
        trail_meta = dict(
            sha=sha or "unknown",
            frames=args.frames, rings=args.rings, azimuth=args.azimuth,
            world=args.world, sixdof=args.sixdof, vision=args.vision,
            noise=args.noise, dropout=args.dropout, prebin=args.prebin,
            generator=(f"accel-{jax.default_backend()}"
                       if os.environ.get("VELO_FIX_ACCEL") == "1"
                       else "numpy"),
            platform=jax.default_backend(),
            ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
        )

    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        scans, masks, gt_velo, gt_cam, T_cam_velo, images, P = get_fixture(
            args.frames, args.rings, args.azimuth, seed,
            distorted=not args.nodistort, with_images=args.vision,
            noise_std=args.noise, dropout=args.dropout,
            sixdof=args.sixdof, world=args.world)
        if args.prebin:
            from velo_tpu.config import LidarConfig
            from velo_tpu.lidar import rangeimage as ri_mod

            lc = LidarConfig(n_rings=args.rings, n_azimuth=args.azimuth)
            binned = [ri_mod.bin_scan_host(s[m], lc)
                      for s, m in zip(scans, masks)]
            scans = np.stack([b[0] for b in binned])
            masks = np.stack([b[1] for b in binned])
        scans_d = jnp.asarray(scans)
        masks_d = jnp.asarray(masks)
        images_d = (jnp.asarray(images, jnp.float32)
                    if args.vision else None)

        for name in args.variants.split(","):
            cfg = variant_cfg(name, args.rings, args.azimuth)
            if args.prebin:
                cfg = dataclasses.replace(cfg, prebin_host=True)
            if args.nodistort:
                cfg = dataclasses.replace(cfg, use_deskew=False)
            if args.vision:
                from velo_tpu.config import VisionConfig
                from velo_tpu.geom import camera as cam_mod

                cfg = dataclasses.replace(
                    cfg, use_vision=True,
                    vision=VisionConfig(height=128, width=384,
                                        k_tracks=128, grid_cols=24))
                if name[:2] == "v:":
                    vfields = {f.name: f.type for f in
                               dataclasses.fields(cfg.vision)}
                    def _cv(k, v):
                        ty = str(vfields[k])
                        if "bool" in ty:
                            return v in ("1", "true", "True")
                        if "int" in ty:
                            return int(v)
                        if "str" in ty:
                            return v
                        return float(v)
                    kv = dict(p.split("=") for p in name[2:].split("+"))
                    cfg = dataclasses.replace(
                        cfg, vision=dataclasses.replace(
                            cfg.vision, **{k: _cv(k, v)
                                           for k, v in kv.items()}))
                cam = cam_mod.Camera(
                    P=jnp.asarray(P, jnp.float32),
                    T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                    width=384, height=128)
                run = jax.jit(lambda c, s, m, im: odometry.run_scan(
                    c, s, m, cfg, images=im, cam=cam))
            else:
                run = jax.jit(lambda c, s, m: odometry.run_scan(c, s, m, cfg))
            carry = odometry.init_carry(cfg)
            t0 = time.perf_counter()
            if args.vision:
                carry, out = run(carry, scans_d, masks_d, images_d)
            else:
                carry, out = run(carry, scans_d, masks_d)
            jax.block_until_ready(out.T_w)
            dt = time.perf_counter() - t0
            poses_velo = np.asarray(out.T_w)

            def metrics_row(variant, poses_velo, secs):
                poses_cam = odometry.velo_to_cam_trajectory(poses_velo,
                                                            T_cam_velo)
                errs = kitti_metric.evaluate_trajectory(poses_cam, gt_cam)
                ate = kitti_metric.ate_rmse(poses_cam, gt_cam)
                F = len(poses_velo)
                rel_gt = np.asarray(
                    [np.linalg.inv(gt_velo[i - 1]) @ gt_velo[i]
                     for i in range(1, F)])
                rel_est = np.asarray(
                    [np.linalg.inv(poses_velo[i - 1]) @ poses_velo[i]
                     for i in range(1, F)])
                rel_err = np.asarray([np.linalg.inv(a) @ b
                                      for a, b in zip(rel_gt, rel_est)])
                rel = np.linalg.norm(rel_err[:, :3, 3], axis=1)
                # per-frame rotation error angle (deg)
                tr = np.clip((np.trace(rel_err[:, :3, :3], axis1=1, axis2=2)
                              - 1) / 2, -1, 1)
                rot = np.degrees(np.arccos(tr))
                return dict(
                    variant=variant, seed=seed,
                    t_err_pct=round(float(errs.t_err_pct), 3),
                    r_err_deg=round(float(errs.r_err_deg_per_100m), 3),
                    ate_m=round(float(ate), 3),
                    med_rel_err_m=round(float(np.median(rel)), 4),
                    max_rel_err_m=round(float(rel.max()), 3),
                    med_rot_err_deg=round(float(np.median(rot)), 4),
                    worst_frame=int(np.argmax(rel)) + 1,
                    degenerate=int(np.asarray(out.degenerate)[1:].sum()),
                    secs=round(secs, 1)), rel, rot

            row, rel, rot = metrics_row(name, poses_velo, dt)
            rows.append(row)
            print(json.dumps(row))
            if trail_meta is not None:
                with open(args.trail, "a") as f:
                    f.write(json.dumps(dict(row, **trail_meta)) + "\n")
            if args.smooth:
                from velo_tpu.pipeline import smoother

                t0 = time.perf_counter()
                refined = np.asarray(smoother.smooth_trajectory(
                    scans_d, masks_d, poses_velo, cfg,
                    window=args.smooth_window, passes=args.smooth_passes))
                srow, _, _ = metrics_row(name + "+smooth", refined,
                                         time.perf_counter() - t0)
                rows.append(srow)
                print(json.dumps(srow))
            if args.dump:
                # Every FrameResult diagnostic (lm_accept, gate/prior/map
                # activation flags, depth-track survivors, trust ramp, ...)
                # rides along so episode analysis needs only this dump.
                diag = {k: np.asarray(getattr(out, k))
                        for k in type(out)._fields if k != "T_w"}
                np.savez_compressed(
                    f"{args.dump}_{name.replace(':','_')}_s{seed}.npz",
                    rel=rel, rot=rot, poses_velo=poses_velo, gt_velo=gt_velo,
                    **diag)
    return rows


if __name__ == "__main__":
    main()
