"""Dataset driver CLI: the log_runner equivalent (src/log_runner.cpp).

Usage:
    python -m sparse_gslam_tpu.runner --dataset-dir datasets/sim \
        --dataset-name sim [--postfix -11] [--no-backend] [--eval]

Reads <dir>/slam<postfix>.yaml (+ line_extractor.yaml), replays
<dir>/<name>.log through the SLAM system, writes <dir>/<name>.result
+ .ftime/.btime/.dtime, and (with --eval) computes the relations ATE
against <dir>/<name>.relations, replacing the external metricEvaluator
flow (datasets/eval.sh).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def _dump_periodic_map(system, slam_cfg, args, prefix, n):
    """Periodic occupancy-map dump (--map-every): the live-rate
    visualization surface (reference visualizer.cpp:287-384 publishes
    occupancy maps from a background thread at visualize_rate)."""
    from .eval.maps import render_map, save_map_png

    est = system.frontend.estimates()
    if system.backend is not None and system.backend.pose_count > 0:
        import numpy as np

        pg = system.backend.pose_estimates()
        est = np.concatenate([pg, est[len(pg):]])
    if len(est) < 2:
        return
    probs, origin, res = render_map(
        system.frontend.keyframes, est, resolution=slam_cfg.map_resolution
    )
    base = args.map_png or (prefix + "-map.png")
    path = base.rsplit(".", 1)[0] + f"-{n:05d}.png"
    save_map_png(path, probs, est, origin, resolution=res)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--dataset-name", required=True)
    ap.add_argument("--postfix", default="")
    ap.add_argument("--no-backend", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument(
        "--realtime", action="store_true",
        help="simulated-realtime mode: frontend paced by timestamps, "
        "backend free-running on its own thread (log_runner.cpp:214-239)",
    )
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument(
        "--map-png", default="",
        help="write a global occupancy map PNG after the run",
    )
    ap.add_argument(
        "--map-every", type=int, default=0,
        help="also dump a map PNG every N frames during the run "
        "(<name>-map-NNNNN.png next to --map-png, or in the dataset "
        "dir): the periodic-visualization analog of the reference's "
        "live rviz occupancy topics (visualizer.cpp:287-384)",
    )
    ap.add_argument(
        "--live-view", type=float, default=0.0, metavar="HZ",
        help="render live maps at this rate on a background thread "
        "while the run progresses (<name>_live_{lm,pg}.png + "
        "_live_status.json, atomically replaced): the runtime "
        "equivalent of the reference's visualize_rate rviz surface "
        "(visualizer.cpp:425-441)",
    )
    ap.add_argument("--checkpoint", default="", help="save state here")
    ap.add_argument("--resume", default="", help="load state first")
    ap.add_argument(
        "--prewarm", action="store_true", default=None,
        help="parallel-compile expected jit shapes at startup "
        "(default: on for non-cpu platforms)",
    )
    ap.add_argument(
        "--no-prewarm", dest="prewarm", action="store_false",
    )
    ap.add_argument(
        "--profile", default="",
        help="write a jax.profiler trace of the run to this directory "
        "(view with tensorboard / xprof; kernel-level speed-of-light "
        "analysis, SURVEY.md §5 tracing)",
    )
    ap.add_argument(
        "--platform", default="cpu",
        help="jax platform for solver kernels (cpu keeps float64)",
    )
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", args.platform)
    import jax

    jax.config.update("jax_platforms", args.platform)
    from .utils.jaxcache import enable as _enable_cache

    _enable_cache(tag=args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    from .io.providers import create_data_provider
    from .io.result_writer import TimingWriter
    from .models.slam import SlamSystem
    from .utils.config import load_dataset_config

    slam_cfg, ls_cfg = load_dataset_config(args.dataset_dir, args.postfix)
    prefix = os.path.join(args.dataset_dir, args.dataset_name)
    provider = create_data_provider(slam_cfg.data_provider, prefix + ".log")

    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=not args.no_backend)
    system.timing = TimingWriter(prefix)
    if args.platform != "cpu":
        # collapse the jit bucket ladders: every distinct shape costs
        # up to ~60 s through the remote-compile tunnel, and at these
        # sizes the solves are latency-bound, so bigger uniform
        # buckets are strictly better (see SlamConfig.bucket_min_*)
        slam_cfg.bucket_min_poses = max(slam_cfg.bucket_min_poses, 64)
        slam_cfg.bucket_min_lms = max(slam_cfg.bucket_min_lms, 32)
        slam_cfg.bucket_min_edges = max(slam_cfg.bucket_min_edges, 256)
        slam_cfg.bucket_min_pg = max(slam_cfg.bucket_min_pg, 128)
    do_prewarm = (
        args.prewarm
        if args.prewarm is not None
        else args.platform != "cpu"
    )
    if do_prewarm:
        # compile the bucket-ladder shapes concurrently while the frame
        # loop starts; first real calls hit a warm cache instead of
        # stalling ~60 s each through the remote-compile tunnel
        from .utils.prewarm import prewarm

        prewarm(slam_cfg)
    if args.resume:
        from .utils.checkpoint import load_checkpoint

        load_checkpoint(args.resume, system)
        print(f"resumed from {args.resume}")

    if args.profile:
        jax.profiler.start_trace(args.profile)
    live = None
    if args.live_view > 0:
        from .eval.live_view import LiveVisualizer

        live = LiveVisualizer(system, prefix, rate=args.live_view)
        live.start()

    t0 = time.time()
    n = 0
    if args.realtime:
        frames = list(provider.frames())
        if args.max_frames:
            frames = frames[: args.max_frames]
        n = len(frames)
        if args.map_every:
            # periodic dumps interleave with the paced frontend; take
            # the system lock so the free-running backend thread can't
            # move the graph mid-render
            def paced(frames=frames):
                for k, fr in enumerate(frames):
                    yield fr
                    if (k + 1) % args.map_every == 0:
                        with system.lock:
                            _dump_periodic_map(
                                system, slam_cfg, args, prefix, k + 1
                            )

            system.run_realtime(paced(), rate=args.rate)
        else:
            system.run_realtime(frames, rate=args.rate)
        if live is not None:
            live.stop(final=True)
    else:
        for frame in provider.frames():
            if live is not None:
                # the live thread snapshots under system.lock; pair it
                # here (the realtime path already locks its ticks)
                with system.lock:
                    system.process_frame(frame)
            else:
                system.process_frame(frame)
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
            if args.map_every and n % args.map_every == 0:
                _dump_periodic_map(system, slam_cfg, args, prefix, n)
            if n % 500 == 0:
                print(
                    f"frame {n} kf={len(system.frontend.keyframes)} "
                    f"lms={len(system.frontend.landmarks)} "
                    f"({time.time() - t0:.1f}s)",
                    flush=True,
                )
        if live is not None:
            # quiesce the render thread before cleanup mutates the
            # graphs without the lock; a final frame renders below
            live.stop(final=False)
        system.final_cleanup()
        if live is not None:
            live.render_once()
    wall = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}")
    if args.checkpoint:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, system)
    system.timing.close()
    system.write_result(prefix + ".result")
    nkf = len(system.frontend.keyframes)
    print(
        f"done: {n} frames, {nkf} keyframes, "
        f"{len(system.frontend.landmarks)} landmarks, "
        f"{system.frontend.rejected_ticks} rejected ticks, "
        f"{wall:.1f}s wall ({n / max(wall, 1e-9):.1f} fps)"
    )
    if system.backend is not None:
        print(
            f"backend: {system.backend.submap_count} submaps, "
            f"{system.backend.closure_count} closures "
            f"({system.backend.false_closure_count} pruned)"
        )
    # compile vs steady-state timing (reference discipline has no
    # compile phase; raw maxima conflate the two -- calc_time.py:13-23)
    from .models.slam import steady_stats
    from .utils import compilewatch

    fm, fx, fn_ = steady_stats(
        system.frontend_times, system.frontend_compiled
    )
    bm, bx, bn_ = steady_stats(
        system.backend_times, system.backend_compiled
    )
    print(
        f"steady-state: frontend mean {fm * 1e3:.1f} ms / max "
        f"{fx * 1e3:.1f} ms (n={fn_}), backend mean {bm * 1e3:.1f} ms "
        f"/ max {bx * 1e3:.1f} ms (n={bn_}); compile total "
        f"{compilewatch.total() - system.compile_s_at_start:.1f} s"
    )

    if args.map_png:
        from .eval.maps import render_map, save_map_png

        est = system.frontend.estimates()
        if system.backend is not None and system.backend.pose_count > 0:
            import numpy as np

            pg = system.backend.pose_estimates()
            est = np.concatenate([pg, est[len(pg):]])
        probs, origin, res = render_map(
            system.frontend.keyframes, est,
            resolution=slam_cfg.map_resolution,
        )
        save_map_png(args.map_png, probs, est, origin, resolution=res)
        print(f"map written to {args.map_png}")

    if args.eval:
        from .eval.relations import evaluate_files

        rel = prefix + ".relations"
        if os.path.exists(rel):
            print(evaluate_files(prefix + ".result", rel))
        else:
            print(f"no relations file at {rel}; skipping eval")

        gt_path = prefix + ".gt"
        if (
            os.path.exists(gt_path)
            and system.backend is not None
            and system.backend.closures
        ):
            from .eval.closures import closure_pr, load_gt

            gt_times, gt_poses = load_gt(gt_path)
            kfs = system.frontend.keyframes
            triples = [
                (
                    kfs[c.i].odom_times[0],
                    kfs[c.j].odom_times[0],
                    c.meas,
                )
                for c in system.backend.closures
                if c.active and not c.suppressed and c.kind == "loop"
            ]
            n_local = sum(
                1
                for c in system.backend.closures
                if c.active and c.kind == "local"
            )
            if n_local:
                print(f"local refinement edges: {n_local}")
            n_sup = system.backend.suppressed_closure_count
            if n_sup:
                print(f"consistency-suppressed closures: {n_sup}")
            infos = [
                c.info
                for c in system.backend.closures
                if c.active and not c.suppressed and c.kind == "loop"
            ]
            pr = closure_pr(
                triples, gt_times, gt_poses,
                # a closure across the full candidate-gate distance is
                # legitimate; what makes one false is a wrong
                # MEASUREMENT (trans/rot tolerance), not endpoint span
                match_radius=max(6.0, slam_cfg.max_match_distance + 2.0),
                infos=infos,
            )
            print(
                f"closures: precision {pr['precision']:.2f} "
                f"({pr['n_true']}/{pr['n_closures']} true), "
                f"ridge-aware precision {pr['precision_ridge']:.2f} "
                f"({pr['n_true_ridge']}/{pr['n_closures']}), "
                f"recall {pr['recall']:.2f} "
                f"({pr['n_detected']}/{pr['n_segments']} revisit "
                f"segments detected)"
            )
            # per-closure diagnostics for the FALSE ones: which pair,
            # and how the measurement disagrees with ground truth
            import numpy as np

            from .eval.closures import interp_gt
            from .utils import se2

            active = [
                c
                for c in system.backend.closures
                if c.active and not c.suppressed and c.kind == "loop"
            ]
            from .ops.solvers import closure_chi2

            g = system.backend._build_pg_data()
            chi2 = np.asarray(closure_chi2(g))
            chi2_of = {
                (c.i, c.j): chi2[k]
                for k, c in enumerate(system.backend.closures)
            }
            # information-weighted GT error per closure: err^T I err,
            # the closure's actual pull on the graph. The P/R metric's
            # 0.5 m tolerance counts RAW error; a ridge measurement
            # with an honestly-wide along-ridge sigma can be "false"
            # by raw error yet carry no more weighted pull than a true
            # closure (VERDICT r2 next-step #4 quantification).
            true_w, false_rows = [], []
            for c, (t_i, t_j, meas), ok, rok, dec in zip(
                active, triples, pr["verdicts"],
                pr["ridge_verdicts"], pr["ridge_rows"],
            ):
                gi = interp_gt(gt_times, gt_poses, t_i)
                gj = interp_gt(gt_times, gt_poses, t_j)
                rel = se2.relative(gi, gj)
                err = se2.relative(rel, np.asarray(meas, np.float64))
                err[2] = se2.wrap_angle(err[2])
                w = float(err @ np.asarray(c.info, np.float64) @ err)
                if ok:
                    true_w.append(w)
                    continue
                sig = np.sqrt(np.diag(np.linalg.inv(c.info)))
                false_rows.append((c, err, gi, gj, sig, w, rok, dec))
            if true_w:
                print(
                    "  true closures gt-weighted chi2: "
                    f"median {np.median(true_w):.1f}, "
                    f"max {np.max(true_w):.1f} (n={len(true_w)})"
                )
            if os.environ.get("SLAM_LOG_CLOSURES"):
                # full accept-order closure table (gate calibration)
                for c, ok, rok in zip(
                    active, pr["verdicts"], pr["ridge_verdicts"]
                ):
                    print(
                        f"  closure kf{c.i}->kf{c.j} "
                        f"{'TRUE ' if ok else 'false'}"
                        f"{'' if rok else '/ridge-FALSE'} "
                        f"drift={c.along_drift:.2f} "
                        f"sig_along={c.sigma_along:.2f}"
                    )
            # accept-time along-ridge drift spread of the TRUE ridge
            # closures (calibrates closure_ridge_max_drift: the gate
            # must clear these while killing the aliases)
            tad = [
                c.along_drift
                for c, ok in zip(active, pr["verdicts"])
                if ok and np.isfinite(c.along_drift)
                and c.sigma_along > slam_cfg.closure_ridge_sigma
            ]
            if tad:
                print(
                    "  true ridge closures along-drift: "
                    f"median {np.median(tad):.2f} m, "
                    f"max {np.max(tad):.2f} m (n={len(tad)})"
                )
            if system.backend.ridge_drift_rejects:
                print(
                    "  ridge-drift rejected matches: "
                    f"{system.backend.ridge_drift_rejects}"
                )
            for c, err, gi, gj, sig, w, rok, dec in false_rows:
                tag = "ridge-ok" if rok else "ridge-FALSE"
                print(
                    f"  FALSE closure kf{c.i}->kf{c.j} "
                    f"err=({err[0]:+.2f},{err[1]:+.2f},"
                    f"{np.degrees(err[2]):+.1f}deg) "
                    f"gt_dist={np.linalg.norm(gi[:2] - gj[:2]):.1f}m "
                    f"sigma=({sig[0]:.2f},{sig[1]:.2f},{sig[2]:.2f}) "
                    f"gt_chi2={w:.1f} "
                    f"chi2={chi2_of[(c.i, c.j)]:.1f} "
                    f"[{tag}: along={dec['along']:.2f}/"
                    f"sig {dec['sigma_along']:.2f}, "
                    f"cross={dec['cross']:.2f}] "
                    f"accept_drift={c.along_drift:.2f}m"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
