"""Command-line entry point.

The reference exposes a bare ``LightningCLI`` driven by YAML
(``lightning_cli.py`` + ``configurations/*.yaml``); here the four canonical
experiments are named presets:

    python -m davo_tpu.cli fit --preset calibration_from_oracle_matches \
        --epochs 5 --checkpoint-dir /tmp/run1
    python -m davo_tpu.cli eval --preset calibration_from_oracle_matches \
        --checkpoint-dir /tmp/run1
    python -m davo_tpu.cli bench
    python -m davo_tpu.cli presets
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _add_common(p):
    p.add_argument("--preset", default="calibration_from_oracle_matches")
    p.add_argument(
        "--config",
        default=None,
        help="YAML experiment config (see configurations/*.yaml); its "
        "optional `preset:` key replaces --preset, CLI flags override both",
    )
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--batches-per-epoch", type=int, default=None)
    p.add_argument("--val-batches", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--metrics-file", default=None, help="JSONL metrics log")
    p.add_argument(
        "--tensorboard-dir", default=None, help="TensorBoard event dir"
    )
    p.add_argument("--platform", default=None, help="force a jax platform (cpu/tpu)")
    p.add_argument("--head", default=None, help="guess head: mlp | transformer")
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--hidden-size", type=int, default=None)
    p.add_argument("--transformer-layers", type=int, default=None)
    p.add_argument("--transformer-heads", type=int, default=None)
    p.add_argument(
        "--guess-tokens",
        type=int,
        default=None,
        help="transformer-head readout tokens (winner-take-all multi-guess)",
    )
    p.add_argument(
        "--solver",
        choices=("bfgs", "lbfgs"),
        default=None,
        help="in-forward solver; lbfgs converts the preset's BFGS config "
        "(shared fields carried over, no dense inverse-Hessian carry)",
    )
    p.add_argument(
        "--lbfgs-history", type=int, default=None, help="L-BFGS memory m"
    )


def _apply_overrides(config, args):
    updates = {}
    for field in (
        "epochs",
        "batch_size",
        "batches_per_epoch",
        "val_batches",
        "seed",
        "head",
        "learning_rate",
        "hidden_size",
        "transformer_layers",
        "transformer_heads",
        "guess_tokens",
    ):
        value = getattr(args, field, None)
        if value is not None and hasattr(config, field):
            updates[field] = value
    if updates:
        config = dataclasses.replace(config, **updates)
    if getattr(args, "solver", None) == "lbfgs" and hasattr(config, "solver"):
        from davo_tpu.solve import LBFGSConfig

        shared = {f.name for f in dataclasses.fields(LBFGSConfig)} & {
            f.name for f in dataclasses.fields(type(config.solver))
        }
        kwargs = {k: getattr(config.solver, k) for k in shared}
        if getattr(args, "lbfgs_history", None):
            kwargs["history"] = args.lbfgs_history
        config = dataclasses.replace(config, solver=LBFGSConfig(**kwargs))
    return config


def _load_guess_fn(
    checkpoint: str,
    window: int,
    points: int,
    restarts: int = 8,
    hidden_size=None,
    transformer_layers=None,
    transformer_heads=None,
):
    """Build a jitted guess+solve fn from a `.pkl` guess checkpoint
    (the vo-eval/eval-seq learned path's window solver)."""
    import pickle

    import jax

    from davo_tpu.train import get_preset

    net_cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        num_views=window,
        num_points=points,
        num_restarts=restarts,
    )
    for field, value in (
        ("hidden_size", hidden_size),
        ("transformer_layers", transformer_layers),
        ("transformer_heads", transformer_heads),
    ):
        if value is not None:
            net_cfg = dataclasses.replace(net_cfg, **{field: value})
    net = net_cfg.build_network()
    with open(checkpoint, "rb") as f:
        restored = pickle.load(f)
    variables = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }

    @jax.jit
    def guess_fn(pw, vw):
        return net.apply(variables, pw, vw)

    return guess_fn


def _load_frontend_fn(
    frontend_checkpoint: str,
    default_points: int,
    image_size: int = 64,
    **gates,
):
    """Build a jitted front-end fn (+ its RenderConfig) from a
    `fit-frontend` checkpoint directory. ``gates`` override the
    VOFrontend verification-gate defaults."""
    import os

    import jax

    from davo_tpu.data.rendering import RenderConfig
    from davo_tpu.models import VOFrontend
    from davo_tpu.train import restore_checkpoint

    arch_path = os.path.join(frontend_checkpoint, "frontend_config.json")
    arch = {}
    if os.path.exists(arch_path):
        with open(arch_path) as f:
            arch = json.load(f)
    image_size = arch.pop("image_size", image_size)
    render_config = RenderConfig(image_size=image_size)
    frontend_net = VOFrontend(
        num_select=arch.get("num_select", default_points),
        descriptor_channels=arch.get("descriptor_channels", 64),
        embedding_size=arch.get("embedding_size", 64),
        **gates,
    )
    fe_restored = restore_checkpoint(frontend_checkpoint)
    fe_vars = {
        "params": fe_restored["params"],
        "batch_stats": fe_restored.get("batch_stats", {}),
    }

    @jax.jit
    def frontend_fn(images):
        out = frontend_net.apply(fe_vars, images)
        return out.matches, out.match_visibility

    @jax.jit
    def detections_fn(images):
        out = frontend_net.apply(fe_vars, images)
        return out.points, jax.nn.sigmoid(out.scores)

    return frontend_fn, detections_fn, render_config


def _cmd_runs(args):
    """``davo_tpu runs list|show|compare`` — registry browse surface."""
    from davo_tpu.train.runs import (
        compare_runs,
        final_metrics,
        load_registry,
        metrics_path_for,
    )

    rows = load_registry(args.registry_dir)
    if not rows:
        print(f"no runs registered under {args.registry_dir}", file=sys.stderr)
        return 1

    def select(run_id_prefix):
        matches = [
            r for r in rows if r.get("run_id", "").startswith(run_id_prefix)
        ]
        if not matches:
            print(f"no run matches {run_id_prefix!r}", file=sys.stderr)
        elif len(matches) > 1:
            print(
                f"{run_id_prefix!r} is ambiguous: "
                + ", ".join(r["run_id"] for r in matches),
                file=sys.stderr,
            )
            matches = []
        return matches

    if args.action == "list":
        for row in rows:
            final = final_metrics(row)
            val = final.get("val") or final.get("train") or {}
            loss = val.get("loss")
            print(
                json.dumps(
                    {
                        "run_id": row.get("run_id"),
                        "name": row.get("name"),
                        "created": row.get("created"),
                        "git_sha": (row.get("git_sha") or "")[:10],
                        "backend": row.get("backend"),
                        "checkpoint_dir": row.get("checkpoint_dir"),
                        "final_loss": None if loss is None else round(loss, 6),
                    }
                )
            )
        return 0

    if args.action == "show":
        if len(args.run_ids) != 1:
            print("runs show takes exactly one run id", file=sys.stderr)
            return 2
        matches = select(args.run_ids[0])
        if not matches:
            return 1
        row = matches[0]
        print(
            json.dumps(
                {
                    **row,
                    "metrics_file": metrics_path_for(row),
                    "final_metrics": final_metrics(row),
                },
                indent=2,
            )
        )
        return 0

    # compare
    selected = []
    for prefix in args.run_ids or [r["run_id"] for r in rows]:
        matches = select(prefix)
        if not matches:
            return 1
        selected.extend(matches)
    print(json.dumps(compare_runs(selected, split=args.split), indent=2))
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="davo_tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    fit_p = sub.add_parser("fit", help="train a preset experiment")
    _add_common(fit_p)
    eval_p = sub.add_parser("eval", help="evaluate a trained checkpoint")
    _add_common(eval_p)
    eval_p.add_argument("--batches", type=int, default=16)
    eval_p.add_argument(
        "--restarts", type=int, default=None, help="multi-start eval solves"
    )
    eval_p.add_argument(
        "--selection", default=None, help="restart selection: error | basin"
    )
    eval_p.add_argument(
        "--restart-proposals",
        default=None,
        help="restart proposals: noise | permutation",
    )
    eval_p.add_argument(
        "--basin-anchor",
        type=float,
        default=None,
        help="basin-score pull towards the guess focal (0 disables)",
    )
    sub.add_parser("bench", help="run the headline benchmark")
    sub.add_parser("presets", help="list experiment presets")
    seq_p = sub.add_parser(
        "eval-seq",
        help="evaluate trajectories in TUM/KITTI file formats: compare an "
        "estimate against ground truth, or run windowed VO along a "
        "ground-truth file with synthesized landmarks",
    )
    seq_p.add_argument("--gt", required=True, help="ground-truth trajectory file")
    seq_p.add_argument(
        "--est", default=None, help="estimated trajectory file (compare mode)"
    )
    seq_p.add_argument("--format", default="tum", choices=("tum", "kitti"))
    seq_p.add_argument(
        "--max-dt", type=float, default=0.02, help="TUM association window (s)"
    )
    seq_p.add_argument(
        "--intrinsics", default=None, help="intrinsics file (fx fy cx cy)"
    )
    seq_p.add_argument(
        "--calib", default=None, help="KITTI calib.txt (P0 row)"
    )
    seq_p.add_argument("--window", type=int, default=4)
    seq_p.add_argument("--points", type=int, default=32)
    seq_p.add_argument("--max-frames", type=int, default=None)
    seq_p.add_argument("--rpe-delta", type=int, default=1)
    seq_p.add_argument("--seed", type=int, default=0)
    seq_p.add_argument("--platform", default=None)
    seq_p.add_argument(
        "--checkpoint",
        default=None,
        help="guess-network .pkl: run the LEARNED windowed VO along the "
        "file instead of the oracle-intrinsics solver",
    )
    seq_p.add_argument(
        "--frontend-checkpoint",
        default=None,
        help="fit-frontend checkpoint dir: render frames along the file "
        "and take every window's observations from the visual front-end "
        "(end-to-end from pixels; requires --checkpoint)",
    )
    seq_p.add_argument("--restarts", type=int, default=8)
    seq_p.add_argument("--hidden-size", type=int, default=None)
    seq_p.add_argument("--transformer-layers", type=int, default=None)
    seq_p.add_argument("--transformer-heads", type=int, default=None)
    seq_p.add_argument(
        "--stitch", default="global", help="global | robust | chain"
    )
    seq_p.add_argument(
        "--pipeline",
        default="windows",
        choices=("windows", "incremental"),
        help="windows: per-window solves + stitching; incremental: "
        "learned bootstrap + PnP/triangulation/BA over detections",
    )
    fe_p = sub.add_parser(
        "fit-frontend",
        help="train the visual front-end (detector + attention matcher)",
    )
    fe_p.add_argument("--epochs", type=int, default=None)
    fe_p.add_argument("--batch-size", type=int, default=None)
    fe_p.add_argument("--batches-per-epoch", type=int, default=None)
    fe_p.add_argument("--image-size", type=int, default=None)
    fe_p.add_argument("--points", type=int, default=None)
    fe_p.add_argument(
        "--select",
        type=int,
        default=None,
        help="solver-facing tracks per window (default: same as --points; "
        "training with more scene points than selected tracks teaches "
        "descriptor discrimination on denser scenes)",
    )
    fe_p.add_argument("--views", type=int, default=None)
    fe_p.add_argument("--learning-rate", type=float, default=None)
    fe_p.add_argument("--seed", type=int, default=None)
    fe_p.add_argument("--checkpoint-dir", default=None)
    fe_p.add_argument("--metrics-file", default=None)
    fe_p.add_argument("--tensorboard-dir", default=None)
    fe_p.add_argument("--platform", default=None)
    ls_p = sub.add_parser(
        "fit-learned-solver",
        help="train an MLP/transformer learned solver on the calibration "
        "objective and compare against BFGS at equal step budget",
    )
    ls_p.add_argument(
        "--solver-type",
        default="mlp",
        choices=("mlp", "transformer", "direction"),
        help="mlp/transformer: learned update rule; direction: train the "
        "SearchDirectionHeuristic gate inside the real BFGS solve",
    )
    ls_p.add_argument(
        "--loss-mode",
        default=None,
        choices=("final", "descent"),
        help="final-objective loss, or per-step descent-aligned loss",
    )
    ls_p.add_argument("--steps", type=int, default=None, help="solver steps")
    ls_p.add_argument("--epochs", type=int, default=None)
    ls_p.add_argument("--batch-size", type=int, default=None)
    ls_p.add_argument("--batches-per-epoch", type=int, default=None)
    ls_p.add_argument("--hidden-size", type=int, default=None)
    ls_p.add_argument("--learning-rate", type=float, default=None)
    ls_p.add_argument("--start-noise", type=float, default=None)
    ls_p.add_argument("--no-recurrent", action="store_true")
    ls_p.add_argument("--seed", type=int, default=None)
    ls_p.add_argument("--metrics-file", default=None)
    ls_p.add_argument(
        "--checkpoint-file", default=None,
        help="pickle the trained solver state here (diagnosis/re-eval)",
    )
    ls_p.add_argument("--tensorboard-dir", default=None)
    ls_p.add_argument("--platform", default=None)
    dist_p = sub.add_parser(
        "eval-distorted",
        help="Brown-Conrady distorted calibration: LM recovery of all 16 "
        "parameters from observed pixels of known world points",
    )
    dist_p.add_argument("--batches", type=int, default=4)
    dist_p.add_argument("--batch-size", type=int, default=16)
    dist_p.add_argument("--points", type=int, default=32)
    dist_p.add_argument("--perturbation", type=float, default=0.02)
    dist_p.add_argument("--pixel-noise", type=float, default=0.0)
    dist_p.add_argument("--lm-iterations", type=int, default=60)
    dist_p.add_argument("--seed", type=int, default=0)
    dist_p.add_argument("--platform", default=None)
    vo_p = sub.add_parser(
        "vo-eval", help="full learned VO on synthetic sequences"
    )
    vo_p.add_argument("--checkpoint", required=True, help="checkpoint .pkl")
    vo_p.add_argument("--frames", type=int, default=16)
    vo_p.add_argument("--window", type=int, default=4)
    vo_p.add_argument("--points", type=int, default=8)
    vo_p.add_argument("--trials", type=int, default=3)
    vo_p.add_argument("--restarts", type=int, default=8)
    vo_p.add_argument("--selection", default="error", help="error | basin")
    vo_p.add_argument("--basin-anchor", type=float, default=0.0)
    vo_p.add_argument("--hidden-size", type=int, default=None)
    vo_p.add_argument("--transformer-layers", type=int, default=None)
    vo_p.add_argument("--transformer-heads", type=int, default=None)
    vo_p.add_argument("--no-refine", action="store_true")
    vo_p.add_argument(
        "--stitch",
        default="global",
        help="window stitching: global (overlap-consistent joint "
        "centre/scale solve) | robust (global + Huber-IRLS edge weights "
        "that confine catastrophic window solves) | chain (greedy "
        "single-pair scale chaining)",
    )
    vo_p.add_argument(
        "--stride",
        type=int,
        default=0,
        help="window stride (0 = window - 2); smaller = more overlap "
        "constraints for the stitcher, more guess/solve calls",
    )
    vo_p.add_argument(
        "--refine-rounds",
        type=int,
        default=1,
        help="alternating re-triangulation + BA rounds in the refinement",
    )
    vo_p.add_argument(
        "--multistart",
        type=int,
        default=0,
        help="refine this many scale-mode hypotheses of the stitched "
        "trajectory in one vmapped batch and keep the lowest-cost one "
        "(0 = single-start refinement)",
    )
    vo_p.add_argument(
        "--host-polish",
        action="store_true",
        help="final float64 global BA on the host CPU (removes the f32 "
        "normal-equation precision floor; TPUs have no native f64)",
    )
    vo_p.add_argument("--platform", default=None)
    vo_p.add_argument(
        "--pipeline",
        default="windows",
        choices=("windows", "incremental"),
        help="windows: independent per-window solves + stitching; "
        "incremental: learned bootstrap window + PnP/triangulation/BA "
        "accumulation over the global tracks (robust to sparse matches)",
    )
    vo_p.add_argument(
        "--association",
        default="geometric",
        choices=("geometric", "descriptor"),
        help="incremental-pipeline track identity: geometric (predict "
        "structure projections, associate to raw detections — immune to "
        "descriptor ambiguity) or descriptor (matcher tracks)",
    )
    vo_p.add_argument(
        "--pnp-ransac",
        type=int,
        default=0,
        help="incremental pipeline: RANSAC subsets per per-frame PnP "
        "(0 = plain robust LM); protects the pose from single wrong "
        "associations",
    )
    vo_p.add_argument(
        "--chain-passes",
        type=int,
        default=1,
        help="incremental pipeline: total association passes; passes "
        "after the first rebuild all associations from scratch under "
        "the previous pass's refined trajectory, traversing in the "
        "opposite direction",
    )
    vo_p.add_argument(
        "--ba-irls",
        type=int,
        default=0,
        help="incremental pipeline: in-call Huber IRLS rounds inside "
        "every accumulator BA (soft down-weighting of observations far "
        "above the median residual; measured to cut hard-seed ATE where "
        "hard rejection makes it worse)",
    )
    vo_p.add_argument(
        "--ba-iterations",
        type=int,
        default=None,
        help="incremental pipeline: Schur-BA LM iterations per solve "
        "(default keeps TrajectoryConfig's 10; the round-5 error budget "
        "measured 30 together with --ba-irls 4 recovering ~15%% mean "
        "ATE on the official seeds for pure compute)",
    )
    vo_p.add_argument(
        "--num-bootstraps",
        type=int,
        default=3,
        help="incremental pipeline: candidate bootstrap windows tried; "
        "the chain with the lowest coverage-penalised self-consistency "
        "cost wins",
    )
    vo_p.add_argument(
        "--window-irls",
        type=int,
        default=0,
        help="geometry-informed IRLS re-solves per window: Huber-"
        "downweight observations inconsistent with the window's own "
        "solution and re-solve (outlier robustness the descriptor gates "
        "cannot provide)",
    )
    vo_p.add_argument(
        "--soft-gate-floor",
        type=float,
        default=0.0,
        help="failed verification gates keep this solve weight instead "
        "of 0 (full constraint count; see VOFrontend.soft_gate_floor)",
    )
    vo_p.add_argument(
        "--matches",
        default="oracle",
        choices=("oracle", "learned"),
        help="window observations: oracle projections, or the trained "
        "visual front-end (detector + attention matcher) run on rendered "
        "frames (requires --frontend-checkpoint)",
    )
    vo_p.add_argument(
        "--frontend-checkpoint",
        default=None,
        help="checkpoint directory from `fit-frontend`",
    )
    vo_p.add_argument("--image-size", type=int, default=64)
    vo_p.add_argument(
        "--match-confidence",
        type=float,
        default=0.0,
        help="mask learned matches whose peak attention weight is below "
        "this (0 = no gating)",
    )
    vo_p.add_argument(
        "--nms-radius",
        type=float,
        default=0.1,
        help="greedy NMS radius (in [-1,1] units) for anchor-feature "
        "selection; suppresses duplicate detections of one blob "
        "(~2x rendered blob sigma; 0 disables)",
    )
    vo_p.add_argument(
        "--snap-radius",
        type=float,
        default=0.0,
        help="snap regressed matches to the nearest detected feature in "
        "their view and reject ones farther than this (0 disables)",
    )
    vo_p.add_argument(
        "--cycle-threshold",
        type=float,
        default=0.0,
        help="reject matches whose reverse match (target -> anchor) "
        "round-trips farther than this from the anchor feature "
        "(0 disables)",
    )
    vo_p.add_argument(
        "--quality-bonus",
        type=float,
        default=0.0,
        help="bias anchor-track selection toward tracks passing the "
        "verification gates in many views (0 = pure detection score)",
    )
    vo_p.add_argument(
        "--score-threshold",
        type=float,
        default=0.0,
        help="drop tracks whose anchor detection probability is below "
        "this (masks junk tracks when < N real blobs are visible)",
    )
    vo_p.add_argument(
        "--centroid-refine",
        type=int,
        default=0,
        help="subpixel mean-shift iterations refining every detection to "
        "the local intensity centroid (0 disables)",
    )
    vo_p.add_argument(
        "--scene-points",
        type=int,
        default=0,
        help="landmarks in the rendered scene (learned matches only; "
        "0 = same as --points). More landmarks than solver slots lets "
        "the front-end select the best verified tracks, like a real VO "
        "feature pipeline",
    )
    vo_p.add_argument(
        "--track-points",
        type=int,
        default=0,
        help="width of the learned GLOBAL tracks fed to the refinement "
        "stage (0 = same as --points); refinement has no fixed-N "
        "constraint, so more verified tracks tighten the BA",
    )
    vo_p.add_argument(
        "--track-anchors",
        type=int,
        default=1,
        choices=(1, 2),
        help="2 = also track the reversed sequence (anchor at BOTH ends) "
        "and concatenate: frame-0-anchored tracks go blind by mid-orbit; "
        "dual anchoring keeps every frame observed",
    )
    runs_p = sub.add_parser(
        "runs",
        help="browse the run registry (the serverless MLflow-parity "
        "surface, reference README.md:3-8): list runs, show one run's "
        "manifest + final metrics, or compare several side by side",
    )
    runs_p.add_argument("action", choices=("list", "show", "compare"))
    runs_p.add_argument(
        "run_ids",
        nargs="*",
        help="run ids for show/compare (unique prefixes accepted; "
        "compare with none selects every run)",
    )
    runs_p.add_argument("--registry-dir", default="artifacts/runs")
    runs_p.add_argument(
        "--split", default="val", help="metrics split for compare"
    )
    args = parser.parse_args(argv)

    if args.command == "presets":
        from davo_tpu.train import PRESETS

        for name, builder in sorted(PRESETS.items()):
            print(f"{name}: {type(builder()).__name__}")
        return 0

    if args.command == "runs":
        return _cmd_runs(args)

    if args.command == "bench":
        # bench.py lives at the repo root (next to the package), which is
        # not necessarily on sys.path when invoked from elsewhere.
        import os

        repo_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import bench

        bench.main()
        return 0

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.command == "eval-distorted":
        import jax.numpy as jnp

        from davo_tpu.camera import (
            DistortedSceneConfig,
            evaluate_distorted_calibration,
        )
        from davo_tpu.solve.least_squares import LMConfig

        results = []
        for i in range(args.batches):
            results.append(
                evaluate_distorted_calibration(
                    jax.random.key(args.seed + i),
                    batch=args.batch_size,
                    perturbation=args.perturbation,
                    pixel_noise=args.pixel_noise,
                    scene=DistortedSceneConfig(num_points=args.points),
                    lm=LMConfig(iterations=args.lm_iterations),
                )
            )
        avg = {
            k: float(sum(r[k] for r in results) / len(results))
            for k in results[0]
        }
        avg["worst_max_param_error"] = float(
            max(r["max_param_error"] for r in results)
        )
        print(json.dumps(avg))
        return 0

    if args.command == "eval-seq":
        from davo_tpu.data.sequences import (
            associate_timestamps,
            load_kitti_calib,
            load_sequence,
            load_tum_intrinsics,
        )
        from davo_tpu.train.evaluation import (
            absolute_trajectory_error,
            camera_centers_from_poses,
            relative_pose_error,
        )

        intrinsics = None
        if args.intrinsics:
            intrinsics = load_tum_intrinsics(args.intrinsics)
        elif args.calib:
            intrinsics = load_kitti_calib(args.calib)

        if args.est:
            # compare mode: estimate file vs ground-truth file
            gt = load_sequence(args.gt, args.format)
            est = load_sequence(args.est, args.format)
            gt_poses, est_poses = gt.poses, est.poses
            if (
                args.format == "tum"
                and gt.timestamps is not None
                and est.timestamps is not None
            ):
                ia, ib = associate_timestamps(
                    est.timestamps, gt.timestamps, max_dt=args.max_dt
                )
                if len(ia) == 0:
                    print("no associated timestamp pairs", file=sys.stderr)
                    return 1
                est_poses, gt_poses = est.poses[ia], gt.poses[ib]
            else:
                k = min(gt_poses.shape[0], est_poses.shape[0])
                gt_poses, est_poses = gt_poses[:k], est_poses[:k]
            est_c = camera_centers_from_poses(
                est_poses[:, 0:3], est_poses[:, 3:6]
            )
            gt_c = camera_centers_from_poses(gt_poses[:, 0:3], gt_poses[:, 3:6])
            metrics = {
                f"ate_{name}": value
                for name, value in absolute_trajectory_error(est_c, gt_c).items()
            }
            metrics.update(
                {
                    f"rpe_{name}": value
                    for name, value in relative_pose_error(
                        est_poses, gt_poses, delta=args.rpe_delta
                    ).items()
                }
            )
            metrics["pairs"] = est_poses.shape[0]
            print(json.dumps({k: float(v) for k, v in metrics.items()}))
            return 0

        # VO mode: run windowed VO along the file's trajectory
        from davo_tpu.train.vo_eval import (
            TrajectoryConfig,
            evaluate_vo_sequence_file,
        )

        guess_fn = None
        frontend_fn = None
        render_config = None
        if args.checkpoint:
            guess_fn = _load_guess_fn(
                args.checkpoint,
                args.window,
                args.points,
                restarts=args.restarts,
                hidden_size=args.hidden_size,
                transformer_layers=args.transformer_layers,
                transformer_heads=args.transformer_heads,
            )
            if args.frontend_checkpoint:
                # verification-gate defaults = the measured round-2
                # diagnosis config (scripts/diagnose_learned_matches.py)
                frontend_fn, _frontend_detections_fn, render_config = (
                    _load_frontend_fn(
                        args.frontend_checkpoint,
                        args.points,
                        nms_radius=0.1,
                        centroid_refine_iters=2,
                        snap_radius=0.08,
                        cycle_threshold=0.08,
                        quality_bonus=10.0,
                        score_threshold=0.5,
                    )
                )
        elif args.frontend_checkpoint:
            print(
                "--frontend-checkpoint requires --checkpoint",
                file=sys.stderr,
            )
            return 2

        detections_fn = None
        if (
            frontend_fn is not None
            and getattr(args, "pipeline", "windows") == "incremental"
        ):
            detections_fn = _frontend_detections_fn
        metrics = evaluate_vo_sequence_file(
            args.gt,
            format=args.format,
            config=TrajectoryConfig(window=args.window),
            key=jax.random.key(args.seed),
            intrinsics=intrinsics,
            max_frames=args.max_frames,
            num_points=args.points,
            guess_fn=guess_fn,
            frontend_fn=frontend_fn,
            render_config=render_config,
            stitch=args.stitch,
            pipeline=getattr(args, "pipeline", "windows"),
            detections_fn=detections_fn,
        )
        print(json.dumps({k: float(v) for k, v in metrics.items()}))
        return 0

    if args.command == "fit-learned-solver":
        from davo_tpu.train import (
            LearnedSolverExperiment,
            compare_with_bfgs,
            fit_learned_solver,
        )
        from davo_tpu.train.metrics import MetricsLogger

        ls_cfg = LearnedSolverExperiment(solver_type=args.solver_type)
        updates = {}
        for cli_name, field in (
            ("steps", "num_steps"),
            ("epochs", "epochs"),
            ("batch_size", "batch_size"),
            ("batches_per_epoch", "batches_per_epoch"),
            ("hidden_size", "hidden_size"),
            ("learning_rate", "learning_rate"),
            ("start_noise", "start_noise"),
            ("seed", "seed"),
        ):
            value = getattr(args, cli_name, None)
            if value is not None:
                updates[field] = value
        if args.no_recurrent:
            updates["recurrent"] = False
        if getattr(args, "loss_mode", None):
            updates["loss_mode"] = args.loss_mode
        if updates:
            ls_cfg = dataclasses.replace(ls_cfg, **updates)
        from davo_tpu.train.runs import make_run_manifest, register_run

        manifest = make_run_manifest(
            ls_cfg, name="fit-learned-solver",
            tags={"command": args.command},
        )
        register_run(manifest)
        logger = MetricsLogger(
            args.metrics_file,
            tensorboard_dir=getattr(args, "tensorboard_dir", None),
            run=manifest,
        )
        network, state, history = fit_learned_solver(ls_cfg, log_fn=logger)
        if getattr(args, "checkpoint_file", None):
            import pickle

            with open(args.checkpoint_file, "wb") as f:
                pickle.dump(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "config": dataclasses.asdict(ls_cfg),
                    },
                    f,
                )
        table = compare_with_bfgs(
            network, state, ls_cfg, jax.random.key(ls_cfg.seed + 1)
        )
        print(json.dumps({"comparison": table}))
        return 0

    if args.command == "fit-frontend":
        from davo_tpu.train import FrontendExperiment, fit_frontend, save_checkpoint
        from davo_tpu.train.metrics import MetricsLogger

        fe_cfg = FrontendExperiment()
        updates = {}
        for cli_name, field in (
            ("epochs", "epochs"),
            ("batch_size", "batch_size"),
            ("batches_per_epoch", "batches_per_epoch"),
            ("image_size", "image_size"),
            ("points", "num_points"),
            ("views", "num_views"),
            ("learning_rate", "learning_rate"),
            ("seed", "seed"),
        ):
            value = getattr(args, cli_name, None)
            if value is not None:
                updates[field] = value
        if getattr(args, "select", None):
            updates["num_select"] = args.select
        if "num_points" in updates:
            updates.setdefault("num_select", updates["num_points"])
        if updates.get("image_size"):
            updates["render"] = dataclasses.replace(
                fe_cfg.render, image_size=updates.pop("image_size")
            )
        if updates:
            fe_cfg = dataclasses.replace(fe_cfg, **updates)
        from davo_tpu.train.runs import make_run_manifest, register_run

        manifest = make_run_manifest(
            fe_cfg, name="fit-frontend", tags={"command": args.command}
        )
        register_run(manifest, checkpoint_dir=args.checkpoint_dir)
        logger = MetricsLogger(
            args.metrics_file,
            tensorboard_dir=getattr(args, "tensorboard_dir", None),
            run=manifest,
        )
        state, history = fit_frontend(fe_cfg, log_fn=logger)
        if args.checkpoint_dir:
            import os

            path = save_checkpoint(
                args.checkpoint_dir,
                len(history["train"]),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            arch = {
                "num_select": fe_cfg.num_select,
                "descriptor_channels": fe_cfg.descriptor_channels,
                "embedding_size": fe_cfg.embedding_size,
                "image_size": fe_cfg.render.image_size,
            }
            with open(
                os.path.join(args.checkpoint_dir, "frontend_config.json"), "w"
            ) as f:
                json.dump(arch, f)
            print(f"checkpoint: {path}")
        final = history["val"][-1] if history["val"] else history["train"][-1]
        print(json.dumps({"final": final}))
        return 0

    if args.command == "vo-eval":
        import pickle

        import jax.numpy as jnp

        from davo_tpu.train import get_preset
        from davo_tpu.train.vo_eval import TrajectoryConfig, evaluate_learned_vo

        # reuse the curriculum preset's solver recipe (single source of
        # truth for the eval solve budget)
        net_cfg = dataclasses.replace(
            get_preset("calibration_transformer_curriculum"),
            num_views=args.window,
            num_points=args.points,
            num_restarts=args.restarts,
            selection=args.selection,
            basin_anchor_weight=args.basin_anchor,
        )
        for field in ("hidden_size", "transformer_layers", "transformer_heads"):
            value = getattr(args, field, None)
            if value is not None:
                net_cfg = dataclasses.replace(net_cfg, **{field: value})
        net = net_cfg.build_network()
        with open(args.checkpoint, "rb") as f:
            restored = pickle.load(f)
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }

        @jax.jit
        def guess_fn(pw, vw):
            return net.apply(variables, pw, vw)

        frontend_fn = None
        track_fn = None
        render_config = None
        detections_fn = None
        if args.matches == "learned":
            import os

            from davo_tpu.data.rendering import RenderConfig
            from davo_tpu.models import VOFrontend
            from davo_tpu.train import restore_checkpoint

            if not args.frontend_checkpoint:
                print(
                    "--matches learned requires --frontend-checkpoint",
                    file=sys.stderr,
                )
                return 2
            arch_path = os.path.join(
                args.frontend_checkpoint, "frontend_config.json"
            )
            arch = {}
            if os.path.exists(arch_path):
                with open(arch_path) as f:
                    arch = json.load(f)
            image_size = arch.pop("image_size", args.image_size)
            render_config = RenderConfig(image_size=image_size)
            frontend_net = VOFrontend(
                num_select=arch.get("num_select", args.points),
                descriptor_channels=arch.get("descriptor_channels", 64),
                embedding_size=arch.get("embedding_size", 64),
                match_confidence_threshold=args.match_confidence,
                nms_radius=args.nms_radius,
                snap_radius=args.snap_radius,
                cycle_threshold=args.cycle_threshold,
                quality_bonus=args.quality_bonus,
                score_threshold=args.score_threshold,
                centroid_refine_iters=args.centroid_refine,
                soft_gate_floor=args.soft_gate_floor,
            )
            fe_restored = restore_checkpoint(args.frontend_checkpoint)
            fe_vars = {
                "params": fe_restored["params"],
                "batch_stats": fe_restored.get("batch_stats", {}),
            }

            @jax.jit
            def frontend_fn(images):
                out = frontend_net.apply(fe_vars, images)
                return out.matches, out.match_visibility

            detections_fn = None
            if args.pipeline == "incremental" and args.association == "geometric":

                @jax.jit
                def detections_fn(images):
                    out = frontend_net.apply(fe_vars, images)
                    return out.points, jax.nn.sigmoid(out.scores)

            track_fn = None
            if (
                args.track_points and args.track_points != args.points
            ) or args.track_anchors == 2:
                track_net = frontend_net.clone(
                    num_select=args.track_points or args.points
                )

                @jax.jit
                def track_fn(images):
                    out = track_net.apply(fe_vars, images)
                    if args.track_anchors == 2:
                        rev = track_net.apply(fe_vars, images[:, ::-1])
                        return (
                            jnp.concatenate(
                                [out.matches, rev.matches[:, ::-1]], axis=2
                            ),
                            jnp.concatenate(
                                [
                                    out.match_visibility,
                                    rev.match_visibility[:, ::-1],
                                ],
                                axis=2,
                            ),
                        )
                    return out.matches, out.match_visibility

        scene_points = args.scene_points or args.points
        if scene_points != args.points and args.matches != "learned":
            print(
                "--scene-points requires --matches learned (oracle "
                "matches go straight to the solver)",
                file=sys.stderr,
            )
            return 2
        tcfg = TrajectoryConfig(
            num_frames=args.frames,
            num_points=scene_points,
            window=args.window,
            stride=args.stride,
        )
        if args.ba_iterations is not None:
            import dataclasses as _dc

            tcfg = _dc.replace(
                tcfg,
                solver=_dc.replace(
                    tcfg.solver, iterations=args.ba_iterations
                ),
            )
        results = []
        for trial in range(args.trials):
            ate = evaluate_learned_vo(
                guess_fn,
                jax.random.key(100 + trial),
                tcfg,
                refine=not args.no_refine,
                refine_rounds=args.refine_rounds,
                host_polish=args.host_polish,
                multistart=args.multistart,
                stitch=args.stitch,
                frontend_fn=frontend_fn,
                render_config=render_config,
                track_fn=track_fn,
                irls_rounds=args.window_irls,
                pipeline=args.pipeline,
                detections_fn=detections_fn,
                pnp_ransac=args.pnp_ransac,
                chain_passes=args.chain_passes,
                ba_irls=args.ba_irls,
                num_bootstraps=args.num_bootstraps,
            )
            results.append({k: float(v) for k, v in ate.items()})
            print(json.dumps({"trial": trial, **results[-1]}), flush=True)
        mean_rmse = sum(r["rmse"] for r in results) / len(results)
        print(json.dumps({"mean_ate_rmse": float(f"{mean_rmse:.6g}")}))
        return 0

    from davo_tpu.train import (
        get_preset,
        fit,
        save_checkpoint,
        restore_checkpoint,
        CalibrationExperiment,
    )
    from davo_tpu.train.metrics import MetricsLogger

    if getattr(args, "config", None):
        from davo_tpu.train import load_config_yaml

        config = load_config_yaml(args.config)
    else:
        config = get_preset(args.preset)
    config = _apply_overrides(config, args)
    run_manifest = None
    if args.command == "fit":
        from davo_tpu.train.runs import make_run_manifest, register_run

        run_manifest = make_run_manifest(
            config,
            name=getattr(args, "config", None) or args.preset,
            tags={"command": args.command},
        )
        register_run(run_manifest, checkpoint_dir=args.checkpoint_dir)
        print(
            json.dumps(
                {
                    "run_id": run_manifest["run_id"],
                    "config_hash": run_manifest["config_hash"],
                    "git_sha": run_manifest["git_sha"],
                }
            ),
            flush=True,
        )
    logger = MetricsLogger(
        args.metrics_file,
        tensorboard_dir=getattr(args, "tensorboard_dir", None),
        run=run_manifest,
    )

    if not isinstance(config, CalibrationExperiment):
        # gen-1 optimisation harness presets
        from davo_tpu.train import fit_optimisation

        if args.command != "fit":
            print(
                f"preset {args.preset!r} supports 'fit' only", file=sys.stderr
            )
            return 2
        state, history = fit_optimisation(config, log_fn=logger)
        if args.checkpoint_dir:
            path = save_checkpoint(
                args.checkpoint_dir,
                len(history["train"]),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            print(f"checkpoint: {path}")
        print(json.dumps({"final_train": history["train"][-1]}))
        return 0

    if args.command == "fit":
        state, history = fit(config, log_fn=logger)
        if args.checkpoint_dir:
            path = save_checkpoint(
                args.checkpoint_dir,
                len(history["train"]),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            print(f"checkpoint: {path}")
        final = history["val"][-1] if history["val"] else {}
        print(json.dumps({"final_val": final}))
        return 0

    # eval
    from davo_tpu.train import (
        create_train_state,
        make_eval_step,
        evaluate_calibration_ate,
    )
    import jax.numpy as jnp

    if getattr(args, "restarts", None):
        config = dataclasses.replace(config, num_restarts=args.restarts)
    if getattr(args, "selection", None):
        config = dataclasses.replace(config, selection=args.selection)
    if getattr(args, "restart_proposals", None):
        config = dataclasses.replace(
            config, restart_proposals=args.restart_proposals
        )
    if getattr(args, "basin_anchor", None) is not None:
        config = dataclasses.replace(
            config, basin_anchor_weight=args.basin_anchor
        )
    key = jax.random.key(config.seed)
    network, state = create_train_state(config, key)
    if args.checkpoint_dir:
        restored = restore_checkpoint(args.checkpoint_dir)
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
    eval_step = make_eval_step(network, config)
    metrics = []
    for i in range(args.batches):
        metrics.append(eval_step(state, jax.random.fold_in(key, 1000 + i)))
    avg = {k: float(jnp.mean(jnp.stack([m[k] for m in metrics]))) for k in metrics[0]}
    avg.update(
        evaluate_calibration_ate(
            network, state, config, jax.random.fold_in(key, 7), batches=4
        )
    )
    print(json.dumps(avg))
    return 0


if __name__ == "__main__":
    sys.exit(main())
