"""Shared held-out-object pose evaluation for the unseen-object rigs.

Runs the complete inference contract — encoder latent from reference views
(``build_latent_object``) -> CEM coarse search -> gradient refinement ->
ADD-S gate at 0.1 x diameter — exactly as tools/train_unseen_objects.py
published it, but parameterized over the observation source so the
REAL-data-path rig (tools/train_unseen_real.py: native rasterizer renders)
and the analytic-oracle rig evaluate with the same estimator stack, search
budgets, RNG stream, and artifact schema.

Reference: the estimate pipeline of examples/pose_estimation.ipynb
(reference recon/inference.py:73-84 + configs/cross_entropy_quick.toml +
configs/adam_slow.toml), with the latent ranking term of
configs/pose/adam_latent.toml available via ``extra_weights``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import numpy as np

from latentfusion_tpu.pose import estimation, metrics


def search_budget_record(args):
    """The artifact's search_budget block from a rig's argparse args."""
    return {
        "cem_samples": args.cem_samples, "cem_iters": args.cem_iters,
        "cem_elites": args.cem_elites,
        "refine_samples": args.refine_samples,
        "refine_iters": args.refine_iters,
        "rank_latent_weight": args.rank_latent_weight,
        "rank_mask_weight": args.rank_mask_weight,
        "rank_iou_weight": args.rank_iou_weight}


def extra_weights_from_args(args):
    return {k: w for k, w in (("latent", args.rank_latent_weight),
                              ("mask", args.rank_mask_weight),
                              ("iou", args.rank_iou_weight)) if w > 0.0}


def build_estimators(model, budget, extra_weights=None):
    """The published coarse+fine stack (quick CEM defaults; reference
    configs/cross_entropy_quick.toml + configs/adam_slow.toml)."""
    extra_weights = dict(extra_weights or {})
    coarse = estimation.CrossEntropyPoseEstimator(
        model=model, num_gmm_components=6, sample_flipped=True,
        num_samples=budget["cem_samples"], num_iters=budget["cem_iters"],
        num_elites=budget["cem_elites"],
        learning_rate=0.75,
        loss_weights={"depth": 1.0, **extra_weights},
        ranking_size=min(16, budget["cem_samples"]))
    fine = estimation.GradientPoseEstimator(
        model=model, ranking_size=min(8, budget["refine_samples"]),
        loss_weights={"depth": 1.0, "ov_depth": 0.3, **extra_weights},
        learning_rate=0.01, num_samples=budget["refine_samples"],
        num_iters=budget["refine_iters"],
        converge_threshold=1e-6, converge_patience=25, optimizer="adam")
    return coarse, fine


def evaluate_object(model, ref_obs, make_target, points, n_targets, budget,
                    extra_weights=None, diameter=1.0, tag="", seed=55):
    """Estimate ``n_targets`` poses of one object and gate each at
    ADD-S < 0.1 x diameter.

    ``ref_obs``: Observation of the object's reference views (any renderer).
    ``make_target(key) -> (gt_camera, target_observation)``: one pose
    target; the RNG stream (PRNGKey(seed), split per target) matches the
    published artifacts'.
    """
    import jax.numpy as jnp

    from latentfusion_tpu.three import quaternion as quat  # noqa: F401

    z_obj = model.build_latent_object(ref_obs)
    coarse, fine = build_estimators(model, budget, extra_weights)

    points = jnp.asarray(points)
    rows = []
    ek = jax.random.PRNGKey(seed)
    for t in range(n_targets):
        ek, k1, k2 = jax.random.split(ek, 3)
        gt_cam, target = make_target(k1)

        coarse_cams = coarse.estimate(z_obj, target, key=k2)
        best = fine.estimate(
            z_obj, target,
            camera=coarse_cams[:min(budget["refine_samples"],
                                    len(coarse_cams))])

        def cam_metrics(c):
            m = metrics.camera_metrics(gt_cam, c, points,
                                       scale_to_meters=1.0)
            return {k: float(m[k]) for k in
                    ("add_s", "rotation_dist", "translation_dist")}

        row = {"target": t,
               "coarse": cam_metrics(coarse_cams[0]),
               "refined": cam_metrics(best[0]),
               "add_s_01d": bool(cam_metrics(best[0])["add_s"]
                                 < 0.1 * diameter)}
        rows.append(row)
        print(f"{tag}target {t}: "
              f"coarse add_s={row['coarse']['add_s']:.4f} "
              f"refined={row['refined']['add_s']:.4f} "
              f"rot={row['refined']['rotation_dist']:.3f} "
              f"trans={row['refined']['translation_dist']:.4f} "
              f"0.1d={row['add_s_01d']}", flush=True)
    acc = float(np.mean([r["add_s_01d"] for r in rows]))
    return rows, acc
