#!/usr/bin/env python
"""End-to-end pose estimation example.

The script equivalent of the reference's ``examples/pose_estimation.ipynb``:
load a model, build a latent object from reference views, run coarse
(cross-entropy) + fine (gradient) pose estimation on a target view, and
print metric tables.

Two data modes:
- ``--bop-path/--scene-path/--object-id``: real LINEMOD/BOP data
  (reference notebook's flow).
- default: fully synthetic — renders a mesh (``--mesh``, or a built-in cube)
  with the native rasterizer, so the pipeline runs with zero external data.

With ``--checkpoint`` a trained model (torch .pth or native) is used;
otherwise random weights (pipeline demo only — expect garbage accuracy, use
the printed GT-vs-estimate tables to see the machinery).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def build_model(args):
    import jax

    from latentfusion_tpu import zoo
    from latentfusion_tpu.recon.inference import LatentFusionModel

    if args.checkpoint:
        return LatentFusionModel.from_checkpoint(args.checkpoint)
    key = jax.random.PRNGKey(0)
    sculptor = zoo.tiny_sculptor(input_size=args.input_size)
    fuser = zoo.tiny_fuser()
    photographer = zoo.tiny_photographer()
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)
    print("! no checkpoint given: using RANDOM weights (pipeline demo)")
    return LatentFusionModel(sculptor, params["sculptor"], fuser,
                             params["fuser"], photographer,
                             params["photographer"],
                             camera_dist=args.camera_dist)


def synthetic_observations(args):
    """Render reference + target views of a mesh with the native rasterizer."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from latentfusion_tpu import three
    from latentfusion_tpu.camera import Camera
    from latentfusion_tpu.data import rendering
    from latentfusion_tpu.meshutils import Mesh, Object3D
    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.three import quaternion as quat

    if args.mesh:
        obj, _ = rendering.load_object(args.mesh, size=1.0)
    else:  # built-in cube
        s = 0.25
        verts = np.asarray(
            [(-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s),
             (-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)], np.float32)
        faces = np.asarray(
            [(0, 1, 2), (0, 2, 3), (4, 6, 5), (4, 7, 6), (0, 4, 5), (0, 5, 1),
             (1, 5, 6), (1, 6, 2), (2, 6, 7), (2, 7, 3), (4, 0, 3), (4, 3, 7)],
            np.int32)
        obj = Object3D(meshes=[Mesh(verts, faces)])
        obj.resize(1.0)

    width, height = 320, 240
    intrinsic = np.asarray([[300.0, 0, width / 2, 0],
                            [0, 300.0, height / 2, 0],
                            [0, 0, 1, 0]], np.float32)
    context = rendering.SceneContext(obj, intrinsic)
    context.randomize_lights(2, 4)
    renderer = rendering.Renderer(width, height)

    key = jax.random.PRNGKey(args.seed)
    quats = quat.random(key, args.num_views + 1)
    observations = []
    for i in range(args.num_views + 1):
        trans = jnp.array([0.0, 0.0, args.camera_dist])
        context.set_pose(trans, quats[i])
        color, depth, mask = renderer.render(context)
        cam = Camera(
            intrinsic,
            three.to_extrinsic_matrix(trans[None], quats[i][None]),
            width=width, height=height)
        observations.append(Observation(
            jnp.moveaxis(color, -1, 0)[None], depth[None, None],
            mask[None, None], cam))
    ref = Observation.collate(observations[:-1])
    target = observations[-1]
    return ref, target, obj


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=Path)
    parser.add_argument("--mesh", type=Path)
    parser.add_argument("--bop-path", type=Path)
    parser.add_argument("--scene-path", type=Path)
    parser.add_argument("--object-id", type=int, default=1)
    parser.add_argument("--num-views", type=int, default=8)
    parser.add_argument("--coarse-config", type=Path,
                        default=Path(__file__).parents[1]
                        / "configs" / "cross_entropy_quick.toml")
    parser.add_argument("--fine-config", type=Path,
                        default=Path(__file__).parents[1]
                        / "configs" / "adam_quick.toml")
    parser.add_argument("--input-size", type=int, default=16)
    parser.add_argument("--camera-dist", type=float, default=1.5)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from latentfusion_tpu.observation import Observation
    from latentfusion_tpu.pose import estimation, format as pf, metrics

    model = build_model(args)

    if args.bop_path:
        from latentfusion_tpu.data.bop import BOPDataset
        from latentfusion_tpu.data.loader import collate

        ds = BOPDataset(args.bop_path, args.scene_path, args.object_id)
        inds = [int(i) for i in ds.sample_evenly(args.num_views + 1)]
        items = [ds[i] for i in inds]
        ref = Observation.from_dict(collate(items[:-1]))
        target = Observation.from_dict(collate(items[-1:]))
        points = ds.load_pointcloud()
    else:
        ref, target, obj = synthetic_observations(args)
        points = jax.numpy.asarray(obj.vertices)

    print(f"building latent object from {len(ref)} views...")
    t0 = time.time()
    z_obj = model.build_latent_object(ref)
    print(f"  done in {time.time() - t0:.2f}s, z_obj {z_obj.shape}")

    coarse = estimation.load_from_config(args.coarse_config, model)
    fine = estimation.load_from_config(args.fine_config, model)

    print("coarse search (cross-entropy)...")
    t0 = time.time()
    coarse_cams = coarse.estimate(z_obj, target)
    print(f"  done in {time.time() - t0:.2f}s")

    print("fine refinement (gradient)...")
    t0 = time.time()
    best = fine.estimate(z_obj, target,
                         camera=coarse_cams[:fine.num_samples])
    print(f"  done in {time.time() - t0:.2f}s")

    gt_cam = target.camera
    rows = []
    for name, cam in (("coarse", coarse_cams[0]), ("fine", best[0])):
        m = metrics.camera_metrics(gt_cam, cam, points, 1.0)
        rows.append({"stage": name, **m})
    print(pf.metrics_table_multiple(
        [{k: v for k, v in r.items() if k != "stage"} for r in rows],
        names=[r["stage"] for r in rows]))


if __name__ == "__main__":
    main()
