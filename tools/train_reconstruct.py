#!/usr/bin/env python
"""Train the LatentFusion reconstruction model (TPU-native).

Behavioral reference: ``tools/train/train_reconstruct.py`` — same flag
surface; the published recipe (tools/train/train.sh) runs here as:

    python tools/train_reconstruct.py \
        --dataset-type shapenet --dataset-path $SHAPENET \
        --save-dir runs --base-name shapenet-256 \
        --input-size 256 --batch-size 8 --batch-groups 2 \
        --num-input-views 8 --num-output-views 24 \
        --sculptor-image-config 64,D,128,D,196,D,256,D,512,D,512,D,512:512,U,512,U,256 \
        --sculptor-camera-config 64,128,256 --sculptor-object-config 256,256 \
        --photographer-object-config none --photographer-camera-config 256,256 \
        --photographer-image-config 256,D,512,D,512:512,U,512,U,512,U,256,U,196,U,128,U,64 \
        --fuser-type gru --no-discriminator --predict-depth --predict-mask \
        --g-depth-recon-loss-type hard_smooth_l1 --g-depth-recon-loss-weight 25 \
        --g-mask-recon-loss-weight 25 --random-orientation --data-parallel
"""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("train_reconstruct")


def get_args(argv=None):
    from latentfusion_tpu.train import args as A

    parser = argparse.ArgumentParser()
    A.add_common_args(parser)
    A.add_dataset_args(parser)
    A.add_architecture_args(parser)
    A.add_loss_args(parser)
    parser.add_argument("--save-dir", type=Path, required=True)
    parser.add_argument("--base-name", type=str, required=True)
    parser.add_argument("--resume", type=Path)
    parser.add_argument("--override", type=str, default="",
                        help="comma-separated arg names to keep from the "
                             "CLI instead of the checkpoint on resume "
                             "(reference: trainutils.py:81-100)")
    parser.add_argument("--branch", action="store_true",
                        help="fork the resumed run under a new name "
                             "(reference: train_reconstruct.py:211-218)")
    parser.add_argument("--branch-name", type=str, default="branch")
    return parser.parse_args(argv)


def load_checkpoint_args(ckpt_args: dict, args, override: str):
    """Restore persisted run args, keeping CLI values for --override'd flags
    (reference: trainutils.py:81-100)."""
    keep = {k.strip().replace("-", "_") for k in override.split(",") if k}
    # Control flags always come from the CLI, never the checkpoint.
    keep |= {"resume", "branch", "branch_name", "override", "save_dir",
             "num_epochs"}
    # Moved-dataset rewrite (reference: train_reconstruct.py:173-190): if
    # the checkpointed data paths no longer exist on this machine, keep the
    # CLI-provided ones instead.
    for path_key in ("dataset_path", "background_path",
                     "depth_background_path", "texture_path"):
        old = ckpt_args.get(path_key)
        if old is not None and not Path(old).exists() and \
                getattr(args, path_key, None) is not None:
            keep.add(path_key)
    for k, v in ckpt_args.items():
        if k in keep or not hasattr(args, k) or v is None:
            continue
        setattr(args, k, v)
    return args


def generate_name(base_name, args) -> str:
    """(reference: train_reconstruct.py:149-164)"""
    return (
        f"{base_name}"
        f"{',mask' if args.predict_mask else ''}"
        f"{',color' if args.predict_color else ''}"
        f"{',depth' if args.predict_depth else ''}"
        f"{',disc' if not args.no_discriminator else ''}"
        f",mask_noise_p={args.mask_noise_p}"
        f",sm={args.scale_mode}"
        f",fuser={args.fuser_type}"
    ).replace(":", "_")


def build_models(args):
    from latentfusion_tpu.recon import fusion, models

    sculptor = models.Sculptor(
        in_size=args.input_size,
        image_config=args.sculptor_image_config,
        camera_config=args.sculptor_camera_config,
        object_config=args.sculptor_object_config,
        cube_size=args.cube_size,
        cube_activation_type=args.cube_activation_type,
        projection_type=args.sculptor_projection_type,
        input_color=not args.no_generator_input_color,
        input_depth=args.generator_input_depth,
        input_mask=args.generator_input_mask,
        scale_mode=args.scale_mode)

    photographer = models.Photographer(
        in_size=sculptor.out_size,
        image_config=args.photographer_image_config,
        camera_config=args.photographer_camera_config,
        object_config=args.photographer_object_config or None,
        occlusion_config=args.photographer_occlusion_config or False,
        projection_type=args.photographer_projection_type,
        predict_color=args.predict_color,
        predict_depth=args.predict_depth,
        predict_mask=args.predict_mask,
        cube_size=args.cube_size,
        scale_mode=args.scale_mode)

    fuser = fusion.get_fuser(args.fuser_type, sculptor.out_channels,
                             args.cube_size, block_config=args.fuser_config)

    discriminator = None
    if not args.no_discriminator:
        from latentfusion_tpu.pggan import MultiScaleDiscriminator

        d_channels = 0
        if args.discriminator_input_color:
            d_channels += 3
        if args.discriminator_input_depth:
            d_channels += 1
        if args.discriminator_input_mask:
            d_channels += 1
        discriminator = MultiScaleDiscriminator(
            d_channels or 1, tuple(args.discriminator_config),
            args.discriminator_scales)
    return sculptor, fuser, photographer, discriminator


def main(argv=None):
    args = get_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from latentfusion_tpu import dtypes, parallel, zoo
    from latentfusion_tpu.train import args as A
    from latentfusion_tpu.train.step import (init_gan_train_state,
                                             make_optimizer,
                                             make_recon_train_step)
    from latentfusion_tpu.train.trainer import ReconTrainer, load_checkpoint
    from latentfusion_tpu.utils import ExponentialScheduler, seed_all
    from latentfusion_tpu.data.loader import IterableLoader

    seed_all(args.seed)

    resume_payload = None
    if args.resume:
        resume_payload = load_checkpoint(args.resume)
        args = load_checkpoint_args(resume_payload.get("args", {}), args,
                                    args.override)
        if args.branch:
            args.base_name = f"{args.base_name}-{args.branch_name}"
            logger.info("branching run as %s", args.base_name)

    if args.use_amp:
        dtypes.set_compute_dtype("bfloat16")

    camera_dist = A.auto_camera_dist(args)
    logger.info("camera_dist=%.4f", camera_dist)

    sculptor, fuser, photographer, discriminator = build_models(args)

    key = jax.random.PRNGKey(args.seed)
    params = zoo.init_recon_params(key, sculptor, fuser, photographer,
                                   batch=1, views=2)

    # LR milestones (reference MultiStepLR, trainutils.py:316-318).
    g_schedule = optax.piecewise_constant_schedule(
        args.generator_lr,
        {m * args.batches_per_epoch: args.generator_lr_gamma
         for m in (args.generator_lr_milestones or [])})
    g_optimizer = optax.adam(g_schedule, b1=0.0, b2=0.99) \
        if args.optimizer == "adam" else make_optimizer(args.optimizer,
                                                        args.generator_lr)
    d_params = None
    d_optimizer = None
    if discriminator is not None:
        d_optimizer = optax.adam(args.discriminator_lr, b1=0.0, b2=0.99)
        in_size = args.input_size
        d_params = discriminator.init(
            jax.random.PRNGKey(args.seed + 1),
            jnp.zeros((2, discriminator.in_channels, in_size, in_size)))

    state = init_gan_train_state(params, g_optimizer, d_params, d_optimizer)

    if resume_payload is not None:
        state = state._replace(params={
            "sculptor": resume_payload["modules"]["sculptor"]["params"],
            "photographer":
                resume_payload["modules"]["photographer"]["params"],
            "fuser": resume_payload["modules"]["fuser"]["params"],
        })
        logger.info("resumed from %s (epoch %s)", args.resume,
                    resume_payload.get("epoch"))

    config = {k: v for k, v in vars(args).items()
              if isinstance(v, (int, float, str, bool, type(None)))}
    config["camera_dist"] = camera_dist
    dataset = A.get_dataset(args)
    mesh = None
    sharding = None
    state_shardings = None
    if getattr(args, "fsdp", 0) and args.fsdp > 1:
        n_dev = len(jax.devices())
        if n_dev % args.fsdp:
            raise SystemExit(
                f"--fsdp {args.fsdp} does not divide {n_dev} devices")
        mesh = parallel.make_mesh_2d(n_dev // args.fsdp, args.fsdp)
        sharding = parallel.batch_sharding(mesh, parallel.DATA_AXIS)
        state_shardings = parallel.fsdp_shardings(state, mesh)
        state = jax.tree_util.tree_map(jax.device_put, state,
                                       state_shardings)
        logger.info("FSDP: %dx%d data x fsdp mesh, params+opt state "
                    "sharded %d-ways", n_dev // args.fsdp, args.fsdp,
                    args.fsdp)
    elif args.data_parallel and len(jax.devices()) > 1:
        mesh = parallel.make_mesh()
        sharding = parallel.batch_sharding(mesh)
        state = parallel.replicate(state, mesh)

    step_fn = make_recon_train_step(sculptor, fuser, photographer,
                                    g_optimizer, discriminator, d_optimizer,
                                    config, state_shardings=state_shardings)
    loader = IterableLoader(dataset, batch_size=args.batch_size,
                            num_workers=args.num_workers, sharding=sharding,
                            transport=args.transport)

    input_noise_sched = ExponentialScheduler(
        1.0, 1e-4, args.input_noise_epochs) if discriminator else None

    explicit = {"batches_per_epoch", "batch_groups", "num_epochs",
                "save_interval", "camera_dist", "seed"}
    extra_config = {k: v for k, v in config.items() if k not in explicit}
    trainer = ReconTrainer(
        name=generate_name(args.base_name, args),
        save_dir=args.save_dir,
        loader=loader,
        batches_per_epoch=args.batches_per_epoch,
        batch_groups=args.batch_groups,
        num_epochs=args.num_epochs,
        save_interval=args.save_interval,
        sculptor=sculptor, fuser=fuser, photographer=photographer,
        discriminator=discriminator,
        g_optimizer=g_optimizer, d_optimizer=d_optimizer,
        state=state, step_fn=step_fn,
        input_noise_sched=input_noise_sched,
        camera_dist=camera_dist, seed=args.seed,
        logger_intervals={"scalar_interval": args.plot_interval,
                          "image_interval": args.show_interval,
                          "histogram_interval": args.histogram_interval},
        **extra_config)
    trainer.start(train=True)


if __name__ == "__main__":
    main()
