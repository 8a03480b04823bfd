#!/usr/bin/env python
"""Train the IBR color generator on top of a frozen reconstruction model.

Behavioral reference: ``tools/train/train_ibr.py`` (539 LoC). Note: the
reference script crashes at import as shipped (it imports a nonexistent
``latentfusion.style.StyleEncoder``, SURVEY.md "Ground truth"); this rebuild
omits StyleEncoder (it is never instantiated there either).
"""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("train_ibr")


def get_args(argv=None):
    from latentfusion_tpu.train import args as A
    from latentfusion_tpu.utils import block_config_arg

    parser = argparse.ArgumentParser()
    A.add_common_args(parser)
    A.add_dataset_args(parser)
    A.add_loss_args(parser)
    parser.add_argument("--save-dir", type=Path, required=True)
    parser.add_argument("--base-name", type=str, required=True)
    parser.add_argument("--recon-checkpoint", type=Path, required=True)
    parser.add_argument("--generator-config",
                        default="64,D,128,D,256,D,512:512,U,256,U,128,U,64",
                        type=block_config_arg())
    parser.add_argument("--ibr-type", default="blend_flow",
                        choices=["regress", "blend", "blend_flow"])
    parser.add_argument("--no-discriminator", action="store_true")
    parser.add_argument("--discriminator-config", default=[64, 128, 256, 512],
                        type=lambda s: [int(x) for x in s.split(",")])
    parser.add_argument("--discriminator-scales", default=3, type=int)
    parser.add_argument("--flow-size", type=int, default=5)
    parser.add_argument("--train-recon", action="store_true")
    parser.add_argument("--recon-lr", type=float, default=1e-5)
    parser.add_argument("--no-apply-mask", action="store_true")
    parser.add_argument("--g-color-recon-loss-k-milestones",
                        type=lambda s: [int(x) for x in s.split(",")],
                        default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    import jax
    import jax.numpy as jnp

    from latentfusion_tpu import dtypes
    from latentfusion_tpu.modules import unet
    from latentfusion_tpu.recon import checkpoint as ckpt
    from latentfusion_tpu.train.ibr_step import (IBRTrainState,
                                                 generator_in_channels,
                                                 generator_out_channels,
                                                 make_ibr_train_step)
    from latentfusion_tpu.train.step import make_optimizer
    from latentfusion_tpu.train.trainer import IBRTrainer
    from latentfusion_tpu.train import args as A
    from latentfusion_tpu.data.loader import IterableLoader
    from latentfusion_tpu.utils import ExponentialScheduler, seed_all

    seed_all(args.seed)
    if args.use_amp:
        dtypes.set_compute_dtype("bfloat16")

    checkpoint = ckpt.load_torch_checkpoint(args.recon_checkpoint)
    checkpoint = ckpt.patch_legacy_args(checkpoint)
    recon_params_args = checkpoint["args"]
    sculptor, sculptor_params = ckpt.sculptor_from_checkpoint(
        checkpoint["modules"]["sculptor"])
    photographer, photographer_params = ckpt.photographer_from_checkpoint(
        checkpoint["modules"]["photographer"])
    fuser, fuser_params = ckpt.fuser_from_checkpoint(
        checkpoint["modules"]["fuser"])
    camera_dist = recon_params_args["camera_dist"]

    in_channels = generator_in_channels(args.num_input_views)
    out_channels = generator_out_channels(args.ibr_type, args.num_input_views)
    generator = unet.UNet2d(in_channels=in_channels,
                            out_channels=out_channels,
                            block_config=args.generator_config)
    key = jax.random.PRNGKey(args.seed)
    gen_params = generator.init(
        key, jnp.zeros((1, in_channels, args.input_size, args.input_size)))

    discriminator = None
    d_params = None
    d_optimizer = None
    if not args.no_discriminator:
        from latentfusion_tpu.pggan import MultiScaleDiscriminator

        discriminator = MultiScaleDiscriminator(
            3, tuple(args.discriminator_config), args.discriminator_scales)
        d_params = discriminator.init(
            jax.random.PRNGKey(args.seed + 1),
            jnp.zeros((2, 3, args.input_size, args.input_size)))
        d_optimizer = make_optimizer(args.optimizer, args.discriminator_lr)

    g_optimizer = make_optimizer(args.optimizer, args.generator_lr)

    params = {
        "generator": gen_params,
        "recon": {"sculptor": sculptor_params, "fuser": fuser_params,
                  "photographer": photographer_params},
    }
    state = IBRTrainState(params, g_optimizer.init(params), d_params,
                          d_optimizer.init(d_params) if d_optimizer else None,
                          jnp.asarray(0))

    config = {k: v for k, v in vars(args).items()
              if isinstance(v, (int, float, str, bool, type(None)))}
    config.update(camera_dist=camera_dist,
                  cube_size=recon_params_args.get("cube_size", 1.0),
                  generator_input_depth=recon_params_args.get(
                      "generator_input_depth", False))
    step_fn = make_ibr_train_step(sculptor, fuser, photographer, generator,
                                  g_optimizer, discriminator, d_optimizer,
                                  config)

    dataset = A.get_dataset(args)
    loader = IterableLoader(dataset, batch_size=args.batch_size,
                            num_workers=args.num_workers,
                            transport=args.transport)

    input_noise_sched = ExponentialScheduler(
        1.0, 1e-4, args.input_noise_epochs) if discriminator else None

    explicit = {"batches_per_epoch", "batch_groups", "num_epochs",
                "save_interval", "camera_dist", "seed"}
    trainer = IBRTrainer(
        name=f"ibr-{args.base_name},type={args.ibr_type}",
        save_dir=args.save_dir, loader=loader,
        batches_per_epoch=args.batches_per_epoch,
        batch_groups=args.batch_groups, num_epochs=args.num_epochs,
        save_interval=args.save_interval,
        sculptor=sculptor, fuser=fuser, photographer=photographer,
        discriminator=discriminator, g_optimizer=g_optimizer,
        d_optimizer=d_optimizer, state=state, step_fn=step_fn,
        input_noise_sched=input_noise_sched, camera_dist=camera_dist,
        seed=args.seed,
        **{k: v for k, v in config.items() if k not in explicit})
    trainer.generator = generator
    trainer.start(train=True)


if __name__ == "__main__":
    main()
