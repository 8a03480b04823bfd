"""Pose estimators: Metropolis-Hastings, Cross-Entropy, Gradient.

Behavioral reference: ``latentfusion/pose/estimation.py``. The reference
interleaves GPU renders with CPU sklearn/numpy (GMM fit, top-K ranking,
per-hypothesis Python optimizers) every iteration; this rebuild keeps the
entire render-compare-refine loop on-device:

- hypotheses are a batch axis (vmap-free: the decoder is natively batched),
  shardable across a device mesh (see ``latentfusion_tpu.parallel``);
- the CEM GMM is a jnp EM fit (``pose/gmm.py``) with annealed elite counts as
  per-sample weights (fixed shapes);
- GradientPoseEstimator replaces N Python Adam loops + N ReduceLROnPlateau
  objects (reference: estimation.py:579-594) with one optax transform over
  stacked per-hypothesis params and a vectorized plateau scheduler, inside a
  single ``lax.while_loop`` with on-device top-K ranking and convergence
  patience as carried state.
"""
from __future__ import annotations

import abc
import functools
import logging
import math
from collections import defaultdict
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .. import distances, dtypes
from ..camera import Camera
from ..observation import Observation
from ..utils import ExponentialScheduler, LinearScheduler
from . import gmm as gmm_lib
from . import initialization
from . import utils as pu

DEFAULT_TRANSLATION_STD = 0.01
DEFAULT_QUATERION_STD = 10.0 / 180.0 * math.pi

logger = logging.getLogger(__name__)


# Round-5 sweep on TPU v5e (artifacts/xla_flag_sweep.json): doubling the
# fusion emitter's scoped-VMEM budget to 64 MiB is worth +3.3% on the
# 8-hyp fwd+bwd refinement loop (1032 -> 1066 hyp/s) and +1.2% on the
# 128-hyp CEM forward loop; 96/128 MiB regress (-2%/-13%, starves
# double-buffering). Applied as the default for the hot loops on
# non-CPU/GPU backends; dtypes.set_compiler_options overrides.
_TPU_DEFAULT_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def _hot_jit(fun, **kwargs):
    """jit for the hot estimator loops, honoring dtypes.set_compiler_options
    (per-compile XLA options forwarded through PJRT — the only way to reach
    server-side TPU compiler knobs on tunneled backends, where XLA_FLAGS is
    parsed locally and aborts on TPU-only flags)."""
    opts = dtypes.get_compiler_options()
    if opts is None and jax.default_backend() not in ("cpu", "gpu", "cuda",
                                                      "rocm"):
        opts = _TPU_DEFAULT_COMPILER_OPTIONS
    if opts:
        kwargs.setdefault("compiler_options", opts)
    return jax.jit(fun, **kwargs)

# Jitted camera-only zoom (host-side eager ops are expensive on tunneled TPU
# backends; target_size/dist are plain multipliers so they can be traced).
_zoom_camera = jax.jit(lambda cam, size, dist: cam.zoom(None, size, dist))


# --------------------------------------------------------------------- config

def load_from_config(config, model, **kwargs):
    """Instantiate an estimator from a TOML config
    (reference: estimation.py:29-59)."""
    if isinstance(config, (str, Path)):
        import tomllib

        with open(config, "rb") as f:
            config = tomllib.load(f)

    params = dict(config["args"])
    params.update(kwargs)
    logger.info("loading pose estimator type=%s", config["type"])

    if config["type"] == "metropolis":
        return MetropolisPoseEstimator(model=model, **params,
                                       loss_weights=config["loss_weights"])
    elif config["type"] == "cross_entropy":
        return CrossEntropyPoseEstimator(model=model, **params,
                                         loss_weights=config["loss_weights"])
    elif config["type"] == "gradient":
        loss_schedules = {
            k: load_schedules_from_config(v)
            for k, v in config.get("loss_schedules", {}).items()
        }
        return GradientPoseEstimator(model=model, **params,
                                     loss_weights=config["loss_weights"],
                                     loss_schedules=loss_schedules)
    raise ValueError(f"Unknown estimator type {config['type']}")


def load_schedules_from_config(config):
    """(reference: estimation.py:62-67)"""
    config = dict(config)
    kind = config.pop("type")
    if kind == "exponential":
        return ExponentialScheduler(**config)
    if kind == "linear":
        return LinearScheduler(**config)
    raise ValueError(f"Unknown schedule type {kind}")


# ----------------------------------------------------------------------- loss

_REFINE_REMAT = False


def set_refine_remat(enabled: bool) -> None:
    """Rematerialize the refinement decode in the backward pass
    (``jax.checkpoint``). Off by default — A/B via bench.py --refine-remat."""
    global _REFINE_REMAT
    _REFINE_REMAT = bool(enabled)


def get_refine_remat() -> bool:
    return _REFINE_REMAT


_REFINE_UNROLL = 1


def set_refine_unroll(n: int) -> None:
    """Unroll the refinement while-body N iterations per loop step.

    Bit-exact with N=1: each unrolled copy past the first applies its
    state update through a ``jnp.where(active, new, old)`` mask, where
    ``active`` is the loop's own continuation predicate — a converged (or
    step-exhausted) state is a fixpoint, so the only cost of overshoot is
    up to N-1 wasted decode fwd+bwds at exit. The win is per-iteration
    fixed overhead: XLA CSEs the loop-invariant operand slices (conv
    kernels, target chunks) across the unrolled copies, amortizing the
    async staging latency the round-3 profile showed dominating the
    8-hypothesis while body. A/B via bench.py --refine-unroll."""
    global _REFINE_UNROLL
    if n < 1:
        raise ValueError("unroll must be >= 1")
    _REFINE_UNROLL = int(n)


def get_refine_unroll() -> int:
    return _REFINE_UNROLL


def _bce_with_logits(logits, targets):
    """Stable binary cross entropy with logits (torch semantics)."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def default_pose_loss(target: Observation, z_pred_depth, z_pred_mask_logits,
                      z_pred_camera: Camera, z_pred_latent=None,
                      z_target_latent=None) -> Dict[str, jnp.ndarray]:
    """Pose fitness losses, per hypothesis (reference: estimation.py:70-118)."""
    pred_depth, _ = z_pred_camera.uncrop(z_pred_depth, scale_mode="nearest")
    pred_mask_logits, _ = z_pred_camera.uncrop(z_pred_mask_logits,
                                               scale_mode="bilinear")
    pred_mask = jax.nn.sigmoid(pred_mask_logits)
    pred_depth = pred_depth * pred_mask
    invalid_mask = (target.depth == 0) & (target.mask > 0.1)

    target = target.prepare()
    target_mask = target.mask
    target_depth = target.depth

    loss_dict = {}
    overlap_mask = pred_mask * target_mask
    depth_loss = jnp.abs(pred_depth - target_depth)
    depth_loss = pu.zero_invalid_pixels(depth_loss, invalid_mask)
    loss_dict["ov_depth"] = pu.reduce_loss_mask(depth_loss, overlap_mask)
    loss_dict["depth"] = depth_loss.mean(axis=(1, 2, 3))

    loss_dict["iou"] = pu.iou_loss(
        pred_mask, pu.zero_invalid_pixels(target.mask, invalid_mask))

    mask_loss = _bce_with_logits(
        pred_mask_logits, jnp.broadcast_to(target_mask, pred_mask.shape))
    loss_dict["mask"] = mask_loss.mean(axis=(1, 2, 3))

    if z_pred_latent is not None and z_target_latent is not None:
        zp = z_pred_latent.reshape(z_pred_latent.shape[0], -1)
        zt = z_target_latent.reshape(z_target_latent.shape[0], -1)
        loss_dict["latent"] = distances.cosine_distance(
            zp, jnp.broadcast_to(zt, zp.shape))
    return loss_dict


def weigh_losses(loss_dict, weight_dict):
    """(reference: estimation.py:121-126)

    Losses with a *statically* zero weight are dropped in Python rather
    than multiplied by 0.0: XLA's algebraic simplifier does not reliably
    eliminate ``0 * bce(...)`` through the backward pass (0*NaN hazard),
    so keeping them would pay the unused mask/IoU fwd+bwd chains every
    refinement iteration. Traced (array) weights are always kept."""
    out = {}
    for k, v in loss_dict.items():
        w = weight_dict.get(k, 0.0)
        if isinstance(w, (int, float)) and w == 0.0:
            continue
        out[k] = w * v
    return out


# -------------------------------------------------------------------- ranking

class Ranking(NamedTuple):
    """On-device top-K pose ranking (replaces the reference's CPU sorted list,
    estimation.py:187-205)."""

    losses: jnp.ndarray          # (K,)
    log_quaternion: jnp.ndarray  # (K, 3)
    translation: jnp.ndarray     # (K, 3)
    viewport: jnp.ndarray        # (K, 4)
    steps: jnp.ndarray           # (K,)


def plateau_lr_update(loss, lr, best, num_bad, *, threshold: float,
                      patience: int, factor: float):
    """Vectorized per-hypothesis ``ReduceLROnPlateau`` step (mode='min',
    threshold_mode='rel', cooldown=0 — the reference's per-optimizer
    scheduler config, estimation.py:588-594).

    Returns the updated ``(lr, best, num_bad)``. Semantics match
    ``torch.optim.lr_scheduler.ReduceLROnPlateau``: a loss is an
    improvement iff ``loss < best * (1 - threshold)``; ``patience``
    non-improving steps are tolerated before the lr is multiplied by
    ``factor`` (verified against torch in tests/test_estimator_parity.py).
    """
    improved = loss < best * (1.0 - threshold)
    best = jnp.where(improved, loss, best)
    num_bad = jnp.where(improved, 0, num_bad + 1)
    reduce_now = num_bad > patience
    lr = jnp.where(reduce_now, lr * factor, lr)
    num_bad = jnp.where(reduce_now, 0, num_bad)
    return lr, best, num_bad


def init_ranking(k: int) -> Ranking:
    return Ranking(
        losses=jnp.full((k,), jnp.inf),
        log_quaternion=jnp.zeros((k, 3)),
        translation=jnp.zeros((k, 3)),
        viewport=jnp.zeros((k, 4)),
        steps=jnp.full((k,), -1, dtype=jnp.int32),
    )


def update_ranking(ranking: Ranking, losses, camera: Camera, step) -> tuple:
    """Merge candidates; returns (ranking, delta_best)."""
    k = ranking.losses.shape[0]
    all_losses = jnp.concatenate([ranking.losses, losses])
    all_lq = jnp.concatenate([ranking.log_quaternion, camera.log_quaternion])
    all_t = jnp.concatenate([ranking.translation, camera.translation])
    all_vp = jnp.concatenate([ranking.viewport, camera.viewport])
    all_steps = jnp.concatenate([
        ranking.steps,
        jnp.full((losses.shape[0],), step, dtype=jnp.int32)])
    idx = jnp.argsort(all_losses)[:k]
    new = Ranking(all_losses[idx], all_lq[idx], all_t[idx], all_vp[idx],
                  all_steps[idx])
    prev_best = ranking.losses[0]
    delta = jnp.maximum(prev_best - new.losses[0], 0.0)
    delta = jnp.where(jnp.isfinite(prev_best), delta, 0.0)
    return new, delta


def init_ranking_batch(num_objects: int, k: int) -> Ranking:
    """Per-object top-K ranking: every field gets a leading object axis."""
    return Ranking(
        losses=jnp.full((num_objects, k), jnp.inf),
        log_quaternion=jnp.zeros((num_objects, k, 3)),
        translation=jnp.zeros((num_objects, k, 3)),
        viewport=jnp.zeros((num_objects, k, 4)),
        steps=jnp.full((num_objects, k), -1, dtype=jnp.int32),
    )


def update_ranking_batch(ranking: Ranking, losses, log_quaternion,
                         translation, viewport, step) -> tuple:
    """Per-object top-K merge. ``losses`` is (B, N); pose leaves are
    (B, N, ·). Returns ``(ranking, delta)`` with ``delta`` shaped (B,) —
    per-object best-loss improvement (0 where not yet finite)."""
    k = ranking.losses.shape[1]
    all_losses = jnp.concatenate([ranking.losses, losses], axis=1)
    idx = jnp.argsort(all_losses, axis=1)[:, :k]

    def take(old, new):
        cat = jnp.concatenate([old, new], axis=1)
        ix = idx.reshape(idx.shape + (1,) * (cat.ndim - 2))
        return jnp.take_along_axis(cat, ix, axis=1)

    steps_new = jnp.full(losses.shape, step, dtype=jnp.int32)
    new = Ranking(
        jnp.take_along_axis(all_losses, idx, axis=1),
        take(ranking.log_quaternion, log_quaternion),
        take(ranking.translation, translation),
        take(ranking.viewport, viewport),
        take(ranking.steps, steps_new),
    )
    prev_best = ranking.losses[:, 0]
    delta = jnp.maximum(prev_best - new.losses[:, 0], 0.0)
    delta = jnp.where(jnp.isfinite(prev_best), delta, 0.0)
    return new, delta


def ranking_to_camera(ranking: Ranking, template: Camera) -> Camera:
    k = ranking.losses.shape[0]
    intrinsic = jnp.broadcast_to(template.intrinsic[:1],
                                 (k, *template.intrinsic.shape[1:]))
    return Camera(intrinsic, None, template.z_span, ranking.viewport,
                  log_quaternion=ranking.log_quaternion,
                  translation=ranking.translation,
                  width=template.width, height=template.height)


_ranking_to_camera_jit = jax.jit(ranking_to_camera)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _finish_batch(ranking, templates: Camera, num_objects: int, stride: int,
                  uncrop: bool):
    """Post-loop epilogue for estimate_batch in ONE dispatch (the batch
    twin of ``_finish_single_object``): per-object ranking slices and
    result-camera construction are ~5 eager round trips per object on the
    tunneled backend otherwise. ``templates[b * stride]`` is object b's
    camera template (optionally uncropped first)."""
    if uncrop:
        templates = templates.uncrop()
    return tuple(
        ranking_to_camera(Ranking(*(leaf[b] for leaf in ranking)),
                          templates[b * stride])
        for b in range(num_objects))


@jax.jit
def _finish_single_object(ranking: Ranking, zoomed_camera: Camera):
    """Post-loop epilogue for single-object estimates, in ONE dispatch.

    Slicing the batch ranking, uncropping the camera template and
    rebuilding the result Camera eagerly costs ~10 remote round trips on
    the tunneled TPU backend (~100 ms per estimate) — fuse them."""
    rank0 = Ranking(*(leaf[0] for leaf in ranking))
    return ranking_to_camera(rank0, zoomed_camera.uncrop()), rank0


# ----------------------------------------------------------------------- base

class PoseEstimator(abc.ABC):
    """(reference: estimation.py:129-216)"""

    def __init__(self, *, model, ranking_size, loss_weights, loss_func=None,
                 return_camera_history=False, verbose=False, mesh=None):
        self.model = model
        self.ranking_size = ranking_size
        self.loss_func = loss_func or default_pose_loss
        self.loss_weights = defaultdict(float)
        self.loss_weights.update(loss_weights)
        self.return_camera_history = return_camera_history
        self.verbose = verbose
        # Optional jax.sharding.Mesh: hypotheses are sharded over its first
        # axis and the estimation loop runs SPMD across chips (XLA inserts
        # the collectives for ranking/GMM reductions). The reference's only
        # analog is single-host nn.DataParallel (torchutils.py:111-170).
        self.mesh = mesh
        # Cached jitted estimation loop (built lazily on first estimate();
        # re-creating jax.jit per call would retrace the full render graph).
        self._run_jit = None
        # Jitted estimate_batch prologues, keyed by batch geometry.
        self._prologue_cache: Dict[tuple, Any] = {}

    def _batch_init_cameras(self, key, target, num_objects: int, n: int,
                            upright: bool = False, hemisphere: bool = False):
        """Jitted per-object translation init + hypothesis sampling shared
        by the ``estimate_batch`` prologues (eager dispatches cost ~10 ms
        each on the tunneled backend; the single-object CEM path jits this
        inside ``run_from_obs``).

        Returns ``(key, hypotheses, inits)``: the advanced PRNG key, the
        B*n object-major sampled hypothesis Camera, and the length-B
        per-object init Camera.
        """
        cache_key = (num_objects, n, upright, hemisphere)
        if cache_key not in self._prologue_cache:
            def prologue(key, target):
                cams, inits = [], []
                for b in range(num_objects):
                    key, sub = jax.random.split(key)
                    cam_est = self.initial_pose(target[b])
                    inits.append(cam_est)
                    cams.append(pu.sample_cameras_with_estimate(
                        n=n, camera_est=cam_est, upright=upright,
                        hemisphere=hemisphere, key=sub))
                return key, Camera.cat(cams), Camera.cat(inits)

            self._prologue_cache[cache_key] = jax.jit(prologue)
        return self._prologue_cache[cache_key](key, target)

    # ------------------------------------------------------------- sharding
    def _shard_hypotheses(self, hyp_tree, *replicated_trees):
        """Shard the hypothesis-axis tree over the mesh; replicate the rest.
        No-op without a mesh."""
        if self.mesh is None:
            return (hyp_tree, *replicated_trees)
        from .. import parallel

        hyp_tree = parallel.shard_batch(hyp_tree, self.mesh)
        replicated_trees = tuple(
            parallel.replicate(t, self.mesh) if t is not None else None
            for t in replicated_trees)
        return (hyp_tree, *replicated_trees)

    def _mesh_ctx(self):
        import contextlib

        return self.mesh if self.mesh is not None else contextlib.nullcontext()

    def _constrain_hypotheses(self, tree, n: int):
        """Force hypothesis-axis sharding on the (n, ...) leaves of a tree
        built INSIDE the jitted loop (freshly sampled cameras have no input
        sharding to propagate from, so without a constraint XLA may
        replicate the decode). Only leaves whose leading dim is exactly the
        hypothesis count are pinned — a divisibility heuristic could grab a
        small non-hypothesis leaf and force a bogus layout (ADVICE r2).
        No-op without a mesh or when n doesn't divide the mesh."""
        if self.mesh is None or n % self.mesh.size != 0:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        ns = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))

        def constrain(x):
            if x.ndim >= 1 and x.shape[0] == n:
                return jax.lax.with_sharding_constraint(x, ns)
            return x

        return jax.tree_util.tree_map(constrain, tree)

    @property
    def device(self):
        return self.model.device

    @classmethod
    def initial_pose(cls, target_obs: Observation) -> Camera:
        """Translation-only init (reference: estimation.py:148-164)."""
        return initialization.estimate_initial_pose(
            target_obs.depth, target_obs.mask, target_obs.camera.intrinsic,
            target_obs.camera.width, target_obs.camera.height)

    def estimate(self, z_obj, target_obs: Observation, **kwargs):
        if len(target_obs) > 1:
            raise ValueError(
                "The pose can only be estimated for one observation at a time.")
        return self._estimate(z_obj, target_obs, **kwargs)

    @abc.abstractmethod
    def _estimate(self, z_obj, target_obs, **kwargs):
        raise NotImplementedError

    # ------------------------------------------------------------- rendering
    def _render_hypotheses(self, z_obj, camera: Camera):
        """Zoom hypothesis cameras, decode, denormalize depth. Output
        (B, V, ...) view groups are flattened back to the object-major
        hypothesis axis (reference: estimation.py:207-216). Pure (jit-safe)."""
        z_camera = camera.zoom(None, self.model.input_size,
                               self.model.camera_dist)
        # apply_mask=True: the reference renders estimator hypotheses via
        # render_latent_object's default, which hard-gates depth by
        # mask>0.5 before denormalization (inference.py:122-128 ->
        # models.py:478-484), then multiplies by the soft mask.
        y, z_lat, _ = self.model.decode_latent(z_obj, z_camera,
                                               return_latent=True,
                                               apply_mask=True)
        z_mask = y["mask"].reshape(-1, *y["mask"].shape[2:])
        z_mask_logits = y["mask_logits"].reshape(
            -1, *y["mask_logits"].shape[2:])
        z_depth = z_camera.denormalize_depth(
            y["depth"].reshape(-1, *y["depth"].shape[2:])) * z_mask
        if z_lat is not None:
            z_lat = z_lat.reshape(-1, *z_lat.shape[2:])
        return z_depth, z_mask_logits, z_lat, z_camera

    def _maybe_latent_code(self, target_obs, camera):
        if self.loss_weights.get("latent", 0.0) > 0.0:
            return self.model.compute_latent_code(target_obs, camera)
        return None

    def _score_hypotheses(self, z_obj, target_obs, camera,
                          z_target_latent=None, weights=None):
        """Render + loss; returns per-hypothesis weighted loss (N,)."""
        z_depth, z_mask_logits, z_lat, z_camera = self._render_hypotheses(
            z_obj, camera)
        loss_dict = self.loss_func(target_obs, z_depth, z_mask_logits,
                                   z_camera,
                                   z_pred_latent=z_lat,
                                   z_target_latent=z_target_latent)
        w = weights if weights is not None else self.loss_weights
        loss = sum(weigh_losses(loss_dict, w).values())
        return loss, loss_dict


# ----------------------------------------------------------------- metropolis

def metropolis_temperature(step, mean_z, num_iters):
    """Annealing temperature: the reference's
    ``ExponentialScheduler(0.1/mean_z, 0.005/mean_z, num_iters).get(step)``
    (estimation.py:246-249, utils.py:151-162) evaluated on traced values so
    one jit serves every ``estimate()`` call."""
    mean_lifetime = -(num_iters - 1) / math.log(0.005 / 0.1)
    return (0.1 / mean_z) * jnp.exp(-step / mean_lifetime)


def metropolis_accept(prev_error, loss, temperature, uniforms):
    """MH accept rule (reference: estimation.py:288-291): strict ``>`` on
    ``exp((prev_error - loss) / T)`` against U(0,1) draws."""
    transition_prob = jnp.exp((prev_error - loss) / temperature)
    return transition_prob > uniforms


class MetropolisPoseEstimator(PoseEstimator):
    """MH with simulated annealing (reference: estimation.py:219-295).
    The whole chain loop is one jitted ``lax.fori_loop``."""

    def __init__(self, *, num_samples, num_iters,
                 translation_std=DEFAULT_TRANSLATION_STD,
                 quaternion_std=DEFAULT_QUATERION_STD, **kwargs):
        super().__init__(**kwargs)
        self.num_samples = num_samples
        self.num_iters = num_iters
        self.translation_std = translation_std
        self.quaternion_std = quaternion_std

    def _estimate(self, z_obj, target_obs, key=None, **kwargs):
        if key is None:
            key = jax.random.PRNGKey(0)
        camera_init = self.initial_pose(target_obs)
        key, sub = jax.random.split(key)
        camera = pu.sample_cameras_with_estimate(self.num_samples, camera_init,
                                                 key=sub)

        use_latent = self.loss_weights.get("latent", 0.0) > 0.0

        if self._run_jit is None:
            def run(key, camera, z_obj, target_obs, mean_z):
                # z_obj/target_obs closed over run()'s arguments, not
                # carried (loop-invariant; see the gradient loop's note).

                def body(step, state):
                    key, camera, error, ranking = state
                    key, k1, k2 = jax.random.split(key, 3)
                    temperature = metropolis_temperature(step, mean_z,
                                                         self.num_iters)
                    proposal = pu.perturb_camera(k1, camera,
                                                 self.translation_std,
                                                 self.quaternion_std)
                    z_target_latent = (self.model.compute_latent_code(
                        target_obs, proposal) if use_latent else None)
                    loss, _ = self._score_hypotheses(z_obj, target_obs,
                                                     proposal,
                                                     z_target_latent)
                    accept = metropolis_accept(
                        error, loss, temperature,
                        jax.random.uniform(k2, loss.shape))
                    camera = camera.replace(
                        log_quaternion=jnp.where(accept[:, None],
                                                 proposal.log_quaternion,
                                                 camera.log_quaternion),
                        translation=jnp.where(accept[:, None],
                                              proposal.translation,
                                              camera.translation))
                    error = jnp.where(accept, loss, error)
                    ranking, _ = update_ranking(ranking, error, camera, step)
                    return (key, camera, error, ranking)

                error = jnp.full((self.num_samples,), 100.0)
                ranking = init_ranking(self.ranking_size)
                state = (key, camera, error, ranking)
                state = jax.lax.fori_loop(0, self.num_iters, body, state)
                return state[3]

            self._run_jit = _hot_jit(run)

        camera, z_obj, target_obs = self._shard_hypotheses(camera, z_obj,
                                                           target_obs)
        with self._mesh_ctx():
            ranking = self._run_jit(key, camera, z_obj, target_obs,
                                    camera_init.translation[:, -1].mean())
        return _ranking_to_camera_jit(ranking, camera)

    def estimate_batch(self, z_objs, observations, key=None):
        """Run MH chains for MULTIPLE objects in one jitted loop (TPU-native
        extension; the reference is single-object). Chains are already
        per-hypothesis independent — object ``b`` owns the contiguous chain
        block ``[b*num_samples, (b+1)*num_samples)``; only the annealing
        temperature (mean of per-object depth inits) and the per-object
        top-K rankings differ from the single path. With ``mesh=`` the
        object-major hypothesis axis is sharded across chips (the
        per-object ranking reductions cross shards via XLA collectives).

        Returns a list of B Cameras (each object's top-K ranking).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(z_objs, (list, tuple)):
            z_objs = jnp.concatenate([jnp.asarray(z) for z in z_objs], axis=0)
        if isinstance(observations, (list, tuple)):
            target = Observation.collate(list(observations))
        else:
            target = observations
        num_objects = z_objs.shape[0]
        if len(target) != num_objects:
            raise ValueError(
                f"got {num_objects} latents but {len(target)} observations")

        key, cameras, cam_inits = self._batch_init_cameras(
            key, target, num_objects, self.num_samples)
        mean_zs = cam_inits.translation[:, -1]  # (B,) per-object depth init
        n = self.num_samples
        use_latent = self.loss_weights.get("latent", 0.0) > 0.0

        def run(key, camera, z_obj, target_obs, mean_z):
            # Loop-invariant operands closed over run()'s arguments, not
            # carried (see the single-object loop's note).
            target_rep = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, n, axis=0), target_obs)

            def body(step, state):
                key, camera, error, ranking = state
                key, k1, k2 = jax.random.split(key, 3)
                temperature = metropolis_temperature(step, mean_z,
                                                     self.num_iters)
                proposal = pu.perturb_camera(k1, camera, self.translation_std,
                                             self.quaternion_std)
                # target_rep is hypothesis-aligned (B*n frames), so the
                # latent code pairs each chain with its own object's
                # observation — same semantics as the single path
                # (reference: estimation.py:282).
                z_target_latent = (self.model.compute_latent_code(
                    target_rep, proposal) if use_latent else None)
                loss, _ = self._score_hypotheses(z_obj, target_rep, proposal,
                                                 z_target_latent)
                accept = metropolis_accept(error, loss, temperature,
                                           jax.random.uniform(k2, loss.shape))
                camera = camera.replace(
                    log_quaternion=jnp.where(accept[:, None],
                                             proposal.log_quaternion,
                                             camera.log_quaternion),
                    translation=jnp.where(accept[:, None],
                                          proposal.translation,
                                          camera.translation))
                error = jnp.where(accept, loss, error)
                ranking, _ = update_ranking_batch(
                    ranking, error.reshape(num_objects, n),
                    camera.log_quaternion.reshape(num_objects, n, 3),
                    camera.translation.reshape(num_objects, n, 3),
                    camera.viewport.reshape(num_objects, n, 4), step)
                return (key, camera, error, ranking)

            error = jnp.full((num_objects * n,), 100.0)
            ranking = init_ranking_batch(num_objects, self.ranking_size)
            state = (key, camera, error, ranking)
            state = jax.lax.fori_loop(0, self.num_iters, body, state)
            return state[3]

        jit_key = (num_objects,)
        if not hasattr(self, "_run_batch_cache"):
            self._run_batch_cache = {}
        if jit_key not in self._run_batch_cache:
            self._run_batch_cache[jit_key] = _hot_jit(run)
        sharded_cameras, z_objs, target = self._shard_hypotheses(
            cameras, z_objs, target)
        with self._mesh_ctx():
            ranking = self._run_batch_cache[jit_key](
                key, sharded_cameras, z_objs, target,
                mean_zs.mean())
        return list(_finish_batch(ranking, cameras, num_objects, n, False))


# ----------------------------------------------------------------------- CEM

class CrossEntropyPoseEstimator(PoseEstimator):
    """Cross-entropy method (reference: estimation.py:298-497), fully
    on-device: GMM EM + sampling + elite annealing inside one jitted loop."""

    def __init__(self, *, num_samples, num_elites, num_iters,
                 num_gmm_components, learning_rate, sample_flipped=False,
                 init_hemisphere=False, init_upright=False,
                 translation_std=DEFAULT_TRANSLATION_STD,
                 quaternion_std=DEFAULT_QUATERION_STD, gmm_em_iters=25,
                 **kwargs):
        super().__init__(**kwargs)
        self.num_samples = num_samples
        self.num_elites = num_elites
        self.num_iters = num_iters
        self.num_gmm_components = num_gmm_components
        self.sample_flipped = sample_flipped
        self.init_upright = init_upright
        self.init_hemisphere = init_hemisphere
        self.learning_rate = learning_rate
        self.translation_std = translation_std
        self.quaternion_std = quaternion_std
        self.gmm_em_iters = gmm_em_iters
        self.elite_sched = ExponentialScheduler(num_samples, num_elites,
                                                num_iters)
        # Jitted multi-object loops keyed by (num_objects,).
        self._run_batch_cache: Dict[tuple, Any] = {}

    def _elite_table(self):
        """int(sched.get(step)) per iteration, computed with host-float
        math (the reference's exact annealed counts, estimation.py:326,349)."""
        return jnp.asarray([int(self.elite_sched.get(s))
                            for s in range(self.num_iters)], dtype=jnp.int32)

    @classmethod
    def _camera_to_params(cls, camera: Camera):
        """(reference: estimation.py:476-481)"""
        return jnp.concatenate([camera.translation, camera.log_quaternion],
                               axis=-1)

    def _params_to_camera(self, params, camera_init: Camera) -> Camera:
        """(reference: estimation.py:483-497)"""
        if params.ndim == 1:
            params = params[None]
        intrinsic = jnp.broadcast_to(camera_init.intrinsic[:1],
                                     (params.shape[0],
                                      *camera_init.intrinsic.shape[1:]))
        return Camera(intrinsic=intrinsic, extrinsic=None,
                      translation=params[:, :3],
                      log_quaternion=params[:, 3:],
                      width=camera_init.width, height=camera_init.height,
                      z_span=camera_init.z_span)

    def _estimate(self, z_obj, target_obs, key=None, cameras=None, **kwargs):
        if key is None:
            key = jax.random.PRNGKey(0)

        use_latent = self.loss_weights.get("latent", 0.0) > 0.0
        num_draw = (self.num_samples // 4 if self.sample_flipped
                    else self.num_samples)

        def sample_poses(key, sample_gmm):
            """(reference: estimation.py:412-427)"""
            k1, k2, k3 = jax.random.split(key, 3)
            params = gmm_lib.sample(k1, sample_gmm, num_draw)
            params = params.at[:, :3].add(
                jax.random.normal(k2, (num_draw, 3)) * self.translation_std)
            params = params.at[:, 3:].add(
                jax.random.normal(k3, (num_draw, 3)) * self.quaternion_std)
            return params

        def run(key, init_params, z_obj, target_obs, camera_init):
            # The large loop-invariant operands (latent volume, target
            # observation, camera template) are closed over run()'s
            # arguments, NOT carried in the fori state — carried copies
            # measured ~19% of loop time in the gradient loop (same
            # while-HLO), and XLA does not reliably simplify pass-through
            # tuple elements.
            def body(step, state):
                key, prev_gmm, cur_gmm, ranking = state
                key, k_samp, k_fit = jax.random.split(key, 3)

                sample_gmm = gmm_lib.blend(prev_gmm, cur_gmm,
                                           self.learning_rate)
                params = sample_poses(k_samp, sample_gmm)
                cameras = self._params_to_camera(params, camera_init)
                if self.sample_flipped:
                    cameras = Camera.cat([
                        cameras,
                        pu.flip_camera(cameras, (0.0, 0.0, 1.0)),
                        pu.flip_camera(cameras, (0.0, 1.0, 0.0)),
                        pu.flip_camera(cameras, (1.0, 0.0, 0.0)),
                    ])
                cameras = self._constrain_hypotheses(cameras, cameras.length)

                z_target_latent = (self.model.compute_latent_code(
                    target_obs, cameras[0]) if use_latent else None)
                loss, _ = self._score_hypotheses(z_obj, target_obs, cameras,
                                                 z_target_latent)

                # Annealed elite count as per-sample weights (fixed shape).
                # Precomputed with host math to match the reference's
                # int(elite_sched.get(step)) exactly (estimation.py:349) --
                # the raw f32 schedule admits one extra elite whenever the
                # annealed count is fractional or near an integer.
                num_elites = self._elite_table()[step]
                order = jnp.argsort(loss)
                rank_of = jnp.zeros_like(order).at[order].set(
                    jnp.arange(loss.shape[0]))
                elite_w = (rank_of < num_elites).astype(jnp.float32)

                all_params = self._camera_to_params(cameras)
                new_gmm = gmm_lib.fit(k_fit, all_params,
                                      self.num_gmm_components,
                                      sample_weights=elite_w,
                                      n_iter=self.gmm_em_iters)
                ranking, _ = update_ranking(ranking, loss, cameras, step)
                return (key, cur_gmm, new_gmm, ranking)

            k0, kloop = jax.random.split(key)
            gmm0 = gmm_lib.fit(k0, init_params, self.num_gmm_components,
                               n_iter=self.gmm_em_iters)
            ranking = init_ranking(self.ranking_size)
            state = (kloop, gmm0, gmm0, ranking)
            state = jax.lax.fori_loop(0, self.num_iters, body, state)
            return state[3]

        def run_from_obs(key, z_obj, target_obs):
            """Translation init + hypothesis sampling + the CEM loop in ONE
            jit: the eager prologue (initial_pose, camera sampling,
            params packing) cost ~10 ms per dispatch on the tunneled
            backend — a few hundred ms per estimate() call."""
            camera_init = self.initial_pose(target_obs)
            key, sub = jax.random.split(key)
            init_cameras = pu.sample_cameras_with_estimate(
                n=self.num_gmm_components * self.num_samples,
                camera_est=camera_init,
                upright=self.init_upright,
                hemisphere=self.init_hemisphere,
                key=sub)
            ranking = run(key, self._camera_to_params(init_cameras),
                          z_obj, target_obs, camera_init)
            return ranking, camera_init

        if cameras is None and self.mesh is None:
            if getattr(self, "_run_obs_jit", None) is None:
                self._run_obs_jit = _hot_jit(run_from_obs)
            ranking, camera_init = self._run_obs_jit(key, z_obj, target_obs)
            logger.info("best camera loss=%s", ranking.losses[0])
            return _ranking_to_camera_jit(ranking, camera_init)

        if cameras is not None:
            camera_init = cameras[0]
            init_cameras = cameras
        else:
            camera_init = self.initial_pose(target_obs)
            key, sub = jax.random.split(key)
            init_cameras = pu.sample_cameras_with_estimate(
                n=self.num_gmm_components * self.num_samples,
                camera_est=camera_init,
                upright=self.init_upright,
                hemisphere=self.init_hemisphere,
                key=sub)
        if self._run_jit is None:
            self._run_jit = _hot_jit(run)
        init_params, z_obj, target_obs = self._shard_hypotheses(
            self._camera_to_params(init_cameras), z_obj, target_obs)
        with self._mesh_ctx():
            ranking = self._run_jit(key, init_params, z_obj, target_obs,
                                    camera_init)
        logger.info("best camera loss=%s", ranking.losses[0])
        return _ranking_to_camera_jit(ranking, camera_init)

    def estimate_batch(self, z_objs, observations, key=None):
        """Coarse-search MULTIPLE objects in one jitted CEM loop.

        TPU-native extension beyond the reference (single observation only,
        estimation.py:166-180): object ``b`` owns the contiguous hypothesis
        block ``[b*num_samples, (b+1)*num_samples)`` with its own vmapped
        GMM, elite annealing and top-K ranking, while every iteration's
        renders share one decoder batch. With ``mesh=`` the object-major
        hypothesis axis is sharded across chips.

        Args:
          z_objs: list of (1, 1, C, D, H, W) latents or stacked (B, 1, ...).
          observations: list of single-frame targets (or collated, len B).

        Returns:
          A list of B Cameras (each object's top-K ranking, best first).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(z_objs, (list, tuple)):
            z_objs = jnp.concatenate([jnp.asarray(z) for z in z_objs], axis=0)
        if isinstance(observations, (list, tuple)):
            target = Observation.collate(list(observations))
        else:
            target = observations
        num_objects = z_objs.shape[0]
        if len(target) != num_objects:
            raise ValueError(
                f"got {num_objects} latents but {len(target)} observations")

        n_init = self.num_gmm_components * self.num_samples
        key, init_cams, camera_init = self._batch_init_cameras(
            key, target, num_objects, n_init,
            upright=self.init_upright, hemisphere=self.init_hemisphere)
        init_params = self._camera_to_params(init_cams).reshape(
            num_objects, n_init, 6)

        jit_key = (num_objects,)
        if jit_key not in self._run_batch_cache:
            self._run_batch_cache[jit_key] = _hot_jit(
                self._make_batch_run(num_objects))
        if self.mesh is not None:
            from .. import parallel

            z_objs = parallel.replicate(z_objs, self.mesh)
            target = parallel.replicate(target, self.mesh)
        with self._mesh_ctx():
            ranking = self._run_batch_cache[jit_key](key, init_params, z_objs,
                                                     target, camera_init)
        return list(_finish_batch(ranking, camera_init, num_objects, 1,
                                  False))

    def _make_batch_run(self, num_objects: int):
        """Build the multi-object CEM loop (per-object GMMs via vmap)."""
        num_draw = (self.num_samples // 4 if self.sample_flipped
                    else self.num_samples)
        n_total = self.num_samples

        def sample_poses(key, sample_gmm):
            k1, k2, k3 = jax.random.split(key, 3)
            params = gmm_lib.sample(k1, sample_gmm, num_draw)
            params = params.at[:, :3].add(
                jax.random.normal(k2, (num_draw, 3)) * self.translation_std)
            params = params.at[:, 3:].add(
                jax.random.normal(k3, (num_draw, 3)) * self.quaternion_std)
            return params

        def cameras_from_flat(flat_params, template):
            per_obj = flat_params.shape[0] // num_objects
            intrinsic = jnp.repeat(template.intrinsic, per_obj, axis=0)
            return Camera(intrinsic=intrinsic, extrinsic=None,
                          translation=flat_params[:, :3],
                          log_quaternion=flat_params[:, 3:],
                          width=template.width, height=template.height,
                          z_span=template.z_span)

        def with_flips(cams, template):
            """4 axis-flip variants, reordered so each object's hypotheses
            stay a contiguous block (decode requires object-major order)."""
            variants = [cams,
                        pu.flip_camera(cams, (0.0, 0.0, 1.0)),
                        pu.flip_camera(cams, (0.0, 1.0, 0.0)),
                        pu.flip_camera(cams, (1.0, 0.0, 0.0))]

            def reorder(leaves):
                x = jnp.stack(leaves)  # (4, B*draw, ...)
                x = x.reshape(4, num_objects, num_draw, *x.shape[2:])
                x = jnp.moveaxis(x, 0, 1)  # (B, 4, draw, ...)
                return x.reshape(num_objects * 4 * num_draw, *x.shape[3:])

            return Camera(
                reorder([v.intrinsic for v in variants]), None,
                template.z_span,
                reorder([v.viewport for v in variants]),
                log_quaternion=reorder([v.log_quaternion for v in variants]),
                translation=reorder([v.translation for v in variants]),
                width=template.width, height=template.height)

        fit_one = lambda k, x, w=None: gmm_lib.fit(
            k, x, self.num_gmm_components, sample_weights=w,
            n_iter=self.gmm_em_iters)

        def make_body(z_obj, target_rep, template):
            """Loop-invariant operands closed over run()'s arguments, not
            carried (see the single-object loop's note)."""

            def body(step, state):
                key, prev_gmm, cur_gmm, ranking = state
                key, k_samp, k_fit = jax.random.split(key, 3)

                sample_gmm = jax.vmap(
                    lambda o, n: gmm_lib.blend(o, n, self.learning_rate))(
                        prev_gmm, cur_gmm)
                samp_keys = jax.random.split(k_samp, num_objects)
                params = jax.vmap(sample_poses)(samp_keys, sample_gmm)
                cams = cameras_from_flat(params.reshape(-1, 6), template)
                if self.sample_flipped:
                    cams = with_flips(cams, template)
                # Freshly sampled cameras have no input sharding to propagate
                # from; pin the hypothesis axis onto the mesh.
                cams = self._constrain_hypotheses(cams, cams.length)

                if self.loss_weights.get("latent", 0.0) > 0.0:
                    # The reference computes one target latent at the first
                    # hypothesis camera (estimation.py:393); per object that
                    # is the first camera of its block, repeated across it.
                    first = cams[::n_total]
                    target_first = jax.tree_util.tree_map(
                        lambda x: x[::n_total], target_rep)
                    z_t = self.model.compute_latent_code(target_first, first)
                    z_target_latent = jnp.repeat(z_t, n_total, axis=0)
                else:
                    z_target_latent = None

                loss, _ = self._score_hypotheses(z_obj, target_rep, cams,
                                                 z_target_latent)
                loss_mat = loss.reshape(num_objects, n_total)

                # Precomputed with host math to match the reference's
                # int(elite_sched.get(step)) exactly (estimation.py:349) --
                # the raw f32 schedule admits one extra elite whenever the
                # annealed count is fractional or near an integer.
                num_elites = self._elite_table()[step]
                rank_of = jnp.argsort(jnp.argsort(loss_mat, axis=1), axis=1)
                elite_w = (rank_of < num_elites).astype(jnp.float32)

                all_params = self._camera_to_params(cams).reshape(
                    num_objects, n_total, 6)
                fit_keys = jax.random.split(k_fit, num_objects)
                new_gmm = jax.vmap(fit_one)(fit_keys, all_params, elite_w)
                ranking, _ = update_ranking_batch(
                    ranking, loss_mat,
                    cams.log_quaternion.reshape(num_objects, n_total, 3),
                    cams.translation.reshape(num_objects, n_total, 3),
                    cams.viewport.reshape(num_objects, n_total, 4), step)
                return (key, cur_gmm, new_gmm, ranking)

            return body

        def run(key, init_params, z_obj, target_obs, template):
            # Interleave-repeat the targets to the per-iteration hypothesis
            # layout (object-major blocks of n_total).
            target_rep = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, n_total, axis=0), target_obs)
            k0, kloop = jax.random.split(key)
            fit_keys = jax.random.split(k0, num_objects)
            gmm0 = jax.vmap(lambda k, x: fit_one(k, x))(fit_keys, init_params)
            ranking = init_ranking_batch(num_objects, self.ranking_size)
            state = (kloop, gmm0, gmm0, ranking)
            state = jax.lax.fori_loop(
                0, self.num_iters, make_body(z_obj, target_rep, template),
                state)
            return state[3]

        return run


# ------------------------------------------------------------------- gradient

class GradientPoseEstimator(PoseEstimator):
    """Gradient pose refinement (reference: estimation.py:500-713).

    One jitted ``lax.while_loop``; per-hypothesis Adam/AdamW/SGD/Adagrad via a
    single stacked optax transform, per-hypothesis ReduceLROnPlateau and
    convergence patience as vectorized carried state.
    """

    def __init__(self, *, learning_rate, num_samples, num_iters,
                 converge_threshold, converge_patience,
                 lr_reduce_patience=25, lr_reduce_threshold=1e-5,
                 lr_reduce_factor=0.5, track_stats=False, loss_schedules=None,
                 optimizer="adamw", **kwargs):
        super().__init__(**kwargs)
        self.learning_rate = learning_rate
        self.num_samples = num_samples
        self.num_iters = num_iters
        self.optimizer = optimizer
        self.lr_reduce_patience = lr_reduce_patience
        self.lr_reduce_threshold = lr_reduce_threshold
        self.lr_reduce_factor = lr_reduce_factor
        self.converge_threshold = converge_threshold
        self.converge_patience = converge_patience
        self.loss_schedules = dict(loss_schedules or {})
        self.track_stats = track_stats
        # Jitted loops keyed by (num_objects, total_hypotheses): the object
        # count is baked into the traced reshapes, so each batch geometry
        # gets its own compiled program.
        self._run_cache: Dict[tuple, Any] = {}

    def _transform(self):
        """(reference: estimation.py:566-577 get_optimizer)"""
        name = self.optimizer
        if name in ("adam", "adamw"):
            return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        elif name == "sgd":
            return optax.identity()
        elif name == "adagrad":
            return optax.scale_by_rss(initial_accumulator_value=0.0,
                                      eps=1e-10)
        raise ValueError(f"Unknown optimizer {name!r}")

    def _weights_at(self, step):
        weights = dict(self.loss_weights)
        for k, sched in self.loss_schedules.items():
            weights[k] = sched.get(step)
        return weights

    def _estimate(self, z_obj, target_obs, camera=None, key=None, **kwargs):
        if key is None:
            key = jax.random.PRNGKey(0)
        if camera is None:
            camera = self.initial_pose(target_obs)
            camera = pu.sample_cameras_with_estimate(
                n=self.num_samples, camera_est=camera, key=key)

        # Optimize the zoomed camera (reference: estimation.py:545).
        camera = _zoom_camera(camera, self.model.input_size,
                              self.model.camera_dist)

        ranking, stats = self._optimize_camera(z_obj, target_obs, camera)
        # _optimize_camera returns per-object rankings; single-object here.
        best, rank0 = _finish_single_object(ranking, camera)
        # Deferred formatting: stringifying the arrays would force a
        # host transfer even when the log level filters the record.
        logger.info("best camera step=%s loss=%s", rank0.steps[0],
                    rank0.losses[0])
        if self.track_stats:
            stats["loss_history"] = stats["loss_history"][:, 0]
            return best, stats
        return best

    def estimate_batch(self, z_objs, observations, key=None, cameras=None):
        """Refine poses for MULTIPLE objects in one jitted loop.

        TPU-native extension beyond the reference (which asserts a single
        observation per estimate, estimation.py:166-180): every object's
        hypotheses share the decoder batch — object ``b`` owns the
        contiguous camera block ``[b*num_samples, (b+1)*num_samples)`` and
        its own latent ``z_objs[b]`` (the photographer natively expands a
        (B, 1, C, D, H, W) latent across ``len(camera)//B`` views,
        reference: models.py:486-505). Small per-object hypothesis counts
        therefore still fill the MXU. Rankings, plateau-LR state and
        convergence are tracked per object; the loop stops when all objects
        have converged (or at ``num_iters``).

        Args:
          z_objs: list of (1, 1, C, D, H, W) latents, or stacked
            (B, 1, C, D, H, W).
          observations: list of single-frame target Observations (or one
            collated Observation of length B).
          cameras: optional pre-built hypothesis cameras of length
            B * num_samples (object-major blocks); sampled from per-object
            depth/mask initialization when omitted.

        Returns:
          A list of B Cameras (each object's top-K ranking, best first),
          plus a stats dict when ``track_stats``.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(z_objs, (list, tuple)):
            z_objs = jnp.concatenate([jnp.asarray(z) for z in z_objs], axis=0)
        if isinstance(observations, (list, tuple)):
            target = Observation.collate(list(observations))
        else:
            target = observations
        num_objects = z_objs.shape[0]
        if len(target) != num_objects:
            raise ValueError(
                f"got {num_objects} latents but {len(target)} observations")

        if cameras is None:
            key, cameras, _ = self._batch_init_cameras(
                key, target, num_objects, self.num_samples)
        cameras = _zoom_camera(cameras, self.model.input_size,
                               self.model.camera_dist)

        ranking, stats = self._optimize_camera(z_objs, target, cameras,
                                               num_objects=num_objects)
        views = cameras.length // num_objects
        results = list(_finish_batch(ranking, cameras, num_objects, views,
                                     True))
        if self.track_stats:
            return results, stats
        return results

    def _optimize_camera(self, z_obj, target_obs, cameras: Camera,
                         num_objects: int = 1):
        tx = self._transform()
        use_latent = self.loss_weights.get("latent", 0.0) > 0.0
        wd = 0.01 if self.optimizer == "adamw" else 0.0
        total = cameras.length
        views_per_obj = total // num_objects

        # remat/unroll knobs are read at trace time -> part of the key.
        jit_key = (num_objects, total, get_refine_remat(),
                   get_refine_unroll())
        if jit_key in self._run_cache:
            init_params = pu.camera_params(cameras, optimize_viewport=True)
            (init_params, cameras), z_obj, target_obs = (
                self._shard_hypotheses((init_params, cameras), z_obj,
                                       target_obs))
            with self._mesh_ctx():
                ranking, loss_history, steps = self._run_cache[jit_key](
                    z_obj, target_obs, init_params, cameras)
            return ranking, {"loss_history": loss_history, "num_steps": steps}

        def render_loss(params, step, camera_template, target_obs, z_obj):
            # target_obs/z_obj/camera_template arrive via run()'s arguments
            # (closed over by body inside run) — NOT via the while carry,
            # which would copy them every iteration.
            cam = camera_template.replace(**params)
            z_target_latent = (self.model.compute_latent_code(
                target_obs, cam) if use_latent else None)
            render = self._render_zoomed
            if get_refine_remat():
                # Recompute the decode in the backward instead of storing
                # activations (A/B'd via bench.py --refine-remat; helps iff
                # the backward is bound on reloading saved activations).
                render = jax.checkpoint(render, static_argnums=())
            z_depth, z_mask, z_mask_logits, z_lat = render(z_obj, cam)
            weights = self._weights_at(step)
            loss_dict = self.loss_func(target_obs, z_depth, z_mask_logits,
                                       cam, z_pred_latent=z_lat,
                                       z_target_latent=z_target_latent)
            optim_loss = sum(weigh_losses(loss_dict, weights).values())
            rank_loss = sum(
                weigh_losses(loss_dict, self.loss_weights).values())
            # Per-OBJECT mean over hypotheses: the reference backprops
            # optim_loss.mean() over its single object's hypothesis batch
            # (estimation.py:614), so each pose's gradient carries a 1/N
            # factor with N = that object's hypothesis count. Normalizing
            # per object (not over the whole B*N batch) keeps estimate()
            # and estimate_batch() exactly consistent. (Adam is nearly
            # scale-invariant, but SGD/Adagrad are not.)
            return optim_loss.sum() / views_per_obj, (rank_loss, loss_dict)

        grad_fn = jax.grad(render_loss, has_aux=True)

        def cond(state):
            return (state["step"] < self.num_iters) & (
                state["converge_count"] < self.converge_patience)

        def make_body(camera_template, full_viewport, target_obs, z_obj,
                      quiet=False):
            """Bind the loop-invariant (large) operands as closures over
            run()'s *arguments* — outside the while carry so they are not
            copied every iteration (profiled: carried state copies were
            ~19% of loop time). ``quiet`` suppresses the verbose progress
            print (used by the masked unroll copies, whose post-exit
            computations are discarded and would log bogus lines)."""

            def body(state):
                params = state["params"]
                grads, (rank_loss, _) = grad_fn(params, state["step"],
                                                camera_template, target_obs,
                                                z_obj)
                # rank_loss was rendered at the CURRENT params; keep that
                # pose for the ranking (the optimizer update below advances
                # params one step past the evaluated loss).
                rank_lq, rank_t = params["log_quaternion"], params["translation"]

                updates, opt_state = tx.update(grads, state["opt_state"],
                                               params)
                if wd > 0:
                    updates = jax.tree_util.tree_map(
                        lambda u, p: u + wd * p, updates, params)
                lr = state["lr"]
                params = jax.tree_util.tree_map(
                    lambda p, u: p
                    - lr.reshape((-1,) + (1,) * (u.ndim - 1)) * u,
                    params, updates)

                lr, plateau_best, num_bad = plateau_lr_update(
                    rank_loss, lr, state["plateau_best"], state["num_bad"],
                    threshold=self.lr_reduce_threshold,
                    patience=self.lr_reduce_patience,
                    factor=self.lr_reduce_factor)

                # Ranking stores the uncropped (full-frame) poses, tracked
                # per object (reference: estimation.py:620-648).
                rank_mat = rank_loss.reshape(num_objects, views_per_obj)
                ranking, delta = update_ranking_batch(
                    state["ranking"], rank_mat,
                    rank_lq.reshape(num_objects, views_per_obj, 3),
                    rank_t.reshape(num_objects, views_per_obj, 3),
                    full_viewport.reshape(num_objects, views_per_obj, 4),
                    state["step"])
                # Converge only once EVERY object's best loss has stalled.
                delta_all = delta.max()
                converge_count = jnp.where(
                    delta_all < self.converge_threshold,
                    state["converge_count"] + 1,
                    jnp.where(delta_all > self.converge_threshold, 0,
                              state["converge_count"]))

                hist = state["loss_history"].at[state["step"]].set(
                    rank_mat.min(axis=1))

                if self.verbose and not quiet:
                    # Live progress (the reference's tqdm description,
                    # estimation.py:634-643) via debug callback.
                    jax.debug.print(
                        "step {s}: best={b:.5f} min={m:.5f} converge={c}",
                        s=state["step"], b=ranking.losses[:, 0].min(),
                        m=rank_loss.min(), c=converge_count)

                return {
                    "step": state["step"] + 1,
                    "params": params,
                    "opt_state": opt_state,
                    "lr": lr,
                    "plateau_best": plateau_best,
                    "num_bad": num_bad,
                    "ranking": ranking,
                    "converge_count": converge_count,
                    "loss_history": hist,
                }

            return body

        def run(z_obj, target_obs, init_params, camera_template):
            if num_objects > 1:
                # Interleave-repeat target leaves so hypothesis b*N+i lines
                # up with object b's observation; the loss then treats the
                # batch exactly like a single object with B*N hypotheses.
                target_obs = jax.tree_util.tree_map(
                    lambda x: jnp.repeat(x, views_per_obj, axis=0),
                    target_obs)
            body = make_body(camera_template,
                             camera_template.uncrop().viewport,
                             target_obs, z_obj)
            state = {
                "step": jnp.asarray(0),
                "params": init_params,
                "opt_state": tx.init(init_params),
                "lr": jnp.full((total,), self.learning_rate),
                "plateau_best": jnp.full((total,), jnp.inf),
                "num_bad": jnp.zeros((total,), dtype=jnp.int32),
                "ranking": init_ranking_batch(num_objects, self.ranking_size),
                "converge_count": jnp.asarray(0),
                "loss_history": jnp.full((self.num_iters, num_objects),
                                         jnp.nan),
            }
            unroll = get_refine_unroll()
            if unroll > 1:
                # Masked copies print nothing: their debug.print cannot be
                # gated on the traced predicate, so verbose mode would log
                # bogus post-exit lines (progress shows every unroll-th
                # step instead).
                quiet_body = make_body(camera_template,
                                       camera_template.uncrop().viewport,
                                       target_obs, z_obj, quiet=True)

                def masked_body(s):
                    # Identity once the continuation predicate fails:
                    # converged state is a fixpoint -> results are
                    # bit-exact vs unroll=1 (see set_refine_unroll).
                    new = quiet_body(s)
                    act = cond(s)
                    return jax.tree_util.tree_map(
                        lambda n, o: jnp.where(act, n, o), new, s)

                def unrolled(s):
                    s = body(s)  # entering the body => predicate held
                    for _ in range(unroll - 1):
                        s = masked_body(s)
                    return s

                state = jax.lax.while_loop(cond, unrolled, state)
            else:
                state = jax.lax.while_loop(cond, body, state)
            return state["ranking"], state["loss_history"], state["step"]

        # Cache the jitted loop: re-creating jax.jit per call would retrace
        # the full decode fwd+bwd graph every estimate() (~16s fixed cost
        # measured on the tunneled TPU backend).
        run_jit = _hot_jit(run)
        self._run_cache[jit_key] = run_jit
        init_params = pu.camera_params(cameras, optimize_viewport=True)
        (init_params, cameras), z_obj, target_obs = (
            self._shard_hypotheses((init_params, cameras), z_obj, target_obs))
        with self._mesh_ctx():
            ranking, loss_history, steps = run_jit(z_obj, target_obs,
                                                   init_params, cameras)
        stats = {"loss_history": loss_history, "num_steps": steps}
        return ranking, stats

    def _render_zoomed(self, z_obj, camera: Camera):
        """Direct decode (camera already zoomed). Output (B, V, ...) view
        groups are flattened back to the object-major hypothesis axis
        (reference: estimation.py:703-713). Mirrors the reference's
        gradient-loop render override: apply_mask=True hard-gates depth by
        mask>0.5 inside interpret_logits (render_latent_object's default),
        but — unlike the base estimator's render — the denormalized depth
        is NOT multiplied by the soft mask (estimation.py:703-713)."""
        y, z_lat, _ = self.model.decode_latent(z_obj, camera,
                                               return_latent=True,
                                               apply_mask=True)
        z_mask = y["mask"].reshape(-1, *y["mask"].shape[2:])
        z_mask_logits = y["mask_logits"].reshape(
            -1, *y["mask_logits"].shape[2:])
        z_depth = camera.denormalize_depth(
            y["depth"].reshape(-1, *y["depth"].shape[2:]))
        if z_lat is not None:
            z_lat = z_lat.reshape(-1, *z_lat.shape[2:])
        return z_depth, z_mask, z_mask_logits, z_lat
