#!/usr/bin/env python
"""Pose-estimation service: amortize compilation across requests.

Production serving wrapper around the warm inference path: load a model
once, enable the persistent compilation cache, then answer line-delimited
JSON requests over stdin/stdout (``--stdio``) or a TCP socket
(``--port``). Compiled estimator loops are reused across requests with
the same geometry (the first request per shape pays the compile; every
subsequent one runs the warm path — seconds vs minutes on a tunneled
backend).

Protocol (one JSON object per line):

  {"cmd": "register", "object": "mug", "npz": "refs.npz"}
      Build + cache the latent object from reference views.
  {"cmd": "estimate", "object": "mug", "npz": "frame.npz",
   "top_k": 8, "seed": 0}
      Coarse (CEM) + fine (gradient) pose for one target frame.
      With "npz": [f1.npz, f2.npz, ...] the frames are estimated JOINTLY
      via estimate_batch (shared latent, one jitted loop).
      With "object": [a, b, ...] AND a matching npz list, frame i is
      estimated against object i's latent — multi-OBJECT joint batch
      (per-frame poses returned in "poses").
  {"cmd": "ping"} / {"cmd": "shutdown"}

npz layout (numpy archive): color (V, 3, H, W) float [0, 1],
depth (V, 1, H, W) or (V, H, W) meters, mask like depth,
intrinsic (3, 3) or (V, 3, 3), extrinsic (V, 4, 4) (reference views:
camera poses; target frames: ignored for estimation, echoed for eval).

Responses: {"ok": true, "id": ..., "extrinsic": [[...4x4...]], ...} or
{"ok": false, "error": "..."}.

Reference analog: the LatentFusion evaluation scripts re-run the whole
pipeline per object (latentfusion/scripts/run_evaluation.py); this keeps
the model + compiled loops resident the way a deployment would.
"""
from __future__ import annotations

import argparse
import json
import logging
import socket
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("serve_pose")


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint", type=Path, default=None,
                   help="model checkpoint (.pth or orbax dir)")
    p.add_argument("--demo-tiny", action="store_true",
                   help="serve a randomly initialized tiny model "
                        "(protocol/latency testing without weights)")
    p.add_argument("--demo-npz", type=Path, default=None,
                   help="learned demo-family params npz (the accuracy "
                        "rigs' enumerated-leaf checkpoints, e.g. "
                        "artifacts/unseen_objects_pool128/"
                        "unseen_objects.npz); builds zoo.demo_* around it")
    p.add_argument("--coarse-config", type=Path,
                   default=Path(__file__).parents[1]
                   / "configs/cross_entropy_quick.toml")
    p.add_argument("--fine-config", type=Path,
                   default=Path(__file__).parents[1]
                   / "configs/adam_quick.toml")
    p.add_argument("--coarse-json", type=str, default=None,
                   help="inline JSON estimator config overriding "
                        "--coarse-config")
    p.add_argument("--fine-json", type=str, default=None)
    p.add_argument("--top-k", type=int, default=8)
    p.add_argument("--stdio", action="store_true",
                   help="serve on stdin/stdout (default if no --port)")
    p.add_argument("--port", type=int, default=None,
                   help="serve on a TCP socket (one line-delimited JSON "
                        "connection at a time)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-cache", action="store_true",
                   help="skip enable_compilation_cache()")
    return p.parse_args(argv)


def observation_from_npz(path):
    import numpy as np

    import jax.numpy as jnp

    from latentfusion_tpu.camera import Camera
    from latentfusion_tpu.observation import Observation

    with np.load(path) as z:
        color = np.asarray(z["color"], np.float32)
        depth = np.asarray(z["depth"], np.float32)
        mask = np.asarray(z["mask"], np.float32)
        intrinsic = np.asarray(z["intrinsic"], np.float32)
        extrinsic = np.asarray(z["extrinsic"], np.float32)
    v, _, h, w = color.shape
    if depth.ndim == 3:
        depth = depth[:, None]
    if mask.ndim == 3:
        mask = mask[:, None]
    if intrinsic.ndim == 2:
        intrinsic = np.tile(intrinsic[None], (v, 1, 1))
    cam = Camera(jnp.asarray(intrinsic), jnp.asarray(extrinsic),
                 width=w, height=h)
    return Observation(jnp.asarray(color), jnp.asarray(depth),
                       jnp.asarray(mask), cam)


class PoseService:
    def __init__(self, args):
        import jax

        from latentfusion_tpu.pose import estimation

        if args.demo_tiny:
            from latentfusion_tpu import zoo
            from latentfusion_tpu.recon.inference import LatentFusionModel

            key = jax.random.PRNGKey(0)
            sculptor = zoo.tiny_sculptor()
            fuser = zoo.tiny_fuser()
            photographer = zoo.tiny_photographer()
            params = zoo.init_recon_params(key, sculptor, fuser,
                                           photographer, batch=1, views=2)
            self.model = LatentFusionModel(
                sculptor, params["sculptor"], fuser, params["fuser"],
                photographer, params["photographer"], camera_dist=1.5)
        elif args.demo_npz is not None:
            from latentfusion_tpu import zoo
            from latentfusion_tpu.recon.inference import LatentFusionModel

            sculptor = zoo.demo_sculptor()
            fuser = zoo.demo_fuser()
            photographer = zoo.demo_photographer()
            template = zoo.init_recon_params(
                jax.random.PRNGKey(0), sculptor, fuser, photographer,
                batch=1, views=2)
            params = zoo.load_params_npz(args.demo_npz, template)
            self.model = LatentFusionModel(
                sculptor, params["sculptor"], fuser, params["fuser"],
                photographer, params["photographer"],
                camera_dist=zoo.DEMO_CAMERA_DIST)
        elif args.checkpoint is not None:
            from latentfusion_tpu.recon.inference import LatentFusionModel

            self.model = LatentFusionModel.from_checkpoint(args.checkpoint)
        else:
            raise SystemExit("need --checkpoint, --demo-npz or --demo-tiny")

        coarse_cfg = (json.loads(args.coarse_json) if args.coarse_json
                      else args.coarse_config)
        fine_cfg = (json.loads(args.fine_json) if args.fine_json
                    else args.fine_config)
        self.coarse = estimation.load_from_config(coarse_cfg, self.model)
        self.fine = estimation.load_from_config(fine_cfg, self.model)
        self.top_k = args.top_k
        self.latents = {}

    # ------------------------------------------------------------ handlers
    def handle(self, req: dict) -> dict:
        import jax

        cmd = req.get("cmd")
        rid = req.get("id")
        t0 = time.time()
        try:
            if cmd == "ping":
                return {"ok": True, "id": rid,
                        "objects": sorted(self.latents)}
            if cmd == "register":
                obs = observation_from_npz(req["npz"])
                self.latents[req["object"]] = \
                    self.model.build_latent_object(obs)
                return {"ok": True, "id": rid, "object": req["object"],
                        "views": int(obs.color.shape[0]),
                        "seconds": round(time.time() - t0, 3)}
            if cmd == "estimate":
                key = jax.random.PRNGKey(int(req.get("seed", 0)))
                top_k = int(req.get("top_k", self.top_k))
                npz = req["npz"]
                obj = req["object"]
                if isinstance(obj, (list, tuple)):
                    # Multi-OBJECT joint batch: frame i is estimated
                    # against object i's latent, all hypothesis blocks
                    # sharing ONE compiled loop (the README's
                    # estimate_batch extension).
                    if not (isinstance(npz, (list, tuple))
                            and len(npz) == len(obj)):
                        raise ValueError(
                            "object list needs a matching npz list")
                    cams = self._estimate_multi(
                        [self.latents[o] for o in obj],
                        [observation_from_npz(p) for p in npz],
                        top_k, key)
                elif isinstance(npz, (list, tuple)):
                    cams = self._estimate_batch(
                        self.latents[obj],
                        [observation_from_npz(p) for p in npz],
                        top_k, key)
                else:
                    cams = [self._estimate_one(
                        self.latents[obj], observation_from_npz(npz),
                        top_k, key)]
                out = [self._pose_payload(c) for c in cams]
                resp = {"ok": True, "id": rid,
                        "seconds": round(time.time() - t0, 3)}
                resp.update(out[0] if not isinstance(npz, (list, tuple))
                            else {"poses": out})
                return resp
            if cmd == "shutdown":
                return {"ok": True, "id": rid, "shutdown": True}
            return {"ok": False, "id": rid, "error": f"unknown cmd {cmd!r}"}
        except Exception as e:  # noqa: BLE001 — report, keep serving
            logger.exception("request failed")
            return {"ok": False, "id": rid, "error": f"{type(e).__name__}: {e}"}

    def _estimate_one(self, z_obj, obs, top_k, key):
        coarse_cams = self.coarse.estimate(z_obj, obs, key=key)
        return self.fine.estimate(z_obj, obs, camera=coarse_cams[:top_k])

    def _estimate_batch(self, z_obj, observations, top_k, key):
        import jax.numpy as jnp

        z_objs = jnp.concatenate([z_obj] * len(observations), axis=0)
        return self._estimate_multi_z(z_objs, observations, top_k, key)

    def _estimate_multi(self, z_objs_list, observations, top_k, key):
        import jax.numpy as jnp

        return self._estimate_multi_z(jnp.concatenate(z_objs_list, axis=0),
                                      observations, top_k, key)

    def _estimate_multi_z(self, z_objs, observations, top_k, key):
        from latentfusion_tpu.camera import Camera

        coarse_out = self.coarse.estimate_batch(z_objs, observations,
                                                key=key)
        return self.fine.estimate_batch(
            z_objs, observations,
            cameras=Camera.cat([c[:top_k] for c in coarse_out]))

    @staticmethod
    def _pose_payload(cams):
        """Best (rank-0) hypothesis of an estimate() result."""
        import numpy as np

        best = cams[:1]
        return {
            "extrinsic": np.asarray(best.extrinsic)[0].tolist(),
            "translation": np.asarray(best.translation)[0].tolist(),
            "log_quaternion": np.asarray(best.log_quaternion)[0].tolist(),
        }


def serve_lines(service, rfile, wfile):
    for line in rfile:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            resp = {"ok": False, "error": f"bad json: {e}"}
        else:
            resp = service.handle(req)
        wfile.write(json.dumps(resp) + "\n")
        wfile.flush()
        if resp.get("shutdown"):
            return True
    return False


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(message)s")
    args = parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_cache:
        import latentfusion_tpu

        path = latentfusion_tpu.enable_compilation_cache()
        logger.info("compilation cache: %s", path)

    service = PoseService(args)
    logger.info("model ready on %s", jax.devices()[0].device_kind)

    if args.port is None or args.stdio:
        serve_lines(service, sys.stdin, sys.stdout)
        return
    srv = socket.create_server(("127.0.0.1", args.port))
    logger.info("listening on 127.0.0.1:%d", args.port)
    while True:
        conn, addr = srv.accept()
        logger.info("connection from %s", addr)
        with conn:
            rfile = conn.makefile("r", encoding="utf-8")
            wfile = conn.makefile("w", encoding="utf-8")
            try:
                if serve_lines(service, rfile, wfile):
                    return
            except (BrokenPipeError, ConnectionResetError, OSError) as e:
                # A dropped client must not kill the resident model and
                # its warm-compiled loops; wait for the next connection.
                logger.warning("client connection lost: %s", e)


if __name__ == "__main__":
    main()
