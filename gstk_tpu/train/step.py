"""The jitted train step — forward, backward, Adam, densify stats, on device.

TPU-native equivalent of ``Trainer.train_iteration``
(``gs_toolkit/engine/trainer.py:479-525``) + the model's after_train stats
hook (vanilla_gs.py:344-372). The reference syncs to host every step
(``.item()`` calls, GradScaler, optimizer-state bookkeeping); here the whole
step — render, loss, backward, per-group Adam, grad-norm accumulation — is a
single compiled XLA program. Data parallelism is a ``shard_map`` over a
device mesh: each device renders its own camera and gradients are
``psum``-averaged (the explicit analog of DDP's bucket all-reduce,
pipelines/base_pipeline.py:202-207), with densify statistics psum'd too so
all replicas refine identically (the reference's per-rank stats silently
diverge under DDP; we fix that).

The screen-space positional gradient that drives densification is obtained
by differentiating w.r.t. a zero ``xys_offset`` input — the functional
replacement for ``xys.retain_grad()`` (vanilla_gs.py:797).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gstk_tpu.core.cameras import Camera
from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.models.vanilla import (
    VanillaConfig,
    composite_gt_with_background,
    render_scene,
    rgb_loss,
)
from gstk_tpu.ops.rasterize import RasterizeConfig
from gstk_tpu.train.optim import AdamState, OptimizerConfig, adam_step, init_adam
from gstk_tpu.train.strategy import RefineState, init_refine_state, update_stats


class TrainState(NamedTuple):
    scene: GaussianScene
    adam: AdamState
    refine: RefineState
    step: jax.Array  # () int32
    # camera-pose refinement (None unless enabled): (num_cameras, 6)
    # tangent-space adjustments + their own Adam moments.
    cam_adjust: Optional[jax.Array] = None
    cam_adam: Optional[AdamState] = None


def init_train_state(
    scene: GaussianScene, num_cameras: Optional[int] = None
) -> TrainState:
    """``num_cameras`` enables the camera-opt group (reference registers it
    unconditionally, method_configs.py:75-80; here it is opt-in)."""
    cam_adjust = cam_adam = None
    if num_cameras is not None:
        from gstk_tpu.core.camera_opt import init_camera_opt

        cam_adjust = init_camera_opt(num_cameras)
        cam_adam = init_adam({"camera_opt": cam_adjust})
    return TrainState(
        scene=scene,
        adam=init_adam(scene.params()),
        refine=init_refine_state(scene.capacity),
        step=jnp.zeros((), jnp.int32),
        cam_adjust=cam_adjust,
        cam_adam=cam_adam,
    )


def _background(key: jax.Array, mode: str) -> jax.Array:
    if mode == "random":
        return jax.random.uniform(key, (3,))
    if mode == "white":
        return jnp.ones(3)
    if mode == "black":
        return jnp.zeros(3)
    raise ValueError(mode)


def make_train_step(
    model_cfg: VanillaConfig,
    raster_cfg: RasterizeConfig,
    optim_cfg: OptimizerConfig,
    img_height: int,
    img_width: int,
    sh_degree: int,
    apply_scale_reg: bool = False,
    axis_name: Optional[str] = None,
    frozen_groups: tuple = (),
    camera_opt: Optional["CameraOptConfig"] = None,
):
    """Build the step function for a static (image size, sh degree) config.

    The returned function has signature
    ``(state, camera, gt_image, key, mask=None, depth=None, mono_scale=None,
    mono_shift=None) -> (state, metrics)`` where ``gt_image`` is (H, W, 3|4)
    float in [0,1]. If ``model_cfg`` is a DepthConfig and ``depth`` is given,
    the co-gs depth-loss zoo is added (gates traced on the step counter).
    Under ``shard_map`` pass ``axis_name`` to psum gradients and densify
    statistics across the data axis. ``frozen_groups`` (e.g. ("means",) for
    surface-gs) receive no parameter updates.

    With ``camera_opt`` (mode != "off") the state must carry camera-opt
    params (``init_train_state(scene, num_cameras=N)``) and the step takes a
    ``camera_index`` kwarg; the learned delta is composed onto the camera,
    the L2 pose penalty joins the loss, and the adjustments get their own
    exp-decayed Adam group (reference camera_optimizers.py:22-150,
    method_configs.py:75-80).
    """
    from gstk_tpu.core.camera_opt import (
        CameraOptConfig,
        apply_to_camera,
        pose_regularizer,
    )
    from gstk_tpu.models.depth import DepthConfig, depth_loss_terms

    use_cam_opt = camera_opt is not None and camera_opt.mode != "off"
    if use_cam_opt:
        cam_optim_cfg = OptimizerConfig(
            lrs=(("camera_opt", camera_opt.lr),),
            extra_exp=(
                ("camera_opt", camera_opt.lr_final, camera_opt.max_steps),
            ),
            eps=1e-15,
        )
    is_depth_model = isinstance(model_cfg, DepthConfig)
    maybe_psum = (
        (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
    )
    maybe_pmean = (
        (lambda x: jax.lax.pmean(x, axis_name)) if axis_name else (lambda x: x)
    )
    maybe_pmax = (
        (lambda x: jax.lax.pmax(x, axis_name)) if axis_name else (lambda x: x)
    )
    max_img_size = max(img_height, img_width)

    def train_step(
        state: TrainState,
        camera: Camera,
        gt_image: jax.Array,
        key: jax.Array,
        mask: Optional[jax.Array] = None,
        depth: Optional[jax.Array] = None,
        mono_scale: Optional[jax.Array] = None,
        mono_shift: Optional[jax.Array] = None,
        camera_index: Optional[jax.Array] = None,
    ) -> Tuple[TrainState, dict]:
        kbg, kdepth = jax.random.split(key)
        background = _background(kbg, model_cfg.background_color)
        gt = composite_gt_with_background(gt_image, background)
        params = state.scene.params()
        xys_zero = jnp.zeros((state.scene.capacity, 2), jnp.float32)

        def loss_fn(p, xys_off, cam_adj):
            scn = state.scene.with_params(p)
            cam = camera
            if use_cam_opt:
                cam = apply_to_camera(
                    camera, cam_adj[camera_index], camera_opt.mode
                )
            out = render_scene(
                scn, cam, img_height, img_width,
                sh_degree=sh_degree, background=background,
                config=model_cfg, raster_config=raster_cfg,
                xys_offset=xys_off,
            )
            ld = rgb_loss(out["rgb"], gt, scn, model_cfg, mask, apply_scale_reg)
            if is_depth_model:
                extra = depth_loss_terms(
                    model_cfg, state.step, out["depth"], depth, gt, scn,
                    kdepth, mask=mask, mono_scale=mono_scale,
                    mono_shift=mono_shift, camera=cam,
                )
                ld.update(extra)
            if use_cam_opt:
                ld["camera_opt_regularizer"] = pose_regularizer(
                    cam_adj, camera_opt
                )
            total = sum(ld.values())
            return total, (out, ld)

        argnums = (0, 1, 2) if use_cam_opt else (0, 1)
        cam_in = state.cam_adjust if use_cam_opt else None
        (loss, (out, ld)), all_grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True
        )(params, xys_zero, cam_in)
        grads, g_xys = all_grads[0], all_grads[1]

        grads = jax.tree.map(maybe_pmean, grads)
        if frozen_groups:
            grads = {
                k: (jnp.zeros_like(v) if k in frozen_groups else v)
                for k, v in grads.items()
            }
        new_params, new_adam = adam_step(
            params, grads, state.adam, state.step, optim_cfg,
            update_mask=state.scene.alive,
        )
        new_cam_adjust, new_cam_adam = state.cam_adjust, state.cam_adam
        if use_cam_opt:
            cam_upd, new_cam_adam = adam_step(
                {"camera_opt": state.cam_adjust},
                {"camera_opt": maybe_pmean(all_grads[2])},
                state.cam_adam, state.step, cam_optim_cfg,
            )
            new_cam_adjust = cam_upd["camera_opt"]

        # Densify signals: accumulate the *local* screen grad norm and
        # visibility summed over the data axis.
        g_xys_norm_in = maybe_psum(jnp.linalg.norm(g_xys, axis=-1))
        visible = maybe_psum((out["radii"] > 0).astype(jnp.int32))
        radii_sync = maybe_pmax(out["radii"])
        refine = RefineState(
            xys_grad_norm=state.refine.xys_grad_norm + g_xys_norm_in,
            vis_counts=state.refine.vis_counts + visible.astype(jnp.float32),
            max_2dsize=jnp.maximum(
                state.refine.max_2dsize,
                radii_sync.astype(jnp.float32) / max_img_size,
            ),
        )

        mse = jnp.mean((out["rgb"] - gt[..., :3]) ** 2)
        metrics = {
            "loss": maybe_pmean(loss),
            "main_loss": maybe_pmean(ld["main_loss"]),
            "psnr": maybe_pmean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-10))),
            "num_alive": state.scene.num_alive,
            "num_intersects": maybe_pmax(out["num_intersects"]),
        }
        if use_cam_opt:
            # reference get_metrics_dict (camera_optimizers.py:139-148)
            metrics["camera_opt_translation"] = jnp.mean(
                jnp.linalg.norm(new_cam_adjust[:, :3], axis=-1)
            )
            metrics["camera_opt_rotation"] = jnp.mean(
                jnp.linalg.norm(new_cam_adjust[:, 3:], axis=-1)
            )
        new_state = TrainState(
            scene=state.scene.with_params(new_params),
            adam=new_adam,
            refine=refine,
            step=state.step + 1,
            cam_adjust=new_cam_adjust,
            cam_adam=new_cam_adam,
        )
        return new_state, metrics

    return train_step
