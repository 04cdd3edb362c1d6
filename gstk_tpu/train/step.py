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
from gstk_tpu.train.strategy import RefineState, init_refine_state


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


def state_layout_formats(state: TrainState):
    """Per-leaf jit layout spec pinning SH rest-coefficient tensors
    ((C, K-1, 3) in scene/Adam moments) to the {0,2,1} device layout the
    SH-eval contraction and the Adam update fusion both prefer.

    XLA picks default (major-to-minor) layouts for jit inputs/outputs and
    does not optimize across call boundaries, so the carried train state
    crossed the step boundary in {0,1,2} while every consumer inside
    wanted {0,2,1} — four (C,15,3) relayout copies per step, ~2.8 ms at
    1M capacity (docs/PERFORMANCE.md). Pinning the boundary layout
    removes them all (probe: 46.8 -> 44.7 ms/step; composes with
    donate_argnums).

    Returns a pytree matching ``state`` with Format leaves on the pinned
    tensors and None elsewhere, or None when unavailable (non-TPU
    backend, API drift, multi-device mesh — the DP path manages its own
    shardings).

    **NOT WIRED IN — recorded negative result.** A standalone probe at 1M
    capacity measured the expected win (46.8 -> 44.7 ms/step, copies
    gone), but wiring the same pin into bench.py at 104k capacity
    CRASHED throughput 30x (29.7 -> ~960 ms/step, parity still ok) —
    the pinned boundary layout apparently forces XLA into a
    catastrophically different layout assignment for the rest of the
    program at that scale. Do not re-enable without profiling BOTH
    operating points; the ~2.8 ms of (C,15,3) relayout copies at 1M
    stay as the known cost (docs/PERFORMANCE.md)."""
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
    except ImportError:
        return None
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return None
    dev = jax.devices()[0]

    def leaf(x):
        if (
            getattr(x, "ndim", 0) == 3
            and x.shape[-1] == 3
            and x.shape[1] >= 1
        ):
            return Format(
                Layout(major_to_minor=(1, 2, 0)), SingleDeviceSharding(dev)
            )
        return None

    return jax.tree.map(leaf, state)


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
    micro_batch: int = 1,
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

    ``micro_batch`` > 1 is the TPU-native form of the reference's per-group
    gradient accumulation (trainer.py:486-505: grads summed over N
    iterations, one optimizer step): camera/gt/key (and mask/depth/
    camera_index when used) gain a leading ``micro_batch`` dim, a
    ``lax.scan`` sums gradients and densify statistics over the
    micro-steps inside the one compiled step, and Adam applies once to the
    summed gradient — same semantics, no cross-step gradient state.
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

    def _make_loss_fn(
        state, camera, gt, background, kdepth, mask, depth, mono_scale,
        mono_shift, camera_index,
    ):
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

        return loss_fn

    def _grads_once(state, camera, gt_image, key, mask, depth, mono_scale,
                    mono_shift, camera_index, params, xys_zero, cam_in):
        """Forward+backward for one camera; returns (loss, out, ld, grads,
        g_xys, cam_grad, gt)."""
        kbg, kdepth = jax.random.split(key)
        background = _background(kbg, model_cfg.background_color)
        gt = composite_gt_with_background(gt_image, background)
        loss_fn = _make_loss_fn(
            state, camera, gt, background, kdepth, mask, depth, mono_scale,
            mono_shift, camera_index,
        )
        argnums = (0, 1, 2) if use_cam_opt else (0, 1)
        (loss, (out, ld)), all_grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True
        )(params, xys_zero, cam_in)
        cam_grad = all_grads[2] if use_cam_opt else None
        return loss, out, ld, all_grads[0], all_grads[1], cam_grad, gt

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
        params = state.scene.params()
        xys_zero = jnp.zeros((state.scene.capacity, 2), jnp.float32)
        cam_in = state.cam_adjust if use_cam_opt else None
        loss, out, ld, grads, g_xys, cam_grad, gt = _grads_once(
            state, camera, gt_image, key, mask, depth, mono_scale,
            mono_shift, camera_index, params, xys_zero, cam_in,
        )

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
                {"camera_opt": maybe_pmean(cam_grad)},
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

    if micro_batch == 1:
        return train_step

    def micro_train_step(
        state: TrainState,
        cameras: Camera,  # leading dim micro_batch on every field
        gt_images: jax.Array,  # (micro_batch, H, W, 3|4)
        key: jax.Array,
        masks: Optional[jax.Array] = None,
        depths: Optional[jax.Array] = None,
        mono_scales: Optional[jax.Array] = None,
        mono_shifts: Optional[jax.Array] = None,
        camera_indices: Optional[jax.Array] = None,
    ) -> Tuple[TrainState, dict]:
        params = state.scene.params()
        xys_zero = jnp.zeros((state.scene.capacity, 2), jnp.float32)
        cam_in = state.cam_adjust if use_cam_opt else None

        xs = {
            "camera": cameras,
            "gt": gt_images,
            "key": jax.random.split(key, micro_batch),
        }
        if masks is not None:
            xs["mask"] = masks
        if depths is not None:
            xs["depth"] = depths
        if mono_scales is not None:
            xs["mono_scale"] = mono_scales
        if mono_shifts is not None:
            xs["mono_shift"] = mono_shifts
        if camera_indices is not None:
            xs["camera_index"] = camera_indices

        def body(carry, x):
            gsum, csum, gx_sum, vis_sum, rad_max = carry
            loss, out, ld, grads, g_xys, cam_grad, gt = _grads_once(
                state, x["camera"], x["gt"], x["key"],
                x.get("mask"), x.get("depth"), x.get("mono_scale"),
                x.get("mono_shift"), x.get("camera_index"),
                params, xys_zero, cam_in,
            )
            gsum = jax.tree.map(jnp.add, gsum, grads)
            if use_cam_opt:
                csum = csum + cam_grad
            gx_sum = gx_sum + maybe_psum(jnp.linalg.norm(g_xys, axis=-1))
            vis_sum = vis_sum + maybe_psum(
                (out["radii"] > 0).astype(jnp.int32)
            ).astype(jnp.float32)
            rad_max = jnp.maximum(
                rad_max, maybe_pmax(out["radii"]).astype(jnp.float32)
            )
            mse = jnp.mean((out["rgb"] - gt[..., :3]) ** 2)
            ys = {
                "loss": loss,
                "main_loss": ld["main_loss"],
                "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
                "num_intersects": out["num_intersects"],
            }
            return (gsum, csum, gx_sum, vis_sum, rad_max), ys

        cap = state.scene.capacity
        carry0 = (
            jax.tree.map(jnp.zeros_like, params),
            jnp.zeros_like(state.cam_adjust) if use_cam_opt else jnp.zeros(()),
            jnp.zeros((cap,), jnp.float32),
            jnp.zeros((cap,), jnp.float32),
            jnp.zeros((cap,), jnp.float32),
        )
        (gsum, csum, gx_sum, vis_sum, rad_max), ys = jax.lax.scan(
            body, carry0, xs
        )

        grads = jax.tree.map(maybe_pmean, gsum)
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
                {"camera_opt": maybe_pmean(csum)},
                state.cam_adam, state.step, cam_optim_cfg,
            )
            new_cam_adjust = cam_upd["camera_opt"]

        refine = RefineState(
            xys_grad_norm=state.refine.xys_grad_norm + gx_sum,
            vis_counts=state.refine.vis_counts + vis_sum,
            max_2dsize=jnp.maximum(
                state.refine.max_2dsize, rad_max / max_img_size
            ),
        )
        metrics = {
            "loss": maybe_pmean(jnp.mean(ys["loss"])),
            "main_loss": maybe_pmean(jnp.mean(ys["main_loss"])),
            "psnr": maybe_pmean(jnp.mean(ys["psnr"])),
            "num_alive": state.scene.num_alive,
            "num_intersects": maybe_pmax(jnp.max(ys["num_intersects"])),
        }
        if use_cam_opt:
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

    return micro_train_step
