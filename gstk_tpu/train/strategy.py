"""Adaptive density control (densify / split / dup / cull) with static shapes.

TPU-native re-design of the reference refinement callbacks
(``gs_toolkit/models/vanilla_gs.py:344-497``). The reference reallocates the
parameter tensors and performs optimizer-state surgery on every refine; under
XLA that would recompile constantly. Here the scene has fixed capacity with
an ``alive`` mask and refinement is one jitted function:

  * cull     -> clear alive bits;
  * split    -> each selected Gaussian emits ``n_split_samples`` children into
                free slots (original culled), scales shrunk by 1.6;
  * dup      -> one copy into a free slot (original kept);
  * slots    -> free-slot ranking via cumsum + one scatter (no host sync);
  * Adam     -> moments zeroed at newly written slots
                (= reference dup_in_optim zero-state).

Thresholds, gating and schedules replicate vanilla_gs.py exactly (grad-norm
densify threshold 2e-4 scaled by 0.5*max(H,W), size thresh 0.01, screen-size
split/cull 0.05/0.15 until step 4000, cull alpha 0.1, scale 0.5, opacity
reset clamp to logit(2*cull_alpha) every reset_alpha_every refines).

One documented deviation: the reference seeds grad-norm accumulators with the
*first* post-reset gradient for all Gaussians including invisible ones
(vanilla_gs.py:355-357); we accumulate visible-only from the start — the
difference only affects Gaussians invisible in that single first step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gstk_tpu.core.gaussians import GaussianScene
from gstk_tpu.models.vanilla import VanillaConfig
from gstk_tpu.train.optim import AdamState, zero_moments_at, zero_moments_group
from gstk_tpu.utils.math import normalize, quat_to_rotmat


class RefineState(NamedTuple):
    """Densification statistics accumulated between refine steps."""

    xys_grad_norm: jax.Array  # (C,) summed screen-space grad norms
    vis_counts: jax.Array  # (C,) number of steps each Gaussian was visible
    max_2dsize: jax.Array  # (C,) max radius / max(H, W) seen


def init_refine_state(capacity: int) -> RefineState:
    # Distinct buffers per field: aliased leaves break jit buffer donation.
    z = lambda: jnp.zeros((capacity,), jnp.float32)
    return RefineState(xys_grad_norm=z(), vis_counts=z(), max_2dsize=z())


def update_stats(
    state: RefineState,
    xys_grad: jax.Array,
    radii: jax.Array,
    max_img_size: int,
) -> RefineState:
    """Per-step stats accumulation (reference after_train, vanilla_gs.py:344-372)."""
    visible = radii > 0
    grads = jnp.linalg.norm(xys_grad, axis=-1)
    return RefineState(
        xys_grad_norm=state.xys_grad_norm + jnp.where(visible, grads, 0.0),
        vis_counts=state.vis_counts + visible.astype(jnp.float32),
        max_2dsize=jnp.maximum(
            state.max_2dsize,
            jnp.where(visible, radii.astype(jnp.float32) / max_img_size, 0.0),
        ),
    )


def _cull_mask(
    scene: GaussianScene,
    cfg: VanillaConfig,
    step: jax.Array,
    max_2dsize: jax.Array,
) -> jax.Array:
    """Reference cull_gaussians criteria (vanilla_gs.py:500-535)."""
    op = jax.nn.sigmoid(scene.opacities[:, 0])
    culls = op < cfg.cull_alpha_thresh
    past_reset = step > cfg.refine_every * cfg.reset_alpha_every
    toobig_world = jnp.max(jnp.exp(scene.scales), axis=-1) > cfg.cull_scale_thresh
    toobig_screen = (max_2dsize > cfg.cull_screen_size) & (
        step < cfg.stop_screen_size_at
    )
    culls = culls | (past_reset & (toobig_world | toobig_screen))
    return culls & scene.alive


def refine(
    scene: GaussianScene,
    adam_state: AdamState,
    refine_state: RefineState,
    step: jax.Array,
    key: jax.Array,
    cfg: VanillaConfig,
    num_train_data: int,
    max_img_size: int,
) -> Tuple[GaussianScene, AdamState, RefineState, dict]:
    """One refinement pass (call every cfg.refine_every steps, after the
    optimizer step). Fully jittable; returns info dict of device scalars."""
    C = scene.capacity
    reset_interval = cfg.reset_alpha_every * cfg.refine_every
    in_warmup = step <= cfg.warmup_length

    do_densify = (
        (step < cfg.stop_split_at)
        & ((step % reset_interval) > (num_train_data + cfg.refine_every))
        & (~in_warmup)
    )
    do_cull_only = (
        (step >= cfg.stop_split_at)
        & jnp.asarray(cfg.continue_cull_post_densification)
        & (~in_warmup)
    )

    avg_grad = (
        refine_state.xys_grad_norm
        / jnp.maximum(refine_state.vis_counts, 1.0)
        * 0.5
        * max_img_size
    )
    high_grads = (avg_grad > cfg.densify_grad_thresh) & scene.alive
    scale_max = jnp.max(jnp.exp(scene.scales), axis=-1)
    big_world = scale_max > cfg.densify_size_thresh
    big_screen = (refine_state.max_2dsize > cfg.split_screen_size) & (
        step < cfg.stop_screen_size_at
    )
    splits = (big_world | big_screen) & high_grads & do_densify
    dups = (~big_world) & high_grads & do_densify

    # ---- candidate children (computed densely for every lane) ----
    nsamps = cfg.n_split_samples
    keys = jax.random.split(key, nsamps)
    quats_n = normalize(scene.quats)
    rots = quat_to_rotmat(quats_n)  # (C, 3, 3)
    split_scale = jnp.log(jnp.maximum(jnp.exp(scene.scales) / 1.6, 1e-30))

    def split_sample(k):
        noise = jax.random.normal(k, (C, 3))
        offs = jnp.einsum("nij,nj->ni", rots, jnp.exp(scene.scales) * noise)
        return scene.means + offs

    cand_means = jnp.concatenate(
        [split_sample(k) for k in keys] + [scene.means], axis=0
    )
    tile = lambda x: jnp.concatenate([x] * nsamps + [x], axis=0)
    cand_scales = jnp.concatenate(
        [split_scale] * nsamps + [scene.scales], axis=0
    )
    cand_quats = tile(scene.quats)
    cand_dc = tile(scene.features_dc)
    # features_rest surgery runs on the FLAT (C, 45) view: XLA gives 3-D
    # (N, 15, 3) scatter/concat operands a {1,2,0:T(4,128)} layout whose
    # sublane padding (15 -> 128) inflates HBM 8.5x — the 2^21-capacity
    # refine compile carried a 12 GB candidate buffer and OOM'd a 16 GB
    # chip. The flat view tiles as (rows-minor, 45->48 sublanes), ~1.07x.
    rest_flat = scene.features_rest.reshape(C, -1)
    cand_rest = tile(rest_flat)
    cand_opac = tile(scene.opacities)
    cand_valid = jnp.concatenate([splits] * nsamps + [dups], axis=0)

    # ---- cull existing lanes (split originals are culled too) ----
    culls = _cull_mask(scene, cfg, step, refine_state.max_2dsize)
    culls = jnp.where(do_densify | do_cull_only, culls, False)
    culls = culls | splits  # split originals replaced by their children
    alive_after_cull = scene.alive & (~culls)

    # New children are subject to the same alpha + world-size cull the
    # reference applies to the concatenated tensor (cull_gaussians runs on
    # the full tensor after densify, vanilla_gs.py:500-535): past the first
    # opacity reset, children with max(exp(scale)) > cull_scale_thresh are
    # culled immediately there and must not survive a refine period here.
    cand_op = jax.nn.sigmoid(cand_opac[:, 0])
    cand_valid = cand_valid & (cand_op >= cfg.cull_alpha_thresh)
    past_reset = step > cfg.refine_every * cfg.reset_alpha_every
    cand_toobig = (
        jnp.max(jnp.exp(cand_scales), axis=-1) > cfg.cull_scale_thresh
    )
    cand_valid = cand_valid & ~(past_reset & cand_toobig)

    # ---- allocate free slots ----
    free = ~alive_after_cull
    num_free = jnp.sum(free.astype(jnp.int32))
    # free slot of rank r = free_order[r] (stable: free slots ascending).
    free_order = jnp.argsort(~free, stable=True)
    cand_rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    place = cand_valid & (cand_rank < num_free)
    # Non-placed candidates target index C: out of bounds, dropped by the
    # scatter — avoids duplicate-index collisions with real targets.
    target = jnp.where(place, free_order[jnp.clip(cand_rank, 0, C - 1)], C)
    dropped = jnp.sum(cand_valid.astype(jnp.int32)) - jnp.sum(
        place.astype(jnp.int32)
    )

    def write(dst, src):
        return dst.at[target].set(src, mode="drop")

    new_scene = GaussianScene(
        means=write(scene.means, cand_means),
        scales=write(scene.scales, cand_scales),
        quats=write(scene.quats, cand_quats),
        features_dc=write(scene.features_dc, cand_dc),
        features_rest=write(rest_flat, cand_rest).reshape(
            scene.features_rest.shape
        ),
        opacities=write(scene.opacities, cand_opac),
        alive=alive_after_cull.at[target].set(
            jnp.ones_like(place), mode="drop"
        ),
    )
    adam_state = zero_moments_at(adam_state, target, place)

    # ---- opacity reset (vanilla_gs.py:476-493) ----
    # Gated on warmup like densify/cull: the reference's refinement_after
    # returns early for step <= warmup_length (vanilla_gs.py:384-386), which
    # skips the reset too.
    do_reset = (
        (~in_warmup)
        & (step < cfg.stop_split_at)
        & ((step % reset_interval) == cfg.refine_every)
    )
    reset_value = cfg.cull_alpha_thresh * 2.0
    reset_logit = jnp.log(reset_value / (1.0 - reset_value))
    new_opac = jnp.where(
        do_reset, jnp.minimum(new_scene.opacities, reset_logit), new_scene.opacities
    )
    new_scene = new_scene._replace(opacities=new_opac)
    adam_state = jax.lax.cond(
        do_reset,
        lambda s: zero_moments_group(s, "opacities"),
        lambda s: s,
        adam_state,
    )

    info = {
        "num_alive": new_scene.num_alive,
        "num_split": jnp.sum(splits.astype(jnp.int32)),
        "num_dup": jnp.sum(dups.astype(jnp.int32)),
        "num_cull": jnp.sum(culls.astype(jnp.int32)),
        "num_dropped": dropped,
        "did_reset": do_reset,
    }
    return new_scene, adam_state, init_refine_state(C), info
