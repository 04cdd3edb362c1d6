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
from gstk_tpu.train.optim import AdamState, zero_moments_group
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

    # ---- candidate children ----
    # Candidate space: nsamps split segments (children of ``splits``
    # originals) followed by one dup segment, segment-major — candidate
    # (seg, parent) has global rank seg*C + parent in the reference's
    # concat order. Only the (nsamps+1)*C-row means/scales tables are
    # materialized ((N, 3) lays out rows-minor at ~1.33x pad); every other
    # attribute is recovered by a parent-index GATHER at the receiving
    # slot. The former formulation scattered (nsamps+1)*C-row candidate
    # tensors into the scene — at 2^21 capacity XLA gave the 3-D
    # (N, 15, 3) SH operand a {1,2,0:T(4,128)} layout (sublane dim 15
    # padded to 128, 8.5x HBM) whose 12 GB candidate buffer OOM'd the
    # refine compile, and the multi-column scatters themselves ran
    # seconds per refine.
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
    cand_scales = jnp.concatenate(
        [split_scale] * nsamps + [scene.scales], axis=0
    )

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
    op_ok = jax.nn.sigmoid(scene.opacities[:, 0]) >= cfg.cull_alpha_thresh
    past_reset = step > cfg.refine_every * cfg.reset_alpha_every
    toobig_split = (
        jnp.max(jnp.exp(split_scale), axis=-1) > cfg.cull_scale_thresh
    )
    toobig_orig = (
        jnp.max(jnp.exp(scene.scales), axis=-1) > cfg.cull_scale_thresh
    )
    valid_a = splits & op_ok & ~(past_reset & toobig_split)  # split segs
    valid_b = dups & op_ok & ~(past_reset & toobig_orig)  # dup seg

    # ---- assign candidates to free slots (gather formulation) ----
    # The mapping "r-th valid candidate -> r-th free slot" is INVERTED per
    # slot instead of scattered per candidate: segment-major candidate
    # order means the r-th valid candidate is (seg, idx_a[r - seg*nA])
    # for r < nsamps*nA and (dup, idx_b[r - nsamps*nA]) after, where
    # idx_a/idx_b compact the per-segment validity masks. Everything is
    # C-sized sorts, prefix sums, gathers and elementwise selects — no
    # scatter touches the scene or the Adam moments.
    from gstk_tpu.ops.binning import _cumsum_1d

    free = ~alive_after_cull
    n_a = jnp.sum(valid_a.astype(jnp.int32))
    n_b = jnp.sum(valid_b.astype(jnp.int32))
    total_valid = nsamps * n_a + n_b
    num_free = jnp.sum(free.astype(jnp.int32))
    idx_a = jnp.argsort(~valid_a, stable=True)  # valid lanes first
    idx_b = jnp.argsort(~valid_b, stable=True)
    r = _cumsum_1d(free.astype(jnp.int32)) - 1  # free rank per slot
    seg = jnp.zeros_like(r)
    for s in range(1, nsamps + 1):
        seg = seg + (r >= s * n_a).astype(jnp.int32)
    pr = jnp.clip(r - seg * n_a, 0, C - 1)
    parent = jnp.where(seg < nsamps, idx_a[pr], idx_b[pr])
    written = free & (r < total_valid)
    parent = jnp.where(written, parent, 0)  # benign index for dead lanes
    cand_row = jnp.clip(seg, 0, nsamps) * C + parent

    sel = lambda new, old: jnp.where(
        written.reshape((C,) + (1,) * (old.ndim - 1)), new, old
    )

    def gather_parent(x):
        # >2-D operands (SH rest (C, 15, 3)) gather through the FLAT view:
        # XLA's 3-D gather/select layouts pad the 15-sublane dim to 128
        # (the 8.5x blow-up documented above); 2-D stays rows-minor.
        flat = x.reshape(C, -1)
        return sel(flat[parent], flat).reshape(x.shape)
    new_scene = GaussianScene(
        means=sel(cand_means[cand_row], scene.means),
        scales=sel(cand_scales[cand_row], scene.scales),
        quats=gather_parent(scene.quats),
        features_dc=gather_parent(scene.features_dc),
        features_rest=gather_parent(scene.features_rest),
        opacities=gather_parent(scene.opacities),
        alive=alive_after_cull | written,
    )
    dropped = total_valid - jnp.minimum(total_valid, num_free)
    # Adam zero-state for written slots (reference dup_in_optim): pure
    # elementwise masking — no scatter. Flat views for >2-D moments (same
    # layout defense as gather_parent).
    zero_written = lambda v: sel(
        jnp.zeros((C, v.size // C), v.dtype), v.reshape(C, -1)
    ).reshape(v.shape)
    adam_state = AdamState(
        count=adam_state.count,
        mu={k: zero_written(v) for k, v in adam_state.mu.items()},
        nu={k: zero_written(v) for k, v in adam_state.nu.items()},
    )

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
