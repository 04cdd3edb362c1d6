"""Per-group Adam with LR schedules and mask-aware state surgery.

TPU-native equivalent of the reference ``Optimizers``
(``gs_toolkit/engine/optimizers.py:59-215``) + nerfstudio schedulers
(``gs_toolkit/engine/schedulers.py:76-135``). A hand-rolled Adam (exact
torch.optim.Adam update rule, eps outside the sqrt) is used instead of optax
so adaptive density control can edit first/second moments per-lane (the
static-shape analog of the reference's optimizer-state surgery,
vanilla_gs.py:282-342) without digging through nested optax states.

Default learning rates are the reference method config
(configs/method_configs.py:98-132): means 1.6e-4 (exp decay to 1.6e-6 over
30k), features_dc 2.5e-3, features_rest 1.25e-4, opacities 5e-2,
scales 5e-3, quats 1e-3.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class AdamState(NamedTuple):
    count: jax.Array  # () int32 — step count (shared across groups)
    mu: Params
    nu: Params


def exponential_decay(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
) -> Callable[[jax.Array], jax.Array]:
    """Nerfstudio-style log-linear decay with optional cosine warmup
    (reference engine/schedulers.py:76-135)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            w = lr_pre_warmup + (lr_init - lr_pre_warmup) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0.0, 1.0)
            )
        else:
            w = jnp.asarray(lr_init, jnp.float32)
        t = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        decayed = jnp.exp(
            jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t
        )
        return jnp.where(step < warmup_steps, w, decayed)

    return schedule


def multistep_decay(
    lr_init: float, milestones: tuple, gamma: float = 0.33
) -> Callable[[jax.Array], jax.Array]:
    """Step decay at milestones (reference MultiStepScheduler,
    engine/schedulers.py)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n = jnp.zeros((), jnp.float32)
        for m in milestones:
            n = n + (step >= m).astype(jnp.float32)
        return lr_init * gamma**n

    return schedule


def cosine_decay(
    lr_init: float, max_steps: int, lr_final: float = 0.0,
    warmup_steps: int = 0,
) -> Callable[[jax.Array], jax.Array]:
    """Cosine decay with linear warmup (reference CosineDecayScheduler)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_init * jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        t = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = lr_final + 0.5 * (lr_init - lr_final) * (
            1.0 + jnp.cos(jnp.pi * t)
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Per-group learning rates; groups missing here fall back to 1e-3."""

    lrs: tuple = (
        ("means", 1.6e-4),
        ("features_dc", 2.5e-3),
        ("features_rest", 2.5e-3 / 20),
        ("opacities", 5e-2),
        ("scales", 5e-3),
        ("quats", 1e-3),
    )
    means_lr_final: float = 1.6e-6
    means_max_steps: int = 30_000
    # extra per-group exponential decays: ((group, lr_final, max_steps), ...)
    extra_exp: tuple = ()
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15
    # optional global-norm gradient clip per group (reference
    # engine/optimizers.py max_norm support); None disables
    max_norm: Optional[float] = None

    def lr_for(self, group: str) -> float:
        return dict(self.lrs).get(group, 1e-3)

    def schedule_for(self, group: str) -> Callable[[jax.Array], jax.Array]:
        base = self.lr_for(group)
        if group == "means":
            return exponential_decay(base, self.means_lr_final, self.means_max_steps)
        for name, lr_final, max_steps in self.extra_exp:
            if name == group:
                return exponential_decay(base, lr_final, max_steps)
        return lambda step: jnp.asarray(base, jnp.float32)


def init_adam(params: Params) -> AdamState:
    # mu and nu must be distinct buffers (jit donation forbids aliases).
    return AdamState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
    )


def adam_step(
    params: Params,
    grads: Params,
    state: AdamState,
    step: jax.Array,
    config: OptimizerConfig = OptimizerConfig(),
    update_mask: Optional[jax.Array] = None,
) -> tuple[Params, AdamState]:
    """One Adam step (torch semantics). ``update_mask`` (C,) freezes dead
    capacity lanes so padding never drifts (their moments/params stay put)."""
    count = state.count + 1
    c1 = 1.0 - config.b1 ** count.astype(jnp.float32)
    c2 = 1.0 - config.b2 ** count.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for name in params:
        g = grads[name]
        if update_mask is not None:
            lane = update_mask.reshape(
                update_mask.shape + (1,) * (g.ndim - update_mask.ndim)
            )
            g = jnp.where(lane, g, 0.0)
        if config.max_norm is not None:
            norm = jnp.linalg.norm(g)
            g = g * jnp.minimum(1.0, config.max_norm / jnp.maximum(norm, 1e-12))
        mu = config.b1 * state.mu[name] + (1.0 - config.b1) * g
        nu = config.b2 * state.nu[name] + (1.0 - config.b2) * (g * g)
        lr = config.schedule_for(name)(step)
        update = lr * (mu / c1) / (jnp.sqrt(nu / c2) + config.eps)
        if update_mask is not None:
            lane = update_mask.reshape(
                update_mask.shape + (1,) * (update.ndim - update_mask.ndim)
            )
            update = jnp.where(lane, update, 0.0)
        new_params[name] = params[name] - update
        new_mu[name] = mu
        new_nu[name] = nu
    return new_params, AdamState(count=count, mu=new_mu, nu=new_nu)


def zero_moments_at(
    state: AdamState, slots: jax.Array, active: jax.Array
) -> AdamState:
    """Zero Adam moments at ``slots`` where ``active`` — the static-shape
    analog of dup_in_optim's zero-state for new Gaussians
    (vanilla_gs.py:308-338). Inactive slots must be out-of-bounds (the scatter
    uses mode="drop")."""
    idx = jnp.where(active, slots, jnp.full_like(slots, 2**30))

    def z(x):
        # Surgery on FLATTENED (N, prod(rest)) views: XLA lays out 3-D
        # (N, 15, 3) scatter operands as {1,2,0:T(4,128)} — sublane dim 15
        # padded to 128, an 8.5x HBM blow-up that OOM'd the 2^21-capacity
        # refine compile (12 GB candidate buffer). 2-D operands get the
        # sane transposed (row-minor) layout.
        flat = x.reshape(x.shape[0], -1)
        upd = jnp.zeros((slots.shape[0], flat.shape[1]), x.dtype)
        return flat.at[idx].set(upd, mode="drop").reshape(x.shape)

    return AdamState(
        count=state.count,
        mu={k: z(v) for k, v in state.mu.items()},
        nu={k: z(v) for k, v in state.nu.items()},
    )


def zero_moments_group(state: AdamState, group: str) -> AdamState:
    """Zero a whole group's moments (opacity reset, vanilla_gs.py:487-493)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[group] = jnp.zeros_like(mu[group])
    nu[group] = jnp.zeros_like(nu[group])
    return AdamState(count=state.count, mu=mu, nu=nu)
