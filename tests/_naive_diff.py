"""Naive differentiable compositing in pure jnp (autodiff-able) for VJP tests.

Per-pixel O(P*C) reference: same masking semantics as the production
rasterizer (thresholds under stop_gradient), with gradients obtained by plain
JAX autodiff — the ground truth for the custom VJP.
"""

import jax
import jax.numpy as jnp


def composite_naive(xys, conics, colors, opacities, gids, tile_bins,
                    img_height, img_width, background, block_width=16):
    tiles_x = (img_width + block_width - 1) // block_width
    C = gids.shape[0]
    karr = jnp.arange(C)

    ii, jj = jnp.meshgrid(
        jnp.arange(img_height), jnp.arange(img_width), indexing="ij"
    )

    def pixel(i, j):
        tile = (i // block_width) * tiles_x + (j // block_width)
        s, e = tile_bins[tile, 0], tile_bins[tile, 1]
        in_range = (karr >= s) & (karr < e)
        g = gids
        dx = xys[g, 0] - j
        dy = xys[g, 1] - i
        a, b, c = conics[g, 0], conics[g, 1], conics[g, 2]
        sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha = jnp.minimum(0.999, opacities[g] * jnp.exp(-sigma))
        valid = jax.lax.stop_gradient(
            (sigma >= 0) & (alpha >= 1.0 / 255.0) & in_range
        )
        a_eff = jnp.where(valid, alpha, 0.0)
        one_m = 1.0 - a_eff
        cp = jnp.cumprod(one_m)
        t_prev = jnp.concatenate([jnp.ones(1), cp[:-1]])
        keep = jax.lax.stop_gradient(t_prev * one_m > 1e-4)
        a_k = jnp.where(keep, a_eff, 0.0)
        t_prev = jnp.where(
            keep, jnp.cumprod(1.0 - a_k) / jnp.maximum(1.0 - a_k, 1e-3), 1.0
        )
        w = t_prev * a_k
        final_t = jnp.prod(1.0 - a_k)
        img = w @ colors[g] + final_t * background
        return img, 1.0 - final_t

    return jax.vmap(jax.vmap(pixel))(ii, jj)
