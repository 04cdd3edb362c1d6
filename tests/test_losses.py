"""Loss function invariants + a hand-rolled numpy SSIM cross-check."""

import jax.numpy as jnp
import numpy as np

from gstk_tpu.utils import losses


def _ssim_np(a, b, data_range=1.0, size=11, sigma=1.5):
    """Independent numpy SSIM (valid-mode gaussian windows)."""
    from scipy.ndimage import convolve

    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def filt(img):
        out = np.stack(
            [convolve(img[..., c], win, mode="constant") for c in range(img.shape[-1])],
            axis=-1,
        )
        h = size // 2
        return out[h:-h, h:-h]

    mu_a, mu_b = filt(a), filt(b)
    saa = filt(a * a) - mu_a**2
    sbb = filt(b * b) - mu_b**2
    sab = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    return (num / den).mean()


def test_ssim_identical_images(rng):
    img = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    s = float(losses.ssim(jnp.asarray(img), jnp.asarray(img)))
    assert abs(s - 1.0) < 1e-5


def test_ssim_matches_numpy(rng):
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _ssim_np(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_ssim_decreases_with_noise(rng):
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    small = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
    big = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    s_small = float(losses.ssim(jnp.asarray(a), jnp.asarray(small)))
    s_big = float(losses.ssim(jnp.asarray(a), jnp.asarray(big)))
    assert s_small > s_big


def test_depth_l1_ignores_invalid(rng):
    gt = np.array([[1.0, 0.0], [2.0, 0.0]], np.float32)
    pred = np.array([[2.0, 99.0], [4.0, 99.0]], np.float32)
    out = float(losses.depth_l1(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(out - 1.5) < 1e-6


def test_pearson_perfect_correlation(rng):
    d = rng.uniform(1, 5, (16, 16)).astype(np.float32)
    assert float(losses.pearson_corr_loss(jnp.asarray(d * 3 + 1), jnp.asarray(d))) < 1e-5


def test_tv_flat_is_zero():
    assert float(losses.total_variation(jnp.ones((8, 8)))) == 0.0


def test_lpips_structure(rng):
    """LPIPS flow: identity -> 0, grows with perturbation, jittable."""
    import jax

    from gstk_tpu.utils.lpips import lpips, random_lpips_params

    params = random_lpips_params(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    fn = jax.jit(lpips)
    assert float(fn(params, img, img)) == 0.0
    small = float(fn(params, img, jnp.clip(img + 0.01, 0, 1)))
    big = float(fn(params, img, jnp.clip(img + 0.2, 0, 1)))
    assert 0 < small < big


def test_lpips_torch_param_conversion():
    """params_from_torch maps torchvision-style state dicts to the npz
    layout (shapes only; real weights are user-supplied)."""
    from gstk_tpu.utils.lpips import (
        _TAPS,
        _VGG_PLAN,
        params_from_torch,
    )

    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg_state = {}
    c_in = 3
    for i, (c_out, _) in enumerate(_VGG_PLAN):
        k = str(conv_ids[i])
        vgg_state[f"{k}.weight"] = np.zeros((c_out, c_in, 3, 3), np.float32)
        vgg_state[f"{k}.bias"] = np.zeros((c_out,), np.float32)
        c_in = c_out
    lpips_state = {
        f"lin{j}.model.1.weight": np.ones(
            (1, _VGG_PLAN[t][0], 1, 1), np.float32
        )
        for j, t in enumerate(_TAPS)
    }
    out = params_from_torch(vgg_state, lpips_state)
    assert out["conv0_w"].shape == (64, 3, 3, 3)
    assert out["conv12_w"].shape == (512, 512, 3, 3)
    assert out["lin4_w"].shape == (512,)
