"""Sorted-boundary segment-broadcast kernel (ops/segment_kernel.py) vs the
portable scatter+cumsum formulation — interpret-mode parity on CPU (hardware
parity rides tests/test_tpu_smoke.py / bench.py).

The kernel computes out_c[j] = sum_{i: b[i] <= j} d_c[i] (mod 2**32) — the
composed scatter+cumsum of ``ops/binning``'s three segment passes in one
MXU mask-matmul call."""

import jax.numpy as jnp
import numpy as np

from gstk_tpu.ops.binning import bin_gaussians
from gstk_tpu.ops.segment_kernel import segment_broadcast

from tests.test_binning import _project


def _ref(b, ds, length):
    """numpy reference with explicit mod-2^32 semantics."""
    outs = []
    for d in ds:
        buf = np.zeros(length, np.int64)
        for bi, di in zip(b, d):
            if bi < length:
                buf[max(bi, 0) :] += int(di)
        outs.append((buf & 0xFFFFFFFF).astype(np.uint32).view(np.int32))
    return outs


def test_segment_broadcast_matches_reference(rng):
    n, length = 700, 4096
    b = np.sort(rng.integers(0, length + 50, n)).astype(np.int32)
    ds = [
        rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        for _ in range(3)
    ]
    got = segment_broadcast(
        jnp.asarray(b), [jnp.asarray(d) for d in ds], length, interpret=True
    )
    ref = _ref(b, ds, length)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), r)


def test_segment_broadcast_single_column_unit_values(rng):
    # the gid-marks column: d = 1 everywhere, repeated boundaries
    n, length = 256, 2048
    b = np.sort(rng.integers(0, length, n)).astype(np.int32)
    b[10:20] = b[10]  # repeats
    b.sort()
    got = segment_broadcast(
        jnp.asarray(b), [jnp.ones(n, jnp.int32)], length, interpret=True
    )[0]
    np.testing.assert_array_equal(
        np.asarray(got), _ref(b, [np.ones(n, np.int32)], length)[0]
    )


def test_segment_broadcast_all_past_length(rng):
    n, length = 64, 1024
    b = np.full(n, length + 7, np.int32)
    got = segment_broadcast(
        jnp.asarray(b), [jnp.arange(n, dtype=jnp.int32)], length,
        interpret=True,
    )[0]
    np.testing.assert_array_equal(np.asarray(got), np.zeros(length, np.int32))


def test_bin_gaussians_kernel_backend_parity(rng):
    """Full bin_gaussians: segment_backend='pallas_interpret' must produce
    the identical Intersections struct as the portable XLA path."""
    out, tile_bounds = _project(rng)
    capacity = 1 << 13
    args = (
        out.xys, out.depths, out.radii, out.num_tiles_hit,
        tile_bounds, 16, capacity,
    )
    ref = bin_gaussians(*args, segment_backend="xla")
    got = bin_gaussians(*args, segment_backend="pallas_interpret")
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            err_msg=name,
        )


def test_bin_gaussians_kernel_backend_parity_overflow(rng):
    """Truncating capacity: the kernel's clamp semantics must match the
    drop-mode scatters when boundaries run past the buffer."""
    out, tile_bounds = _project(rng)
    total = int(np.asarray(out.num_tiles_hit).sum())
    capacity = max(1024, (total // 2 // 1024) * 1024)
    assert capacity < total
    args = (
        out.xys, out.depths, out.radii, out.num_tiles_hit,
        tile_bounds, 16, capacity,
    )
    ref = bin_gaussians(*args, segment_backend="xla")
    got = bin_gaussians(*args, segment_backend="pallas_interpret")
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            err_msg=name,
        )


def test_segment_sum_sorted_matches_numpy(rng):
    from gstk_tpu.ops.segment_kernel import segment_sum_sorted

    rows, npv, n = 16, 3000, 2500
    vals = rng.normal(size=(rows, npv)).astype(np.float32)
    counts = rng.integers(0, 4, n)
    hi = np.minimum(np.cumsum(counts), npv).astype(np.int32)
    out = segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(hi), interpret=True
    )
    lo = np.concatenate([[0], hi[:-1]])
    ref = np.stack(
        [vals[:, l:h].sum(axis=1) for l, h in zip(lo, hi)], axis=1
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_sum_sorted_empty_and_clipped(rng):
    from gstk_tpu.ops.segment_kernel import segment_sum_sorted

    rows, npv, n = 8, 1024, 600
    vals = rng.normal(size=(rows, npv)).astype(np.float32)
    # first 100 segments empty; segment 100 covers everything (its end
    # overshoots npv and must clip); the rest are empty again
    hi = np.zeros(n, np.int32)
    hi[100:] = npv + 50
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(hi), interpret=True
    ))
    assert np.all(out[:, :100] == 0)
    np.testing.assert_allclose(
        out[:, 100], vals.sum(axis=1), rtol=1e-5, atol=1e-4
    )
    assert np.all(out[:, 101:] == 0)


def test_segment_sum_sorted_terms2(rng):
    """terms=2 (the rasterize VJP's setting): ~2^-16 relative — fine for
    threshold-free gradient sums."""
    from gstk_tpu.ops.segment_kernel import segment_sum_sorted

    rows, npv, n = 16, 2048, 1500
    vals = rng.normal(size=(rows, npv)).astype(np.float32)
    counts = rng.integers(0, 4, n)
    hi = np.minimum(np.cumsum(counts), npv).astype(np.int32)
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(hi), interpret=True, terms=2
    ))
    lo = np.concatenate([[0], hi[:-1]])
    ref = np.stack(
        [vals[:, l:h].sum(axis=1) for l, h in zip(lo, hi)], axis=1
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
