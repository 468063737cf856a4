"""Blocked Pallas env-map sampler: fast-path parity vs the generic
gather/scatter, including azimuth-seam wraparound windows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.ops import grid_sample as gs
from adgs_tpu.models.env_map import _grid_sample_align_corners


def _coords(rng, H, W, x_center=0.0, x_span=0.1, y_center=0.2, y_span=0.1,
            wrap=False):
    """Smooth image-shaped [-1,1] coords; wrap=True crosses azimuth +-1."""
    yy = np.linspace(y_center - y_span, y_center + y_span, H)
    if wrap:
        # azimuth sweeps through the seam: 0.9 .. 1.0 | -1.0 .. -0.9
        xx = np.linspace(0.92, 1.08, W)
        xx = np.where(xx > 1.0, xx - 2.0, xx)
    else:
        xx = np.linspace(x_center - x_span, x_center + x_span, W)
    c = np.stack(np.meshgrid(xx, yy, indexing="xy"), axis=-1)
    c += rng.normal(size=c.shape) * 1e-4
    return jnp.asarray(np.clip(c, -1.0, 1.0).astype(np.float32))


class TestBlockedSampler:
    @pytest.mark.parametrize("wrap", [False, True])
    def test_fast_path_covers_and_matches(self, rng, wrap):
        Hg = Wg = 512
        grid = jnp.asarray(rng.normal(size=(3, Hg, Wg)).astype(np.float32))
        H, W = 40, 96
        coords = _coords(rng, H, W, wrap=wrap)
        nby, nbx = -(-H // gs.BH), -(-W // gs.BW)
        *_, ok = gs._tap_blocks(grid.shape, coords, H, W, nby, nbx)
        assert bool(ok), "fast path must cover this frame (incl. the seam)"

        got = gs.grid_sample_image(grid, coords)
        want = _grid_sample_align_corners(grid, coords)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("wrap", [False, True])
    def test_fast_path_gradients_match(self, rng, wrap):
        Hg = Wg = 512
        grid = jnp.asarray(rng.normal(size=(3, Hg, Wg)).astype(np.float32))
        H, W = 24, 64
        coords = _coords(rng, H, W, wrap=wrap)
        gcot = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))

        def f_fast(g):
            return jnp.sum(gs.grid_sample_image(g, coords) * gcot)

        def f_gen(g):
            return jnp.sum(_grid_sample_align_corners(g, coords) * gcot)

        d_fast = jax.grad(f_fast)(grid)
        d_gen = jax.grad(f_gen)(grid)
        np.testing.assert_allclose(np.asarray(d_fast), np.asarray(d_gen),
                                   rtol=1e-5, atol=1e-6)

    def test_uncoverable_frame_falls_back(self, rng):
        """A frame with MORE than MAXBAD uncoverable blocks must take the
        generic path (ok=False) and still be correct."""
        Hg = Wg = 512
        grid = jnp.asarray(rng.normal(size=(3, Hg, Wg)).astype(np.float32))
        H, W = 80, 256  # 80 blocks, all random -> bad count > MAXBAD=64
        c = rng.uniform(-1, 1, size=(H, W, 2)).astype(np.float32)  # random
        coords = jnp.asarray(c)
        nby, nbx = -(-H // gs.BH), -(-W // gs.BW)
        *_, ok = gs._tap_blocks(grid.shape, coords, H, W, nby, nbx)
        assert not bool(ok)
        got = gs.grid_sample_image(grid, coords)
        want = _grid_sample_align_corners(grid, coords)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestResidualBlocks:
    def test_singular_block_patched(self, rng):
        """A frame with a few uncoverable blocks (pole singularity: azimuth
        sweeps the whole grid inside one block) must stay on the fast path
        via the residual patch and still match the generic result."""
        Hg = Wg = 512
        grid = jnp.asarray(rng.normal(size=(3, Hg, Wg)).astype(np.float32))
        H, W = 40, 96
        c = np.array(_coords(rng, H, W))
        # corrupt one block with wild coords (pole-like)
        c[8:16, 32:64, 0] = rng.uniform(-1, 1, size=(8, 32))
        coords = jnp.asarray(c)
        nby, nbx = -(-H // gs.BH), -(-W // gs.BW)
        *_, ok_b, ok = gs._tap_blocks(grid.shape, coords, H, W, nby, nbx)
        assert bool(ok) and not bool(ok_b.all())

        got = gs.grid_sample_image(grid, coords)
        want = _grid_sample_align_corners(grid, coords)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        gcot = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
        d_fast = jax.grad(lambda g: jnp.sum(
            gs.grid_sample_image(g, coords) * gcot))(grid)
        d_gen = jax.grad(lambda g: jnp.sum(
            _grid_sample_align_corners(g, coords) * gcot))(grid)
        np.testing.assert_allclose(np.asarray(d_fast), np.asarray(d_gen),
                                   rtol=1e-5, atol=1e-6)
