"""Rasterizer tests: blending semantics, binning, tiled-vs-reference parity,
and gradient parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adgs_tpu.raster import composite, preprocess, binning as binning_lib
from adgs_tpu.raster import reference as reference_lib
from adgs_tpu.raster.api import rasterize
from adgs_tpu.raster.types import TILE_X, TILE_Y
from tests import scene_fixtures as fx


def sequential_blend_oracle(alphas, feats, bg=None):
    """Transcription of the renderCUDA per-pixel loop (forward.cu:335-392)."""
    T = 1.0
    C = np.zeros(feats.shape[-1])
    for a, f in zip(alphas, feats):
        a = min(0.99, a)
        if a < 1.0 / 255.0:
            continue
        test_T = T * (1 - a)
        if test_T < 1e-4:
            break
        C += f * a * T
        T = test_T
    if bg is not None:
        C[:3] += T * bg
    return C, T


class TestBlendWeights:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_sequential_loop(self, seed):
        r = np.random.default_rng(seed)
        G = 200
        # mix of tiny, moderate and saturating alphas incl. exact gates
        alphas = r.uniform(0, 1.2, size=G)
        alphas[r.random(G) < 0.3] *= 0.004  # below the 1/255 gate
        alphas = np.minimum(alphas, 0.99)
        feats = r.normal(size=(G, 4))
        want_C, want_T = sequential_blend_oracle(alphas, feats)

        a = jnp.asarray(alphas, dtype=jnp.float32)[None, :]
        a = jnp.where(a < 1.0 / 255.0, 0.0, a)  # caller-side gate
        bw = composite.blend_weights(a)
        got_C = (bw.weights @ jnp.asarray(feats, dtype=jnp.float32))[0]
        np.testing.assert_allclose(got_C, want_C, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(bw.t_eff[0], want_T, rtol=2e-3, atol=1e-5)

    def test_chunked_equals_unchunked(self):
        r = np.random.default_rng(5)
        G, P = 96, 7
        alphas = jnp.asarray(np.minimum(r.uniform(0, 1.0, size=(P, G)), 0.99),
                             dtype=jnp.float32)
        full = composite.blend_weights(alphas)
        t_raw = t_eff = jnp.ones(P, dtype=jnp.float32)
        ws = []
        for c in range(0, G, 32):
            bw = composite.blend_weights(alphas[:, c:c + 32], t_raw, t_eff)
            t_raw, t_eff = bw.t_raw, bw.t_eff
            ws.append(bw.weights)
        np.testing.assert_allclose(jnp.concatenate(ws, axis=-1), full.weights,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(t_eff, full.t_eff, rtol=1e-5, atol=1e-7)


class TestBinning:
    def test_matches_bruteforce(self, rng):
        cam = fx.make_camera()
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=150)
        prep = preprocess.preprocess(g["means3d"], g["scales"], g["rotations"],
                                     g["opacities"], g["shs"], st)
        b = binning_lib.bin_gaussians(prep, st, capacity=8192)
        assert not bool(b.overflow)

        # brute force instance list
        rect_min = np.asarray(prep.rect_min)
        rect_max = np.asarray(prep.rect_max)
        vis = np.asarray(prep.visible)
        depth = np.asarray(prep.depth)
        want = []  # (tile, depth, gid)
        for i in range(150):
            if not vis[i]:
                continue
            for ty in range(rect_min[i, 1], rect_max[i, 1]):
                for tx in range(rect_min[i, 0], rect_max[i, 0]):
                    want.append((ty * st.grid_x + tx, depth[i], i))
        want.sort(key=lambda x: (x[0], x[1], x[2]))
        nr = int(b.num_rendered)
        assert nr == len(want)
        got_tile = np.asarray(b.tile_id[:nr])
        got_gid = np.asarray(b.gauss_id[:nr])
        np.testing.assert_array_equal(got_tile, [w[0] for w in want])
        np.testing.assert_array_equal(got_gid, [w[2] for w in want])

        # ranges consistent
        for t in range(st.num_tiles):
            s, c = int(b.tile_start[t]), int(b.tile_count[t])
            assert np.all(got_tile[s:s + c] == t)

    def test_overflow_flag(self, rng):
        cam = fx.make_camera()
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=400)
        prep = preprocess.preprocess(g["means3d"], g["scales"], g["rotations"],
                                     g["opacities"], g["shs"], st)
        # requested capacity rounds up to INSTANCE_ALIGN; the true instance
        # count must exceed that for the overflow flag to fire
        big = binning_lib.bin_gaussians(prep, st, capacity=16384)
        assert int(big.num_rendered) > binning_lib.INSTANCE_ALIGN
        b = binning_lib.bin_gaussians(prep, st, capacity=4)
        assert bool(b.overflow)


class TestReferenceRenderer:
    def test_pixel_matches_sequential_oracle(self, rng):
        cam = fx.make_camera()
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=120)
        prep = preprocess.preprocess(g["means3d"], g["scales"], g["rotations"],
                                     g["opacities"], g["shs"], st)
        out = reference_lib.composite_reference(prep, st)

        # replay a few pixels with the sequential loop
        order = np.argsort(np.where(np.asarray(prep.visible),
                                    np.asarray(prep.depth), np.inf),
                           kind="stable")
        m2d = np.asarray(prep.mean2d)[order]
        con = np.asarray(prep.conic)[order]
        opa = np.where(np.asarray(prep.visible), np.asarray(prep.opacity), 0)[order]
        rgb = np.asarray(prep.rgb)[order]
        dep = np.asarray(prep.depth)[order]
        rmin = np.asarray(prep.rect_min)[order]
        rmax = np.asarray(prep.rect_max)[order]
        r = np.random.default_rng(7)
        for _ in range(12):
            px_ = int(r.integers(0, st.image_width))
            py_ = int(r.integers(0, st.image_height))
            tx, ty = px_ // TILE_X, py_ // TILE_Y
            alphas, feats = [], []
            for j in range(len(order)):
                if not (rmin[j, 0] <= tx < rmax[j, 0]
                        and rmin[j, 1] <= ty < rmax[j, 1]):
                    continue
                dx = m2d[j, 0] - px_
                dy = m2d[j, 1] - py_
                power = (-0.5 * (con[j, 0] * dx * dx + con[j, 2] * dy * dy)
                         - con[j, 1] * dx * dy)
                if power > 0:
                    continue
                alphas.append(opa[j] * np.exp(power))
                feats.append(np.concatenate([rgb[j], [1.0 / (dep[j] + 1e-7)]]))
            want_C, want_T = sequential_blend_oracle(
                np.array(alphas) if alphas else np.zeros((0,)),
                np.array(feats) if feats else np.zeros((0, 4)))
            got = np.concatenate([
                np.asarray(out.color)[:, py_, px_],
                np.asarray(out.depth)[:, py_, px_],
            ])
            np.testing.assert_allclose(got, want_C, rtol=5e-3, atol=5e-4)
            np.testing.assert_allclose(1.0 - np.asarray(out.opacity)[0, py_, px_],
                                       want_T, rtol=5e-3, atol=1e-4)


class TestTiledParity:
    def _render_both(self, rng, **kw):
        cam = fx.make_camera()
        st = fx.settings_from_camera(cam, bg=(0.2, 0.3, 0.1))
        g = fx.make_gaussians(rng, n=256)
        flow = jnp.asarray(rng.normal(size=(256, 3)), dtype=jnp.float32)
        sem = jnp.asarray(rng.uniform(size=(256, 1)), dtype=jnp.float32)
        args = dict(means3d=g["means3d"], opacities=g["opacities"],
                    scales=g["scales"], rotations=g["rotations"],
                    settings=st, shs=g["shs"], flow_points=flow, semantic=sem)
        ref = rasterize(backend="reference", **args)
        xla = rasterize(backend="xla", capacity=1 << 14, max_per_tile=512,
                        **args, **kw)
        return ref, xla

    def test_images_match(self, rng):
        ref, xla = self._render_both(rng)
        np.testing.assert_allclose(xla.color, ref.color, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(xla.depth, ref.depth, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(xla.opacity, ref.opacity, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(xla.flow, ref.flow, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(xla.semantic, ref.semantic, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(xla.radii, ref.radii)

    def test_gradients_match(self, rng):
        cam = fx.make_camera(width=32, height=32)
        st = fx.settings_from_camera(cam, bg=(0.1, 0.1, 0.1))
        g = fx.make_gaussians(rng, n=96)
        target = jnp.asarray(rng.uniform(size=(3, 32, 32)), dtype=jnp.float32)

        def loss(params, backend):
            out = rasterize(
                means3d=params["means3d"], opacities=params["opacities"],
                scales=params["scales"], rotations=params["rotations"],
                settings=st, shs=params["shs"], backend=backend,
                capacity=1 << 13, max_per_tile=256)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.opacity))

        g_ref = jax.grad(lambda p: loss(p, "reference"))(g)
        g_xla = jax.grad(lambda p: loss(p, "xla"))(g)
        for k in g:
            np.testing.assert_allclose(
                g_xla[k], g_ref[k], rtol=5e-3, atol=1e-5,
                err_msg=f"grad mismatch for {k}")

    def test_screen_offset_grad(self, rng):
        """dL/dmean2D surfaces through the zero screen_offset input
        (the densification-stats signal, gaussian_model.py:863-867)."""
        cam = fx.make_camera(width=32, height=32)
        st = fx.settings_from_camera(cam)
        g = fx.make_gaussians(rng, n=64)
        so = jnp.zeros((64, 2), dtype=jnp.float32)

        def loss(so, backend):
            out = rasterize(
                means3d=g["means3d"], opacities=g["opacities"],
                scales=g["scales"], rotations=g["rotations"], settings=st,
                shs=g["shs"], screen_offset=so, backend=backend,
                capacity=1 << 13, max_per_tile=256)
            return jnp.mean(out.color ** 2)

        g_ref = jax.grad(lambda s: loss(s, "reference"))(so)
        g_xla = jax.grad(lambda s: loss(s, "xla"))(so)
        assert np.any(np.asarray(g_ref) != 0.0)
        np.testing.assert_allclose(g_xla, g_ref, rtol=5e-3, atol=1e-6)


class TestOpacityAwareSupport:
    """The rect shrink to the exact alpha support (preprocess.py) must be
    lossless: pixels beyond sigma*sqrt(2 ln(255 op)) are zeroed by the
    1/255 gate, so rendering with the full 3-sigma rects gives the SAME
    image; op <= 1/255 gaussians lose their rect entirely."""

    def _prep(self, rng, ops):
        cam = fx.make_camera()
        st = fx.settings_from_camera(cam, bg=(0.1, 0.2, 0.3))
        g = fx.make_gaussians(rng, n=len(ops))
        g["opacities"] = jnp.asarray(ops, dtype=jnp.float32)
        prep = preprocess.preprocess(
            g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], st)
        return prep, st

    def test_subthreshold_opacity_has_no_rect(self, rng):
        ops = np.full(64, 1.0 / 255.0 - 1e-4)
        prep, _ = self._prep(rng, ops)
        assert np.all(np.asarray(prep.tiles_touched) == 0)
        assert not np.any(np.asarray(prep.visible))

    def test_shrunk_rects_render_identically(self, rng):
        ops = np.concatenate([
            np.full(32, 0.005), np.full(32, 0.02),
            np.full(32, 0.2), np.full(32, 0.9)])
        prep, st = self._prep(rng, ops)

        # rebuild the full 3-sigma rects (undo the shrink; all ops > 1/255
        # here so the factor is positive)
        shrink = np.sqrt(
            np.clip(2.0 * np.log(255.0 * ops) + 1e-3, 0.0, 9.0) / 9.0)
        extent3 = prep.extent / jnp.asarray(shrink, jnp.float32)[:, None]
        rmin3, rmax3 = preprocess.get_rect(prep.mean2d, extent3,
                                           st.grid_x, st.grid_y)
        tiles3 = ((rmax3[..., 0] - rmin3[..., 0])
                  * (rmax3[..., 1] - rmin3[..., 1]))
        # re-derive base visibility (frustum + peak-alpha) — OR-ing with
        # prep.visible would revive frustum-culled gaussians whose
        # projected quantities are garbage
        vis3 = (tiles3 > 0) & (prep.depth > 0.2) & jnp.asarray(
            ops * 255.0 >= 1.0 - 1e-5)
        prep3 = prep._replace(extent=extent3, rect_min=rmin3, rect_max=rmax3,
                              tiles_touched=jnp.where(vis3, tiles3, 0)
                              .astype(jnp.int32), visible=vis3)
        assert int(jnp.sum(prep3.tiles_touched)) > int(
            jnp.sum(prep.tiles_touched)), "shrink should cut instances"

        from adgs_tpu.raster import tiled as tiled_lib
        out_s = tiled_lib.render_tiled(
            prep, binning_lib.bin_gaussians(prep, st, capacity=1 << 14), st)
        out_f = tiled_lib.render_tiled(
            prep3, binning_lib.bin_gaussians(prep3, st, capacity=1 << 14), st)
        # extra sub-gate instances change chunk boundaries and thus the
        # f32 summation tree -> tolerate 1-ULP, nothing more
        np.testing.assert_allclose(np.asarray(out_s.color),
                                   np.asarray(out_f.color), atol=5e-7)
        np.testing.assert_allclose(np.asarray(out_s.opacity),
                                   np.asarray(out_f.opacity), atol=5e-7)
