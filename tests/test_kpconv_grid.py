"""Grid-pyramid (voxel subsampling) option for KPConv.

Reference structure: MinkowskiEngine quantization + per-voxel mean
(model/KPConv_model.py:362-389), rebuilt as fixed-capacity static-shape
voxel hashing (models/kpconv.py grid_subsample_fixed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sug_tpu.models.kpconv import (
    KPCONV_DEFAULTS,
    KPConvGenerator,
    build_pyramid,
    grid_subsample_fixed,
)


def _numpy_voxel_means(pc, dl):
    """Oracle: dict voxel -> mean of member points."""
    vox = {}
    for p in pc:
        key = tuple(np.floor(p / dl).astype(int))
        vox.setdefault(key, []).append(p)
    return {k: np.mean(v, axis=0) for k, v in vox.items()}


class TestGridSubsample:
    def test_centroids_are_voxel_means(self, rng):
        pc = np.asarray(rng.uniform(-1, 1, (2, 128, 3)), np.float32)
        dl = 0.4
        out, valid = jax.jit(
            lambda p: grid_subsample_fixed(p, dl, 64)
        )(jnp.asarray(pc))
        out, valid = np.asarray(out), np.asarray(valid)
        for b in range(2):
            oracle = _numpy_voxel_means(pc[b], dl)
            n_vox = len(oracle)
            assert valid[b].sum() == min(n_vox, 64)
            got = out[b][valid[b] > 0]
            want = np.array(sorted(oracle.values(), key=lambda x: tuple(x)))
            got_s = np.array(sorted(got.tolist()))
            if n_vox <= 64:  # all voxels kept: exact set equality
                np.testing.assert_allclose(got_s, np.sort(want, axis=0), atol=1e-5)

    def test_capacity_overflow_stratified(self, rng):
        pc = np.asarray(rng.uniform(-1, 1, (1, 256, 3)), np.float32)
        out, valid = grid_subsample_fixed(jnp.asarray(pc), 0.05, 32)
        assert np.asarray(valid).sum() == 32  # far more voxels than capacity
        # all kept slots are genuine voxel means (within the cloud bounds)
        assert np.abs(np.asarray(out)[0]).max() < 2.0

    def test_invalid_slots_far_and_distinct(self, rng):
        pc = np.asarray(rng.uniform(-0.1, 0.1, (1, 64, 3)), np.float32)
        out, valid = grid_subsample_fixed(jnp.asarray(pc), 1.0, 16)
        out, valid = np.asarray(out)[0], np.asarray(valid)[0]
        pads = out[valid == 0]
        assert (np.abs(pads) > 1e5).all()
        # pairwise distinct by >> any conv radius
        d = np.linalg.norm(pads[:, None] - pads[None, :], axis=-1)
        d[np.arange(len(pads)), np.arange(len(pads))] = np.inf
        assert d.min() > 5.0

    def test_respects_input_valid_mask(self, rng):
        pc = np.asarray(rng.uniform(-1, 1, (1, 64, 3)), np.float32)
        halfmask = jnp.asarray(np.r_[np.ones(32), np.zeros(32)], jnp.float32)[None]
        out, valid = grid_subsample_fixed(jnp.asarray(pc), 0.4, 64, valid=halfmask)
        oracle = _numpy_voxel_means(pc[0, :32], 0.4)
        assert np.asarray(valid).sum() == len(oracle)


class TestGridPyramid:
    def test_pyramid_shapes_and_masks(self, rng):
        pc = jnp.asarray(rng.normal(size=(2, 256, 3)) * 0.5, jnp.float32)
        cfg = dict(KPCONV_DEFAULTS, pyramid="grid",
                   grid_capacities=(256, 128, 64, 32, 16))
        pyr = build_pyramid(pc, cfg)
        assert pyr["valid"] is not None and len(pyr["valid"]) == 5
        for lvl, (pts, v) in enumerate(zip(pyr["points"], pyr["valid"])):
            assert pts.shape[1] == (256, 128, 64, 32, 16)[lvl]
            assert v.shape == pts.shape[:2]
            # valid rows sort first (contract of _sample_tensor_slices)
            vv = np.asarray(v)
            for b in range(vv.shape[0]):
                n = int(vv[b].sum())
                assert vv[b, :n].all() and not vv[b, n:].any()
        # coarser level has no more valid voxels than finer
        counts = [np.asarray(v).sum(1) for v in pyr["valid"]]
        for a, b in zip(counts, counts[1:]):
            assert (b <= a).all()

    @pytest.mark.slow
    def test_generator_forward_backward_finite(self, rng):
        # grid_dl matched to this sparse 128-pt cloud's density: at the
        # reference's dl=0.02 every ball holds ONLY its center, the
        # InstanceNorm chain amplifies the near-constant activations'
        # float noise, and the compounded backward rsqrt factors overflow —
        # the starvation regime the trainer-side calibration warning exists
        # to flag (tools/calibrate_kpconv.py).
        pc = jnp.asarray(rng.normal(size=(2, 128, 3)) * 0.5, jnp.float32)
        cfg = {"pyramid": "grid", "grid_capacities": (128, 64, 32, 16, 8),
               "num_layers": 5, "grid_dl": 0.1}
        model = KPConvGenerator(cfg=cfg)
        variables = model.init(jax.random.key(0), pc, True)

        def loss(params):
            g, node, _ = model.apply({"params": params}, pc, True)
            assert g.shape == (2, 1024) and node.shape == (2, 64, 64)
            return jnp.sum(g**2) + jnp.sum(node**2)

        val, grads = jax.value_and_grad(loss)(variables["params"])
        assert np.isfinite(float(val)) and float(val) > 0
        for leaf in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()

    @pytest.mark.slow
    def test_pyramid_mode_defaults(self, rng):
        """grid is the default (reference structure + measured transfer win);
        pyramid=fps keeps the round-2 FPS pyramid (valid=None)."""
        pc = jnp.asarray(rng.normal(size=(1, 128, 3)), jnp.float32)
        pyr = build_pyramid(pc, dict(KPCONV_DEFAULTS))
        assert pyr["valid"] is not None
        pyr = build_pyramid(pc, dict(KPCONV_DEFAULTS, pyramid="fps"))
        assert pyr["valid"] is None

    @pytest.mark.slow
    def test_pad_rows_do_not_leak_into_global_feat(self, rng):
        """Adding pad capacity must not change the global feature: run the
        same cloud with generous vs tight capacities and compare."""
        pc = jnp.asarray(rng.normal(size=(1, 64, 3)) * 0.3, jnp.float32)
        outs = []
        for caps in ((64, 48, 32, 24, 16), (64, 64, 64, 64, 64)):
            cfg = {"pyramid": "grid", "grid_capacities": caps, "num_layers": 5,
                   "grid_dl": 0.1}
            model = KPConvGenerator(cfg=cfg)
            variables = model.init(jax.random.key(0), pc, True)
            g, _, _ = model.apply({"params": variables["params"]}, pc, True)
            outs.append(np.asarray(g))
        # capacities only add pad slots when they exceed the true voxel
        # count; if every level's voxel count fits in the tighter capacity
        # the two runs see identical valid sets -> identical features.
        cfg = dict(KPCONV_DEFAULTS, pyramid="grid", grid_dl=0.1,
                   grid_capacities=(64, 48, 32, 24, 16))
        pyr = build_pyramid(pc, cfg)
        fits = all(
            np.asarray(v).sum() < min(cap, 64)
            for v, cap in zip(pyr["valid"], (64, 48, 32, 24, 16))
        )
        if fits:
            np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)


class TestMaskedDeformRegularizer:
    """p2p_fitting_regularizer with a sown q_mask must equal the regularizer
    computed on only the valid rows — pad rows neither deflate the fitting
    mean nor add phantom repulsion pairs."""

    def test_masked_equals_valid_only(self):
        import jax.numpy as jnp

        from sug_tpu.models.kpconv import p2p_fitting_regularizer

        rng = np.random.default_rng(0)
        B, Q, K = 2, 8, 5
        valid_q = 5  # rows >= valid_q are padding
        min_d2 = jnp.asarray(rng.uniform(0.0, 2.0, (B, Q, K)), jnp.float32)
        kp = jnp.asarray(rng.normal(size=(B, Q, K, 3)), jnp.float32)
        qm = jnp.asarray(
            (np.arange(Q) < valid_q)[None, :].repeat(B, 0), jnp.float32
        )
        # garbage pad rows (what a grid-pyramid sentinel level produces)
        min_d2 = min_d2 * qm[..., None]
        kp_garbage = kp.at[:, valid_q:].set(0.0)

        sown = {"layer": {
            "q_mask": (qm,),
            "min_d2_over_ext2": (min_d2,),
            "deformed_kp_over_ext": (kp_garbage,),
        }}
        got = float(p2p_fitting_regularizer(sown))

        sown_valid = {"layer": {
            "min_d2_over_ext2": (min_d2[:, :valid_q],),
            "deformed_kp_over_ext": (kp[:, :valid_q],),
        }}
        want = float(p2p_fitting_regularizer(sown_valid))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_gradient_is_finite(self):
        import jax
        import jax.numpy as jnp

        from sug_tpu.models.kpconv import p2p_fitting_regularizer

        rng = np.random.default_rng(1)
        kp = jnp.asarray(rng.normal(size=(1, 4, 5, 3)), jnp.float32)

        def loss(kp):
            return p2p_fitting_regularizer(
                {"l": {"deformed_kp_over_ext": (kp,)}}
            )

        g = jax.grad(loss)(kp)
        assert np.isfinite(np.asarray(g)).all()


class TestMortonPreSorted:
    """Round-5: the voxel key switched to a Morton (Z-order) code so pyramid
    levels >= 2 can skip their multi-operand sorts (the key hierarchy makes
    the previous level's output already sorted for the 2x-coarser grid)."""

    def test_morton_hierarchy(self, rng):
        from sug_tpu.models.kpconv import _morton3

        v = jnp.asarray(rng.integers(0, 1024, size=(256, 3)), jnp.int32)
        coarse = np.asarray(_morton3(v >> 1))
        fine = np.asarray(_morton3(v))
        np.testing.assert_array_equal(coarse, fine >> 3)

    def test_pre_sorted_matches_sorted_path(self, rng):
        """Feeding grid_subsample_fixed's own output into the next level with
        pre_sorted=True must give bit-identical results to the sorting path."""
        from sug_tpu.models.kpconv import grid_subsample_fixed

        pc = jnp.asarray(rng.uniform(-1, 1, size=(3, 256, 3)), jnp.float32)
        p1, v1 = grid_subsample_fixed(pc, 0.1, 128)
        fast = grid_subsample_fixed(p1, 0.2, 64, valid=v1, pre_sorted=True)
        slow = grid_subsample_fixed(p1, 0.2, 64, valid=v1, pre_sorted=False)
        np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(slow[0]))
        np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(slow[1]))
        # and one level further down the pyramid
        fast2 = grid_subsample_fixed(fast[0], 0.4, 32, valid=fast[1], pre_sorted=True)
        slow2 = grid_subsample_fixed(slow[0], 0.4, 32, valid=slow[1], pre_sorted=False)
        np.testing.assert_array_equal(np.asarray(fast2[0]), np.asarray(slow2[0]))

    def test_misaligned_dl_falls_back_to_sorting(self, rng):
        """The Morton hierarchy shortcut is only valid when the integer voxel
        offset int(R/dl) halves exactly between levels (child voxel ids ==
        parent >> 1). grid_dl=0.03 violates it (offsets 133 vs 66 vs 33), so
        build_pyramid must fall back to sorting: its level outputs must equal
        an explicit pre_sorted=False reconstruction (they would silently
        mis-segment voxels if the shortcut were taken)."""
        from sug_tpu.models.kpconv import (
            KPCONV_DEFAULTS, build_pyramid, grid_subsample_fixed,
        )

        # the hazard is real at the misaligned transition 0.12 -> 0.24
        # (offsets 33 vs 16; 33 != 2*16): the shortcut mis-segments voxels by
        # O(voxel size), not rounding noise. The 0.06 -> 0.12 transition
        # (66 == 2*33) is aligned, and there the shortcut is BITWISE exact
        # (lax.sort is stable, so re-sorting an already-sorted level is the
        # identity) — both sides of the guard demonstrated.
        pc = jnp.asarray(rng.uniform(-1, 1, size=(4, 256, 3)), jnp.float32)
        p1, v1 = grid_subsample_fixed(pc, 0.12, 128)
        fast = grid_subsample_fixed(p1, 0.24, 64, valid=v1, pre_sorted=True)
        slow = grid_subsample_fixed(p1, 0.24, 64, valid=v1, pre_sorted=False)
        assert np.abs(np.asarray(fast[0]) - np.asarray(slow[0])).max() > 1e-3
        p1a, v1a = grid_subsample_fixed(pc, 0.06, 128)
        fa = grid_subsample_fixed(p1a, 0.12, 64, valid=v1a, pre_sorted=True)
        sl = grid_subsample_fixed(p1a, 0.12, 64, valid=v1a, pre_sorted=False)
        np.testing.assert_array_equal(np.asarray(fa[0]), np.asarray(sl[0]))

        cfg = dict(KPCONV_DEFAULTS, grid_dl=0.03, grid_capacities=(256, 128, 64, 32, 16))
        pyr = build_pyramid(pc, cfg)
        pts, valid = [pc], jnp.ones(pc.shape[:2], pc.dtype)
        for lvl in range(1, cfg["num_layers"]):
            cap = min(cfg["grid_capacities"][lvl], pts[-1].shape[1])
            pts_l, valid = grid_subsample_fixed(
                pts[-1], 0.03 * (2 ** lvl), cap, valid=valid, pre_sorted=False
            )
            pts.append(pts_l)
            np.testing.assert_array_equal(
                np.asarray(pyr["points"][lvl]), np.asarray(pts_l),
                err_msg=f"level {lvl}",
            )
