"""Golden tests for the coordinate-hash tables and sparse conv engine against
brute-force NumPy implementations of the reference semantics (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsu3d_tpu.ops import hashing as hs
from minsu3d_tpu.ops import sparse, sparse_conv


def random_voxels(rng, n, extent=40, batches=3):
    coords = rng.integers(0, extent, size=(n, 3))
    batch = rng.integers(0, batches, size=(n,))
    keys = {(int(b), *map(int, c)) for b, c in zip(batch, coords)}
    keys = sorted(keys)
    arr = np.array(keys, dtype=np.int32)
    return arr[:, 0], arr[:, 1:]


def pad(x, cap, fill=0):
    out = np.full((cap,) + x.shape[1:], fill, x.dtype)
    out[: len(x)] = x
    return out


class TestHashing:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 1024, size=(100, 3)).astype(np.int32)
        batch = rng.integers(0, 1000, size=(100,)).astype(np.int32)
        khi, klo = hs.pack(jnp.array(batch), jnp.array(coords))
        b2, c2 = hs.unpack(khi, klo)
        np.testing.assert_array_equal(np.asarray(b2), batch)
        np.testing.assert_array_equal(np.asarray(c2), coords)

    def test_lookup_finds_all_and_rejects_missing(self):
        rng = np.random.default_rng(1)
        batch, coords = random_voxels(rng, 500)
        n = len(batch)
        cap = 700
        khi, klo = hs.pack(jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)))
        valid = jnp.arange(cap) < n
        khi, klo = hs.mask_invalid(khi, klo, valid)
        perm = hs.lexsort_pairs(khi, klo)
        s_hi, s_lo = khi[perm], klo[perm]

        q_hi, q_lo = hs.pack(jnp.array(batch), jnp.array(coords))
        idx, found = hs.lookup(s_hi, s_lo, q_hi, q_lo)
        assert bool(jnp.all(found))
        np.testing.assert_array_equal(np.asarray(s_hi[idx]), np.asarray(q_hi))
        np.testing.assert_array_equal(np.asarray(s_lo[idx]), np.asarray(q_lo))

        # queries guaranteed absent (different batch id)
        q_hi2 = q_hi + 100
        idx2, found2 = hs.lookup(s_hi, s_lo, q_hi2, q_lo)
        assert not bool(jnp.any(found2))
        assert bool(jnp.all(idx2 == cap))


class TestBuildBase:
    def test_dedup_and_row2voxel(self):
        rng = np.random.default_rng(2)
        batch = np.array([0, 0, 0, 1, 1, 0], dtype=np.int32)
        coords = np.array([[1, 2, 3], [1, 2, 3], [4, 5, 6], [1, 2, 3], [1, 2, 3], [9, 9, 9]], np.int32)
        feats = rng.normal(size=(6, 4)).astype(np.float32)
        cap = 8
        level, row2voxel, feats_v = sparse.build_base(
            jnp.array(batch), jnp.array(coords), jnp.ones(6, bool), cap, jnp.array(feats))
        assert int(level.count) == 4  # {(0,123),(0,456),(0,999),(1,123)}
        r2v = np.asarray(row2voxel)
        assert r2v[0] == r2v[1] and r2v[3] == r2v[4]
        assert len({r2v[0], r2v[2], r2v[3], r2v[5]}) == 4
        # voxel coords round-trip through the table
        vc = np.asarray(level.coords)
        for row in range(6):
            np.testing.assert_array_equal(vc[r2v[row]], coords[row])
        # representative features: first row in key order of each voxel
        fv = np.asarray(feats_v)
        np.testing.assert_allclose(fv[r2v[0]], feats[0])
        np.testing.assert_allclose(fv[r2v[3]], feats[3])

    def test_overflow_drops_deterministically(self):
        batch = np.zeros(10, np.int32)
        coords = np.stack([np.arange(10)] * 3, 1).astype(np.int32)
        level, row2voxel, _ = sparse.build_base(
            jnp.array(batch), jnp.array(coords), jnp.ones(10, bool), 6)
        assert int(level.count) == 6
        assert int(level.n_dropped) == 4
        assert int(jnp.sum(row2voxel == 6)) == 4


def np_subm_conv(coords, batch, feats, weight):
    """Brute-force 3^3 submanifold conv."""
    n = len(coords)
    table = {(int(b), *map(int, c)): i for i, (b, c) in enumerate(zip(batch, coords))}
    out = np.zeros((n, weight.shape[-1]), np.float32)
    for i in range(n):
        k = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    key = (int(batch[i]), int(coords[i, 0] + dx), int(coords[i, 1] + dy), int(coords[i, 2] + dz))
                    j = table.get(key)
                    if j is not None:
                        out[i] += feats[j] @ weight[k]
                    k += 1
    return out


class TestSparseConv:
    def _plan(self, rng, n=200, cap=256, levels=2):
        batch, coords = random_voxels(rng, n, extent=16, batches=2)
        n = len(batch)
        feats = rng.normal(size=(n, 8)).astype(np.float32)
        caps = [cap for _ in range(levels)]  # random data doesn't shrink 2x/level
        plan, row2voxel, feats_v = sparse.build_plan(
            jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
            jnp.arange(cap) < n, caps, levels, jnp.array(pad(feats, cap)))
        return batch, coords, feats, plan, row2voxel, feats_v

    def test_subm_conv_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        batch, coords, feats, plan, r2v, feats_v = self._plan(rng)
        w = rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2
        out = sparse_conv.subm_conv(feats_v, plan.levels[0], jnp.array(w))
        ref = np_subm_conv(coords, batch, feats, w)
        got = np.asarray(out)[np.asarray(r2v)[: len(batch)]]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_down_up_conv_consistency(self):
        rng = np.random.default_rng(4)
        batch, coords, feats, plan, r2v, feats_v = self._plan(rng)
        child, parent = plan.levels[0], plan.levels[1]
        wd = rng.normal(size=(8, 8, 6)).astype(np.float32) * 0.2
        down = np.asarray(sparse_conv.down_conv(feats_v, child, parent.cap, jnp.array(wd)))

        # brute force: parent coord -> sum of child feats @ W[kid]
        pc = np.asarray(parent.coords)
        pb = np.asarray(parent.batch)
        pv = np.asarray(parent.valid)
        ref = np.zeros_like(down)
        for i, (b, c) in enumerate(zip(batch, coords)):
            key = (int(b), *(c // 2))
            pi = next(j for j in range(len(pc)) if pv[j] and pb[j] == key[0] and tuple(pc[j]) == key[1:])
            kid = (c[0] & 1) * 4 + (c[1] & 1) * 2 + (c[2] & 1)
            ref[pi] += feats[i] @ wd[kid]
        np.testing.assert_allclose(down[pv], ref[pv], rtol=1e-4, atol=1e-4)

        # transposed conv: child i receives parent feats @ Wu[kid_i]
        wu = rng.normal(size=(8, 6, 3)).astype(np.float32) * 0.2
        up = np.asarray(sparse_conv.up_conv(jnp.array(ref), child, jnp.array(wu)))
        kid = np.asarray(child.child_kid)
        pidx = np.asarray(child.parent_idx)
        cv = np.asarray(child.valid)
        for i in range(int(child.count)):
            if cv[i]:
                np.testing.assert_allclose(up[i], ref[pidx[i]] @ wu[kid[i]], rtol=1e-4, atol=1e-4)

    def test_tap_lists_enumerate_exactly_the_valid_pairs(self):
        rng = np.random.default_rng(11)
        _, _, _, plan, _, _ = self._plan(rng)
        level = plan.levels[0]
        cap = level.cap
        lv = sparse_conv.add_tap_lists(level, e_cap=cap)
        assert int(lv.tap_dropped) == 0
        nbr = np.asarray(level.nbr_idx)
        for cls, tap_ids in enumerate(sparse_conv.TAP_CLASSES):
            src = np.asarray(lv.tap_src[cls])
            tgt = np.asarray(lv.tap_tgt[cls])
            for row, k in enumerate(tap_ids):
                valid_tgts = np.nonzero(nbr[:, k] < cap)[0]
                n = len(valid_tgts)
                # exactly the valid pairs, in target order (monotone both ways)
                np.testing.assert_array_equal(tgt[row, :n], valid_tgts)
                np.testing.assert_array_equal(src[row, :n], nbr[valid_tgts, k])
                assert (tgt[row, n:] == cap).all() and (src[row, n:] == cap).all()
                assert (np.diff(src[row, :n]) > 0).all()  # monotone sources

    def test_subm_conv_tap_matches_dense(self):
        rng = np.random.default_rng(12)
        batch, coords, feats, plan, r2v, feats_v = self._plan(rng)
        w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
        lv = sparse_conv.add_tap_lists(plan.levels[0], e_cap=192)
        dense = np.asarray(sparse_conv.subm_conv(feats_v, plan.levels[0], w))
        tap = np.asarray(sparse_conv.subm_conv_tap(feats_v, lv, w))
        np.testing.assert_allclose(tap, dense, rtol=1e-5, atol=1e-5)
        # bf16 compute path
        dense_bf = np.asarray(sparse_conv.subm_conv(
            feats_v.astype(jnp.bfloat16), plan.levels[0], w, jnp.bfloat16)).astype(np.float32)
        tap_bf = np.asarray(sparse_conv.subm_conv_tap(
            feats_v.astype(jnp.bfloat16), lv, w, jnp.bfloat16)).astype(np.float32)
        np.testing.assert_allclose(tap_bf, dense_bf, rtol=0.05, atol=0.05)

    def test_tap_overflow_drops_and_surfaces(self):
        rng = np.random.default_rng(13)
        # dense plan (extent 8 -> ~60% occupancy) so per-tap counts well
        # exceed the minimum class capacity of 8
        batch, coords = random_voxels(rng, 1200, extent=8, batches=2)
        n = len(batch)
        cap = 1024
        plan, _, _ = sparse.build_plan(
            jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
            jnp.arange(cap) < n, [cap, cap], 2)
        full = sparse_conv.add_tap_lists(plan.levels[0], e_cap=cap)
        counts = [(np.asarray(s) < cap).sum(1) for s in full.tap_src]
        e_small = int(max(c.max() for c in counts)) // 2
        lv = sparse_conv.add_tap_lists(plan.levels[0], e_cap=e_small)
        expect = 0
        for cls, scale in enumerate(sparse_conv.TAP_CLASS_SCALE):
            ecls = max(int(round(scale * e_small)), 8)
            expect += int(np.maximum(counts[cls] - ecls, 0).sum())
            # surviving pairs are the FIRST ecls of each tap (prefix rule)
            src = np.asarray(lv.tap_src[cls])
            for row in range(src.shape[0]):
                n = min(int(counts[cls][row]), ecls)
                np.testing.assert_array_equal(
                    src[row, :n], np.asarray(full.tap_src[cls])[row, :n])
        assert int(lv.tap_dropped) == expect > 0

    def test_subm_conv_blocked_matches_dense(self):
        rng = np.random.default_rng(21)
        batch, coords, feats, plan, r2v, feats_v = self._plan(rng)
        level = plan.levels[0]
        cap = level.cap
        w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
        dense = np.asarray(sparse_conv.subm_conv(feats_v, level, w))

        # halo covering the whole table: fixup list empty, result EXACT
        lv = sparse_conv.add_block_meta(level, halo=cap, block=64)
        assert int(lv.fix_dropped) == 0
        assert (np.asarray(lv.fix_src) == cap).all()
        blocked = np.asarray(sparse_conv.subm_conv_blocked(feats_v, lv, w))
        np.testing.assert_array_equal(blocked, dense)

        # tiny halo: real pairs spill to the fixup list; still exact values
        lv2 = sparse_conv.add_block_meta(level, halo=4, block=64)
        assert int(lv2.fix_dropped) == 0          # default cap holds them
        assert (np.asarray(lv2.fix_src) < cap).any()
        blocked2 = np.asarray(sparse_conv.subm_conv_blocked(feats_v, lv2, w))
        np.testing.assert_allclose(blocked2, dense, rtol=1e-5, atol=1e-5)

        # bf16 compute path
        dense_bf = np.asarray(sparse_conv.subm_conv(
            feats_v.astype(jnp.bfloat16), level, w, jnp.bfloat16)).astype(np.float32)
        blk_bf = np.asarray(sparse_conv.subm_conv_blocked(
            feats_v.astype(jnp.bfloat16), lv, w, jnp.bfloat16)).astype(np.float32)
        np.testing.assert_allclose(blk_bf, dense_bf, rtol=0.05, atol=0.05)

    def test_subm_conv_blocked_z_matches_dense(self):
        """Blocked z-run windows = blocked streaming + 9-column gathers; same
        single (B, 27*Cin) contraction over the same values, so bit-identical
        to the dense form when the fixup list is empty."""
        rng = np.random.default_rng(29)
        for extent, seed in ((8, 0), (32, 1)):
            batch, coords = random_voxels(rng, 700, extent=extent, batches=2)
            n = len(batch)
            cap = 1024
            feats = rng.normal(size=(n, 8)).astype(np.float32)
            plan, _, feats_v = sparse.build_plan(
                jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
                jnp.arange(cap) < n, [cap, cap], 2, jnp.array(pad(feats, cap)))
            level = plan.levels[0]
            w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
            dense = np.asarray(sparse_conv.subm_conv(feats_v, level, w))

            # halo covering the whole table: fixup empty, result EXACT
            lv = sparse_conv.add_block_meta_z(level, halo=cap, block=64)
            assert int(lv.fix_dropped) == 0
            assert (np.asarray(lv.fix_src) == cap).all()
            got = np.asarray(sparse_conv.subm_conv_blocked_z(feats_v, lv, w))
            np.testing.assert_array_equal(got, dense)

            # tiny halo: whole columns spill to the fixup list (all their
            # present taps, so more pairs than the per-tap blocked form —
            # give the list ample capacity here); exact values
            lv2 = sparse_conv.add_block_meta_z(level, halo=4, block=64,
                                               fix_cap=cap * 27)
            assert int(lv2.fix_dropped) == 0
            assert (np.asarray(lv2.fix_src) < cap).any()
            got2 = np.asarray(sparse_conv.subm_conv_blocked_z(feats_v, lv2, w))
            np.testing.assert_allclose(got2, dense, rtol=1e-5, atol=1e-5)

            # bf16 compute path
            dense_bf = np.asarray(sparse_conv.subm_conv(
                feats_v.astype(jnp.bfloat16), level, w, jnp.bfloat16)).astype(np.float32)
            z_bf = np.asarray(sparse_conv.subm_conv_blocked_z(
                feats_v.astype(jnp.bfloat16), lv, w, jnp.bfloat16)).astype(np.float32)
            np.testing.assert_allclose(z_bf, dense_bf, rtol=0.05, atol=0.05)

    def test_subm_conv_zslice_matches_dense(self):
        """z-run slice conv is BIT-identical to the dense gather form: the
        table is sorted (batch, x, y, z) with z minor, so each (dx, dy)
        column's dz-neighbors occupy consecutive rows (sparse_conv
        add_zslice_meta invariant), and the contraction is the same single
        (V, 27*Cin) GEMM over the same values."""
        rng = np.random.default_rng(23)
        # dense-ish plan (extent 8) maximizes full 3-runs; also run a sparse
        # one (extent 32) where most columns have 0-1 neighbors
        for extent, seed in ((8, 0), (32, 1)):
            batch, coords = random_voxels(rng, 700, extent=extent, batches=2)
            n = len(batch)
            cap = 1024
            feats = rng.normal(size=(n, 8)).astype(np.float32)
            plan, _, feats_v = sparse.build_plan(
                jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
                jnp.arange(cap) < n, [cap, cap], 2, jnp.array(pad(feats, cap)))
            level = plan.levels[0]
            w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
            lv = sparse_conv.add_zslice_meta(level)
            # invariant: every present tap sits within its column's 3-row window
            pos = np.asarray(lv.z_pos)
            nbr = np.asarray(level.nbr_idx).reshape(cap, 9, 3)
            assert ((pos[nbr < cap] >= 0) & (pos[nbr < cap] <= 2)).all()
            dense = np.asarray(sparse_conv.subm_conv(feats_v, level, w))
            zs = np.asarray(sparse_conv.subm_conv_zslice(feats_v, lv, w))
            np.testing.assert_array_equal(zs, dense)
            # bf16 compute path: identical contraction -> bitwise equal too
            dense_bf = np.asarray(sparse_conv.subm_conv(
                feats_v.astype(jnp.bfloat16), level, w, jnp.bfloat16))
            zs_bf = np.asarray(sparse_conv.subm_conv_zslice(
                feats_v.astype(jnp.bfloat16), lv, w, jnp.bfloat16))
            np.testing.assert_array_equal(zs_bf, dense_bf)

    def test_blocked_fixup_overflow_surfaces(self):
        rng = np.random.default_rng(22)
        # dense plan (extent 8 -> ~60% occupancy): plenty of far pairs
        batch, coords = random_voxels(rng, 1200, extent=8, batches=2)
        n = len(batch)
        cap = 1024
        plan, _, _ = sparse.build_plan(
            jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
            jnp.arange(cap) < n, [cap, cap], 2)
        level = plan.levels[0]
        # count the real out-of-window pairs with an ample fixup capacity
        full = sparse_conv.add_block_meta(level, halo=4, block=64, fix_cap=cap * 27)
        n_far = int((np.asarray(full.fix_src) < cap).sum())
        assert n_far > 8 and int(full.fix_dropped) == 0
        lv = sparse_conv.add_block_meta(level, halo=4, block=64, fix_cap=8)
        assert int(lv.fix_dropped) == n_far - 8

    def test_subm_conv_blocked_vjp_matches_autodiff(self):
        """The hand-written gather-form backward (dx = blocked conv of dout
        with flipped-transposed taps; dW = window-scan recompute) must match
        autodiff of the plain dense-tap conv — including pairs that ride the
        beyond-halo fixup list."""
        rng = np.random.default_rng(22)
        batch, coords, feats, plan, r2v, feats_v = self._plan(rng)
        level = plan.levels[0]
        w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
        dout_seed = jnp.array(rng.normal(size=(level.cap, 5)).astype(np.float32))

        def loss_ref(f, w):
            return jnp.sum(sparse_conv.subm_conv(f, level, w) * dout_seed)

        gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats_v, w)

        for halo in (level.cap, 4):  # empty fixup list / active fixup list
            lv = sparse_conv.add_block_meta(level, halo=halo, block=64)
            assert int(lv.fix_dropped) == 0

            def loss_vjp(f, w, lv=lv):
                return jnp.sum(sparse_conv.subm_conv_blocked_vjp(f, lv, w) * dout_seed)

            gx, gw = jax.grad(loss_vjp, argnums=(0, 1))(feats_v, w)
            np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                       rtol=1e-4, atol=1e-5)

    def test_conv_is_differentiable(self):
        rng = np.random.default_rng(5)
        _, _, feats, plan, _, feats_v = self._plan(rng, n=50, cap=64)
        w = jnp.array(rng.normal(size=(27, 8, 4)).astype(np.float32))

        def loss(f, w):
            return jnp.sum(sparse_conv.subm_conv(f, plan.levels[0], w) ** 2)

        g1, g2 = jax.grad(loss, argnums=(0, 1))(feats_v, w)
        assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()
        assert float(jnp.abs(g2).sum()) > 0


class TestHostPlan:
    """The C++ host plan builder must be bit-identical to the device builder
    (they are interchangeable paths of general_model.build_scene_plan)."""

    @pytest.fixture(autouse=True)
    def _need_lib(self):
        from minsu3d_tpu.csrc import native

        if not native.available():
            import subprocess, sys
            subprocess.run([sys.executable, "-m", "minsu3d_tpu.csrc.build"],
                           check=False, capture_output=True)
            native._TRIED = False
        if not native.available():
            pytest.skip("native host lib not built")

    def test_matches_device_builder(self):
        from minsu3d_tpu.csrc import native

        rng = np.random.default_rng(3)
        n_rows = 700
        coords = rng.integers(0, 30, size=(n_rows, 3)).astype(np.int32)
        batch = rng.integers(0, 2, size=(n_rows,)).astype(np.int32)
        valid = rng.random(n_rows) > 0.15
        caps = [512, 256, 128]

        plan, r2v, _ = sparse.build_plan(
            jnp.array(batch), jnp.array(coords), jnp.array(valid), caps, 3,
            jnp.array(rng.normal(size=(n_rows, 4)).astype(np.float32)))
        host = native.build_plan_host(batch, coords, valid, caps, 3)
        assert host is not None

        np.testing.assert_array_equal(np.asarray(r2v), host["plan_row2voxel"])
        for lvl in range(3):
            dev = plan.levels[lvl]
            for name, got in [
                ("khi", host[f"plan{lvl}_khi"]), ("klo", host[f"plan{lvl}_klo"]),
                ("coords", host[f"plan{lvl}_coords"]),
                ("valid", host[f"plan{lvl}_valid"]),
                ("nbr_idx", host[f"plan{lvl}_nbr"]),
            ]:
                want = np.asarray(getattr(dev, name))
                if name in ("coords",):  # device zeroes invalid coords
                    want = want * np.asarray(dev.valid)[:, None]
                    got = got * host[f"plan{lvl}_valid"][:, None]
                np.testing.assert_array_equal(got, want, err_msg=f"level {lvl} {name}")
            # batch ids only meaningful on valid rows
            np.testing.assert_array_equal(
                host[f"plan{lvl}_batch"] * host[f"plan{lvl}_valid"],
                np.asarray(dev.batch) * np.asarray(dev.valid), err_msg=f"level {lvl} batch")
            assert int(host[f"plan{lvl}_count"]) == int(dev.count)
            assert int(host[f"plan{lvl}_dropped"]) == int(dev.n_dropped)
            if lvl < 2:
                np.testing.assert_array_equal(
                    host[f"plan{lvl}_parent"], np.asarray(plan.levels[lvl].parent_idx),
                    err_msg=f"level {lvl} parent")
                np.testing.assert_array_equal(
                    host[f"plan{lvl}_kid"], np.asarray(plan.levels[lvl].child_kid),
                    err_msg=f"level {lvl} kid")

    def test_overflow_matches_device(self):
        from minsu3d_tpu.csrc import native

        rng = np.random.default_rng(4)
        batch, coords = random_voxels(rng, 400, extent=12, batches=2)
        valid = np.ones(len(batch), bool)
        caps = [64, 32]  # force drops
        plan, r2v, _ = sparse.build_plan(
            jnp.array(batch), jnp.array(coords), jnp.array(valid), caps, 2, None)
        host = native.build_plan_host(batch, coords, valid, caps, 2)
        np.testing.assert_array_equal(np.asarray(r2v), host["plan_row2voxel"])
        for lvl in range(2):
            assert int(host[f"plan{lvl}_dropped"]) == int(plan.levels[lvl].n_dropped)
            np.testing.assert_array_equal(host[f"plan{lvl}_khi"],
                                          np.asarray(plan.levels[lvl].khi))
            np.testing.assert_array_equal(host[f"plan{lvl}_nbr"],
                                          np.asarray(plan.levels[lvl].nbr_idx))

    def test_scene_plan_feature_path(self):
        """build_scene_plan with host-plan batch keys gathers the same
        representative features as the device sort pipeline."""
        from minsu3d_tpu.csrc import native
        from minsu3d_tpu.model.general_model import build_scene_plan

        rng = np.random.default_rng(5)
        n_rows = 300
        coords = rng.integers(0, 20, size=(n_rows, 3)).astype(np.int32)
        batch_ids = rng.integers(0, 2, size=(n_rows,)).astype(np.int32)
        valid = rng.random(n_rows) > 0.1
        feats = rng.normal(size=(n_rows, 5)).astype(np.float32)
        p2v = rng.integers(0, n_rows, size=(50,)).astype(np.int32)
        caps = [256, 128]

        base = {
            "voxel_batch": jnp.array(batch_ids), "voxel_coords": jnp.array(coords),
            "voxel_mask": jnp.array(valid), "voxel_feats": jnp.array(feats),
            "p2v": jnp.array(p2v),
        }
        plan_d, v2p_d, feats_d = build_scene_plan(dict(base), caps, 2)
        host = native.build_plan_host(batch_ids, coords, valid, caps, 2)
        hb = dict(base)
        hb.update({k: jnp.array(v) for k, v in host.items()})
        plan_h, v2p_h, feats_h = build_scene_plan(hb, caps, 2)
        np.testing.assert_array_equal(np.asarray(v2p_d), np.asarray(v2p_h))
        np.testing.assert_array_equal(np.asarray(feats_d), np.asarray(feats_h))
        np.testing.assert_array_equal(np.asarray(plan_d.levels[0].nbr_idx),
                                      np.asarray(plan_h.levels[0].nbr_idx))


class TestChannelMajorConv:
    """Channel-major (C, V) conv variants must match the row-major path to
    float tolerance with IDENTICAL weights (same param shapes — checkpoints
    are layout-interchangeable)."""

    def _plan(self, rng, n=200, cap=256, levels=2):
        batch, coords = random_voxels(rng, n, extent=16, batches=2)
        n = len(batch)
        feats = rng.normal(size=(n, 8)).astype(np.float32)
        caps = [cap for _ in range(levels)]
        plan, row2voxel, feats_v = sparse.build_plan(
            jnp.array(pad(batch, cap)), jnp.array(pad(coords, cap)),
            jnp.arange(cap) < n, caps, levels, jnp.array(pad(feats, cap)))
        return plan, feats_v

    def test_subm_cm_matches_row(self):
        rng = np.random.default_rng(11)
        plan, feats_v = self._plan(rng)
        w = jnp.array(rng.normal(size=(27, 8, 5)).astype(np.float32) * 0.2)
        row = np.asarray(sparse_conv.subm_conv(feats_v, plan.levels[0], w))
        cm = np.asarray(sparse_conv.subm_conv_cm(feats_v.T, plan.levels[0], w))
        np.testing.assert_allclose(cm.T, row, rtol=1e-5, atol=1e-5)

    def test_down_up_cm_match_row(self):
        rng = np.random.default_rng(12)
        plan, feats_v = self._plan(rng)
        child, parent = plan.levels[0], plan.levels[1]
        wd = jnp.array(rng.normal(size=(8, 8, 6)).astype(np.float32) * 0.2)
        row = np.asarray(sparse_conv.down_conv(feats_v, child, parent.cap, wd))
        cm = np.asarray(sparse_conv.down_conv_cm(feats_v.T, child, parent.cap, wd))
        np.testing.assert_allclose(cm.T, row, rtol=1e-5, atol=1e-5)

        pf = jnp.array(rng.normal(size=(parent.cap, 6)).astype(np.float32))
        wu = jnp.array(rng.normal(size=(8, 6, 8)).astype(np.float32) * 0.2)
        row = np.asarray(sparse_conv.up_conv(pf, child, wu))
        cm = np.asarray(sparse_conv.up_conv_cm(pf.T, child, wu))
        np.testing.assert_allclose(cm.T, row, rtol=1e-5, atol=1e-5)


def test_backbone_channel_major_matches_row_major():
    """Full Backbone forward: cm=True must reproduce cm=False outputs with the
    same params (f32; train and eval modes)."""
    import jax
    from helpers import tiny_cfg, make_batch
    from minsu3d_tpu.model import general_model as gm
    from minsu3d_tpu.model.module import Backbone

    cfg = tiny_cfg()
    batch, arrays, items = make_batch(cfg, "val", 1, seed=3)
    n_levels = len(cfg.model.network.blocks)
    caps = gm.backbone_caps(cfg, "val")
    plan, v2p, vfeats = gm.build_scene_plan(arrays, caps[:n_levels], n_levels)

    kw = dict(input_channel=6, output_channel=cfg.model.network.m,
              block_channels=tuple(cfg.model.network.blocks),
              block_reps=cfg.model.network.block_reps, sem_classes=20)
    row_net = Backbone(**kw, cm=False)
    cm_net = Backbone(**kw, cm=True)
    variables = row_net.init(jax.random.PRNGKey(0), vfeats, plan, v2p,
                             arrays["point_mask"], False)
    out_row = row_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"], False)
    out_cm = cm_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"], False)
    for k in out_row:
        np.testing.assert_allclose(np.asarray(out_cm[k]), np.asarray(out_row[k]),
                                   rtol=2e-4, atol=2e-4)

    # train mode: batch_stats updates must match too
    out_row, mrow = row_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"],
                                  True, mutable=["batch_stats"])
    out_cm, mcm = cm_net.apply(variables, vfeats, plan, v2p, arrays["point_mask"],
                               True, mutable=["batch_stats"])
    for k in out_row:
        np.testing.assert_allclose(np.asarray(out_cm[k]), np.asarray(out_row[k]),
                                   rtol=2e-4, atol=2e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(mrow["batch_stats"])
    flat_c = dict(jax.tree_util.tree_leaves_with_path(mcm["batch_stats"]))
    for path, leaf in flat_r:
        np.testing.assert_allclose(np.asarray(flat_c[path]), np.asarray(leaf),
                                   rtol=2e-4, atol=2e-4)


def test_backbone_tap_compact_matches_dense():
    """Full Backbone forward on a plan carrying compact tap lists must
    reproduce the dense-plan outputs with the same params (f32)."""
    import jax
    from helpers import tiny_cfg, make_batch
    from minsu3d_tpu.model import general_model as gm
    from minsu3d_tpu.model.module import Backbone

    cfg = tiny_cfg()
    batch, arrays, items = make_batch(cfg, "val", 1, seed=3)
    n_levels = len(cfg.model.network.blocks)
    caps = gm.backbone_caps(cfg, "val")
    plan, v2p, vfeats = gm.build_scene_plan(arrays, caps[:n_levels], n_levels)
    plan_tap, _, _ = gm.build_scene_plan(arrays, caps[:n_levels], n_levels,
                                         tap_fracs=(1.0,) * n_levels)
    assert int(gm.plan_tap_dropped(plan_tap)) == 0  # full-cap lists drop nothing

    net = Backbone(input_channel=6, output_channel=cfg.model.network.m,
                   block_channels=tuple(cfg.model.network.blocks),
                   block_reps=cfg.model.network.block_reps, sem_classes=20)
    variables = net.init(jax.random.PRNGKey(0), vfeats, plan, v2p,
                         arrays["point_mask"], False)
    out_dense = net.apply(variables, vfeats, plan, v2p, arrays["point_mask"], False)
    out_tap = net.apply(variables, vfeats, plan_tap, v2p, arrays["point_mask"], False)
    for k in out_dense:
        np.testing.assert_allclose(np.asarray(out_tap[k]), np.asarray(out_dense[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_backbone_blocked_matches_dense():
    """Full Backbone forward on a plan carrying blocked-window kernel maps
    (plain 27-row and blocked z-run variants) must reproduce the dense-plan
    outputs bit-for-bit when the halos cover every pair (and the fixup path
    keeps it exact regardless)."""
    import jax
    from helpers import tiny_cfg, make_batch
    from minsu3d_tpu.model import general_model as gm
    from minsu3d_tpu.model.module import Backbone

    cfg = tiny_cfg()
    batch, arrays, items = make_batch(cfg, "val", 1, seed=3)
    n_levels = len(cfg.model.network.blocks)
    caps = gm.backbone_caps(cfg, "val")
    plan, v2p, vfeats = gm.build_scene_plan(arrays, caps[:n_levels], n_levels)
    plan_blk, _, _ = gm.build_scene_plan(arrays, caps[:n_levels], n_levels,
                                         blocked=(64,) * n_levels)
    plan_bz, _, _ = gm.build_scene_plan(arrays, caps[:n_levels], n_levels,
                                        blocked=(64,) * n_levels, zslice=True)
    assert any(lv.blk_li is not None for lv in plan_blk.levels)
    assert any(lv.blk_zb is not None for lv in plan_bz.levels)
    assert int(gm.plan_tap_dropped(plan_blk)) == 0

    net = Backbone(input_channel=6, output_channel=cfg.model.network.m,
                   block_channels=tuple(cfg.model.network.blocks),
                   block_reps=cfg.model.network.block_reps, sem_classes=20)
    variables = net.init(jax.random.PRNGKey(0), vfeats, plan, v2p,
                         arrays["point_mask"], False)
    out_dense = net.apply(variables, vfeats, plan, v2p, arrays["point_mask"], False)
    out_blk = net.apply(variables, vfeats, plan_blk, v2p, arrays["point_mask"], False)
    out_bz = net.apply(variables, vfeats, plan_bz, v2p, arrays["point_mask"], False)
    for k in out_dense:
        np.testing.assert_allclose(np.asarray(out_blk[k]), np.asarray(out_dense[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
        np.testing.assert_allclose(np.asarray(out_bz[k]), np.asarray(out_dense[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=f"bz:{k}")
