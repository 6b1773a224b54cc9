"""Host data pipeline tests: transforms, voxelization, dataset, collate."""

import numpy as np
import pytest

from helpers import tiny_cfg, tiny_scenes, make_batch
from minsu3d_tpu.data import transform
from minsu3d_tpu.data.batching import collate, shard_caps
from minsu3d_tpu.data.dataset import GeneralDataset
from minsu3d_tpu.data.voxelize import sparse_quantize


class TestTransforms:
    def test_rot_flip_orthogonal(self):
        rng = np.random.default_rng(0)
        m = transform.rotz_mat(1.2)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        f = transform.flip_mat(rng, 0)
        assert abs(abs(f[0, 0]) - 1) < 1e-12

    def test_elastic_displacement_bounded(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 100, (5000, 3)).astype(np.float32)
        y = transform.elastic(x, 6, 40 / 50, rng)
        assert y.shape == x.shape
        # triple box blur bounds noise well below N(0,1) scale * mag
        assert np.abs(y - x).max() < 3.0

    def test_crop_limits_points(self):
        rng = np.random.default_rng(1)
        pc = rng.uniform(0, 200, (5000, 3))
        out, valid = transform.crop(pc, 1000, 512, rng)
        assert valid.sum() <= 1000 or valid.sum() == 5000


class TestVoxelize:
    def test_invariants(self):
        rng = np.random.default_rng(0)
        coords = rng.uniform(-3, 3, (20000, 3)).astype(np.float32)
        feats = rng.normal(size=(20000, 5)).astype(np.float32)
        vc, vf, p2v = sparse_quantize(coords, feats, 0.05)
        grid = np.floor(coords / 0.05).astype(np.int64)
        np.testing.assert_array_equal(vc[p2v], grid)          # every point in its voxel
        assert len(np.unique(p2v)) == len(vc)                 # no empty voxels
        # representative features come from a member point
        key = {tuple(c): i for i, c in enumerate(vc)}
        for j in rng.integers(0, len(vc), 50):
            members = np.flatnonzero(p2v == j)
            assert any(np.allclose(vf[j], feats[m]) for m in members)


class TestDatasetCollate:
    def test_getitem_schema(self):
        cfg = tiny_cfg()
        ds = GeneralDataset(cfg, "val", scenes=tiny_scenes(1))
        item = ds[0]
        n = item["point_xyz"].shape[0]
        assert item["sem_labels"].shape == (n,)
        assert item["instance_ids"].shape == (n,)
        assert item["p2v"].shape == (n,)
        assert item["voxel_coords"].min() >= 0
        assert item["instance_num_point"].sum() == (item["instance_ids"] >= 0).sum()
        # centers: points of an instance share its mean
        ids = item["instance_ids"]
        for k in np.unique(ids[ids >= 0])[:3]:
            m = ids == k
            np.testing.assert_allclose(
                item["instance_center_xyz"][m][0], item["point_xyz"][m].mean(0), atol=1e-4)

    def test_collate_rebasing(self):
        cfg = tiny_cfg()
        ds = GeneralDataset(cfg, "val", scenes=tiny_scenes(2))
        items = [ds[0], ds[1]]
        batch = collate(items, shard_caps(cfg, "val"))
        n0 = items[0]["point_xyz"].shape[0]
        i0 = int(items[0]["num_instance"])
        # scene-1 instance ids shifted by scene-0 instance count
        ids1 = batch["instance_ids"][n0 : n0 + items[1]["point_xyz"].shape[0]]
        valid1 = ids1 >= 0
        assert ids1[valid1].min() >= i0
        # voxel maps offset by scene-0 voxel count
        v0 = items[0]["voxel_coords"].shape[0]
        p2v1 = batch["p2v"][n0 : n0 + items[1]["point_xyz"].shape[0]]
        assert p2v1.min() >= v0
        assert batch["point_mask"].sum() == n0 + items[1]["point_xyz"].shape[0]

    def test_collate_overflow_raises(self):
        cfg = tiny_cfg()
        ds = GeneralDataset(cfg, "val", scenes=tiny_scenes(1))
        caps = dict(shard_caps(cfg, "val"))
        caps["points"] = 10
        with pytest.raises(ValueError):
            collate([ds[0]], caps)

    def test_train_mode_augments_and_crops(self):
        cfg = tiny_cfg()
        cfg.data["max_num_point"] = 4000
        ds = GeneralDataset(cfg, "train", scenes=tiny_scenes(1))
        item = ds[0]
        assert item["point_xyz"].shape[0] <= 4000


class TestWorkerPool:
    def test_pool_iter_order_and_errors(self):
        from minsu3d_tpu.data.datamodule import _pool_iter

        out = list(_pool_iter(lambda i: i * i, 20, workers=4, depth=2))
        assert out == [i * i for i in range(20)]

        def boom(i):
            if i == 5:
                raise ValueError("worker failed")
            return i

        with pytest.raises(ValueError, match="worker failed"):
            list(_pool_iter(boom, 10, workers=3, depth=2))

    def test_eval_batches_honor_num_workers(self):
        """data.num_workers > 1 must keep scene order (reference DataLoader
        num_workers semantics, data_module.py:26)."""
        from minsu3d_tpu.data.datamodule import DataModule

        cfg = tiny_cfg()
        cfg.data.num_workers = 4
        dm = DataModule(cfg, scenes={"val": tiny_scenes(6)})
        ds = dm.setup("val")
        expect = [ds[i]["scan_id"] for i in range(len(ds))]
        ids = [scan_id for scan_id, _, _ in dm.eval_batches("val")]
        assert ids == expect
