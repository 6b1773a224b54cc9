"""Config loader tests: Hydra-compatible composition, interpolation, overrides."""

import pytest

from minsu3d_tpu.config import load_config


def test_defaults_compose():
    cfg = load_config([])
    assert cfg.data.voxel_size == 0.02
    assert cfg.model.trainer.max_epochs == 496
    assert cfg.global_train_seed == 123


def test_group_selection_and_inheritance():
    cfg = load_config(["model=hais", "data=scannetv2"])
    assert cfg.model.network.module == "HAIS"
    assert cfg.model.network.m == 32
    assert cfg.model.trainer.max_epochs == 512          # hais override
    assert cfg.model.inference.split == "val"           # inherited from base
    assert cfg.data.classes == 20
    assert cfg.data.ignore_classes == [1, 2]


def test_interpolation():
    cfg = load_config(["model=pointgroup", "data=scannetv2", "experiment_name=exp9"])
    assert cfg.exp_output_root_path.endswith("output/ScanNetv2/PointGroup/exp9")
    assert cfg.data.metadata.train_list.endswith("metadata/scannetv2_train.txt")
    # referenced-through interpolation keeps types
    assert cfg.model.checkpoint.every_n_epochs == cfg.model.trainer.check_val_every_n_epoch


def test_dotted_overrides_types():
    cfg = load_config(["model=pointgroup", "model.trainer.max_epochs=7",
                       "model.optimizer.lr=0.5", "data.caps.points=123",
                       "model.network.blocks=[1,2]", "model.network.use_color=False"])
    assert cfg.model.trainer.max_epochs == 7
    assert cfg.model.optimizer.lr == 0.5
    assert cfg.data.caps.points == 123
    assert cfg.model.network.blocks == [1, 2]
    assert cfg.model.network.use_color is False


def test_unknown_group_raises():
    with pytest.raises(FileNotFoundError):
        load_config(["model=doesnotexist"])


def test_bad_override_raises():
    with pytest.raises(ValueError):
        load_config(["noequalsign"])
