"""Model registry — name-string resolution like the reference's
``getattr(minsu3d.model, cfg.model.network.module)`` (train.py:38)."""

from __future__ import annotations

from typing import Callable, NamedTuple


class ModelBundle(NamedTuple):
    make_net: Callable        # (cfg, split) -> flax module
    losses: Callable          # (cfg, caps, batch, out, with_heads, **flags) -> dict
    pred_instances: Callable  # (cfg, scan_id, xyz, out_np, n_ignored) -> list[dict]
    forward_flags: Callable   # (cfg, epoch, train) -> static kwargs for __call__
    loss_flags: Callable      # (cfg, epoch) -> static kwargs for losses


def _bundle(m) -> ModelBundle:
    return ModelBundle(m.make_net, m.losses, m.pred_instances, m.forward_flags, m.loss_flags)


def _pointgroup() -> ModelBundle:
    from minsu3d_tpu.model import pointgroup as m

    return _bundle(m)


def _hais() -> ModelBundle:
    from minsu3d_tpu.model import hais as m

    return _bundle(m)


def _softgroup() -> ModelBundle:
    from minsu3d_tpu.model import softgroup as m

    return _bundle(m)


MODELS = {"PointGroup": _pointgroup, "HAIS": _hais, "SoftGroup": _softgroup}


def get_model(name: str) -> ModelBundle:
    if name not in MODELS:
        raise KeyError(f"Unknown model '{name}' (have {sorted(MODELS)})")
    return MODELS[name]()
