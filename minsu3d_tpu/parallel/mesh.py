"""Device mesh + data-parallel step construction.

The reference's only parallelism is Lightning DDP over NCCL (SURVEY.md §2.4);
here it is a 1-D ``data`` mesh with ``shard_map``: each device runs the
single-shard model on its own scene group, gradients and batch-norm batch
statistics are ``pmean``-ed over ICI, parameters stay replicated. Scales to
multi-host by the same mesh spanning processes (jax.distributed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: int | str = "auto") -> Mesh:
    devs = jax.devices()
    if devices != "auto":
        devs = devs[: int(devices)]
    return Mesh(devs, ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def warmup_collectives(mesh: Mesh) -> None:
    """Run one tiny psum over the full mesh right after startup.

    The cross-process collective context (Gloo on CPU, ICI elsewhere) is
    created lazily at first use with a ~30 s rendezvous timeout; the first
    REAL collective sits behind each process's independent XLA compile of the
    train step, whose skew can exceed that timeout. Creating the context here
    — when all processes are within seconds of each other — lets later
    collectives reuse it and tolerate arbitrary compile skew (verified: a
    warmed 2-process CPU clique survives 60 s of skew)."""
    import numpy as np

    n_local = len([d for d in mesh.devices.reshape(-1)
                   if d.process_index == jax.process_index()])
    local = np.ones((n_local, 8), np.float32)
    arr = jax.make_array_from_process_local_data(data_sharded(mesh), local)
    f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(jnp.sum(x), "data"),
                              mesh=mesh, in_specs=P("data"), out_specs=P(),
                              check_vma=False))
    jax.block_until_ready(f(arr))


def make_train_step(mesh: Mesh, apply_fn, loss_fn, tx):
    """Build the jitted data-parallel train step.

    ``apply_fn(params, batch_stats, batch, rng) -> (out, new_batch_stats)``
    runs the single-shard model; ``loss_fn(out, batch) -> dict`` of scalar
    losses. The step returns (params, batch_stats, opt_state, metrics, diag)
    with grads/metrics/batch-stats pmean-ed over the data axis; ``diag``
    (capacity-overflow counters from ``out["diag"]``) is psum-ed — a drop on
    any shard must be visible.
    """

    def shard_step(params, batch_stats, opt_state, batch, rng):
        # batch leaves carry a leading shard axis of size 1 inside shard_map
        batch = jax.tree.map(lambda x: jnp.squeeze(x, 0), batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def compute(p):
            out, new_bs = apply_fn(p, batch_stats, batch, rng)
            losses = loss_fn(out, batch)
            total = sum(losses.values())
            return total, (losses, new_bs, out.get("diag", {}))

        (total, (losses, new_bs, diag)), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        grads = jax.lax.pmean(grads, "data")
        new_bs = jax.lax.pmean(new_bs, "data")
        losses = jax.lax.pmean({**losses, "total_loss": total}, "data")
        diag = jax.lax.psum(diag, "data")
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda a, b: a + b, params, updates)
        return new_params, new_bs, new_opt, losses, diag

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1, 2))
