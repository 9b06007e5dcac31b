"""Tensor-parallel sharding of the SDXL generator over the ``mp`` mesh axis.

The reference runs SDXL on one GPU; on TPU the 2.9B-param UNet can instead be
sharded across chips: every conv/dense kernel splits its output-feature axis
over ``mp`` (Megatron-style column parallelism), activations stay batch-
sharded over ``dp``, and GSPMD inserts the ICI collectives where layers
consume features produced on other chips. This is the "shard SDXL over the
mesh" option SURVEY.md §2.2 calls out; with IP-Adapter conditioning the hot
cross-attention K/V projections split the same way.

The rules are shape-driven (shard the last axis when divisible by the mp
size, else replicate), so they apply to any config — tiny test UNets and the
real checkpoint alike.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_sharding_rules(mesh: Mesh, params, *, axis: str = "mp"):
    """Pytree of NamedShardings: kernels shard their output-feature (last)
    axis over ``axis`` when divisible; everything else replicates."""
    size = mesh.shape[axis]

    def rule(path, leaf):
        name = path[-1].key if path else ""
        if (
            name == "kernel"
            and leaf.ndim >= 2
            and leaf.shape[-1] % size == 0
            and leaf.shape[-1] >= size
        ):
            spec = (None,) * (leaf.ndim - 1) + (axis,)
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params, *, axis: str = "mp"):
    """Place a generator/UNet param tree onto the mesh, tensor-parallel."""
    shardings = param_sharding_rules(mesh, params, axis=axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def sharded_unet_apply(unet, mesh: Mesh, *, data_axis: str = "dp"):
    """jitted UNet forward with batch-sharded activations and tp params."""
    batch_sharding = NamedSharding(mesh, P(data_axis))

    @jax.jit
    def forward(params, latents, t, ctx, image_embeds):
        latents = jax.lax.with_sharding_constraint(latents, batch_sharding)
        return unet.apply(
            {"params": params}, latents, t, ctx, None, None, image_embeds
        )

    return forward
