"""Device mesh + sharding builders for multi-chip serving and training.

The reference has no multi-device story at all (single pinned GPU,
`docker-compose.yml:12-16`, uvicorn workers=1, serial batch-1 gRPC —
SURVEY §2.3); its only concurrency is Triton-internal. The TPU-native
scaling model is SPMD over a `jax.sharding.Mesh`:

  * `data` axis — batch-sharded replication of the fused serving pipeline
    (the dominant axis for CNN inference: per-image work is independent,
    so throughput scales linearly over ICI with zero cross-chip traffic).
  * `model` axis — tensor parallelism over conv output channels for the
    large HRNet/BiFPN layers; XLA inserts the all-gathers/reduce-scatters
    on ICI from the sharding annotations alone.

All functions are platform-agnostic: real chips under axon, or the
virtual CPU mesh in CI (`xla_force_host_platform_device_count`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by model_parallel="
            f"{model_parallel}"
        )
    dp = n_devices // model_parallel
    mesh_devices = mesh_utils.create_device_mesh(
        (dp, model_parallel), devices=devices
    )
    return Mesh(mesh_devices, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(path: str, leaf: Any, model_size: int, min_dim: int) -> P:
    """Tensor-parallel rule: shard the output-channel (last) dim of large
    parameters over 'model'; replicate everything else.

    Covers flax conv kernels (HWIO, last dim = out channels) and their
    BN/bias vectors so layer-local layouts stay aligned (no resharding
    between a conv and its BN).
    """
    shape = getattr(leaf, "shape", ())
    if (
        model_size > 1
        and len(shape) >= 1
        and shape[-1] >= min_dim
        and shape[-1] % model_size == 0
    ):
        return P(*([None] * (len(shape) - 1)), "model")
    return P()


def param_shardings(
    tree: Any, mesh: Mesh, min_dim: int = 64
) -> Any:
    """NamedShardings for a variables/optimizer pytree under the TP rule."""
    model_size = mesh.shape["model"]

    def to_sharding(path, leaf):
        return NamedSharding(
            mesh, _leaf_spec(jax.tree_util.keystr(path), leaf, model_size,
                             min_dim)
        )

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def shard_tree(tree: Any, shardings: Any) -> Any:
    """device_put a pytree according to its shardings tree."""
    return jax.tree.map(jax.device_put, tree, shardings)
