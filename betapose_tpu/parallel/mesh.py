"""Device mesh + sharding helpers.

The framework's parallelism story (SURVEY.md 2.9): data parallelism over a
1-D or 2-D `jax.sharding.Mesh` with XLA-compiled collectives over ICI —
replacing the reference's host-staged multi-GPU weight averaging
(`network_kernels.cu:232-345`) and `nn.DataParallel`.  Parameters are
replicated; batches are sharded on the 'data' axis; gradient all-reduce is
inserted by XLA from the sharding annotations (no hand-written comm).
An optional 'model' axis is provided for weight sharding of the widest
conv layers (off by default — these models fit comfortably per-chip).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              spatial_parallel: int = 1, devices=None) -> Mesh:
    """Mesh over the first n devices: ('data',) by default, plus a 'model'
    axis (tensor parallelism) when model_parallel > 1 and/or a 'space' axis
    (spatial partitioning of the image H dimension — the CP analog for
    conv workloads, SURVEY.md section 5.7) when spatial_parallel > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    inner = model_parallel * spatial_parallel
    assert n % inner == 0, (n, model_parallel, spatial_parallel)
    axes = [("data", n // inner)]
    if spatial_parallel > 1:
        axes.append(("space", spatial_parallel))
    if model_parallel > 1:
        axes.append(("model", model_parallel))
    arr = np.array(devices).reshape([s for _, s in axes])
    return Mesh(arr, tuple(name for name, _ in axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with the leading axis sharded on
    'data'."""
    s = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def frame_sharded(mesh: Mesh) -> NamedSharding:
    """Sharding for image batches [B, H, W, C]: batch on 'data', and image
    ROWS on 'space' when the mesh carries a spatial axis.  Under a spatial
    axis XLA/GSPMD partitions every conv spatially and inserts the halo
    exchanges itself — the latency-scaling path for small batches, where
    data parallelism has nothing left to split."""
    if "space" in mesh.shape:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def shard_frames(mesh: Mesh, frames):
    return jax.device_put(frames, frame_sharded(mesh))


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_params_tp(mesh: Mesh, tree, axis_name: str = "model"):
    """Tensor-parallel weight sharding over the mesh's model axis.

    Channel-wise (Megatron-style for convs): the output-channel axis — last
    axis of HWIO conv kernels, [in, out] dense kernels, and the per-channel
    BN/bias vectors — is sharded across `axis_name` whenever its size
    divides the axis; anything indivisible stays replicated.  Activations
    inherit a channel sharding through GSPMD propagation and XLA inserts
    the all-gathers/reduce-scatters where consecutive layers disagree —
    the TPU-native counterpart of splitting a layer's filters across GPUs.

    Correctness does not depend on which leaves shard (GSPMD keeps the
    math identical); this choice keeps the widest conv stacks' weights and
    activations distributed, which is what TP exists to buy (HBM headroom
    per chip for scaled-up variants).
    """
    size = mesh.shape[axis_name]

    def put(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[-1] >= size and shape[-1] % size == 0:
            spec = P(*([None] * (len(shape) - 1) + [axis_name]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)
