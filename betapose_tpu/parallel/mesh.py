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
              devices=None) -> Mesh:
    """1-D ('data',) or 2-D ('data','model') mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel > 1:
        assert n % model_parallel == 0
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.array(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with the leading axis sharded on
    'data'."""
    s = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


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
