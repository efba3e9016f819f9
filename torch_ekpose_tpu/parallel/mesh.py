"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference train.py:106) with implicit scatter/gather. The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over the ``data`` axis: batches
are sharded across devices, parameters are replicated, and XLA inserts the
gradient all-reduce (psum over ICI) during ``jax.jit`` partitioning — no
explicit collective code is needed at this scale.

Multi-host (e.g. a v5e pod slice spanning hosts, gradients riding
ICI/DCN) uses the same mesh over the GLOBAL device set:
:func:`init_distributed` brings up jax's coordination service, after
which ``jax.devices()`` spans every process and the same pjit program
runs SPMD across hosts. ``shard_batch`` assembles global arrays from
each process's local shard of the batch.

The mesh axis layout is kept in one place so a future 2-D (data x model)
layout only changes this module.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed", "make_mesh", "data_sharding", "replicated",
    "field_sharding", "place_replicated", "place_tree", "shard_batch",
    "zero1_sharding_tree", "infer_compute_dtype",
]

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def infer_compute_dtype(params):
    """Activation dtype to feed a model given its parameter tree.

    Quantized trees mix int8 ``kernel_q`` leaves with f32 scale/bias
    leaves — their activations run bfloat16 (models/quant.py). Probe ALL
    leaves: the first leaf is whatever sorts alphabetically (a float
    bias for these models), which once made an int8 check dead code.
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(params)
    if any(leaf.dtype == jnp.int8 for leaf in leaves):
        return jnp.bfloat16
    return next(
        leaf.dtype for leaf in leaves
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """Join a multi-host run (call before any other jax use; the
    reference has no multi-host story at all). After this,
    ``jax.devices()`` is the GLOBAL device set and ``make_mesh()``
    spans it.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_mesh(num_devices: int = 0, devices=None, spatial: int = 1) -> Mesh:
    """Device mesh. ``num_devices=0`` uses all (global, when distributed)
    devices.

    ``spatial=1`` (default): the 1-D data-parallel mesh.
    ``spatial=k>1``: a 2-D ``(data, spatial)`` mesh for spatially-sharded
    training — the batch axis splits over ``data`` and the image HEIGHT
    over ``spatial`` (GSPMD partitions every conv spatially and inserts
    the halo exchanges; see :func:`field_sharding`). Devices fill the
    spatial axis first so each sp group sits on adjacent (ICI-near)
    chips, where the per-conv halo rows travel.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    if spatial > 1:
        n = len(devices)
        if n % spatial:
            raise ValueError(
                f"spatial={spatial} does not divide the {n}-device mesh"
            )
        grid = np.asarray(devices).reshape(n // spatial, spatial)
        return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC field sharding: batch over ``data``, height over ``spatial``.

    On a 1-D mesh this degenerates to :func:`data_sharding` so callers
    can pass it unconditionally.
    """
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return data_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_replicated(mesh: Mesh, tree):
    """Replicate a pytree of host arrays onto every device of the mesh.

    Single-process: one device_put. Multi-process: every process holds an
    identical host copy (e.g. a seeded init or a restored checkpoint) and
    the global array is assembled from per-device copies — device_put
    cannot place onto non-addressable devices.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        local = mesh.local_devices

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_single_device_arrays(
                x.shape, sharding, [jax.device_put(x, d) for d in local]
            )

        return jax.tree.map(put, tree)
    return jax.device_put(tree, sharding)


def zero1_sharding_tree(mesh: Mesh, tree):
    """ZeRO-1 shardings for an optimizer-state pytree.

    Adam's moments mirror the parameter tree — for VGG19 that is 2 x
    ~200M float32, 1.6 GB of HBM that plain data parallelism replicates
    onto every chip. Sharding each moment leaf across the ``data`` axis
    turns the optimizer update into the classic ZeRO-1 schedule —
    GSPMD lowers it to reduce-scatter(grads) + sharded Adam +
    all-gather(updates), the same wire bytes as the all-reduce it
    replaces — and cuts optimizer HBM by the mesh size. (The reference
    has no equivalent; ``nn.DataParallel`` keeps one full optimizer on
    the root GPU.)

    Each array leaf is sharded on its largest dimension that divides
    evenly by the mesh size; leaves with no such dimension (step
    counters, hyperparams, tiny biases) replicate — for conv nets
    those are a rounding error next to the kernels.
    """
    n = mesh.size
    # on a 2-D (data, spatial) mesh the moments shard over BOTH axes —
    # ZeRO-1 is a memory layout, any flattening of the device set works
    axes = (
        mesh.axis_names[0] if len(mesh.axis_names) == 1
        else tuple(mesh.axis_names)
    )

    def leaf(x):
        shape = getattr(x, "shape", ())
        best = None
        for i, d in enumerate(shape):
            if d % n == 0 and d > 0 and (best is None or d > shape[best]):
                best = i
        if best is None:
            return replicated(mesh)
        spec = [None] * len(shape)
        spec[best] = axes
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, tree)


def place_tree(mesh: Mesh, tree, shardings):
    """Place a pytree of host arrays with per-leaf shardings.

    Generalizes :func:`place_replicated` to mixed sharding trees (e.g.
    replicated params + ZeRO-1-sharded optimizer state). Multi-process:
    every process holds an identical full host copy (a seeded init or a
    restored checkpoint) and each leaf is assembled from the locally
    addressable shards via ``make_array_from_callback``.
    """
    if jax.process_count() > 1:

        def put(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, s, lambda idx: x[idx]
            )

        return jax.tree.map(put, tree, shardings)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


def shard_batch(mesh: Mesh, batch, specs=None):
    """Place a pytree of host arrays with the batch axis sharded.

    Single-process: one device_put. Multi-process: each process passes
    its LOCAL slice of the batch (its loader's shard) and the result is
    the global array — batch axis globally sharded, addressable shards
    fed from local data.

    ``specs``: optional per-element ``PartitionSpec`` tuple matching a
    tuple batch (spatial training shards NHWC fields over
    ``(data, spatial)`` while keypoint tensors stay batch-sharded);
    ``None`` keeps the uniform leading-axis data sharding.
    """
    if specs is None:
        shardings = jax.tree.map(lambda _: data_sharding(mesh), batch)
    else:
        shardings = tuple(NamedSharding(mesh, s) for s in specs)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            batch, shardings,
        )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), batch, shardings
    )
