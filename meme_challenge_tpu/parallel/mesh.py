"""Device-mesh setup and sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel`` plus
NCCL for the detector (SURVEY.md §2.3). The TPU-native parallel layer is
richer and expressed *entirely* through ``jax.sharding`` — XLA inserts all
collectives over ICI/DCN; there is no hand-written communication:

- **fold**: the repo's real scale axis — 15 crossval folds are independent
  training problems sharded across the mesh (fold_parallel.py);
- **data**: batch-dimension data parallelism within a fold (psum gradients);
- **model**: tensor parallelism for the encoder's hidden/intermediate
  projections — unnecessary for 110M/340M params but exposed as first-class
  sharding rules (SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host initialization (replaces the reference's NCCL
    ``detectron2.engine.launch`` path, SURVEY.md §5): after this,
    ``jax.devices()`` is global and meshes span hosts — ICI within a slice,
    DCN across slices, all through sharding specs."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(shape: Sequence[int] = (),
              axes: Sequence[str] = ("fold", "data"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over the available devices.

    Empty shape → all devices on the first axis. On multi-host, call
    ``jax.distributed.initialize()`` first; devices here are global.
    """
    if devices is None:
        devices = jax.devices()
    if not shape:
        shape = (len(devices),)
        axes = axes[:1]
    assert int(np.prod(shape)) == len(devices), (
        f"mesh shape {shape} != device count {len(devices)}")
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    return Mesh(dev_array, tuple(axes[:len(shape)]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    if axis not in mesh.axis_names:
        return replicated(mesh)
    return NamedSharding(mesh, P(axis))


def encoder_tp_spec(name: str, model_axis: str = "model") -> P:
    """Tensor-parallel PartitionSpec for a stacked-encoder parameter.

    Megatron-style column/row split expressed as sharding rules; XLA/GSPMD
    derives the all-reduces. Stacked layout is ``[L, ...]`` (layer axis never
    sharded).

    - QKV / FFN-in kernels ``[L, H, out]``: split the *output* dim (column).
      The QKV kernel is stored pre-concatenated ``[L, H, 3H]`` ([q|k|v]);
      GSPMD keeps the post-matmul ``split`` correct under any shard count
      (it reshards when a cut point lands mid-shard, e.g. model=2).
    - attn-out / FFN-out kernels ``[L, in, H]``: split the *input* dim (row).
    - biases of column-split kernels: split; row-split biases + LN params:
      replicated.
    """
    col_kernels = {"qkv_kernel", "ffn_in_kernel"}
    row_kernels = {"attn_out_kernel", "ffn_out_kernel"}
    col_biases = {"qkv_bias", "ffn_in_bias"}
    if name in col_kernels:
        return P(None, None, model_axis)
    if name in row_kernels:
        return P(None, model_axis, None)
    if name in col_biases:
        return P(None, model_axis)
    return P()


def uniter_param_specs(params: dict, model_axis: str = "model",
                       fold_axis: Optional[str] = None) -> dict:
    """PartitionSpec tree for a UNITER(-family) param pytree.

    ``fold_axis`` prepends a sharded leading fold dimension (stacked
    fold-parallel params).
    """
    def spec_for(path, leaf) -> P:
        names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        leaf_name = names[-1]
        if "encoder" in names:
            spec = encoder_tp_spec(leaf_name, model_axis)
        elif leaf_name == "word_embeddings":
            spec = P(model_axis, None)   # vocab-sharded embedding table
        elif leaf_name in ("img_linear_kernel",):
            spec = P(None, model_axis)
        else:
            spec = P()
        if fold_axis is not None:
            spec = P(fold_axis, *spec)
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def filter_divisible_specs(mesh: Mesh, params: dict, specs: dict) -> dict:
    """Drop sharding on any dim the mesh axis doesn't divide evenly.

    Keeps TP specs usable for arbitrary model sizes (e.g. a vocab that the
    ``model`` axis doesn't divide) — those leaves fall back to replication
    on that axis instead of erroring in ``device_put``.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def fix(leaf, spec: P) -> P:
        parts = list(spec)
        for d, axis in enumerate(parts):
            if axis is None:
                continue
            names = axis if isinstance(axis, tuple) else (axis,)
            total = int(np.prod([sizes[n] for n in names]))
            if d >= leaf.ndim or leaf.shape[d] % total != 0:
                parts[d] = None
        return P(*parts)

    # params is the primary tree (array leaves); each spec rides along as a
    # matching subtree (P is a tuple, i.e. itself a pytree)
    return jax.tree.map(fix, params, specs)


def apply_shardings(mesh: Mesh, params: dict, specs: dict) -> dict:
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)
