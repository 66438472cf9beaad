"""Device mesh + sharding helpers — the TPU-native distributed runtime.

The reference's entire distributed layer is single-node multi-process data
parallelism: mp.spawn + DDP over NCCL with implicit grad all-reduce
(train_vqa.py:541-551, :236; SURVEY.md §2.5). On TPU none of that plumbing
exists as user code: we lay out a `jax.sharding.Mesh`, place the batch with
a `("data",)` PartitionSpec, keep params replicated (or model-sharded), and
jit the train step — XLA SPMD inserts all ICI collectives (the DDP
all-reduce becomes a gradient psum fused into the backward pass).

Gradient-scale parity with DDP: the reference's per-rank loss is a *sum*
over the rank's batch and DDP *averages* grads over ranks, so the effective
gradient is sum-over-64-examples regardless of world size (per-rank batch is
always BATCH_SIZE). Our global batch is BATCH_SIZE * n_devices with grads
divided by n_devices — identical dynamics at any device count.

Multi-host: call `jax.distributed.initialize()` before `get_mesh()`; the
mesh then spans all processes and the same program runs SPMD across hosts
(DCN rendezvous replaces the reference's MASTER_ADDR/MASTER_PORT TCP store).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int = 0, model_axis: int = 1) -> Mesh:
    """1-D data mesh (optionally x model axis for tensor sharding).

    n_devices == 0 uses every visible device. The data axis carries the
    batch; the model axis (if >1) carries hidden-dim shards.
    """
    from mmnas_tpu.utils.xla_cache import enable as _enable_xla_cache
    _enable_xla_cache()  # every engine passes through here exactly once
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % model_axis != 0:
        raise ValueError(f"n_devices {n} not divisible by model_axis {model_axis}")
    arr = np.array(devs[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape["data"]


def shard_batch(mesh: Mesh, batch):
    """Place a host batch on the mesh, leading axis split over 'data'.

    Single-process: plain device_put with the sharding. Multi-host: each
    process holds 1/process_count of the global batch (the loaders are
    rank-strided, engine.make_loader) and the global array is assembled
    with make_array_from_process_local_data — the TPU-native replacement
    for the reference's per-rank DataLoader + DDP input split."""
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def shard_stacked_batch(mesh: Mesh, batch):
    """Place a STACKED chunk of batches [N, B, ...]: the scan axis N stays
    replicated, the batch axis (dim 1) splits over 'data' (the fused
    SCAN_STEPS engine mode, engine/search.py make_chunk_step)."""
    sh = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def prefetch_to_device(batch_iter, mesh: Mesh, size: int = 2):
    """Wrap a host batch iterator: device_put each batch ahead of use so
    H2D transfer overlaps the previous step's compute (the JAX dispatch is
    async; keeping `size` batches in flight keeps the pipe full)."""
    import collections
    buf = collections.deque()
    it = iter(batch_iter)
    try:
        for _ in range(size):
            buf.append(shard_batch(mesh, next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(shard_batch(mesh, next(it)))
        except StopIteration:
            pass
        yield out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params, opt state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape["model"]


def place_params(mesh: Mesh, params):
    """Param placement honoring the mesh's model axis: replicated for a
    1-sized model axis (pure DP, reference parity), megatron TP rules
    (parallel/sharding.py) otherwise."""
    if model_axis_size(mesh) == 1:
        return replicate(mesh, params)
    from mmnas_tpu.parallel.sharding import shard_params
    return shard_params(mesh, params)


def place_opt_state(mesh: Mesh, opt_state, params):
    """Adam-style opt-state placement: entries congruent with the param
    tree (m, v) follow the param shardings; everything else (step counters,
    lr, per-leaf time trees of scalars) is replicated."""
    if model_axis_size(mesh) == 1 or not isinstance(opt_state, dict):
        return replicate(mesh, opt_state)
    from mmnas_tpu.parallel.sharding import param_shardings
    p_sh = param_shardings(mesh, params)
    p_def = jax.tree_util.tree_structure(params)
    repl = NamedSharding(mesh, P())

    def put_like(leaf, p_leaf, sh):
        # WarmupAdam's "t" tree is param-congruent but holds SCALAR
        # counters — only leaves of the param's shape take its sharding
        ok = getattr(leaf, "shape", None) == getattr(p_leaf, "shape", None)
        return jax.device_put(leaf, sh if ok else repl)

    out = {}
    for k, entry in opt_state.items():
        if jax.tree_util.tree_structure(entry) == p_def:
            out[k] = jax.tree_util.tree_map(put_like, entry, params, p_sh)
        else:
            out[k] = replicate(mesh, entry)
    return out


def eval_dataset_order(outs: np.ndarray, per_process_bs: int,
                       n_items: int) -> np.ndarray:
    """Reorder eval outputs collected from replicated GLOBAL batches into
    sampler (dataset/subset) order and drop all padding.

    Each global batch is rank-MAJOR — shard_batch assembles process-local
    slices in jax.devices() order, i.e. concat over processes — while the
    sampler deals positions rank-STRIDED (pos = k * process_count + rank,
    data/sampler.py:49; reference sampler.py:44). Inverting both is the
    single-controller equivalent of the reference's interleaved all_gather
    reassembly (train_vqa.py:382-395). Truncating to n_items
    (= len(sampler.subset_indices)) removes both the sampler divisibility
    pad and the loader's pad_to_full cycling: every padded entry has
    per-rank position k >= num_samples, hence sampler pos >= n_items."""
    pc = jax.process_count()
    nb = outs.shape[0] // (per_process_bs * pc)
    out = outs.reshape((nb, pc, per_process_bs) + outs.shape[1:])
    out = out.swapaxes(1, 2).reshape((-1,) + outs.shape[1:])
    return out[:n_items]


def allgather_host_order(local: np.ndarray, n_items: int) -> np.ndarray:
    """Gather per-process HOST-side eval arrays (e.g. labels the local
    loader yielded) into the same sampler order as eval_dataset_order.
    Collective: every process must call it (the multi-host replacement for
    reading labels straight off the local batch)."""
    pc = jax.process_count()
    if pc > 1:
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(local)  # [pc, n_local, ...]
        local = np.swapaxes(gathered, 0, 1).reshape(
            (-1,) + gathered.shape[2:])
    return local[:n_items]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
