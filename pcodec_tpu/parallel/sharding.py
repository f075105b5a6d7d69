"""Multi-chip scale-out: shard decode tasks data-parallel over a device mesh.

The reference is single-threaded per chunk (SURVEY.md §2.5); the primary
TPU scaling axis is data parallelism over independent pages/chunks:
  * chunk metadata (flat ANS node/lower tables) is replicated (KB-scale),
  * page segments + per-page state shard across the mesh's `tasks` axis,
  * decode needs no cross-device communication; a psum only aggregates
    byte-count/checksum statistics (rides ICI).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcodec_tpu.ops.decode import (
    TaskSchema,
    build_group_arrays,
    decode_group_kernel,
    group_tasks,
    plan_standalone_file,
)


def make_mesh(devices=None, axis: str = "tasks") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def pad_group_to_devices(arrays, n_devices: int):
    """Pad the task axis so it divides the mesh size (padding tasks decode
    garbage from zeroed segments and are dropped on the host)."""
    T = arrays[0].shape[0]
    rem = (-T) % n_devices
    if rem == 0:
        return arrays, T
    padded = []
    for a in arrays:
        pad_shape = (rem,) + a.shape[1:]
        padded.append(np.concatenate([a, np.zeros(pad_shape, dtype=a.dtype)]))
    return tuple(padded), T


def sharded_decode_group(mesh: Mesh, arrays, node_flat, lower_flat, schema: TaskSchema):
    """Run one schema group sharded across the mesh; returns host numpy."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    arrays, true_t = pad_group_to_devices(arrays, mesh.devices.size)
    args = tuple(jax.device_put(jnp.asarray(a), shard) for a in arrays) + (
        jax.device_put(jnp.asarray(node_flat), repl),
        jax.device_put(jnp.asarray(lower_flat), repl),
    )
    out = decode_group_kernel(*args, schema=schema)
    return np.asarray(out)[:true_t]


def sharded_decode_standalone(data: bytes, mesh: Mesh = None):
    """Decode a standalone file with pages sharded across the mesh."""
    mesh = mesh or make_mesh()
    plan = plan_standalone_file(data)
    node_flat, lower_flat = plan.flat_tables()

    task_outputs = {}
    for schema, tis in group_tasks(plan):
        items = [plan.tasks[ti] for ti in tis]
        arrays = build_group_arrays(items, schema)
        out = sharded_decode_group(mesh, arrays, node_flat, lower_flat, schema)
        for i, ti in enumerate(tis):
            t = plan.tasks[ti]
            task_outputs[ti] = out[i, : t.n].astype(t.nt.np_dtype)

    pieces = []
    for kind, idx in plan.order_keys:
        pieces.append(plan.fallback_arrays[idx] if kind == "fallback" else task_outputs[idx])
    if not pieces:
        return np.zeros(0, dtype=np.float64)
    from pcodec_tpu.utils import concat
    return concat(pieces)


def sharded_roundtrip_step(mesh: Mesh, arrays, node_flat, lower_flat, schema: TaskSchema):
    """A jitted, mesh-sharded "full step": decode all shards and psum a
    checksum across the mesh (exercises a real collective over the task
    sharding). Used by the multichip dry run."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnames=("schema",))
    def step(*args, schema=None):
        out = decode_group_kernel(*args, schema=schema)
        checksum = jnp.sum(out.astype(jnp.float64))
        return out, checksum

    arrays, true_t = pad_group_to_devices(arrays, mesh.devices.size)
    # sharding propagates from the input placement: task axis over the mesh,
    # ANS tables replicated
    args = tuple(jax.device_put(jnp.asarray(a), shard) for a in arrays) + (
        jax.device_put(jnp.asarray(node_flat), repl),
        jax.device_put(jnp.asarray(lower_flat), repl),
    )
    out, checksum = step(*args, schema=schema)
    return np.asarray(out)[:true_t], float(checksum)


# ---------------------------------------------------------------------------
# container path: shard Pallas decode tiles across the mesh (shard_map)
# ---------------------------------------------------------------------------


def sharded_container_decode_checksum(data: bytes, mesh: Mesh = None):
    """Decode a PCT container with decode tiles sharded data-parallel across
    the mesh, psum-reducing a checksum across devices (the collective rides
    ICI). Chunk tables are replicated (KB-scale); compressed words are
    replicated too (each device realigns only its own tiles' sections — on a
    real pod the outer format would instead ship each host its byte ranges).

    Returns (checksum_i32, n_chains). Single-launch containers only (the
    common homogeneous case); use ops.pallas_decode directly otherwise.
    """
    from jax.experimental.shard_map import shard_map

    import pcodec_tpu.ops.pallas_decode as pd

    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    plan = pd.plan_container(data)
    assert len(plan.launches) == 1, "sharded demo expects one launch group"
    (lkey, launch), = plan.launches.items()
    schema = launch.schema

    # pad tiles to a multiple of the mesh
    n_tiles = launch.curs.shape[0]
    pad = (-n_tiles) % nd
    def padt(a):
        if pad == 0:
            return a
        z = np.zeros((pad,) + a.shape[1:], dtype=a.dtype)
        return np.concatenate([a, z])
    curs = padt(launch.curs)
    states0 = padt(launch.states0)
    bodyn = padt(launch.bodyn)
    tbl_ids = padt(launch.tbl_ids)
    starts = launch.starts_blk
    spad = (-len(starts)) % (nd * 256)
    starts = np.concatenate([starts, np.zeros(spad, starts.dtype)])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    def step(raw2d, starts_blk, curs, states0, bodyn, tbl_ids, tables):
        sec = pd._realign(raw2d, starts_blk, schema.fetch_blocks)
        outs = pd._decode_call(schema, sec, tables, curs, states0, bodyn, tbl_ids)
        # psum over i32 (wrapping checksum): the backend only lowers plain
        # 32-bit sum all-reduces
        local = sum(jnp.sum(o, dtype=jnp.int32) for o in outs)
        return jax.lax.psum(local.reshape(1), axis)

    out = jax.jit(step)(
        jnp.asarray(plan.raw2d), jnp.asarray(starts), jnp.asarray(curs),
        jnp.asarray(states0), jnp.asarray(bodyn), jnp.asarray(tbl_ids),
        jnp.asarray(launch.tables),
    )
    return int(np.asarray(out)[0]), launch.n_chains
