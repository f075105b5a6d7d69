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

from pcodec_tpu.ops.pallas_decode import TILE_CHAINS
from pcodec_tpu.ops.decode import (
    TaskSchema,
    numbers_from_device_out,
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
            task_outputs[ti] = numbers_from_device_out(t.nt, out[i, : t.n])

    pieces = []
    for kind, idx in plan.order_keys:
        pieces.append(plan.fallback_arrays[idx] if kind == "fallback" else task_outputs[idx])
    if not pieces:
        return np.zeros(0, dtype=np.float64)
    from pcodec_tpu.utils import concat
    return concat(pieces)


def sharded_container_decode(data: bytes, mesh: Mesh = None, plan=None):
    """Bit-exact sharded PCT decode with per-device byte-range scatter.

    The SURVEY §5 comm design, for EVERY launch group / mode / delta
    encoding: the host scatters to each device ONLY the 4 KB blocks its
    chains reference (the outer container knows every page's byte range —
    no replication of the compressed buffer), chunk tables are replicated
    (KB-scale), each device runs the Pallas kernels on its tile shard
    under shard_map, and the XLA post (delta reconstruction, mode joins,
    ragged trim) runs on the gathered global outputs inside the same jit.
    Returns the decoded numpy array.

    Pass plan=pallas_decode.plan_standalone(data) to shard-decode a plain
    standalone .pco file through the same path (chains = the synthetic
    1024-splits the standalone planner creates).
    """
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is not None:
        shard_map = partial(shard_map, check_vma=False)
    else:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = partial(_sm, check_rep=False)

    import pcodec_tpu.ops.pallas_decode as pd

    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    plan = plan or pd.plan_container(data)
    raw2d = plan.raw2d
    n_blocks_total = raw2d.shape[0] // 8

    # ---- host prep per launch: tile padding + per-device block scatter ----
    prepared = {}
    for lkey, launch in plan.launches.items():
        schema = launch.schema
        fb = schema.fetch_blocks
        n_tiles = launch.curs.shape[0]
        pad_t = (-n_tiles) % nd

        def padt(a):
            if pad_t == 0:
                return a
            z = np.zeros((pad_t,) + a.shape[1:], dtype=a.dtype)
            return np.concatenate([a, z])

        curs = padt(launch.curs)
        states0 = padt(launch.states0)
        bodyn = padt(launch.bodyn)
        tbl_ids = padt(launch.tbl_ids)
        moments = padt(launch.moments) if launch.moments is not None else None
        tpd = curs.shape[0] // nd

        starts = launch.starts_blk
        spad = nd * tpd * TILE_CHAINS - len(starts)
        starts = np.concatenate([starts, np.zeros(spad, starts.dtype)])
        cpd = len(starts) // nd

        local_starts = np.zeros((nd, cpd), dtype=np.int32)
        uniq_per_dev = []
        for d in range(nd):
            sl = starts[d * cpd : (d + 1) * cpd]
            uniq, inv = np.unique(sl, return_inverse=True)
            uniq_per_dev.append(uniq)
            local_starts[d] = (inv * fb).astype(np.int32)
        max_u = max(len(u) for u in uniq_per_dev)
        local_raw = np.zeros((nd, max_u * fb * 8, 128), dtype=np.int32)
        for d, uniq in enumerate(uniq_per_dev):
            for k, b in enumerate(uniq.tolist()):
                hi = min(b + fb, n_blocks_total)
                span = raw2d[b * 8 : hi * 8]
                local_raw[d, k * fb * 8 : k * fb * 8 + span.shape[0]] = span

        prepared[lkey] = {
            "n_tiles": n_tiles,
            "args": dict(
                local_raw=jnp.asarray(local_raw),
                local_starts=jnp.asarray(local_starts),
                curs=jnp.asarray(curs),
                states0=jnp.asarray(states0),
                bodyn=jnp.asarray(bodyn),
                tbl_ids=jnp.asarray(tbl_ids),
                moments=None if moments is None else jnp.asarray(moments),
                tables=jnp.asarray(launch.tables),
            ),
        }

    def run(args_by_launch):
        outs_by_launch = {}
        for lkey, launch in plan.launches.items():
            schema = launch.schema
            fb = schema.fetch_blocks
            a = args_by_launch[repr(lkey)]
            has_mo = a["moments"] is not None
            # _decode_call returns 1 plane for 32-bit non-fused latents,
            # else (lo, hi) planes
            n_outs = 1 if (schema.lat32 and not schema.fuse) else 2

            def kernel(lr, ls, cu, st, bn, ti, tb, mo=None, schema=schema,
                       fb=fb):
                sec = pd._realign(lr[0], ls[0], fb)
                return pd._decode_call(schema, sec, tb, cu, st, bn, ti, mo)

            sh = P(axis)
            in_specs = [sh, sh, sh, sh, sh, sh, P()]
            operands = [a["local_raw"], a["local_starts"], a["curs"],
                        a["states0"], a["bodyn"], a["tbl_ids"], a["tables"]]
            if has_mo:
                in_specs.append(sh)
                operands.append(a["moments"])
            f = shard_map(
                kernel if has_mo else
                (lambda lr, ls, cu, st, bn, ti, tb, k=kernel:
                 k(lr, ls, cu, st, bn, ti, tb)),
                mesh=mesh,
                in_specs=tuple(in_specs),
                out_specs=tuple([sh] * n_outs),
            )
            outs = f(*operands)
            T = prepared[lkey]["n_tiles"]
            outs_by_launch[lkey] = tuple(o[:T] for o in outs)
        return pd._post_chunks(plan, outs_by_launch)

    args_by_launch = {repr(k): v["args"] for k, v in prepared.items()}
    results = jax.jit(run)(args_by_launch)

    nt = plan.idx.nt
    pieces = []
    for cp, res in zip(plan.chunks, results):
        if cp.fallback is not None:
            pieces.append(cp.fallback)
            continue
        mem = np.asarray(res)
        if mem.ndim == 2:  # fused int32 little-endian word pairs
            mem = np.ascontiguousarray(mem).view(np.uint64).reshape(-1)
        pieces.append(mem.astype(nt.latent.np_dtype).view(nt.np_dtype))
    from pcodec_tpu.utils import concat

    if not pieces:
        return np.zeros(0, dtype=nt.np_dtype)
    return concat(pieces)


def sharded_container_encode(nums, config=None, mesh: Mesh = None,
                             page_n: int = 1024, chunk_n: int = 1 << 20):
    """Bit-exact sharded PCT encode (SURVEY §5: the encode half of the comm
    design). Training decisions are host/planner work exactly as in the
    single-chip path; the EB/EC dissect+pack kernels run under shard_map
    with page-tile shards per device, and the per-page section streams
    gather back for host file assembly in file order. Output bytes are
    identical to the single-device encoder (and therefore to the host
    pipeline).
    """
    from pcodec_tpu.ops.pallas_encode import encode_container_device

    mesh = mesh or make_mesh()
    return encode_container_device(nums, config, page_n=page_n,
                                   chunk_n=chunk_n, shard_mesh=mesh)
