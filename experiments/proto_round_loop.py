"""Prototype v2: ANS round-loop skeleton as a Pallas kernel.

Structure under test (mirrors the planned production decode kernel):
  dense layout: (8 sublanes, 128 lanes) vregs hold 256 chains x 4 streams,
  chain (s, g) occupies lanes 4g..4g+3 of sublane s.

  per round (4 interleaved symbols per chain):
    - node lookup from chunk-shared table: row-replicated lane-gathers + select
    - within-quad prefix of bit counts -> per-stream cursors (dense rolls)
    - bit-window extraction from a per-chain 4-word window vreg W4 via two
      dense take_along_axis ops + funnel shift
    - W4 refill for next round: per 8-chain group, one lane-gather from the
      group's (8,128)-word section + masked select

All data fake; measures symbols/s. take_along_axis semantics asserted
against numpy first.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def taa_kernel(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)


def check_taa():
    rng = np.random.default_rng(0)
    tbl = rng.integers(0, 1000, (8, 128), dtype=np.int32)
    idx = rng.integers(0, 128, (8, 128), dtype=np.int32)
    out = pl.pallas_call(
        taa_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(tbl), jnp.asarray(idx))
    expect = np.take_along_axis(tbl, idx, axis=1)
    assert np.array_equal(np.asarray(out), expect), "taa semantics mismatch!"
    print("A. take_along_axis semantics: OK (per-row lane gather)")


N_GROUPS = 32
ROUNDS = 64
TS_LOG = 10
TS = 1 << TS_LOG
N_TILE_CHAINS = N_GROUPS * 8  # 256


def make_round_kernel(with_emit):
    lane_i = None

    def kernel(sec_ref, node_ref, state_ref, out_ref, *rest):
        emit_ref = rest[0] if with_emit else None
        node_tiles = [node_ref[:, k * 128:(k + 1) * 128] for k in range(TS // 128)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        j_in_quad = lane & 3
        quad_base = lane & ~3
        group_of_lane = lane >> 2
        const4g = [jnp.full((8, 128), 4 * g, jnp.int32) for g in range(N_GROUPS)]
        gmask = [group_of_lane == g for g in range(N_GROUPS)]

        def refill(w0_rep4, W4):
            # W4[s, 4g+k] = sec[chain(s,g)][w0(chain)+k]
            for g in range(N_GROUPS):
                sec_g = sec_ref[g * 8:(g + 1) * 8, :]
                rep = jnp.take_along_axis(w0_rep4, const4g[g], axis=1)
                idx = (rep + j_in_quad) & 127
                gath = jnp.take_along_axis(sec_g, idx, axis=1)
                W4 = jnp.where(gmask[g], gath, W4)
            return W4

        def round_body(r, carry):
            states, cursor, acc = carry
            # cursor: stream-0 bit cursor, replicated across each quad's 4 lanes

            # 1. node lookup (chunk-shared table)
            idx_lo = states & 127
            sel = states >> 7
            node = jnp.take_along_axis(node_tiles[0], idx_lo, axis=1)
            for k in range(1, TS // 128):
                gk = jnp.take_along_axis(node_tiles[k], idx_lo, axis=1)
                node = jnp.where(sel == k, gk, node)
            bits = node & 15
            base = jax.lax.shift_right_logical(node, 11)

            # 2. within-quad exclusive prefix of bits
            b1 = jnp.where(j_in_quad >= 1, pltpu.roll(bits, 1, axis=1), 0)
            b2 = jnp.where(j_in_quad >= 2, pltpu.roll(bits, 2, axis=1), 0)
            b3 = jnp.where(j_in_quad >= 3, pltpu.roll(bits, 3, axis=1), 0)
            cum = cursor + b1 + b2 + b3  # per-stream bit cursor

            # 3. window extraction from W4 (refilled at end of prev round)
            w0 = jax.lax.shift_right_logical(cursor, 5)
            blocal = cum - jax.lax.shift_left(w0, 5)
            k_w = jax.lax.shift_right_logical(blocal, 5)
            s_w = blocal & 31
            W4 = acc[0]
            lo = jnp.take_along_axis(W4, quad_base + k_w, axis=1)
            hi = jnp.take_along_axis(W4, quad_base + jnp.minimum(k_w + 1, 3), axis=1)
            f = jax.lax.shift_right_logical(lo, s_w) | jnp.where(
                s_w == 0, 0, jax.lax.shift_left(hi, 32 - s_w))
            val = f & ((jnp.int32(1) << bits) - 1)
            new_states = (base + val) & (TS - 1)

            # 4. cursor advance: lane 3 of each quad has cum+bits = end
            qend = cum + bits
            new_cursor = jnp.take_along_axis(qend, lane | 3, axis=1)

            # 5. refill W4 for next round
            w0n = jax.lax.shift_right_logical(new_cursor, 5)
            W4n = refill(w0n, W4)

            if with_emit:
                emit_ref[r, :, :] = new_states
            return new_states, new_cursor, (W4n,)

        W4_0 = refill(jnp.zeros((8, 128), jnp.int32), jnp.zeros((8, 128), jnp.int32))
        states, cursor, acc = jax.lax.fori_loop(
            0, ROUNDS, round_body,
            (state_ref[:], jnp.zeros((8, 128), jnp.int32), (W4_0,)))
        out_ref[:] = states + cursor

    return kernel


def bench(with_emit, n_tiles):
    rng = np.random.default_rng(1)
    sec = jnp.asarray(rng.integers(0, 2**31, (n_tiles, N_TILE_CHAINS, 128), np.int32))
    node = jnp.asarray(np.tile(rng.integers(0, 2**20, (1, TS), np.int32), (8, 1)))
    state = jnp.asarray(rng.integers(0, TS, (n_tiles, 8, 128), np.int32))

    kern = make_round_kernel(with_emit)
    out_shapes = [jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    if with_emit:
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles, ROUNDS, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, ROUNDS, 8, 128), lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))

    def kernel(sec_ref, node_ref, state_ref, *outs):
        kern(sec_ref.at[0], node_ref, state_ref.at[0],
             *(o.at[0] for o in outs))

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, N_TILE_CHAINS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if with_emit else out_specs[0],
    )

    @jax.jit
    def run(sec, node, state):
        return pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes) if with_emit else out_shapes[0],
            grid_spec=grid_spec,
        )(sec, node, state)

    out = run(sec, node, state)
    first = out[0] if with_emit else out
    _ = float(first[0, 0, 0])
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        out = run(sec, node, state)
        first = out[0] if with_emit else out
        _ = float(first[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    syms = n_tiles * N_TILE_CHAINS * 4 * ROUNDS
    tag = "emit" if with_emit else "noemit"
    print(f"B[{tag}] x{n_tiles:3d} tiles: {best*1e3:7.3f} ms,"
          f" {syms/best/1e6:6.0f} M symbols/s")


if __name__ == "__main__":
    check_taa()
    bench(False, 64)
    bench(False, 256)
    bench(False, 1024)
    bench(True, 256)
    bench(True, 1024)
