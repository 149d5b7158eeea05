"""Fused Pallas TPU kernel for probability-domain sum-product BP on LIFTED
graphs — the reference-faithful algorithm (``DecoderCPU.h:150-292``
semantics) at fused-kernel speed on sum-of-monomial codes (bivariate
bicycle, codes/bicycle.py).

Same skeleton as kernels/lifted_min_sum_pallas.py (padded blocks, pad-aware
product-group rolls, f32 done-mask, per-tile early exit, posterior epilogue)
with the probability-domain CN/VN rules of kernels/bp_pallas.py.  Numerics
are bit-identical to decoder/sum_product.bp_run on a LiftedGraph: the
leave-one-out products accumulate in the same prefix/suffix order and the
mod-group rolls are pure data movement (tests/test_bicycle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qec_ldpc_tpu.decoder.lifted import LiftedGraph, _neg


def _build_kernel(graph: LiftedGraph, max_iters: int, check_every: int,
                  conv_low: float, conv_high: float, blk: int):
    C = graph.num_check_blocks
    V = graph.num_var_blocks
    Dc, Dv = graph.check_degree, graph.var_degree
    P = graph.P
    E = graph.num_edge_blocks
    group = graph.group
    incident = [[graph._var_rank_edges[i * V + v] for i in range(Dv)]
                for v in range(V)]

    def kernel(prior_ref, syn_ref, v_out_ref, iters_ref,
               v_ref, e_ref, sgn_ref, done_ref):
        prior = prior_ref[0]
        bt = syn_ref.shape[-1]
        rows_blk = jax.lax.broadcasted_iota(jnp.int32, (blk, bt), 0)

        def roll_p(x, c):
            """y[q] = x[(q - c) % P] on rows < P; garbage on pads."""
            c = int(c) % P
            if c == 0:
                return x
            r1 = pltpu.roll(x, c, 0)
            r2 = pltpu.roll(x, (c - P) % blk, 0)
            return jnp.where(rows_blk < c, r2, r1)

        def route(x, shift):
            """Check->var for +shift: y[q] = x[(q - shift) % group]."""
            if len(group) == 1:
                return roll_p(x, shift[0])
            l, m = group
            a, b = int(shift[0]) % l, int(shift[1]) % m
            if b == 0:
                return roll_p(x, a * m)
            hi = roll_p(x, (a * m + b) % P)
            lo = roll_p(x, (a * m + b - m) % P)
            return jnp.where(rows_blk % m < b, lo, hi)

        def eblock(ref, e):
            return ref[e * blk:(e + 1) * blk, :]

        # 0.5 * (1 - 2*syndrome) staged per padded check row (pads: 0.5)
        sgn_ref[:] = jnp.full((C * blk, bt), 0.5, jnp.float32)
        for c in range(C):
            sgn_ref[c * blk:c * blk + P, :] = (
                0.5 - syn_ref[c * P:(c + 1) * P, :].astype(jnp.float32))

        # init messages: prior on valid rows, 0 on pads (t = 1 in products)
        rows = jax.lax.broadcasted_iota(jnp.int32, (E * blk, bt), 0)
        v_ref[:] = jnp.where(rows % blk < P, prior, 0.0)
        done_ref[:] = jnp.zeros((8, bt), jnp.float32)

        def iteration(last, masked):
            done = done_ref[0:1, :] > 0.5 if masked else None
            # -- check-node (DecoderCPU.h:150-186 rule) --
            for c in range(C):
                ts = [1.0 - 2.0 * eblock(v_ref, c * Dc + d) for d in range(Dc)]
                ones = jnp.ones_like(ts[0])
                pre = [ones] * Dc
                for i in range(1, Dc):
                    pre[i] = pre[i - 1] * ts[i - 1]
                suf = [ones] * Dc
                for i in range(Dc - 2, -1, -1):
                    suf[i] = suf[i + 1] * ts[i + 1]
                sgn_c = sgn_ref[c * blk:(c + 1) * blk, :]
                for d in range(Dc):
                    base = (c * Dc + d) * blk
                    e_ref[base:base + blk, :] = 0.5 - sgn_c * (pre[d] * suf[d])

            # -- variable-node (DecoderCPU.h:188-229 rule) --
            for v in range(V):
                evs = [route(eblock(e_ref, e), graph.shifts[e])
                       for e in incident[v]]
                ems = [1.0 - ev for ev in evs]
                ones = jnp.ones_like(evs[0])
                pre_p = [ones] * Dv
                pre_m = [ones] * Dv
                for i in range(1, Dv):
                    pre_p[i] = pre_p[i - 1] * evs[i - 1]
                    pre_m[i] = pre_m[i - 1] * ems[i - 1]
                suf_p = [ones] * Dv
                suf_m = [ones] * Dv
                for i in range(Dv - 2, -1, -1):
                    suf_p[i] = suf_p[i + 1] * evs[i + 1]
                    suf_m[i] = suf_m[i + 1] * ems[i + 1]
                full_p = pre_p[-1] * evs[-1]
                full_m = pre_m[-1] * ems[-1]
                for i, e in enumerate(incident[v]):
                    prod_p = full_p if last else pre_p[i] * suf_p[i]
                    prod_m = full_m if last else pre_m[i] * suf_m[i]
                    num = prior * prod_p
                    den = (1.0 - prior) * prod_m + num
                    vv = num / den
                    rolled = route(vv, _neg(graph.shifts[e], group))
                    if masked:
                        old = v_ref[e * blk:(e + 1) * blk, :]
                        rolled = jnp.where(done, old, rolled)
                    v_ref[e * blk:(e + 1) * blk, :] = rolled

        def not_converged():
            v = v_ref[:]
            vrows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            inside = ((v != 0.0) & (v > conv_low) & (v < conv_high)
                      & (vrows % blk < P))
            return jnp.any(inside, axis=0, keepdims=True)

        def cond(state):
            n, alldone, _ = state
            return (n < max_iters - 1) & (alldone == 0)

        def body(state):
            n, _, anydone = state

            @pl.when(anydone == 0)
            def _():
                iteration(False, masked=False)

            @pl.when(anydone != 0)
            def _():
                iteration(False, masked=True)

            @pl.when((n % check_every) == 0)
            def _():
                conv = jnp.where(not_converged(), 0.0, 1.0)
                prev = done_ref[0:1, :]
                done_ref[0:1, :] = jnp.maximum(prev, conv)

            alldone = (jnp.min(done_ref[0:1, :]) > 0.5).astype(jnp.int32)
            anydone = (jnp.max(done_ref[0:1, :]) > 0.5).astype(jnp.int32)
            return n + 1, alldone, anydone

        n_loop, alldone, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

        @pl.when(alldone == 0)
        def _():
            iteration(True, masked=True)

        n_final = jnp.where(alldone == 0, n_loop + 1, n_loop)

        for i in range(E):
            v_out_ref[i * P:(i + 1) * P, :] = v_ref[i * blk:i * blk + P, :]
        iters_ref[:] = jnp.full((1, bt), n_final, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("graph", "max_iters", "check_every", "conv_low",
                     "conv_high", "tile_batch", "interpret"))
def lifted_bp_run_pallas(
    graph: LiftedGraph,
    syndrome: jnp.ndarray,   # (num_checks, batch) in {0,1}
    prior: jnp.ndarray,      # scalar channel error prob (already 2/3-scaled)
    max_iters: int,
    check_every: int = 10,
    conv_low: float = 0.01,
    conv_high: float = 0.99,
    tile_batch: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused-kernel equivalent of sum_product.bp_run on a
    LiftedGraph — same contract as kernels/bp_pallas.bp_run_pallas
    (per-tile early exit; iters is per-lane executed iterations)."""
    num_checks, batch = syndrome.shape
    if batch % tile_batch != 0:
        raise ValueError(f"batch {batch} not divisible by tile_batch {tile_batch}")
    num_tiles = batch // tile_batch
    C, E, P = graph.num_check_blocks, graph.num_edge_blocks, graph.P
    E_rows = graph.num_edges
    blk = -(-P // 8) * 8

    kernel = _build_kernel(graph, max_iters, check_every, conv_low, conv_high,
                           blk)
    prior_arr = jnp.reshape(jnp.asarray(prior, jnp.float32), (1,))

    scratch_bytes = (2 * E * blk + C * blk + 8) * tile_batch * 4
    io_bytes = 2 * (E_rows + num_checks + 64) * tile_batch * 4
    declared = scratch_bytes + io_bytes
    # headroom for compiler temporaries/spills scales with the footprint
    # (a flat 16 MiB measured ~3.6 MiB short at P=521 edge rows)
    vmem_limit = min(120 * 1024 * 1024,
                     max(declared + (16 << 20), declared * 3 // 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((num_checks, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((E_rows, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((E * blk, tile_batch), jnp.float32),  # V messages
            pltpu.VMEM((E * blk, tile_batch), jnp.float32),  # E messages
            pltpu.VMEM((C * blk, tile_batch), jnp.float32),  # syndrome sign
            pltpu.VMEM((8, tile_batch), jnp.float32),        # done mask
        ],
    )
    v_final, iters = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((E_rows, batch), jnp.float32),
            jax.ShapeDtypeStruct((1, batch), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(prior_arr, syndrome.astype(jnp.int32))
    return v_final, iters[0]
