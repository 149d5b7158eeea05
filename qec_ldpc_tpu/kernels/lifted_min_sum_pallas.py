"""Fused Pallas TPU kernel for flooding min-sum on LIFTED graphs.

Generalizes kernels/min_sum_pallas.py from single-circulant graphs
(CirculantGraph: one permutation per block, block rows hitting every block
column once) to the lifted graphs of decoder/lifted.py — sums of monomial
permutations over Z_P or Z_l x Z_m, e.g. bivariate bicycle codes
(codes/bicycle.py).  Same fused design: the whole BP loop VMEM-resident,
padded 64/8-row blocks, static-shift routing, f32 done-mask, per-tile early
exit, optional fused damping operand (the relay engine, decoder/relay.py).

Routing on the product group: check lane r of an edge with shift (a, b)
connects to var lane ((r1+a)%l, (r2+b)%m), lanes flattened row-major.  The
check->var move y[q] = x[(q1-a)%l, (q2-b)%m] decomposes into TWO pad-aware
flat rolls selected by the inner lane position:

    y[q] = x[(q - (a*m+b)) % P]      where q%m >= b   (no inner borrow)
    y[q] = x[(q - (a*m+b) + m) % P]  where q%m <  b   (borrow from the row)

so a 2-D group roll costs 4 ``pltpu.roll``s + 2 selects — still static, no
gathers.  Numerics are bit-identical to the XLA path (decoder/min_sum.py on
a LiftedGraph): min/sign arithmetic is exact and the leave-one-out sums
accumulate in the same prefix/suffix order (tests/test_bicycle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qec_ldpc_tpu.decoder.lifted import LiftedGraph, _neg
from qec_ldpc_tpu.decoder.min_sum import np_log_band


def _build_kernel(graph: LiftedGraph, max_iters: int, check_every: int,
                  band: float, alpha: float, blk: int, damped: bool):
    C = graph.num_check_blocks
    V = graph.num_var_blocks
    Dc, Dv = graph.check_degree, graph.var_degree
    P = graph.P
    E = graph.num_edge_blocks
    group = graph.group
    # var block v's incident edges in rank order (check-major edge ids)
    incident = [[graph._var_rank_edges[i * V + v] for i in range(Dv)]
                for v in range(V)]

    def kernel(*refs):
        if damped:
            (prior_ref, syn_ref, damp_ref, v_out_ref, iters_ref,
             v_ref, e_ref, sgn_ref, done_ref, dmp_ref) = refs
        else:
            (prior_ref, syn_ref, v_out_ref, iters_ref,
             v_ref, e_ref, sgn_ref, done_ref) = refs
        prior_llr = prior_ref[0]
        bt = syn_ref.shape[-1]
        rows_blk = jax.lax.broadcasted_iota(jnp.int32, (blk, bt), 0)

        def roll_p(x, c):
            """y[q] = x[(q - c) % P] on rows < P; garbage on pads (valid rows
            never read pads — both branch rolls land in [0, P))."""
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

        # per-edge syndrome sign (1 - 2s) staged per padded check row (pads +1)
        sgn_ref[:] = jnp.ones((C * blk, bt), jnp.float32)
        for c in range(C):
            sgn_ref[c * blk:c * blk + P, :] = (
                1.0 - 2.0 * syn_ref[c * P:(c + 1) * P, :].astype(jnp.float32))

        if damped:
            dmp_ref[:] = jnp.zeros((E * blk, bt), jnp.float32)
            for i in range(E):
                dmp_ref[i * blk:i * blk + P, :] = damp_ref[i * P:(i + 1) * P, :]

        rows = jax.lax.broadcasted_iota(jnp.int32, (E * blk, bt), 0)
        v_ref[:] = jnp.where(rows % blk < P, prior_llr, 0.0)
        done_ref[:] = jnp.zeros((8, bt), jnp.float32)

        def iteration(last, masked):
            done = done_ref[0:1, :] > 0.5 if masked else None
            # -- check-node: normalized min-sum over each row's Dc edges --
            for c in range(C):
                ts = [eblock(v_ref, c * Dc + d) for d in range(Dc)]
                mags = [jnp.abs(t) for t in ts]
                sgs = [jnp.where(t < 0, -1.0, 1.0) for t in ts]
                big = jnp.full_like(mags[0], jnp.inf)
                ones = jnp.ones_like(sgs[0])
                pre_m = [big] * Dc
                pre_s = [ones] * Dc
                for i in range(1, Dc):
                    pre_m[i] = jnp.minimum(pre_m[i - 1], mags[i - 1])
                    pre_s[i] = pre_s[i - 1] * sgs[i - 1]
                suf_m = [big] * Dc
                suf_s = [ones] * Dc
                for i in range(Dc - 2, -1, -1):
                    suf_m[i] = jnp.minimum(suf_m[i + 1], mags[i + 1])
                    suf_s[i] = suf_s[i + 1] * sgs[i + 1]
                sgn_c = sgn_ref[c * blk:(c + 1) * blk, :]
                for d in range(Dc):
                    loo_sgn = pre_s[d] * suf_s[d]
                    loo_min = jnp.minimum(pre_m[d], suf_m[d])
                    e_ref[(c * Dc + d) * blk:(c * Dc + d + 1) * blk, :] = (
                        sgn_c * (alpha * loo_sgn * loo_min))

            # -- variable-node: prior + leave-one-out sums over Dv edges --
            for v in range(V):
                evs = [route(eblock(e_ref, e), graph.shifts[e])
                       for e in incident[v]]
                zeros = jnp.zeros_like(evs[0])
                pre = [zeros] * Dv
                for i in range(1, Dv):
                    pre[i] = pre[i - 1] + evs[i - 1]
                suf = [zeros] * Dv
                for i in range(Dv - 2, -1, -1):
                    suf[i] = suf[i + 1] + evs[i + 1]
                full = (pre[-1] + suf[-1]) + evs[-1]
                for i, e in enumerate(incident[v]):
                    vv = prior_llr + (full if last else pre[i] + suf[i])
                    rolled = route(vv, _neg(graph.shifts[e], group))
                    if damped or masked:
                        old = v_ref[e * blk:(e + 1) * blk, :]
                        if damped:
                            dmp = dmp_ref[e * blk:(e + 1) * blk, :]
                            rolled = dmp * old + (1.0 - dmp) * rolled
                        if masked:
                            rolled = jnp.where(done, old, rolled)
                    v_ref[e * blk:(e + 1) * blk, :] = rolled

        def not_converged():
            v = v_ref[:]
            rws = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            inside = (jnp.abs(v) < band) & (rws % blk < P)
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
                     "alpha", "tile_batch", "interpret"))
def lifted_min_sum_run_pallas(
    graph: LiftedGraph,
    syndrome: jnp.ndarray,   # (num_checks, batch) in {0,1}
    prior: jnp.ndarray,      # scalar channel error prob (already 2/3-scaled)
    max_iters: int,
    check_every: int = 10,
    conv_low: float = 0.01,
    alpha: float = 0.75,
    tile_batch: int = 128,
    interpret: bool = False,
    damping: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused-kernel equivalent of min_sum.min_sum_run on a
    LiftedGraph — same contract as kernels/min_sum_pallas.min_sum_run_pallas
    (per-tile early exit, optional fused damping)."""
    num_checks, batch = syndrome.shape
    if batch % tile_batch != 0:
        raise ValueError(f"batch {batch} not divisible by tile_batch {tile_batch}")
    num_tiles = batch // tile_batch
    C, E, P = graph.num_check_blocks, graph.num_edge_blocks, graph.P
    E_rows = graph.num_edges
    blk = -(-P // 8) * 8
    damped = damping is not None

    band = float(np_log_band(conv_low))
    kernel = _build_kernel(graph, max_iters, check_every, band, alpha, blk,
                           damped)
    prior_f = jnp.asarray(prior, jnp.float32)
    prior_llr = jnp.reshape(jnp.log1p(-prior_f) - jnp.log(prior_f), (1,))

    n_scratch_blocks = 3 if damped else 2
    scratch_bytes = (n_scratch_blocks * E * blk + C * blk + 8) * tile_batch * 4
    io_bytes = (2 + damped) * (E_rows + num_checks + 64) * tile_batch * 4
    declared = scratch_bytes + io_bytes
    # headroom for compiler temporaries/spills scales with the footprint
    # (a flat 16 MiB measured ~3.6 MiB short at P=521 edge rows)
    vmem_limit = min(120 * 1024 * 1024,
                     max(declared + (16 << 20), declared * 3 // 2))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((num_checks, tile_batch), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [prior_llr, syndrome.astype(jnp.int32)]
    scratch_shapes = [
        pltpu.VMEM((E * blk, tile_batch), jnp.float32),  # V messages
        pltpu.VMEM((E * blk, tile_batch), jnp.float32),  # E messages
        pltpu.VMEM((C * blk, tile_batch), jnp.float32),  # syndrome sign
        pltpu.VMEM((8, tile_batch), jnp.float32),        # done mask
    ]
    if damped:
        in_specs.append(pl.BlockSpec((E_rows, tile_batch), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))
        inputs.append(damping.astype(jnp.float32))
        scratch_shapes.append(
            pltpu.VMEM((E * blk, tile_batch), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((E_rows, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
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
    )(*inputs)
    return v_final, iters[0]
