"""Fused Pallas TPU kernel for LAYERED normalized min-sum BP.

Companion to kernels/{bp_pallas,min_sum_pallas}.py — the same VMEM-resident
design (padded 64-row circulant blocks, static-shift routing, f32 done-mask,
per-tile early exit) applied to the serial block-row schedule of
decoder/layered.py.  Layered decoding propagates each layer's check update
into the posteriors immediately, converging in roughly half the flooding
sweeps; combined with the kernel's per-tile early exit this is the
framework's fastest decode path on converging workloads.

State per batch tile, all VMEM-resident across the whole decode:
  * ``q`` — posterior LLRs, var-indexed, L padded blocks
  * ``r`` — check->var messages, check-indexed, B*L padded blocks

Per layer ``b``: route each posterior block to check order, subtract the old
message (leave-one-out), min-sum across the L block columns, add the new
message back and route to var order — 2L routes per layer, the same routing
budget per sweep as one flooding iteration.  Convergence (every
``check_every`` sweeps) is the layered criterion: the hard decision satisfies
the syndrome, tested as a pure sign-product parity per block-row.

Numerics are bit-identical to decoder/layered.py (same prefix/suffix
leave-one-out order, same op sequence; routing is an exact permutation in
both) — asserted by tests/test_layered.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qec_ldpc_tpu.decoder.layout import CirculantGraph


def _build_kernel(graph: CirculantGraph, max_iters: int, check_every: int,
                  alpha: float, blk: int):
    B, L, P = graph.B, graph.L, graph.P
    NB = B * L

    def kernel(prior_ref, syn_ref, q_out_ref, iters_ref,
               q_ref, r_ref, sgn_ref, done_ref):
        prior_llr = prior_ref[0]
        bt = syn_ref.shape[-1]
        rows_blk = jax.lax.broadcasted_iota(jnp.int32, (blk, bt), 0)

        def route(x, c):
            """y[q] = x[(q - c) % P] on rows < P; GARBAGE on pad rows (valid
            rows never read pads — see bp_pallas.route)."""
            c = int(c) % P
            if c == 0:
                return x
            r1 = pltpu.roll(x, c, 0)
            r2 = pltpu.roll(x, (c - P) % blk, 0)
            return jnp.where(rows_blk < c, r2, r1)

        def qblock(l):
            return q_ref[l * blk:(l + 1) * blk, :]

        def rblock(b, l):
            base = (b * L + l) * blk
            return r_ref[base:base + blk, :]

        # syndrome sign 1-2*s per padded block row (pads: +1 so the parity
        # test is trivially satisfied on pad rows)
        sgn_ref[:] = jnp.ones((B * blk, bt), jnp.float32)
        for b in range(B):
            sgn_ref[b * blk:b * blk + P, :] = (
                1.0 - 2.0 * syn_ref[b * P:(b + 1) * P, :].astype(jnp.float32))

        # init: posteriors = prior LLR (pads too — harmless, they only feed
        # pad rows), messages = 0
        q_ref[:] = jnp.full((L * blk, bt), prior_llr, jnp.float32)
        r_ref[:] = jnp.zeros((NB * blk, bt), jnp.float32)
        done_ref[:] = jnp.zeros((8, bt), jnp.float32)

        def sweep(masked):
            """One full iteration: serial pass over the B block-row layers.
            ``masked`` is STATIC (two Mosaic branches): honor the per-lane
            done-mask on q/r writes; the unmasked variant skips a VMEM read
            pass and the selects, and runs until the first convergence
            event (see bp_pallas.iteration)."""
            done = done_ref[0:1, :] > 0.5 if masked else None
            for b in range(B):
                sgn_b = sgn_ref[b * blk:(b + 1) * blk, :]
                ts = [route(qblock(l), (-graph.table[b, l]) % P)
                      - rblock(b, l) for l in range(L)]
                mags = [jnp.abs(t) for t in ts]
                sgs = [jnp.where(t < 0, -1.0, 1.0) for t in ts]
                big = jnp.full_like(mags[0], jnp.inf)
                ones = jnp.ones_like(sgs[0])
                pre_m = [big] * L
                pre_s = [ones] * L
                for i in range(1, L):
                    pre_m[i] = jnp.minimum(pre_m[i - 1], mags[i - 1])
                    pre_s[i] = pre_s[i - 1] * sgs[i - 1]
                suf_m = [big] * L
                suf_s = [ones] * L
                for i in range(L - 2, -1, -1):
                    suf_m[i] = jnp.minimum(suf_m[i + 1], mags[i + 1])
                    suf_s[i] = suf_s[i + 1] * sgs[i + 1]
                for l in range(L):
                    loo = jnp.minimum(pre_m[l], suf_m[l])
                    r_new = sgn_b * (alpha * (pre_s[l] * suf_s[l]) * loo)
                    q_new = route(ts[l] + r_new, graph.table[b, l])
                    if masked:
                        r_new = jnp.where(done, rblock(b, l), r_new)
                        q_new = jnp.where(done, qblock(l), q_new)
                    base = (b * L + l) * blk
                    r_ref[base:base + blk, :] = r_new
                    q_ref[l * blk:(l + 1) * blk, :] = q_new

        def mismatch():
            """Per-lane f32 (1, bt): 0 iff the hard decision of q satisfies
            the syndrome — the sign-product parity of
            decoder/layered.syndrome_satisfied, in pure f32 arithmetic
            (Mosaic cannot legalize i1 vectors).  Valid output rows of a
            route never read pad rows, and pad rows are masked out of the
            reduction, so q's pad garbage is inert."""
            total = None
            for b in range(B):
                parity = None
                for l in range(L):
                    s = jnp.where(qblock(l) <= 0.0, -1.0, 1.0)
                    s = route(s, (-graph.table[b, l]) % P)
                    parity = s if parity is None else parity * s
                sgn_b = sgn_ref[b * blk:(b + 1) * blk, :]
                bad = jnp.where(rows_blk < P, jnp.abs(parity - sgn_b), 0.0)
                col = jnp.max(bad, axis=0, keepdims=True)  # (1, bt)
                total = col if total is None else jnp.maximum(total, col)
            return total

        def cond(state):
            n, alldone, _ = state
            return (n < max_iters) & (alldone == 0)

        def body(state):
            n, _, anydone = state

            @pl.when(anydone == 0)
            def _():
                sweep(masked=False)

            @pl.when(anydone != 0)
            def _():
                sweep(masked=True)

            @pl.when((n % check_every) == (check_every - 1))
            def _():
                conv = jnp.where(mismatch() > 0.0, 0.0, 1.0)
                prev = done_ref[0:1, :]
                done_ref[0:1, :] = jnp.maximum(prev, conv)

            alldone = (jnp.min(done_ref[0:1, :]) > 0.5).astype(jnp.int32)
            anydone = (jnp.max(done_ref[0:1, :]) > 0.5).astype(jnp.int32)
            return n + 1, alldone, anydone

        n_final, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

        # copy padded posteriors to the dense (L*P, bt) output layout
        for l in range(L):
            q_out_ref[l * P:(l + 1) * P, :] = q_ref[l * blk:l * blk + P, :]
        iters_ref[:] = jnp.full((1, bt), n_final, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("graph", "max_iters", "check_every", "alpha",
                     "tile_batch", "interpret"))
def layered_run_pallas(
    graph: CirculantGraph,
    syndrome: jnp.ndarray,   # (num_checks, batch) in {0,1}
    prior: jnp.ndarray,      # scalar channel error prob (already 2/3-scaled)
    max_iters: int,
    check_every: int = 1,
    alpha: float = 0.75,
    tile_batch: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused-kernel equivalent of layered.layered_min_sum_run.

    Returns (q_final posterior LLRs (num_vars, batch), iters (batch,)):
    iters is the per-tile executed sweep count (each batch tile early-exits
    independently when all its lanes satisfy their syndromes).
    """
    num_checks, batch = syndrome.shape
    if batch % tile_batch != 0:
        raise ValueError(f"batch {batch} not divisible by tile_batch {tile_batch}")
    num_tiles = batch // tile_batch
    B, L, P = graph.B, graph.L, graph.P
    blk = -(-P // 8) * 8

    kernel = _build_kernel(graph, max_iters, check_every, alpha, blk)
    prior_f = jnp.asarray(prior, jnp.float32)
    prior_llr = jnp.reshape(jnp.log1p(-prior_f) - jnp.log(prior_f), (1,))

    scratch_bytes = ((B * L + L + B) * blk + 8) * tile_batch * 4
    io_bytes = 2 * (L * P + num_checks + 64) * tile_batch * 4
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
            pl.BlockSpec((L * P, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_batch), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((L * blk, tile_batch), jnp.float32),      # q posteriors
            pltpu.VMEM((B * L * blk, tile_batch), jnp.float32),  # r messages
            pltpu.VMEM((B * blk, tile_batch), jnp.float32),      # syndrome sign
            pltpu.VMEM((8, tile_batch), jnp.float32),            # done mask
        ],
    )
    q_final, iters = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L * P, batch), jnp.float32),
            jax.ShapeDtypeStruct((1, batch), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(prior_llr, syndrome.astype(jnp.int32))
    return q_final, iters[0]
