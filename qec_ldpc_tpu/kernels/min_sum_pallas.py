"""Fused Pallas TPU kernel for normalized min-sum BP (LLR domain).

Companion to kernels/bp_pallas.py (sum-product): the same VMEM-resident
design — padded 64-row circulant blocks, static-shift message routing, f32
done-mask in scratch, per-tile early exit — applied to the LLR min-sum rules
of decoder/min_sum.py (BASELINE config 2: "batched min-sum BP decode, single
chip, fixed 50-iteration cap").  Replaces the reference's per-edge CUDA
threads (``kernels.cu:95-250``) for the production-approximation algorithm
the reference does not have.

Numerics match decoder/min_sum.py exactly: the check-node min/sign rule is
exact arithmetic (mins, ±1 products, one normalization multiply), and the
variable-node leave-one-out sums accumulate in the same prefix/suffix order
as the XLA path, so messages are bit-identical (verified on real TPU and in
interpret mode by tests/test_kernels.py).

The optional ``damping`` operand (check-indexed per-edge memory coefficients,
see ``min_sum.min_sum_run``) fuses the relay decoder's damped update
``v = d*v_old + (1-d)*v_new`` into the kernel, so ensemble relay retries
(decoder/relay.py) run at fused kernel speed.  The damped path matches the
XLA damped loop to ~1 ulp per iteration (XLA fuses the blend's multiply-adds
differently in the two surrounding graphs), which is immaterial to relay —
every repair is accepted only after an exact syndrome re-encode; the
UNDAMPED path remains bit-identical as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qec_ldpc_tpu.decoder.layout import CirculantGraph
from qec_ldpc_tpu.decoder.min_sum import np_log_band

#: circulant sizes past this dispatch to the transposed wide-lane kernel
#: (kernels/min_sum_wide_pallas.py).  The resident batch-on-lanes kernel was
#: measured healthy at P=521 and VMEM-OOM at P=1051 on the real v5e chip
#: (large_code_real_r4.jsonl: 171–419 MB requested of 128 MB, mostly
#: register-allocator spill slots); the wide kernel's per-tile state is
#: ~16x smaller and its lane-padding waste drops with P, so the crossover
#: sits between those two measured points.
WIDE_MIN_P = 768


def _build_kernel(graph: CirculantGraph, max_iters: int, check_every: int,
                  band: float, alpha: float, blk: int, damped: bool):
    B, L, P = graph.B, graph.L, graph.P
    NB = B * L

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

        def route(x, c):
            """y[q] = x[(q - c) % P] on rows < P; GARBAGE on pad rows (valid
            rows never read pads; every consumer is row-elementwise and the
            convergence scan / output copy mask or skip pads — see
            bp_pallas.route)."""
            c = int(c) % P
            if c == 0:
                return x
            r1 = pltpu.roll(x, c, 0)
            r2 = pltpu.roll(x, (c - P) % blk, 0)
            return jnp.where(rows_blk < c, r2, r1)

        def vblock(b, l):
            base = (b * L + l) * blk
            return v_ref[base:base + blk, :]

        # per-edge syndrome sign 1-2*s staged per padded block row (pads: +1)
        sgn_ref[:] = jnp.ones((B * blk, bt), jnp.float32)
        for b in range(B):
            sgn_ref[b * blk:b * blk + P, :] = (
                1.0 - 2.0 * syn_ref[b * P:(b + 1) * P, :].astype(jnp.float32))

        if damped:
            # stage damping coefficients into the padded block layout
            # (pads get 0: their values are never read by valid rows)
            dmp_ref[:] = jnp.zeros((NB * blk, bt), jnp.float32)
            for i in range(NB):
                dmp_ref[i * blk:i * blk + P, :] = damp_ref[i * P:(i + 1) * P, :]

        # init: prior LLR on valid rows, 0 on pad rows
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB * blk, bt), 0)
        v_ref[:] = jnp.where(rows % blk < P, prior_llr, 0.0)
        done_ref[:] = jnp.zeros((8, bt), jnp.float32)

        def iteration(last, masked):
            """One min-sum iteration; both flags STATIC, as in bp_pallas:
            the unmasked variant skips the done-mask V read/select pass and
            runs until the first convergence event; ``last`` (posterior
            formation) is hoisted out of the loop as one epilogue call."""
            done = done_ref[0:1, :] > 0.5 if masked else None
            # -- check-node: normalized min-sum (decoder/min_sum.py rules) --
            for b in range(B):
                ts = [vblock(b, l) for l in range(L)]
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
                sgn_b = sgn_ref[b * blk:(b + 1) * blk, :]
                for l in range(L):
                    base = (b * L + l) * blk
                    loo_sgn = pre_s[l] * suf_s[l]
                    loo_min = jnp.minimum(pre_m[l], suf_m[l])
                    e_ref[base:base + blk, :] = sgn_b * (alpha * loo_sgn * loo_min)

            # -- variable-node: prior + leave-one-out sums over block rows --
            for l in range(L):
                evs = [route(e_ref[(b * L + l) * blk:(b * L + l + 1) * blk, :],
                             graph.table[b, l]) for b in range(B)]
                zeros = jnp.zeros_like(evs[0])
                pre = [zeros] * B
                for i in range(1, B):
                    pre[i] = pre[i - 1] + evs[i - 1]
                suf = [zeros] * B
                for i in range(B - 2, -1, -1):
                    suf[i] = suf[i + 1] + evs[i + 1]
                full = (pre[-1] + suf[-1]) + evs[-1]  # suf[-1] is 0: loo[-1]+term
                for b in range(B):
                    vv = prior_llr + (full if last else pre[b] + suf[b])
                    i = b * L + l
                    rolled = route(vv, P - int(graph.table[b, l]))
                    if damped or masked:
                        old = v_ref[i * blk:(i + 1) * blk, :]
                        if damped:
                            d = dmp_ref[i * blk:(i + 1) * blk, :]
                            rolled = d * old + (1.0 - d) * rolled
                        if masked:
                            rolled = jnp.where(done, old, rolled)
                    v_ref[i * blk:(i + 1) * blk, :] = rolled

        def not_converged():
            # per-lane: some valid-row message with |llr| < band (the LLR
            # image of the reference band test, DecoderCPU.h:231-246);
            # pad rows hold 0 and must be excluded
            v = v_ref[:]
            rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            inside = (jnp.abs(v) < band) & (rows % blk < P)
            return jnp.any(inside, axis=0, keepdims=True)  # (1, bt)

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

        # posterior epilogue (reference n == N-1), only if some lane is live
        @pl.when(alldone == 0)
        def _():
            iteration(True, masked=True)

        n_final = jnp.where(alldone == 0, n_loop + 1, n_loop)

        for i in range(NB):
            v_out_ref[i * P:(i + 1) * P, :] = v_ref[i * blk:i * blk + P, :]
        iters_ref[:] = jnp.full((1, bt), n_final, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("graph", "max_iters", "check_every", "conv_low",
                     "alpha", "tile_batch", "interpret"))
def min_sum_run_pallas(
    graph: CirculantGraph,
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
    """Drop-in fused-kernel equivalent of min_sum.min_sum_run.

    Returns (v_final LLRs (num_edges, batch), iters (batch,)): iters is the
    per-tile executed iteration count (each batch tile early-exits
    independently when all its lanes converge).

    ``damping``: optional check-indexed (num_edges, batch) f32 memory
    coefficients — the fused image of ``min_sum_run(damping=...)``, matching
    it to ~1 ulp per iteration (NOT bit-identical: FMA fusion of the blend
    differs — see the module docstring); the relay decoder engine.
    """
    if not isinstance(graph, CirculantGraph):
        # lifted graphs (sums of monomials / product groups, e.g. bivariate
        # bicycle codes) route to the generalized kernel — same contract
        from qec_ldpc_tpu.kernels.lifted_min_sum_pallas import (
            lifted_min_sum_run_pallas,
        )

        return lifted_min_sum_run_pallas(
            graph, syndrome, prior, max_iters, check_every=check_every,
            conv_low=conv_low, alpha=alpha, tile_batch=tile_batch,
            interpret=interpret, damping=damping)
    if graph.P >= WIDE_MIN_P:
        # large-P codes: the resident layout VMEM-OOMs (see WIDE_MIN_P);
        # route to the transposed wide-lane kernel, which picks its own
        # (sublane) batch tile
        from qec_ldpc_tpu.kernels.min_sum_wide_pallas import (
            min_sum_run_wide_pallas,
        )

        return min_sum_run_wide_pallas(
            graph, syndrome, prior, max_iters, check_every=check_every,
            conv_low=conv_low, alpha=alpha,
            interpret=interpret, damping=damping)
    num_checks, batch = syndrome.shape
    if batch % tile_batch != 0:
        raise ValueError(f"batch {batch} not divisible by tile_batch {tile_batch}")
    num_tiles = batch // tile_batch
    B, L, P = graph.B, graph.L, graph.P
    E_rows = graph.num_edges
    blk = -(-P // 8) * 8
    damped = damping is not None

    band = float(np_log_band(conv_low))
    kernel = _build_kernel(graph, max_iters, check_every, band, alpha, blk,
                           damped)
    prior_f = jnp.asarray(prior, jnp.float32)
    prior_llr = jnp.reshape(jnp.log1p(-prior_f) - jnp.log(prior_f), (1,))

    n_scratch_blocks = 3 if damped else 2  # V, E [, damping] padded tensors
    scratch_bytes = (n_scratch_blocks * B * L * blk + B * blk + 8) * tile_batch * 4
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
        pltpu.VMEM((B * L * blk, tile_batch), jnp.float32),  # V messages
        pltpu.VMEM((B * L * blk, tile_batch), jnp.float32),  # E messages
        pltpu.VMEM((B * blk, tile_batch), jnp.float32),      # syndrome sign
        pltpu.VMEM((8, tile_batch), jnp.float32),            # done mask
    ]
    if damped:
        in_specs.append(pl.BlockSpec((E_rows, tile_batch), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))
        inputs.append(damping.astype(jnp.float32))
        scratch_shapes.append(
            pltpu.VMEM((B * L * blk, tile_batch), jnp.float32))  # padded damping

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
