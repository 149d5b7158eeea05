"""Wide-lane fused Pallas min-sum kernel for LARGE circulant sizes P.

The resident kernel (kernels/min_sum_pallas.py) keeps the whole edge state in
VMEM with batch on the 128-lane axis and the P circulant lanes on sublanes —
per-tile state is ``O(B*L*P * 128)`` floats, which measured on the real chip
dies at P >= 1051 ("Used 171.21M of 128.00M vmem", with 81–164 MB of
register-allocator spill slots from the fully-unrolled block walk;
benchmarks/data/large_code_real_r4.jsonl) and falls back to an XLA loop
running ~28x slower.  That wall is the single-chip limit VERDICT r4 #1 asks
round 5 to break.

This kernel TRANSPOSES the layout: the P circulant lanes ride the hardware
lane axis (padded to a multiple of 128) and a small batch tile (default 8,
the f32 sublane count) rides the sublanes.  Message routing — the per-block
cyclic shift by the exponent table, the heart of the circulant design
(decoder/layout.py) — becomes a LANE roll instead of a sublane roll; the
shifts stay static, so it is still two ``pltpu.roll``s and a select, no
gathers.  Per-tile VMEM state is ``O(B*L*Pl * bt)`` floats — for the P=4201
probe code that is ~5.4 MB per edge tensor instead of ~86 MB, so the whole
BP loop stays VMEM-resident far past the old wall (P ~ 10^4 fits easily),
while per-op width ``(bt, Pl)`` keeps the VPU saturated (Pl >= 1152 lanes =
9+ native tiles per op).

Trade-off and dispatch rule: lane padding wastes ``Pl/P - 1`` of the compute
(23% at P=521, 2.3% at P=1051, 0.5% at P=4201), and bt=8 tiles early-exit at
coarser batch granularity than 128-lane tiles — so the transposed layout
only wins where the resident kernel cannot run.  ``min_sum_run_pallas``
dispatches here automatically when P exceeds the resident kernel's measured
wall (see ``WIDE_MIN_P`` there).

Numerics are bit-identical to decoder/min_sum.py's XLA loop for the undamped
path (same prefix/suffix leave-one-out order, same op set — transposition
does not reassociate anything); the damped path matches to ~1 ulp per
iteration exactly like the resident kernel (FMA fusion of the blend differs
between surrounding graphs; every relay repair is gated by an exact syndrome
re-encode).  Replaces the reference's per-edge CUDA threads
(``kernels.cu:95-250``) at code sizes the reference's dense O(n^2) arrays
could never reach (``Quantum_LDPC_Code.h:22-24``; SURVEY §5 scaling analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qec_ldpc_tpu.decoder.layout import CirculantGraph
from qec_ldpc_tpu.decoder.min_sum import np_log_band


def _build_kernel(graph: CirculantGraph, max_iters: int, check_every: int,
                  band: float, alpha: float, Pl: int, bt: int, damped: bool):
    B, L, P = graph.B, graph.L, graph.P
    NB = B * L

    def kernel(*refs):
        if damped:
            (prior_ref, sgn_ref, dmp_ref, v_out_ref, iters_ref,
             v_ref, e_ref, done_ref) = refs
        else:
            (prior_ref, sgn_ref, v_out_ref, iters_ref,
             v_ref, e_ref, done_ref) = refs
        prior_llr = prior_ref[0]
        lanes_blk = jax.lax.broadcasted_iota(jnp.int32, (bt, Pl), 1)

        def route(x, c):
            """y[:, q] = x[:, (q - c) % P] on lanes < P; GARBAGE on pad lanes
            (valid lanes never read pads; every consumer is lane-elementwise
            and the convergence scan / output slice mask or drop pads) —
            the lane-axis image of min_sum_pallas.route."""
            c = int(c) % P
            if c == 0:
                return x
            r1 = pltpu.roll(x, c, 1)
            r2 = pltpu.roll(x, (c - P) % Pl, 1)
            return jnp.where(lanes_blk < c, r2, r1)

        # init: prior LLR on valid lanes, 0 on pad lanes
        lanes3 = jax.lax.broadcasted_iota(jnp.int32, (NB, bt, Pl), 2)
        v_ref[:] = jnp.where(lanes3 < P, prior_llr, 0.0)
        done_ref[:] = jnp.zeros((bt, 128), jnp.float32)

        def iteration(last, masked):
            """One min-sum iteration; both flags STATIC (same structure as
            min_sum_pallas.iteration: unmasked until the first convergence
            event, posterior formation hoisted as one epilogue call)."""
            done = done_ref[:, 0:1] > 0.5 if masked else None
            # -- check-node: normalized min-sum (decoder/min_sum.py rules) --
            for b in range(B):
                ts = [v_ref[b * L + l] for l in range(L)]
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
                sgn_b = sgn_ref[b * bt:(b + 1) * bt, :]
                for l in range(L):
                    loo_sgn = pre_s[l] * suf_s[l]
                    loo_min = jnp.minimum(pre_m[l], suf_m[l])
                    e_ref[b * L + l] = sgn_b * (alpha * loo_sgn * loo_min)

            # -- variable-node: prior + leave-one-out sums over block rows --
            for l in range(L):
                evs = [route(e_ref[b * L + l], graph.table[b, l])
                       for b in range(B)]
                zeros = jnp.zeros_like(evs[0])
                pre = [zeros] * B
                for i in range(1, B):
                    pre[i] = pre[i - 1] + evs[i - 1]
                suf = [zeros] * B
                for i in range(B - 2, -1, -1):
                    suf[i] = suf[i + 1] + evs[i + 1]
                full = (pre[-1] + suf[-1]) + evs[-1]  # suf[-1] is 0
                for b in range(B):
                    vv = prior_llr + (full if last else pre[b] + suf[b])
                    i = b * L + l
                    rolled = route(vv, P - int(graph.table[b, l]))
                    if damped or masked:
                        old = v_ref[i]
                        if damped:
                            d = dmp_ref[i * bt:(i + 1) * bt, :]
                            rolled = d * old + (1.0 - d) * rolled
                        if masked:
                            rolled = jnp.where(done, old, rolled)
                    v_ref[i] = rolled

        def not_converged():
            # per batch row: some valid-lane message with |llr| < band (the
            # LLR image of the reference band test, DecoderCPU.h:231-246)
            v = v_ref[:]
            inside = (jnp.abs(v) < band) & (lanes3 < P)
            per_blk = jnp.any(inside, axis=2, keepdims=True)   # (NB, bt, 1)
            return jnp.any(per_blk, axis=0)                    # (bt, 1)

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
                prev = done_ref[:, 0:1]
                done_ref[:, 0:1] = jnp.maximum(prev, conv)

            alldone = (jnp.min(done_ref[:, 0:1]) > 0.5).astype(jnp.int32)
            anydone = (jnp.max(done_ref[:, 0:1]) > 0.5).astype(jnp.int32)
            return n + 1, alldone, anydone

        n_loop, alldone, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

        # posterior epilogue (reference n == N-1), only if some lane is live
        @pl.when(alldone == 0)
        def _():
            iteration(True, masked=True)

        n_final = jnp.where(alldone == 0, n_loop + 1, n_loop)

        for i in range(NB):
            v_out_ref[i * bt:(i + 1) * bt, :] = v_ref[i]
        iters_ref[:] = jnp.full((bt, 128), n_final, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("graph", "max_iters", "check_every", "conv_low",
                     "alpha", "tile_batch", "interpret"))
def min_sum_run_wide_pallas(
    graph: CirculantGraph,
    syndrome: jnp.ndarray,   # (num_checks, batch) in {0,1}
    prior: jnp.ndarray,      # scalar channel error prob (already 2/3-scaled)
    max_iters: int,
    check_every: int = 10,
    conv_low: float = 0.01,
    alpha: float = 0.75,
    tile_batch: int = 8,
    interpret: bool = False,
    damping: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in equivalent of ``min_sum_run_pallas`` for large P.

    Same contract: returns (v_final LLRs (num_edges, batch) check-indexed,
    iters (batch,) per-tile executed iteration counts).  ``tile_batch`` here
    is the SUBLANE tile (batch rows per grid step; default 8 = one f32
    sublane group) — per-tile VMEM is ~``3 * B*L*Pl * tile_batch * 4`` bytes.

    ``damping``: optional check-indexed (num_edges, batch) f32 memory
    coefficients (the relay engine), matching ``min_sum_run(damping=...)``
    to ~1 ulp per iteration (NOT bit-identical — FMA fusion of the blend
    differs; see kernels/min_sum_pallas.py docstring).
    """
    num_checks, batch = syndrome.shape
    B, L, P = graph.B, graph.L, graph.P
    NB = B * L
    bt = min(tile_batch, batch)
    if batch % bt != 0:
        raise ValueError(f"batch {batch} not divisible by tile_batch {bt}")
    num_tiles = batch // bt
    Pl = -(-P // 128) * 128
    damped = damping is not None

    band = float(np_log_band(conv_low))
    kernel = _build_kernel(graph, max_iters, check_every, band, alpha, Pl,
                           bt, damped)
    prior_f = jnp.asarray(prior, jnp.float32)
    prior_llr = jnp.reshape(jnp.log1p(-prior_f) - jnp.log(prior_f), (1,))

    # Stage syndrome signs outside the kernel, TILE-MAJOR 2D: every
    # XLA-visible operand/result of this kernel is rank-2 (rows, Pl).
    # This is LOAD-BEARING, not style: with rank-3 blocks ((B, bt, Pl) etc.)
    # the compiled program MISREAD the kernel's output when consumed
    # in-program at some shapes — measured at (B=5, P in {1301, 2081,
    # 2111, 2131}): in-program hard decisions differed from the
    # bit-identical fetched-to-host values of the same buffer, and
    # co-residence with the XLA while_loop engine crashed the TPU worker.
    # Every long-proven kernel in this repo uses rank-2 XLA-visible
    # buffers; rank-3 was this kernel's one novelty (r5 fault hunt).
    s3 = syndrome.astype(jnp.float32).reshape(B, P, batch).transpose(0, 2, 1)
    sign = jnp.pad(1.0 - 2.0 * s3, ((0, 0), (0, 0), (0, Pl - P)),
                   constant_values=1.0)
    sign2 = sign.reshape(B, num_tiles, bt, Pl).transpose(1, 0, 2, 3)
    sign2 = sign2.reshape(num_tiles * B * bt, Pl)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((B * bt, Pl), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [prior_llr, sign2]
    if damped:
        d3 = damping.astype(jnp.float32).reshape(NB, P, batch)
        d3 = jnp.pad(d3.transpose(0, 2, 1), ((0, 0), (0, 0), (0, Pl - P)))
        d2 = d3.reshape(NB, num_tiles, bt, Pl).transpose(1, 0, 2, 3)
        d2 = d2.reshape(num_tiles * NB * bt, Pl)
        in_specs.append(pl.BlockSpec((NB * bt, Pl), lambda t: (t, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(d2)

    scratch_shapes = [
        pltpu.VMEM((NB, bt, Pl), jnp.float32),  # V messages
        pltpu.VMEM((NB, bt, Pl), jnp.float32),  # E messages
        pltpu.VMEM((bt, 128), jnp.float32),     # done mask (col 0)
    ]
    # declared VMEM: scratch + in/out blocks (x2 for pipelining buffers);
    # wider headroom than the resident kernel: measured at P=1051/bt=32 the
    # compiler's stack allocation ran 2.5 MB past declared*1.5 + 16 MiB
    blk_bytes = NB * bt * Pl * 4
    declared = (2 * blk_bytes + bt * 128 * 4
                + 2 * (B * bt * Pl * 4 + blk_bytes + bt * 128 * 4)
                + (2 * blk_bytes if damped else 0))
    vmem_limit = min(120 * 1024 * 1024,
                     max(declared + (24 << 20), declared * 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((NB * bt, Pl), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
    )
    v_out, iters = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles * NB * bt, Pl), jnp.float32),
            jax.ShapeDtypeStruct((batch, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*inputs)
    # back to the flat check-indexed (num_edges, batch) edge-tensor layout:
    # (tile, blk, row, lane) -> (blk, lane, tile, row)
    v4 = v_out.reshape(num_tiles, NB, bt, Pl)[:, :, :, :P]
    v_final = v4.transpose(1, 3, 0, 2).reshape(graph.num_edges, batch)
    return v_final, iters[:, 0]
