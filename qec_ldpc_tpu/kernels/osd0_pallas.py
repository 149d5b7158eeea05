"""Fused Pallas kernel for batched GF(2) OSD-0 elimination.

The XLA formulations of the device OSD-0 walk (decoder/osd_device.py
docstring) bottomed out at ~3k lanes/s on the chip — every one of the ~n
sequential column steps round-trips the packed system through HBM, and even
a VMEM-resident variant was bound by ~24 separate cross-lane reductions per
column (per-word masked pivot-row extraction plus bookkeeping max/argmax,
each with fixed lowering overhead).  This kernel keeps the whole per-tile
state in VMEM for the entire walk and compresses the serial per-column work
to three fused passes:

* ONE lane-argmax picks each lane's first unused pivot row; the pivot
  one-hot needs no validity reduction (``oh_p = (cols == argmax) · cand``
  is all-zero exactly when no candidate row exists);
* ONE fused 3D masked reduction ``mp[j] = Σ_m ms[j] · oh_p`` extracts the
  pivot row across ALL packed words at once (exact: the mask is one-hot);
* ONE fused XOR pass eliminates the pivot column from every other row
  holding it.

The syndrome rides as an extra word-plane of the system, so the same
elimination rule updates it for free.  The full-rank early-exit check runs
once per 8-column unrolled body; pad columns (n rounded up to whole words)
have zero bits everywhere, so they can never pivot and need no bound guard.
Batch tiles are large (256 sublane rows) — per-tile state is only
``(w+2) * bt * m * 4`` bytes, and big tiles amortize the loop overhead that
dominated small ones.

The value stream is the same swap-free Gauss–Jordan as the host solvers, so
results are BIT-identical (the greedy pivot set is a pure function of the
column order; the OSD-0 solution is unique; every device op here is exact
integer/bit arithmetic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: columns walked per while-loop body (the rank early-exit check runs once
#: per body; pad columns are harmless no-ops)
_UNROLL = 8


def _build_kernel(m: int, n: int, w: int, rank: int, bt: int):
    W = w + 1  # + syndrome word-plane

    def kernel(m_ref, out_ref, ms_ref, used_ref, piv_ref):
        # ms_ref (W, bt, m) int32: packed 32-bit words + syndrome plane
        for j in range(W):
            ms_ref[j] = m_ref[:, j, :]
        used_ref[:] = jnp.zeros((bt, m), jnp.int32)
        piv_ref[:] = jnp.full((bt, m), n + 1, jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1)
        n32 = w * 32

        def cond(base):
            got = jnp.sum(used_ref[:].astype(jnp.float32), axis=1,
                          keepdims=True)
            return (base < n32) & (jnp.min(got) < rank)

        def body(base):
            for i in range(_UNROLL):
                c = base + i
                k = c // 32
                b = c % 32
                word = ms_ref[k]                         # (bt, m) dynamic idx
                bits = (word >> b) & 1                   # int32 0/1
                cand = bits & (1 - used_ref[:])          # int32 0/1
                # Mosaic argmax only lowers for f32 operands
                p = jnp.argmax(cand.astype(jnp.float32), axis=1,
                               keepdims=True)            # first max
                # all-zero when no candidate: no validity reduction needed
                oh_p = jnp.where(cols == p, cand, 0)
                # pivot row across ALL word-planes: one fused 3D reduction
                # (one-hot mask -> exactly one contributing row)
                mp = jnp.sum(ms_ref[:] * oh_p[None, :, :], axis=2,
                             keepdims=True)              # (W, bt, 1)
                elim = bits & (1 - oh_p)                 # (bt, m) 0/1
                for j in range(W):
                    ms_ref[j] = ms_ref[j] ^ (elim * mp[j])
                piv_ref[:] = jnp.where(oh_p > 0, c, piv_ref[:])
                used_ref[:] = used_ref[:] | oh_p
            return base + _UNROLL

        jax.lax.while_loop(cond, body, jnp.int32(0))
        out_ref[0] = ms_ref[W - 1]                       # reduced syndrome
        out_ref[1] = used_ref[:]
        out_ref[2] = piv_ref[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("m", "n", "rank", "tile_batch",
                                    "interpret"))
def osd0_eliminate_pallas(
    packed: jnp.ndarray,     # (B, w+1, m) int32: word-planes + syndrome
    m: int, n: int, rank: int,
    tile_batch: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused elimination.  Returns (s_final (B, m) bool reduced
    syndrome bits, used (B, m) bool pivot-row mask, pivcol (B, m) int32 —
    the ordered-column index of each pivot row, > n where unused)."""
    B, W, _ = packed.shape
    bt = min(tile_batch, B)
    if B % bt != 0:
        raise ValueError(f"batch {B} not divisible by tile {bt}")
    kernel = _build_kernel(m, n, W - 1, rank, bt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, W, m), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, bt, m), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, bt, m), jnp.int32),
            pltpu.VMEM((bt, m), jnp.int32),
            pltpu.VMEM((bt, m), jnp.int32),
        ],
    )
    # declared VMEM: double-buffered in/out blocks + scratch, with headroom
    # (the 16 MiB default tripped at bt=256 x m=305)
    declared = (2 * bt * W * m + 2 * 3 * bt * m
                + W * bt * m + 2 * bt * m) * 4
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3, B, m), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(110 << 20,
                                 max(declared * 3 // 2, declared + (16 << 20)))),
        interpret=interpret,
    )(packed)[0]
    return out[0] == 1, out[1] == 1, out[2]
