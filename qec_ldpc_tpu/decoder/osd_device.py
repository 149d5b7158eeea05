"""Device (TPU) OSD-0: batched GF(2) elimination as packed-int32 bitwise ops.

VERDICT r4 #3: the quality mode's OSD solve ran only on the host
(``native/gf2.cpp::qec_osd_batch``, OpenMP over lanes) and this container's
2 cores made heavy-weight sweeps host-bound — W=50 on the [[610,61]] code
measured 3.6k samples/s vs 205k at W=10 (``quality_sweep_r4.jsonl``).  OSD-0
is column reduction: pure XOR/AND bit arithmetic a TPU executes as wide
uint32 vector ops, batched over failed lanes.

Algorithm (per lane, vectorized over the batch): walk the reliability-ordered
columns of ``H`` doing one Gauss–Jordan pass — greedy pivot-row selection and
elimination of the pivot column from every other row — with the syndrome
carried as a separate per-row bit column that the same row operations update.
After the walk each pivot row reads its solution coefficient off its
syndrome bit; an unused row with a set syndrome bit means "unsolvable".

BIT-equivalence to the host solver (``decoder/osd.py::_osd_one_np`` /
``qec_osd_batch``): row operations preserve every linear relation among
columns, so the greedy first-linearly-independent column set is exactly the
host's (it is a pure function of the column order), and the OSD-0 solution
over a full-column-rank ``H_S`` is unique — corrections and solved flags
match the host path bit for bit (tests/test_osd.py).  The ``lam > 0``
combination sweep stays on the host (a tiny per-lane search over ≤ lam²
candidates after the same OSD-0 reduction).

TPU-shape notes (measured on the chip; the naive form ran at host speed):

* the m parity rows ride the 128-lane axis and the packed column-words ride
  sublanes — every per-step mask/reduction/broadcast is per-row;
* the column walk is PYTHON-UNROLLED in 32-column word blocks: a fused
  block of 32 unrolled steps amortizes the per-XLA-loop-iteration overhead
  that dominated a ``while_loop`` formulation (~280 µs/column);
* the active window SHRINKS: columns already walked are never read again
  (the syndrome is separate state), so block k drops word k-1 from the
  carry — the elimination's O(n·m·n/32) word traffic halves;
* blocks are skipped via ``lax.cond`` once every lane has found all
  ``rank(H)`` pivots — rank is order-independent, so it is computed ONCE on
  the host at construction and baked in as the exit bound;
* no gathers anywhere in the walk (the TPU compiler cannot take gathers in
  loop bodies); the two the algorithm needs — ordering H's columns and
  un-permuting the solution — run OUTSIDE as ``jnp.take`` /
  ``take_along_axis``.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

#: device batches are processed in padded slices of these many lanes (two
#: compiled shapes per (m, n): small-failure chunks and bulk).  Large bulk
#: slices amortize the tunneled runtime's per-dispatch latency (~40 ms).
_SLICE = 2048
_SLICE_SMALL = 256


def _pack_rows_words(bits: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """(..., nbits) 0/1 int -> (..., w) int32 32-bit words, little-endian
    bits (the fused kernel's packing; bit patterns, sign irrelevant)."""
    w = -(-nbits // 32)
    pad = w * 32 - nbits
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1)
    b = bits.reshape(*bits.shape[:-1], w, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    packed = jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


@lru_cache(maxsize=64)
def _solver(m: int, n: int, rank: int):
    """Jitted OSD-0 solver for an (m, n) parity-check shape of known rank.

    Ordering, bit-packing, and solution read-off run as one-shot XLA ops;
    the sequential column walk runs in the fused Pallas kernel
    (kernels/osd0_pallas.py), which keeps the packed system in VMEM for the
    whole walk — the XLA-only formulations round-tripped it through HBM
    every column and bottomed out at host speed.
    """

    def _core(h_bits: jnp.ndarray,      # (m, n) int32 0/1
              syndromes: jnp.ndarray,   # (m, B) int32 0/1
              order: jnp.ndarray,       # (B, n) int32
              inv_order: jnp.ndarray):  # (B, n) int32
        from qec_ldpc_tpu.kernels.osd0_pallas import osd0_eliminate_pallas

        h_ord = jnp.take(h_bits, order, axis=1)          # (m, B, n)
        M = _pack_rows_words(h_ord.transpose(1, 0, 2), n)  # (B, m, w) int32
        planes = jnp.concatenate(
            [M, syndromes.T[:, :, None].astype(jnp.int32)], axis=2)
        packed = planes.transpose(0, 2, 1)               # (B, w+1, m)
        s_f, used, pivcol = osd0_eliminate_pallas(
            packed, m, n, rank,
            interpret=(jax.default_backend() == "cpu"))
        solved = ~jnp.any(~used & s_f, axis=1)
        # read off: e_ordered[c] = syndrome bit of the row whose pivot is c
        contrib = s_f[:, :, None] & (
            pivcol[:, :, None] == jnp.arange(n, dtype=jnp.int32)[None, None])
        e_ordered = jnp.any(contrib, axis=1)             # (B, n)
        e = jnp.take_along_axis(e_ordered, inv_order, axis=1)
        e = jnp.where(solved[:, None], e, False)
        return e.astype(jnp.int8), solved

    solve = jax.jit(_core)

    @jax.jit
    def solve_rel(h_bits, syndromes, reliability, idx):
        """Device-resident variant: gathers lane subset ``idx`` out of the
        full (compacted) ``syndromes (m, Bc)`` / ``reliability (n, Bc)``
        and ranks with a STABLE argsort (identical tie-breaking to the
        host's ``np.argsort(kind='stable')``, so results stay
        bit-identical).  Everything lives INSIDE one jit: sorts compile
        slowly on TPU and an eager per-shape sort recompiled on every
        distinct failed-lane count (measured ~40 s/chunk before this, r5);
        eager gathers each paid the ~40 ms tunnel dispatch latency."""
        syn = jnp.take(syndromes, idx, axis=1).astype(jnp.int32)
        rel = jnp.take(reliability, idx, axis=1)
        order = jnp.argsort(rel, axis=0, stable=True).T
        order = order.astype(jnp.int32)
        inv_order = jnp.argsort(order, axis=1).astype(jnp.int32)
        return _core(h_bits, syn, order, inv_order)

    return solve, solve_rel


def _gf2_rank(h: np.ndarray) -> int:
    from qec_ldpc_tpu import native

    out = native.gf2_rref(h)
    if out is not None:
        return len(out[1])
    from qec_ldpc_tpu.codes.construction import gf2_rref

    return len(gf2_rref(h)[1])


class DeviceOSD0:
    """Batched device OSD-0 for one parity-check matrix.

    Same contract as the host :class:`~qec_ldpc_tpu.decoder.osd.OSDecoder`
    restricted to ``lam == 0``; constructed from the dense H once.
    """

    def __init__(self, h_dense: np.ndarray):
        h = np.ascontiguousarray(np.asarray(h_dense, dtype=np.int32) % 2)
        self.m, self.n = h.shape
        self.rank = _gf2_rank(h)
        self._h = jnp.asarray(h)
        self._solve, self._solve_rel = _solver(self.m, self.n, self.rank)

    def decode(self, syndromes: np.ndarray, order: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
        """syndromes (m, B) 0/1; order (B, n) int32 most-likely-error-first
        (the caller computes it from BP reliabilities exactly as for the host
        solver).  Returns ((n, B) uint8 corrections, (B,) bool solved).

        NOTE: host-array entry point — every slice ships ~5 MB of order
        arrays host->device, which costs ~0.2 s/slice through the tunneled
        runtime (~26 MB/s uplink).  Production uses
        :meth:`decode_device`, which keeps everything on device.
        """
        B = syndromes.shape[1]
        if B == 0:
            return np.zeros((self.n, 0), np.uint8), np.zeros(0, bool)
        inv_order = np.argsort(order, axis=1).astype(np.int32)
        return self._run_slices(
            B,
            lambda sl: (jnp.asarray(np.asarray(syndromes[:, sl], np.int32)),
                        jnp.asarray(np.asarray(order[sl], np.int32)),
                        jnp.asarray(inv_order[sl])))

    def decode_device(self, syndromes, reliability, failed: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Device-resident entry point: ``syndromes (m, Bc)`` and
        ``reliability (n, Bc)`` are jax arrays already on the accelerator
        (the quality-mode chunk's full compacted columns — FIXED width, so
        one compiled program per bucket size, not one per failed count);
        ``failed`` is the host-side array of lane indices to solve.  Lane
        gather, ranking (stable argsort) and the solve all run inside the
        jitted program; only the tiny index vector goes up and only the
        corrections come back.

        Returns ((n, len(failed)) uint8 corrections, (len(failed),) bool).
        """
        k = int(failed.size)
        if k == 0:
            return np.zeros((self.n, 0), np.uint8), np.zeros(0, bool)
        target = _SLICE_SMALL if k <= _SLICE_SMALL else _SLICE
        es, oks = [], []
        for lo in range(0, k, target):
            part = failed[lo:lo + target]
            bsz = part.size
            # pad the index set to the bucket size: pad lanes duplicate
            # lane 0 and their results are dropped
            idx = np.zeros(target, np.int32)
            idx[:bsz] = part
            e, ok = self._solve_rel(self._h, syndromes, reliability,
                                    jnp.asarray(idx))
            es.append(np.asarray(e)[:bsz])
            oks.append(np.asarray(ok)[:bsz])
        e = np.concatenate(es, axis=0)
        ok = np.concatenate(oks, axis=0)
        return e.T.astype(np.uint8), ok

    def decode_device_arrays(self, syndromes, reliability, failed: np.ndarray
                             ):
        """Like :meth:`decode_device` but the corrections STAY on device —
        for the fully-device repair path that splices and classifies there
        (parallel/montecarlo._device_repair_classify).  Returns
        ``(splice_idx (K,) np.int32, e (K, n) device int8, ok (K,) device
        bool)`` with K the bucket-padded count; pad entries solve lane 0
        (results valid but unwanted) and their splice_idx is -1 so callers
        can route them to a dump column."""
        k = int(failed.size)
        if k == 0:
            return None
        target = _SLICE_SMALL if k <= _SLICE_SMALL else _SLICE
        idxs, es, oks = [], [], []
        for lo in range(0, k, target):
            part = failed[lo:lo + target]
            bsz = part.size
            solve_idx = np.zeros(target, np.int32)
            solve_idx[:bsz] = part
            splice_idx = np.full(target, -1, np.int32)
            splice_idx[:bsz] = part
            e, ok = self._solve_rel(self._h, syndromes, reliability,
                                    jnp.asarray(solve_idx))
            idxs.append(splice_idx)
            es.append(e)
            oks.append(ok)
        if len(es) == 1:
            return idxs[0], es[0], oks[0]
        return (np.concatenate(idxs), jnp.concatenate(es),
                jnp.concatenate(oks))

    def _run_slices(self, B, get_slice):
        """Host-entry slicing/padding driver: two padded bucket shapes;
        padded lanes carry zero syndromes (trivially solved, e = 0) and are
        dropped from the outputs."""
        target = _SLICE_SMALL if B <= _SLICE_SMALL else _SLICE
        es, oks = [], []
        for lo in range(0, B, target):
            sl = slice(lo, min(lo + target, B))
            bsz = sl.stop - lo
            pad = target - bsz
            syn, ord_, inv = get_slice(sl)
            if pad > 0:
                syn = jnp.pad(syn, ((0, 0), (0, pad)))
                base = jnp.broadcast_to(
                    jnp.arange(self.n, dtype=jnp.int32)[None],
                    (pad, self.n))
                ord_ = jnp.concatenate([ord_, base])
                inv = jnp.concatenate([inv, base])
            e, ok = self._solve(self._h, syn, ord_, inv)
            es.append(np.asarray(e)[:bsz])
            oks.append(np.asarray(ok)[:bsz])
        e = np.concatenate(es, axis=0)
        ok = np.concatenate(oks, axis=0)
        return e.T.astype(np.uint8), ok
