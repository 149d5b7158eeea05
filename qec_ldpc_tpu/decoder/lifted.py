"""Generalized lifted-graph edge-tensor layout (beyond single circulants).

``decoder/layout.py``'s :class:`CirculantGraph` models the reference's code
family exactly: every PCM block is ONE P x P circulant permutation and every
block row hits every block column exactly once (``QEC_LDPC_CSS.cu:94-131``).
Modern quantum-LDPC families break both assumptions — e.g. bivariate bicycle
codes (IBM gross code family, arXiv:2308.07915) have blocks that are SUMS of
monomial permutations over the product group Z_l x Z_m.  This module
generalizes the layout to arbitrary **lifted graphs**:

  * the lift group is Z_P (``group=(P,)``) or Z_l x Z_m (``group=(l, m)``);
    a block is a |group|-sized permutation indexed by a group element
    ``shift``: check lane ``r`` connects to var lane ``(r + shift) % group``
    (flattened row-major for product groups) — the same convention as
    ``CirculantGraph`` (check r <-> var (C + r) % P);
  * edges are a list of (check_block, var_block, shift) **edge blocks**; a
    (check_block, var_block) pair may carry several edge blocks (sum of
    monomials) and a block row need not touch every block column;
  * check degree Dc (edge blocks per check row) and var degree Dv (edge
    blocks per var column) must each be uniform — true for all the regular
    LDPC families of interest and required for rectangular leave-one-out.

The public interface is duck-type identical to ``CirculantGraph`` (cn_view /
vn_view / to_var / to_check / expand_checks / expand_vars / syndrome plus the
``check_degree`` / ``var_degree`` widths), so the XLA decoders
(decoder/sum_product.py, decoder/min_sum.py, decoder/decode.py) and the
Monte-Carlo/relay/OSD stack run on lifted graphs unchanged.  Everything
remains static-shape and gather-free: routing is per-block cyclic rolls
(1-D slices+concat; product groups roll each axis of the (l, m) lane grid),
plus a static block permutation between check-major and var-major edge order.

Layouts:
  * check-major (the storage order): edge blocks sorted by check block, Dc
    consecutive blocks per check row -> ``cn_view`` reshapes to (C, Dc, ...).
  * var-major (produced by ``to_var``): position (i, v) holds var block v's
    rank-i incident edge (ranks assigned in check-major order), so
    ``vn_view`` reshapes to (Dv, V*P, ...) with axis 0 = incidence index —
    for a circulant graph this reproduces CirculantGraph's (B, L*P) layout
    exactly (rank == block row).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import lax


def _normalize_shift(shift, group: tuple[int, ...]) -> tuple[int, ...]:
    if isinstance(shift, (int, np.integer)):
        shift = (int(shift),)
    shift = tuple(int(s) % g for s, g in zip(shift, group, strict=True))
    return shift


def _neg(shift: tuple[int, ...], group: tuple[int, ...]) -> tuple[int, ...]:
    return tuple((-s) % g for s, g in zip(shift, group))


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash for jit static args
class LiftedGraph:
    """Static message-routing data for one lifted (generalized QC) PCM."""

    #: lift group: (P,) for Z_P, (l, m) for Z_l x Z_m
    group: tuple[int, ...]
    num_check_blocks: int
    num_var_blocks: int
    #: edge blocks in check-major order
    check_blocks: tuple[int, ...]
    var_blocks: tuple[int, ...]
    shifts: tuple[tuple[int, ...], ...]
    #: uniform degrees
    check_degree: int
    var_degree: int
    #: var-major order: _var_rank_edges[i*V + v] = check-major edge id of var
    #: block v's rank-i incident edge; _var_pos = its inverse permutation
    _var_rank_edges: tuple[int, ...]
    _var_pos: tuple[int, ...]

    @staticmethod
    def build(
        num_check_blocks: int,
        num_var_blocks: int,
        group: tuple[int, ...] | int,
        edges: list[tuple[int, int, object]],
    ) -> "LiftedGraph":
        """``edges``: (check_block, var_block, shift) triples; shift is an int
        (Z_P) or a tuple matching ``group``.  Stable-sorted into check-major
        order; degrees must come out uniform."""
        if isinstance(group, int):
            group = (group,)
        group = tuple(int(g) for g in group)
        order = sorted(range(len(edges)), key=lambda e: edges[e][0])
        cb = tuple(int(edges[e][0]) for e in order)
        vb = tuple(int(edges[e][1]) for e in order)
        sh = tuple(_normalize_shift(edges[e][2], group) for e in order)
        counts_c = np.bincount(cb, minlength=num_check_blocks)
        counts_v = np.bincount(vb, minlength=num_var_blocks)
        if len(set(counts_c)) != 1:
            raise ValueError(f"non-uniform check degrees {sorted(set(counts_c))}")
        if len(set(counts_v)) != 1:
            raise ValueError(f"non-uniform var degrees {sorted(set(counts_v))}")
        dc, dv = int(counts_c[0]), int(counts_v[0])
        # rank-major var order: for rank i, var blocks 0..V-1
        incident: list[list[int]] = [[] for _ in range(num_var_blocks)]
        for e, v in enumerate(vb):
            incident[v].append(e)
        var_rank_edges = tuple(
            incident[v][i] for i in range(dv) for v in range(num_var_blocks)
        )
        var_pos = [0] * len(cb)
        for p, e in enumerate(var_rank_edges):
            var_pos[e] = p
        return LiftedGraph(
            group=group,
            num_check_blocks=num_check_blocks,
            num_var_blocks=num_var_blocks,
            check_blocks=cb,
            var_blocks=vb,
            shifts=sh,
            check_degree=dc,
            var_degree=dv,
            _var_rank_edges=var_rank_edges,
            _var_pos=tuple(var_pos),
        )

    @staticmethod
    def from_circulant(table: np.ndarray, P: int) -> "LiftedGraph":
        """A CirculantGraph-equivalent lifted graph (testing/parity aid):
        block row b, column l, shift table[b, l] — identical edge order and
        var-major layout to ``CirculantGraph.from_table(table, P)``."""
        table = np.asarray(table)
        B, L = table.shape
        edges = [(b, l, int(table[b, l])) for b in range(B) for l in range(L)]
        return LiftedGraph.build(B, L, (P,), edges)

    # -- sizes ------------------------------------------------------------

    @property
    def P(self) -> int:
        p = 1
        for g in self.group:
            p *= g
        return p

    @property
    def num_checks(self) -> int:
        return self.num_check_blocks * self.P

    @property
    def num_vars(self) -> int:
        return self.num_var_blocks * self.P

    @property
    def num_edge_blocks(self) -> int:
        return len(self.check_blocks)

    @property
    def num_edges(self) -> int:
        return self.num_edge_blocks * self.P

    # -- static-roll primitives -------------------------------------------

    def _chunk(self, x: jnp.ndarray, i: int) -> jnp.ndarray:
        P = self.P
        return lax.slice_in_dim(x, i * P, (i + 1) * P, axis=0)

    def _roll(self, x: jnp.ndarray, shift: tuple[int, ...]) -> jnp.ndarray:
        """out[r] = x[(r + shift) % group] on a (P, batch) chunk, r flattened
        row-major over the group.  Static shifts -> slices + concats."""
        if len(self.group) == 1:
            (P,) = self.group
            s = shift[0] % P
            if s == 0:
                return x
            return jnp.concatenate(
                [lax.slice_in_dim(x, s, P, axis=0),
                 lax.slice_in_dim(x, 0, s, axis=0)], axis=0)
        l, m = self.group
        a, b = shift
        y = x.reshape(l, m, *x.shape[1:])
        # out[i] = y[(i + a) % l]  <=>  jnp.roll(y, -a) (static python shift)
        if a:
            y = jnp.roll(y, -a, axis=0)
        if b:
            y = jnp.roll(y, -b, axis=1)
        return y.reshape(x.shape)

    def to_var(self, x: jnp.ndarray) -> jnp.ndarray:
        """Check-indexed check-major -> var-indexed var-major(rank-major)."""
        chunks = [
            self._roll(self._chunk(x, e), _neg(self.shifts[e], self.group))
            for e in self._var_rank_edges
        ]
        return jnp.concatenate(chunks, axis=0)

    def to_check(self, x: jnp.ndarray) -> jnp.ndarray:
        """Var-indexed var-major -> check-indexed check-major (inverse)."""
        chunks = [
            self._roll(self._chunk(x, self._var_pos[e]), self.shifts[e])
            for e in range(self.num_edge_blocks)
        ]
        return jnp.concatenate(chunks, axis=0)

    # -- graph-structured linear ops ----------------------------------------

    def syndrome(self, errors: jnp.ndarray) -> jnp.ndarray:
        """Mod-2 syndrome (num_vars, batch) -> (num_checks, batch):
        S[c*P + r] = XOR over the row's edge blocks of
        errors[vb*P + (r + shift) % group]."""
        rows = []
        e = 0
        for c in range(self.num_check_blocks):
            acc = None
            for _ in range(self.check_degree):
                blk = self._roll(self._chunk(errors, self.var_blocks[e]),
                                 self.shifts[e])
                acc = blk if acc is None else acc + blk
                e += 1
            rows.append(acc)
        return jnp.concatenate(rows, axis=0) % 2

    # -- flat <-> structured views ------------------------------------------

    def cn_view(self, x: jnp.ndarray) -> jnp.ndarray:
        """(num_edges, batch) check-major -> (C, Dc, P*batch)."""
        return x.reshape(self.num_check_blocks, self.check_degree, -1)

    def vn_view(self, x: jnp.ndarray) -> jnp.ndarray:
        """(num_edges, batch) var-major -> (Dv, V*P, batch), axis 0 =
        incidence rank (the leave-one-out axis)."""
        return x.reshape(self.var_degree, self.num_vars, -1)

    def expand_checks(self, s: jnp.ndarray) -> jnp.ndarray:
        """Per-check (C*P, batch) -> per-edge check-major (num_edges, batch)."""
        c_p = s.reshape(self.num_check_blocks, 1, self.P, -1)
        full = jnp.broadcast_to(
            c_p, (self.num_check_blocks, self.check_degree, self.P, s.shape[-1]))
        return full.reshape(self.num_edges, -1)

    def expand_vars(self, g: jnp.ndarray) -> jnp.ndarray:
        """Per-variable (V*P, batch) -> CHECK-indexed per-edge rows."""
        full = jnp.broadcast_to(g[None], (self.var_degree, *g.shape))
        return self.to_check(full.reshape(self.num_edges, -1))

    # -- dense export (tests / GF(2) algebra) --------------------------------

    def dense_pcm(self) -> np.ndarray:
        """Expand to the dense binary PCM (num_checks x num_vars)."""
        P = self.P
        pcm = np.zeros((self.num_checks, self.num_vars), dtype=np.int8)
        # flattened group index of (r + shift) for every r
        idx = np.arange(P)
        coords = np.unravel_index(idx, self.group)
        for e in range(self.num_edge_blocks):
            sh = self.shifts[e]
            tgt = np.ravel_multi_index(
                tuple((c + s) % g for c, s, g in zip(coords, sh, self.group)),
                self.group)
            pcm[self.check_blocks[e] * P + idx, self.var_blocks[e] * P + tgt] ^= 1
        return pcm
