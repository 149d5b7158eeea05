"""Full X/Z decode with hard decision and error-code flags.

Reproduces the semantics of ``DecoderCPU::Decode`` (``DecoderCPU.h:317-390``):
decode the X and Z syndromes with BP, hard-decide each variable as flipped if
**any** of its incident messages >= 0.5 (the reference's any-edge quirk,
DecoderCPU.h:354-373 — not a posterior mean), flag per-sample convergence
failures from a final CheckConvergence pass, and flag syndrome failures by
re-encoding the decision and comparing syndromes.

The reference runs X and Z as two OpenMP sections (DecoderCPU.h:329-345); here
they are two batched BP runs inside one jit — XLA schedules them back to back
on the same chip, and the batch axis supplies the parallelism.

ErrorCode bitmask matches ``Decoder.h:14-23``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from qec_ldpc_tpu.codes.css import QuantumLDPCCode
from qec_ldpc_tpu.decoder.layout import CirculantGraph
from qec_ldpc_tpu.decoder.min_sum import (
    _not_converged_mask_llr,
    min_sum_run,
    np_log_band,
)
from qec_ldpc_tpu.decoder.sum_product import BPConfig, _not_converged_mask, bp_run

# ErrorCode bit flags (Decoder.h:14-23)
SUCCESS = 0
SYNDROME_FAIL_X = 1
SYNDROME_FAIL_Z = 2
CONVERGENCE_FAIL_X = 4
CONVERGENCE_FAIL_Z = 8


@dataclasses.dataclass(frozen=True, eq=False)
class CodeGraphs:
    """Static decode-time structure for one code: the X and Z circulant graphs."""

    code: QuantumLDPCCode
    x: CirculantGraph
    z: CirculantGraph

    @staticmethod
    def build(code: QuantumLDPCCode) -> "CodeGraphs":
        return CodeGraphs(
            code=code,
            x=CirculantGraph.from_table(code.hc, code.P),
            z=CirculantGraph.from_table(code.hd, code.P),
        )


@partial(jax.tree_util.register_dataclass,
         data_fields=("decisions_x", "decisions_z", "error_code", "iters_x",
                      "iters_z", "iter_samples_x", "iter_samples_z",
                      "soft_x", "soft_z"),
         meta_fields=())
@dataclasses.dataclass
class DecodeResult:
    """Batched decode output; all arrays have trailing batch axis."""

    decisions_x: jnp.ndarray  # (num_vars, batch) int8 hard decisions
    decisions_z: jnp.ndarray
    error_code: jnp.ndarray   # (batch,) int32 bitmask
    iters_x: jnp.ndarray      # () max iterations executed by any batch lane
    iters_z: jnp.ndarray
    #: () total executed lane-iterations (sum over batch of each lane's
    #: iteration count) — the HONEST work measure under early exit
    #: (SURVEY §7: masked/executed iterations must be counted faithfully;
    #: Pallas tiles exit independently, so this can be < iters * batch)
    iter_samples_x: jnp.ndarray
    iter_samples_z: jnp.ndarray
    #: (num_vars, batch) float32 posterior-LLR proxies (smaller = more likely
    #: in error), only with cfg.return_soft — consumed by OSD (decoder/osd.py)
    soft_x: jnp.ndarray | None = None
    soft_z: jnp.ndarray | None = None


def kernel_consts(graphs: CodeGraphs, cfg: BPConfig):
    """Runtime operand pytree for the fused-kernel decode path.

    The Pallas kernel routes messages with per-block permutation-matrix
    stacks (~MBs for large codes).  When ``decode_batch`` is called inside an
    outer jit (Monte-Carlo scans, benchmarks), fetch this OUTSIDE the jit and
    pass it through as a traced argument — otherwise the stacks are baked
    into the HLO as multi-megabyte constants, making remote compilation slow
    and uncacheable (see kernels.bp_pallas.roll_operand).  Returns None when
    the config doesn't use the kernel.
    """
    if (cfg.algorithm != "min-sum" and cfg.kernel == "pallas"
            and cfg.kernel_roll_impl == "mxu"
            and isinstance(graphs.x, CirculantGraph)):
        # lifted graphs take the XLA fallback in _decode_one_graph and have
        # no mxu roll operands
        from qec_ldpc_tpu.kernels.bp_pallas import roll_operand

        return {"x": jnp.asarray(roll_operand(graphs.x)),
                "z": jnp.asarray(roll_operand(graphs.z))}
    # the default "shift" routing needs no runtime operands
    return None


def _lane_sort(syndrome: jnp.ndarray):
    """(perm, inv): batch-lane permutation grouping lanes by syndrome weight.

    The fused kernels early-exit per batch tile when ALL of a tile's lanes
    have converged, so one slow lane holds its whole tile at the iteration
    cap.  Syndrome weight is a strong (and free) predictor of BP convergence
    time; sorting by it clusters slow lanes into few tiles so the rest exit
    early.  Per-lane decode trajectories are independent of batch position,
    so permute-decode-invert is bit-identical to decoding in place — only the
    executed-work accounting changes (and shrinks)."""
    weight = jnp.sum(syndrome, axis=0)
    perm = jnp.argsort(weight)
    inv = jnp.argsort(perm)
    return perm, inv


def _decode_one_graph(graph, syndrome, prior, cfg: BPConfig, rolls=None):
    # the layered schedule is specialized to single-circulant graphs; lifted
    # graphs (decoder/lifted.py, e.g. bivariate bicycle codes) decode via
    # flooding — both flooding kernels dispatch to lifted-capable fused
    # variants (kernels/lifted_{bp,min_sum}_pallas.py)
    is_circulant = isinstance(graph, CirculantGraph)
    if not is_circulant and cfg.algorithm == "layered-min-sum":
        raise ValueError(
            "layered-min-sum requires a CirculantGraph (block-row layers of "
            "a lifted graph are not variable-disjoint); use algorithm="
            "'min-sum' for lifted codes")
    # sorted-lane view fed to the fused kernels; outputs are un-permuted
    # immediately after each kernel call, so everything downstream (hard
    # decision, convergence flags, re-encode vs `syndrome`) sees the
    # original lane order
    syn_k, inv = syndrome, None
    if cfg.kernel == "pallas" and cfg.kernel_sort_lanes:
        perm, inv = _lane_sort(syndrome)
        syn_k = syndrome[:, perm]
    if cfg.algorithm == "layered-min-sum":
        from qec_ldpc_tpu.decoder.layered import layered_min_sum_run

        if cfg.kernel == "pallas":
            from qec_ldpc_tpu.kernels.layered_pallas import layered_run_pallas

            q, per_col_iters = layered_run_pallas(
                graph, syn_k, prior,
                max_iters=cfg.max_iters, check_every=cfg.layered_check_every,
                alpha=cfg.min_sum_alpha,
                tile_batch=min(cfg.kernel_tile_batch, syndrome.shape[-1]),
                interpret=(jax.default_backend() == "cpu"),
            )
            if inv is not None:
                q = q[:, inv]
            iters = jnp.max(per_col_iters)
            iter_samples = jnp.sum(per_col_iters)
        else:
            q, iters = layered_min_sum_run(
                graph, syndrome, prior,
                max_iters=cfg.max_iters, check_every=cfg.layered_check_every,
                alpha=cfg.min_sum_alpha,
            )
            iter_samples = iters * syndrome.shape[-1]
        # layered maintains posteriors natively: hard decision is q <= 0;
        # "failed to converge" === hard decision violates the syndrome, so
        # conv_fail is derived from the common re-encode below
        decisions = (q <= 0.0).astype(jnp.int8)
        s_hat = graph.syndrome(decisions.astype(jnp.int32))
        syn_fail = jnp.any(s_hat != syndrome, axis=0)
        soft = q if cfg.return_soft else None  # layered q IS the posterior
        return decisions, syn_fail, syn_fail, iters, iter_samples, soft
    if cfg.algorithm == "min-sum":
        if cfg.kernel == "pallas":
            from qec_ldpc_tpu.kernels.min_sum_pallas import min_sum_run_pallas

            v, per_col_iters = min_sum_run_pallas(
                graph, syn_k, prior,
                max_iters=cfg.max_iters, check_every=cfg.check_every,
                conv_low=cfg.conv_low, alpha=cfg.min_sum_alpha,
                tile_batch=min(cfg.kernel_tile_batch, syndrome.shape[-1]),
                interpret=(jax.default_backend() == "cpu"),
            )
            if inv is not None:
                v = v[:, inv]
            iters = jnp.max(per_col_iters)
            iter_samples = jnp.sum(per_col_iters)
        else:
            v, iters = min_sum_run(
                graph, syndrome, prior,
                max_iters=cfg.max_iters, check_every=cfg.check_every,
                conv_low=cfg.conv_low, alpha=cfg.min_sum_alpha,
            )
            # the XLA loop runs every lane until the global exit
            iter_samples = iters * syndrome.shape[-1]
        # LLR images of the reference's probability-domain semantics:
        # "any incident message >= 0.5" <=> any incident llr <= 0
        vv = graph.vn_view(graph.to_var(v))  # (B, num_vars, batch)
        decisions = jnp.any(vv <= 0.0, axis=0).astype(jnp.int8)
        conv_fail = _not_converged_mask_llr(v, np_log_band(cfg.conv_low))
        # sum of the B outgoing edge LLRs: an affine image of the posterior
        # LLR within a lane (each edge = prior + leave-one-out sum, so the
        # sum = B*prior + (B-1)*(posterior - prior)) — exact ranking for OSD
        soft = jnp.sum(vv, axis=0) if cfg.return_soft else None
    else:
        if cfg.kernel == "pallas":
            from qec_ldpc_tpu.kernels.bp_pallas import bp_run_pallas

            v, per_col_iters = bp_run_pallas(
                graph, syn_k, prior,
                max_iters=cfg.max_iters, check_every=cfg.check_every,
                conv_low=cfg.conv_low, conv_high=cfg.conv_high,
                tile_batch=min(cfg.kernel_tile_batch, syndrome.shape[-1]),
                interpret=(jax.default_backend() == "cpu"),
                rolls=rolls,
                roll_impl=cfg.kernel_roll_impl,
            )
            if inv is not None:
                v = v[:, inv]
            iters = jnp.max(per_col_iters)
            iter_samples = jnp.sum(per_col_iters)
        else:
            v, iters = bp_run(
                graph, syndrome, prior,
                max_iters=cfg.max_iters, check_every=cfg.check_every,
                conv_low=cfg.conv_low, conv_high=cfg.conv_high,
            )
            iter_samples = iters * syndrome.shape[-1]
        # hard decision: any incident message >= 0.5 (DecoderCPU.h:354-373)
        vv = graph.vn_view(graph.to_var(v))  # (B, num_vars, batch)
        decisions = jnp.any(vv >= cfg.hard_threshold, axis=0).astype(jnp.int8)
        conv_fail = _not_converged_mask(v, cfg.conv_low, cfg.conv_high)  # (batch,)
        if cfg.return_soft:
            # probability-domain messages -> summed edge LLRs (same affine-
            # image ranking argument as the min-sum path).  Saturated lanes
            # can hold NaN messages (0/0 in the masked VN posterior between
            # convergence checks — see decoder/validate.py); a NaN edge
            # carries no usable information, so it contributes 0 LLR.
            vc = jnp.clip(vv, 1e-12, 1.0 - 1e-7)
            term = jnp.log1p(-vc) - jnp.log(vc)
            soft = jnp.sum(jnp.where(jnp.isnan(vv), 0.0, term), axis=0)
        else:
            soft = None
    # re-encode and compare syndromes (DecoderCPU.h:380-384)
    s_hat = graph.syndrome(decisions.astype(jnp.int32))
    syn_fail = jnp.any(s_hat != syndrome, axis=0)
    return decisions, conv_fail, syn_fail, iters, iter_samples, soft


@partial(jax.jit, static_argnames=("graphs", "cfg"))
def decode_batch(
    graphs: CodeGraphs,
    syndrome_x: jnp.ndarray,  # (J*P, batch) in {0,1}
    syndrome_z: jnp.ndarray,  # (K*P, batch)
    error_probability: jnp.ndarray | float,
    cfg: BPConfig = BPConfig(),
    consts=None,              # kernel_consts(graphs, cfg); see its docstring
) -> DecodeResult:
    if consts is None:
        if (cfg.kernel == "pallas" and cfg.kernel_roll_impl == "mxu"
                and isinstance(graphs.x, CirculantGraph)):
            # the mxu roll path needs multi-MB permutation operands; when
            # decode_batch is traced inside an OUTER jit with consts=None
            # they become giant HLO constants (slow, uncacheable remote
            # compiles — the exact trap kernel_consts exists to avoid)
            import warnings

            warnings.warn(
                "decode_batch(cfg.kernel_roll_impl='mxu') called with "
                "consts=None: the roll operands are being fabricated at "
                "trace time and will be baked into the HLO as multi-MB "
                "constants. Fetch kernel_consts(graphs, cfg) OUTSIDE the "
                "enclosing jit and pass it via consts=.",
                stacklevel=2)
        consts = kernel_consts(graphs, cfg)
    prior = jnp.float32(cfg.prior_factor) * jnp.asarray(error_probability, jnp.float32)
    dx, cfx, sfx, itx, isx, softx = _decode_one_graph(
        graphs.x, syndrome_x, prior, cfg,
        rolls=None if consts is None else consts["x"])
    dz, cfz, sfz, itz, isz, softz = _decode_one_graph(
        graphs.z, syndrome_z, prior, cfg,
        rolls=None if consts is None else consts["z"])
    code = (
        sfx.astype(jnp.int32) * SYNDROME_FAIL_X
        + sfz.astype(jnp.int32) * SYNDROME_FAIL_Z
        + cfx.astype(jnp.int32) * CONVERGENCE_FAIL_X
        + cfz.astype(jnp.int32) * CONVERGENCE_FAIL_Z
    )
    return DecodeResult(decisions_x=dx, decisions_z=dz, error_code=code,
                        iters_x=itx, iters_z=itz,
                        iter_samples_x=isx, iter_samples_z=isz,
                        soft_x=softx, soft_z=softz)


def syndromes_from_errors(
    graphs: CodeGraphs, x_errors: jnp.ndarray, z_errors: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(num_vars, batch) error bits -> ((J*P, batch), (K*P, batch)) syndromes."""
    return graphs.x.syndrome(x_errors), graphs.z.syndrome(z_errors)
