"""Sharded Monte-Carlo estimation of logical-error statistics.

TPU-native replacement for the reference's OpenMP statistics harness
(``DecoderCPU::GetStatistics``, ``DecoderCPU.h:392-530``): host threads with a
locked shared RNG and atomic counters become device-batched decodes over a
``data`` mesh axis with counter-based per-sample keys and a ``psum`` reduction
(SURVEY §2 native-inventory item 4).

One fused jit step per chunk:
  sample errors -> syndromes -> batched X/Z BP decode -> classify -> counters.

The same step runs single-device (plain jit) or sharded (shard_map over the
mesh); statistical results are identical because sample keys are derived from
(seed, global sample index), independent of the device partition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from qec_ldpc_tpu.decoder.decode import CodeGraphs, decode_batch
from qec_ldpc_tpu.decoder.sum_product import BPConfig
from qec_ldpc_tpu.parallel.mesh import DATA_AXIS
from qec_ldpc_tpu.sampling.classify import NUM_COUNTERS, classify_batch
from qec_ldpc_tpu.sampling.errors import (
    sample_depolarizing_errors,
    sample_weight_w_errors,
)


def _chunk_body(graphs: CodeGraphs, i_minus_p: jnp.ndarray, key: jax.Array,
                weight: int, error_probability, cfg: BPConfig, batch: int,
                error_model: str):
    """Sample + decode + classify one batch; returns (counters[9], iters[2])."""
    n = graphs.code.n
    if error_model == "weight":
        xe, ze = sample_weight_w_errors(key, n, weight, batch)
    elif error_model == "depolarizing":
        xe, ze = sample_depolarizing_errors(key, n, error_probability, batch)
    else:
        raise ValueError(f"unknown error model {error_model!r}")
    xe_i = xe.astype(jnp.int32)
    ze_i = ze.astype(jnp.int32)
    sx = graphs.x.syndrome(xe_i)
    sz = graphs.z.syndrome(ze_i)
    res = decode_batch(graphs, sx, sz, error_probability, cfg)
    counters = classify_batch(i_minus_p, xe_i, ze_i,
                              res.decisions_x.astype(jnp.int32),
                              res.decisions_z.astype(jnp.int32),
                              res.error_code)
    iters = jnp.stack([res.iters_x, res.iters_z])
    return counters, iters


@partial(jax.jit, static_argnames=("graphs", "weight", "cfg", "batch", "error_model"))
def mc_chunk(graphs: CodeGraphs, i_minus_p: jnp.ndarray, key: jax.Array,
             weight: int, error_probability, cfg: BPConfig, batch: int,
             error_model: str = "weight"):
    """Single-device Monte-Carlo chunk."""
    return _chunk_body(graphs, i_minus_p, key, weight, error_probability, cfg,
                       batch, error_model)


def make_sharded_chunk(mesh: Mesh, graphs: CodeGraphs, weight: int,
                       cfg: BPConfig, batch_per_device: int,
                       error_model: str = "weight"):
    """Build a jitted shard_map chunk: each data-axis device decodes its own
    sub-batch with its own fold_in key and early-exit loop; counters are
    psum-reduced to a replicated [NUM_COUNTERS] vector (the TPU analog of the
    reference's ``#pragma omp atomic`` counters)."""

    num_data = mesh.shape[DATA_AXIS]

    def shard_fn(i_minus_p, key, error_probability):
        idx = jax.lax.axis_index(DATA_AXIS)
        dev_key = jax.random.fold_in(key, idx)
        counters, iters = _chunk_body(
            graphs, i_minus_p, dev_key, weight, error_probability, cfg,
            batch_per_device, error_model)
        return (jax.lax.psum(counters, DATA_AXIS),
                jax.lax.psum(iters, DATA_AXIS))

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)


def run_monte_carlo(
    graphs: CodeGraphs,
    weight: int,
    count: int,
    error_probability: float,
    cfg: BPConfig,
    seed: int,
    batch_size: int = 1024,
    mesh: Mesh | None = None,
    error_model: str = "weight",
    progress: "callable | None" = None,
    start_chunk: int = 0,
    init_counters: np.ndarray | None = None,
):
    """Accumulate statistics counters over ``count`` samples.

    Chunks of ``batch_size`` samples run until >= count samples are tested
    (count is rounded up to a whole number of chunks, mirroring the
    reference's COUNT/nThreads rounding, DecoderCPU.h:427,438,527).

    ``start_chunk``/``init_counters`` support journal-based resume
    (harness/journal.py).  Returns (counters[NUM_COUNTERS], total_bp_iters).
    """
    i_minus_p = jnp.asarray(graphs.code.i_minus_p)
    key = jax.random.PRNGKey(seed)
    if mesh is not None:
        num_data = mesh.shape[DATA_AXIS]
        per_dev = max(1, batch_size // num_data)
        chunk_fn = make_sharded_chunk(mesh, graphs, weight, cfg, per_dev, error_model)
        chunk_samples = per_dev * num_data
        def run_chunk(k, p):
            return chunk_fn(i_minus_p, k, jnp.float32(p))
    else:
        chunk_samples = batch_size
        def run_chunk(k, p):
            return mc_chunk(graphs, i_minus_p, k, weight, jnp.float32(p), cfg,
                            batch_size, error_model)

    totals = np.zeros(NUM_COUNTERS, dtype=np.int64)
    if init_counters is not None:
        totals += np.asarray(init_counters, dtype=np.int64)
    total_iters = 0
    num_chunks = -(-count // chunk_samples)
    for c in range(start_chunk, num_chunks):
        ck = jax.random.fold_in(key, c)
        counters, iters = run_chunk(ck, error_probability)
        counters = np.asarray(counters, dtype=np.int64)
        chunk_iters = int(np.asarray(iters).sum())
        total_iters += chunk_iters
        totals += counters
        if progress is not None:
            progress(c, num_chunks, counters, chunk_iters)
    return totals, total_iters
