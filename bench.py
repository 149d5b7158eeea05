"""Headline benchmark: BP-iteration throughput on the [[610,61]] flagship code.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: BP-iteration * codewords / second / chip for the FULL Monte-Carlo
pipeline (sample weight-15 Pauli errors -> X/Z syndromes -> batched
sum-product decode via the fused Pallas kernel -> classify -> counters),
fixed 100-iteration decode (convergence exit disabled, verified per chunk:
every lane executes exactly 100 X-iterations and 100 Z-iterations; iteration*
samples counted per sample, matching the baseline derivation).

Chunks are scanned on device inside one dispatch: the tunneled TPU runtime
costs ~30-70 ms per dispatch, which would otherwise dominate; production runs
amortize identically (parallel/montecarlo.py steps_per_call).

Baseline: the reference CPU+OpenMP harness measured 887 samples/s at
W=15/MAX=100/p=0.01 on the author's workstation, i.e. <= 8.87e4
BP-iteration*samples/s for the whole CPU (SURVEY §6; results file
results/[J=4,K=5,L=10,P=61,s=9,t=49][[n=610,k=61]]_W_15_MAX_100_p_0.01.txt).
"""

import json
import sys
import time

import numpy as np

BASELINE_ITER_SAMPLES_PER_S = 8.87e4


def main() -> int:
    import jax

    # persistent compile cache: the tunneled TPU compiler is slow and its
    # latency is highly variable; caching keeps bench runs reproducible
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from qec_ldpc_tpu.codes import construct_code
    from qec_ldpc_tpu.decoder import BPConfig
    from qec_ldpc_tpu.decoder.decode import CodeGraphs, kernel_consts
    from qec_ldpc_tpu.parallel.montecarlo import _chunk_body
    from qec_ldpc_tpu.sampling import NUM_COUNTERS

    code = construct_code(4, 5, 10, 61, 9, 49)
    graphs = CodeGraphs.build(code)
    max_iters = 100
    batch = 2048
    chunks = 64
    weight = 15
    # check_every > max_iters disables the convergence exit after the
    # (vacuous) n=0 check -> fixed work; verified via the iters output below
    cfg = BPConfig(max_iters=max_iters, check_every=max_iters + 1,
                   kernel="pallas")
    i_minus_p = jnp.asarray(code.i_minus_p)
    # kernel roll operands as runtime args, NOT trace-time constants: keeps
    # the HLO module small so remote compiles are fast and cacheable
    consts = kernel_consts(graphs, cfg)

    @jax.jit
    def run(key, consts, i_minus_p):
        def body(carry, c):
            counters, min_it = carry
            ck = jax.random.fold_in(key, c)
            cnt, iters = _chunk_body(graphs, i_minus_p, ck, weight,
                                     jnp.float32(0.01), cfg, batch, "weight",
                                     consts)
            return (counters + cnt, jnp.minimum(min_it, jnp.min(iters))), None
        init = (jnp.zeros(NUM_COUNTERS, jnp.int32), jnp.int32(2**31 - 1))
        (counters, min_it), _ = jax.lax.scan(
            body, init, jnp.arange(chunks, dtype=jnp.uint32))
        return counters, min_it

    key = jax.random.PRNGKey(0)
    counters, min_it = run(key, consts, i_minus_p)  # compile + warm up
    counters = np.asarray(counters)
    # iters are lane-iteration sums: full work = max_iters per lane
    assert int(min_it) == max_iters * batch, f"early exit leaked: {int(min_it)}"
    assert counters[0] == chunks * batch, counters

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        counters, min_it = run(key, consts, i_minus_p)
        counters = np.asarray(counters)  # materialize: full host sync
        best = min(best, time.perf_counter() - t0)
    assert int(min_it) == max_iters * batch

    samples = chunks * batch
    iter_samples_per_s = samples * max_iters / best
    result = {
        "metric": "bp_iteration_codewords_per_s_per_chip",
        "value": round(iter_samples_per_s, 1),
        "unit": (f"BP-iter*codewords/s/chip (full pipeline: sample+decode+"
                 f"classify, sum-product Pallas kernel, n=610 code, fixed "
                 f"{max_iters} iters, {chunks}x{batch} samples/dispatch)"),
        "vs_baseline": round(iter_samples_per_s / BASELINE_ITER_SAMPLES_PER_S, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
