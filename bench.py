"""Headline benchmark: BP-iteration throughput on the [[610,61]] flagship code.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: BP-iteration * codewords / second / chip, sum-product, fixed
100-iteration decode (early exit disabled so every lane does exactly
max_iters X-iterations and max_iters Z-iterations — honest fixed work, no
masked-iteration credit).

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
    from qec_ldpc_tpu.decoder import BPConfig, CodeGraphs, decode_batch, syndromes_from_errors
    from qec_ldpc_tpu.sampling import sample_weight_w_errors

    code = construct_code(4, 5, 10, 61, 9, 49)
    graphs = CodeGraphs.build(code)
    max_iters = 100
    # check_every > max_iters: convergence early-exit disabled -> fixed work
    cfg = BPConfig(max_iters=max_iters, check_every=max_iters + 1)

    batch = 2048
    key = jax.random.PRNGKey(0)
    xe, ze = sample_weight_w_errors(key, code.n, 15, batch)
    sx, sz = syndromes_from_errors(graphs, xe.astype(jnp.int32), ze.astype(jnp.int32))

    def step():
        res = decode_batch(graphs, sx, sz, 0.01, cfg)
        # materialize on host: block_until_ready alone has proven unreliable
        # for timing rapid redispatches through the tunneled TPU runtime
        return np.asarray(res.decisions_x), int(res.iters_x), int(res.iters_z)

    # compile + warm up
    _, ix, iz = step()
    assert ix == max_iters and iz == max_iters

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        step()
    dt = (time.perf_counter() - t0) / reps

    # each sample runs max_iters X-BP iterations AND max_iters Z-BP iterations;
    # count iteration*samples exactly as the baseline derivation does (per
    # sample, not per graph)
    iter_samples_per_s = batch * max_iters / dt
    result = {
        "metric": "bp_iteration_codewords_per_s_per_chip",
        "value": round(iter_samples_per_s, 1),
        "unit": f"BP-iter*codewords/s/chip (sum-product, n=610 code, fixed {max_iters} iters, batch {batch})",
        "vs_baseline": round(iter_samples_per_s / BASELINE_ITER_SAMPLES_PER_S, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
