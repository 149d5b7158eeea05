"""Layered (serial-schedule) normalized min-sum: XLA path, Pallas kernel
(interpret mode on CPU), and decode_batch integration.

The layered schedule is a framework-native extension beyond the reference's
flooding sum-product (``DecoderCPU.h:150-292``); correctness here is anchored
to (a) exact decoding of low-weight errors, (b) the syndrome-satisfied
convergence criterion agreeing with an explicit re-encode, (c) converging in
no more sweeps than flooding min-sum needs iterations, and (d) the Pallas
kernel being bit-identical to the XLA reference path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qec_ldpc_tpu.decoder import BPConfig, decode_batch, layered_min_sum_run, min_sum_run
from qec_ldpc_tpu.decoder.layered import syndrome_satisfied
from qec_ldpc_tpu.kernels.layered_pallas import layered_run_pallas
from qec_ldpc_tpu.sampling import sample_weight_w_errors

PRIOR = jnp.float32(2.0 / 3.0 * 0.02)


def _errors_and_syndromes(code, graphs, weight, batch, seed=0):
    xe, _ = sample_weight_w_errors(jax.random.PRNGKey(seed), code.n, weight, batch)
    return xe, graphs.x.syndrome(xe.astype(jnp.int32))


def test_weight1_decodes_exactly_in_few_sweeps(small_code, small_graphs):
    xe, syn = _errors_and_syndromes(small_code, small_graphs, 1, 32, seed=1)
    q, iters = layered_min_sum_run(small_graphs.x, syn, PRIOR, max_iters=50)
    decisions = np.asarray(q <= 0.0).astype(int)
    assert (decisions == np.asarray(xe)).all()
    assert int(iters) <= 3  # layered converges in a couple of sweeps


def test_syndrome_satisfied_matches_reencode(small_code, small_graphs):
    _, syn = _errors_and_syndromes(small_code, small_graphs, 2, 64)
    q, _ = layered_min_sum_run(small_graphs.x, syn, PRIOR, max_iters=50)
    syn_sign = 1.0 - 2.0 * syn.astype(jnp.float32)
    sat = np.asarray(syndrome_satisfied(small_graphs.x, q, syn_sign))
    d = np.asarray(q <= 0.0).astype(np.int32)
    s_hat = np.asarray(small_graphs.x.syndrome(jnp.asarray(d)))
    assert (sat == (s_hat == np.asarray(syn)).all(axis=0)).all()


def test_converges_no_slower_than_flooding(small_code, small_graphs):
    """On converging lanes the layered schedule needs no more sweeps than
    flooding min-sum needs iterations (typically about half)."""
    _, syn = _errors_and_syndromes(small_code, small_graphs, 1, 64, seed=5)
    _, it_layered = layered_min_sum_run(small_graphs.x, syn, PRIOR,
                                        max_iters=50, check_every=1)
    _, it_flooding = min_sum_run(small_graphs.x, syn, PRIOR, max_iters=50,
                                 check_every=1)
    assert int(it_layered) <= int(it_flooding)


@pytest.mark.parametrize("iters", [1, 3, 10])
def test_pallas_matches_xla_fixed_sweeps(small_code, small_graphs, iters):
    """No early exit: posteriors bit-identical after every sweep count."""
    _, syn = _errors_and_syndromes(small_code, small_graphs, 2, 8)
    q_ref, it_ref = layered_min_sum_run(
        small_graphs.x, syn, PRIOR, max_iters=iters, check_every=iters + 2)
    q_ker, it_ker = layered_run_pallas(
        small_graphs.x, syn, PRIOR, max_iters=iters, check_every=iters + 2,
        tile_batch=8, interpret=True)
    assert int(it_ref) == iters
    assert np.asarray(it_ker).max() == iters
    np.testing.assert_array_equal(np.asarray(q_ker), np.asarray(q_ref))


def test_pallas_matches_xla_early_exit(small_code, small_graphs):
    """Default every-sweep convergence: executed sweep counts and posteriors
    agree with the XLA loop."""
    _, syn = _errors_and_syndromes(small_code, small_graphs, 1, 8, seed=3)
    q_ref, it_ref = layered_min_sum_run(small_graphs.x, syn, PRIOR,
                                        max_iters=50, check_every=1)
    q_ker, it_ker = layered_run_pallas(small_graphs.x, syn, PRIOR,
                                       max_iters=50, check_every=1,
                                       tile_batch=8, interpret=True)
    assert np.asarray(it_ker).max() == int(it_ref)
    np.testing.assert_array_equal(np.asarray(q_ker), np.asarray(q_ref))


@pytest.mark.parametrize("kernel", ["xla", "pallas"])
def test_decode_batch_integration(small_code, small_graphs, kernel):
    """Full X/Z decode with classification flags; weight-1 errors decode to
    SUCCESS on every lane with both engines."""
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(9), small_code.n, 1, 16)
    sx = small_graphs.x.syndrome(xe.astype(jnp.int32))
    sz = small_graphs.z.syndrome(ze.astype(jnp.int32))
    cfg = BPConfig(max_iters=50, algorithm="layered-min-sum", kernel=kernel,
                   kernel_tile_batch=16)
    res = decode_batch(small_graphs, sx, sz, 0.02, cfg)
    assert (np.asarray(res.error_code) == 0).all()
    assert (np.asarray(res.decisions_x) == np.asarray(xe)).all()
    assert (np.asarray(res.decisions_z) == np.asarray(ze)).all()
    # layered counts executed sweeps per tile honestly
    assert int(res.iter_samples_x) <= int(res.iters_x) * 16
