"""Tanner-graph-sharded decode (parallel/graph_sharded.py) vs the
single-device decoder, on the 8-virtual-device CPU mesh.

The sharded path reassociates cross-device products, so messages agree to
float tolerance and hard decisions/error codes agree exactly on
non-borderline samples (BASELINE config 5 validation strategy).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qec_ldpc_tpu.decoder import BPConfig, decode_batch
from qec_ldpc_tpu.parallel import make_mesh
from qec_ldpc_tpu.parallel.graph_sharded import make_graph_sharded_decoder
from qec_ldpc_tpu.sampling import sample_weight_w_errors


def _random_syndromes(code, graphs, rng, batch, weight=2):
    n = code.n
    xs = np.zeros((n, batch), dtype=np.int64)
    zs = np.zeros((n, batch), dtype=np.int64)
    for b in range(batch):
        xs[rng.choice(n, weight, replace=False), b] = 1
        zs[rng.choice(n, weight, replace=False), b] = 1
    sx = jnp.asarray(code.syndrome_x(xs.T).T)
    sz = jnp.asarray(code.syndrome_z(zs.T).T)
    return sx, sz


@pytest.mark.parametrize("num_data,num_graph", [(1, 2), (2, 3), (1, 6)])
def test_matches_single_device_decode(small_code, small_graphs, rng,
                                      num_data, num_graph):
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=num_data, num_graph=num_graph)
    cfg = BPConfig(max_iters=15)
    decode = make_graph_sharded_decoder(mesh, graphs, cfg)

    batch = 4 * num_data
    sx, sz = _random_syndromes(code, graphs, rng, batch)
    dx, dz, codes, iters = decode(sx, sz, 0.05)
    ref = decode_batch(graphs, sx, sz, 0.05, cfg)

    assert np.array_equal(np.asarray(dx), np.asarray(ref.decisions_x))
    assert np.array_equal(np.asarray(dz), np.asarray(ref.decisions_z))
    assert np.array_equal(np.asarray(codes), np.asarray(ref.error_code))
    assert np.asarray(iters).shape == (num_data, 2)


def test_weight_one_corrected_on_full_mesh(small_code, small_graphs):
    """(data=4, graph=2) mesh: weight-1 errors must be perfectly corrected,
    exercising both axes at once."""
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=4, num_graph=2)
    decode = make_graph_sharded_decoder(mesh, graphs, BPConfig(max_iters=50))

    batch = 16
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(11), code.n, 1, batch)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    dx, dz, codes, _ = decode(sx, sz, 0.02)
    assert np.array_equal(np.asarray(dx), np.asarray(xe))
    assert np.array_equal(np.asarray(dz), np.asarray(ze))
    assert (np.asarray(codes) == 0).all()


def test_zero_syndrome_zero_decisions(small_code, small_graphs):
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=2, num_graph=2)
    decode = make_graph_sharded_decoder(mesh, graphs, BPConfig(max_iters=20))
    sx = jnp.zeros((code.num_eqs_x, 4), dtype=jnp.int32)
    sz = jnp.zeros((code.num_eqs_z, 4), dtype=jnp.int32)
    dx, dz, codes, _ = decode(sx, sz, 0.05)
    assert np.asarray(dx).sum() == 0 and np.asarray(dz).sum() == 0
    assert (np.asarray(codes) == 0).all()


def test_requires_divisible_columns(small_code, small_graphs):
    mesh = make_mesh(num_data=1, num_graph=4)  # L=6 not divisible by 4
    with pytest.raises(ValueError, match="must divide"):
        make_graph_sharded_decoder(mesh, small_graphs, BPConfig())


@pytest.mark.parametrize("num_data,num_graph", [(1, 2), (2, 3)])
def test_min_sum_bit_exact_vs_single_device(small_code, small_graphs, rng,
                                            num_data, num_graph):
    """Min-sum's cross-shard reduction (min + sign product) is exact under
    any association, so the graph-sharded decode is bit-identical to the
    single-device min-sum path: decisions, error codes, everything."""
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=num_data, num_graph=num_graph)
    cfg = BPConfig(max_iters=15, algorithm="min-sum")
    decode = make_graph_sharded_decoder(mesh, graphs, cfg)

    batch = 4 * num_data
    sx, sz = _random_syndromes(code, graphs, rng, batch)
    dx, dz, codes, _ = decode(sx, sz, 0.05)
    ref = decode_batch(graphs, sx, sz, 0.05, cfg)
    assert np.array_equal(np.asarray(dx), np.asarray(ref.decisions_x))
    assert np.array_equal(np.asarray(dz), np.asarray(ref.decisions_z))
    assert np.array_equal(np.asarray(codes), np.asarray(ref.error_code))


def test_min_sum_weight_one_corrected_on_full_mesh(small_code, small_graphs):
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=4, num_graph=2)
    decode = make_graph_sharded_decoder(
        mesh, graphs, BPConfig(max_iters=50, algorithm="min-sum"))
    batch = 16
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(13), code.n, 1, batch)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    dx, dz, codes, _ = decode(sx, sz, 0.02)
    assert np.array_equal(np.asarray(dx), np.asarray(xe))
    assert np.array_equal(np.asarray(dz), np.asarray(ze))
    assert (np.asarray(codes) == 0).all()


@pytest.mark.parametrize("num_data,num_graph", [(1, 2), (2, 3)])
def test_layered_bit_exact_vs_single_device(small_code, small_graphs, rng,
                                            num_data, num_graph):
    """Layered min-sum's cross-shard reductions (min + sign product) are
    exact under any association, so the graph-sharded layered decode is
    bit-identical to the single-device layered path."""
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=num_data, num_graph=num_graph)
    cfg = BPConfig(max_iters=15, algorithm="layered-min-sum")
    decode = make_graph_sharded_decoder(mesh, graphs, cfg)

    batch = 4 * num_data
    sx, sz = _random_syndromes(code, graphs, rng, batch)
    dx, dz, codes, _ = decode(sx, sz, 0.05)
    ref = decode_batch(graphs, sx, sz, 0.05, cfg)
    assert np.array_equal(np.asarray(dx), np.asarray(ref.decisions_x))
    assert np.array_equal(np.asarray(dz), np.asarray(ref.decisions_z))
    assert np.array_equal(np.asarray(codes), np.asarray(ref.error_code))


def test_layered_weight_one_corrected_on_full_mesh(small_code, small_graphs):
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=4, num_graph=2)
    decode = make_graph_sharded_decoder(
        mesh, graphs, BPConfig(max_iters=50, algorithm="layered-min-sum"))
    batch = 16
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(17), code.n, 1, batch)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    dx, dz, codes, _ = decode(sx, sz, 0.02)
    assert np.array_equal(np.asarray(dx), np.asarray(xe))
    assert np.array_equal(np.asarray(dz), np.asarray(ze))
    assert (np.asarray(codes) == 0).all()


def test_unknown_algorithm_rejected(small_graphs):
    mesh = make_mesh(num_data=1, num_graph=2)
    with pytest.raises(ValueError, match="unknown algorithm"):
        make_graph_sharded_decoder(
            mesh, small_graphs, BPConfig(algorithm="bogus"))


# ---- fused between-halos kernel path (kernels/sharded_step_pallas, r5) ----

@pytest.mark.parametrize("num_data,num_graph", [(2, 2), (1, 3)])
def test_min_sum_pallas_step_bit_exact(small_code, small_graphs, rng,
                                       num_data, num_graph):
    """The between-halos Pallas step is bit-identical to BOTH the XLA
    sharded engine and the single-device min-sum decode (same value stream:
    partials are a pure function of V in both schedules, min/±1-product are
    exact under any association)."""
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=num_data, num_graph=num_graph)
    batch = 8 * num_data
    sx, sz = _random_syndromes(code, graphs, rng, batch)
    outs = {}
    for kern in ("xla", "pallas"):
        cfg = BPConfig(max_iters=25, algorithm="min-sum", kernel=kern)
        decode = make_graph_sharded_decoder(mesh, graphs, cfg)
        dx, dz, codes, iters = decode(sx, sz, 0.05)
        outs[kern] = tuple(np.asarray(a) for a in (dx, dz, codes, iters))
    for a, b in zip(outs["xla"], outs["pallas"]):
        assert np.array_equal(a, b)
    ref = decode_batch(graphs, sx, sz, 0.05,
                       BPConfig(max_iters=25, algorithm="min-sum"))
    assert np.array_equal(outs["pallas"][0], np.asarray(ref.decisions_x))
    assert np.array_equal(outs["pallas"][2], np.asarray(ref.error_code))


def test_min_sum_pallas_step_early_exit(small_code, small_graphs):
    """Early exit through the kernel path: weight-1 errors decode in few
    iterations and fully correct on a (data x graph) mesh."""
    code, graphs = small_code, small_graphs
    mesh = make_mesh(num_data=4, num_graph=2)
    decode = make_graph_sharded_decoder(
        mesh, graphs, BPConfig(max_iters=50, algorithm="min-sum",
                               kernel="pallas"))
    batch = 16
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(13), code.n, 1, batch)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    dx, dz, codes, iters = decode(sx, sz, 0.02)
    assert np.array_equal(np.asarray(dx), np.asarray(xe))
    assert np.array_equal(np.asarray(dz), np.asarray(ze))
    assert (np.asarray(codes) == 0).all()
    assert np.asarray(iters).max() < 50


def test_pallas_step_rejected_for_non_min_sum(small_graphs):
    mesh = make_mesh(num_data=2, num_graph=2)
    for algo in ("sum-product", "layered-min-sum"):
        with pytest.raises(ValueError, match="between-halos"):
            make_graph_sharded_decoder(
                mesh, small_graphs,
                BPConfig(max_iters=10, algorithm=algo, kernel="pallas"))


def test_pallas_step_collective_structure(small_code, small_graphs):
    """ONE all_gather per BP iteration (inside the while body), no other
    in-loop collectives — the halo-exchange claim, now for the kernel path
    (hlo_inspect attributes collectives to their innermost loop)."""
    from qec_ldpc_tpu.harness.hlo_inspect import loop_collective_summary

    mesh = make_mesh(num_data=2, num_graph=2)
    cfg = BPConfig(max_iters=25, algorithm="min-sum", kernel="pallas")
    G = mesh.shape["graph"]
    from qec_ldpc_tpu.parallel.graph_sharded import ShardRouter  # noqa: F401

    # lower (not run) the decoder's jitted shard_map
    decode = make_graph_sharded_decoder(mesh, small_graphs, cfg)
    sx = jnp.zeros((small_graphs.x.num_checks, 8), jnp.int32)
    sz = jnp.zeros((small_graphs.z.num_checks, 8), jnp.int32)
    import jax as _jax

    lowered = _jax.jit(lambda a, b: decode(a, b, 0.02)).lower(sx, sz)
    summary = loop_collective_summary(lowered.as_text())
    bodies = [b for b in summary["bodies"]
              if sum(b.counts.values()) > 0]
    # two decode loops (X and Z), each with exactly one all_gather
    per_iter = [b.counts.get("all_gather", 0) for b in bodies]
    assert per_iter.count(1) >= 2, (per_iter, [b.counts for b in bodies])
    for b in bodies:
        assert b.counts.get("all_to_all", 0) == 0
        assert b.counts.get("collective_permute", 0) == 0
