"""OSD post-processing: native/NumPy parity, solver invariants, CSS splice,
and Monte-Carlo integration.

The reference has no analog (BP failures are merely counted,
``DecoderCPU.h:380-384,480-489``); these tests pin the framework-native
BP+OSD subsystem (decoder/osd.py, native/gf2.cpp::qec_osd_batch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qec_ldpc_tpu as q
from qec_ldpc_tpu import native
from qec_ldpc_tpu.decoder import BPConfig, CSSPostprocessor, OSDecoder
from qec_ldpc_tpu.decoder.decode import (
    SYNDROME_FAIL_X,
    SYNDROME_FAIL_Z,
    CodeGraphs,
    decode_batch,
)
from qec_ldpc_tpu.decoder.osd import _osd_one_np
from qec_ldpc_tpu.parallel.montecarlo import run_monte_carlo, run_monte_carlo_osd
from qec_ldpc_tpu.sampling import sample_weight_w_errors
from qec_ldpc_tpu.sampling.classify import (
    C_CORRECTED,
    C_CONV_X,
    C_CONV_Z,
    C_LOGICAL,
    C_SYN_X,
    C_SYN_Z,
    C_TESTED,
)


@pytest.fixture(scope="module")
def small_graphs():
    return CodeGraphs.build(q.construct_code(3, 3, 6, 7, 2, 3))


def _random_instance(rng, m, n, batch, p_col=0.25, p_err=0.1):
    H = (rng.random((m, n)) < p_col).astype(np.uint8)
    e_true = (rng.random((n, batch)) < p_err).astype(np.uint8)
    s = H @ e_true % 2
    rel = rng.standard_normal((n, batch)).astype(np.float32)
    return H, s, rel


@pytest.mark.parametrize("lam", [0, 8])
def test_osd_satisfies_syndrome_random(lam):
    rng = np.random.default_rng(3)
    for _ in range(20):
        m = int(rng.integers(5, 40))
        n = m + int(rng.integers(5, 40))
        H, s, rel = _random_instance(rng, m, n, batch=13)
        e, ok = OSDecoder(H, lam=lam).decode(s, rel)
        # syndromes from real errors are always in the column space
        assert ok.all()
        assert np.array_equal(H @ e % 2, s)


@pytest.mark.parametrize("lam", [0, 6])
def test_osd_native_matches_numpy(lam):
    if not native.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for _ in range(10):
        m = int(rng.integers(5, 30))
        n = m + int(rng.integers(5, 30))
        H, s, rel = _random_instance(rng, m, n, batch=7)
        e, ok = OSDecoder(H, lam=lam).decode(s, rel)
        order = np.argsort(rel, axis=0, kind="stable").T
        cols_bits = np.ascontiguousarray(H.T)
        for b in range(s.shape[1]):
            e_np, ok_np = _osd_one_np(cols_bits, s[:, b], order[b], lam)
            assert bool(ok[b]) == ok_np
            assert np.array_equal(e[:, b], e_np)


def test_osd_detects_unsolvable():
    rng = np.random.default_rng(5)
    H = np.zeros((4, 8), dtype=np.uint8)
    H[:3] = (rng.random((3, 8)) < 0.5).astype(np.uint8)
    s = np.zeros((4, 2), dtype=np.uint8)
    s[3, 1] = 1  # lane 1's syndrome hits the all-zero check row
    e, ok = OSDecoder(H, lam=2).decode(
        s, rng.standard_normal((8, 2)).astype(np.float32))
    assert ok[0] and not ok[1]
    assert not e[:, 1].any()


def test_combination_sweep_never_increases_weight():
    rng = np.random.default_rng(17)
    for _ in range(10):
        H, s, rel = _random_instance(rng, 20, 40, batch=5, p_col=0.3,
                                     p_err=0.15)
        e0, ok0 = OSDecoder(H, lam=0).decode(s, rel)
        e2, ok2 = OSDecoder(H, lam=10).decode(s, rel)
        assert ok0.all() and ok2.all()
        assert (e2.sum(axis=0) <= e0.sum(axis=0)).all()
        assert np.array_equal(H @ e2 % 2, s)


def test_osd_ranking_prefers_reliable_solution():
    # single-error syndrome with the true column marked most-unreliable:
    # OSD-0 must pick exactly that column
    rng = np.random.default_rng(23)
    n = 24
    H = (rng.random((16, n)) < 0.3).astype(np.uint8)
    e_true = np.zeros((n, 1), dtype=np.uint8)
    e_true[5] = 1
    s = H @ e_true % 2
    rel = np.full((n, 1), 10.0, dtype=np.float32)
    rel[5] = -10.0  # most likely in error
    e, ok = OSDecoder(H, lam=0).decode(s, rel)
    assert ok[0]
    assert np.array_equal(e, e_true)


@pytest.mark.parametrize("algorithm", ["sum-product", "min-sum",
                                       "layered-min-sum"])
def test_return_soft_shapes_and_ranking(small_graphs, algorithm):
    graphs = small_graphs
    n, batch = graphs.code.n, 16
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(2), n, 3, batch)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    cfg = BPConfig(max_iters=20, algorithm=algorithm, kernel="xla",
                   return_soft=True)
    res = decode_batch(graphs, sx, sz, 0.02, cfg)
    assert res.soft_x.shape == (n, batch)
    assert res.soft_z.shape == (n, batch)
    if algorithm == "layered-min-sum":
        # layered soft IS the posterior: decisions == (posterior <= 0)
        assert np.array_equal(np.asarray(res.decisions_x),
                              np.asarray(res.soft_x <= 0.0).astype(np.int8))
    # soft defaults to None when not requested
    res2 = decode_batch(graphs, sx, sz, 0.02,
                        BPConfig(max_iters=20, algorithm=algorithm,
                                 kernel="xla"))
    assert res2.soft_x is None and res2.soft_z is None


def test_css_postprocessor_resolves_failures(small_graphs):
    graphs = small_graphs
    n, batch = graphs.code.n, 64
    # heavy errors so plenty of lanes fail BP
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(4), n, 5, batch)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    cfg = BPConfig(max_iters=15, kernel="xla", return_soft=True)
    res = decode_batch(graphs, sx, sz, 0.02, cfg)
    ec0 = np.asarray(res.error_code)
    failed_x = (ec0 & SYNDROME_FAIL_X) != 0
    assert failed_x.any(), "fixture produced no BP failures; raise the weight"

    dx, dz, ec = CSSPostprocessor(graphs, lam=4).apply(
        np.asarray(sx), np.asarray(sz), res)
    # all syndrome failures resolved, and the fixes actually re-encode
    assert ((ec & (SYNDROME_FAIL_X | SYNDROME_FAIL_Z)) == 0).all()
    assert np.array_equal(
        np.asarray(graphs.x.syndrome(jnp.asarray(dx, jnp.int32))),
        np.asarray(sx))
    assert np.array_equal(
        np.asarray(graphs.z.syndrome(jnp.asarray(dz, jnp.int32))),
        np.asarray(sz))
    # untouched lanes keep their decisions; convergence flags preserved
    ok_lanes = (ec0 & (SYNDROME_FAIL_X | SYNDROME_FAIL_Z)) == 0
    assert np.array_equal(dx[:, ok_lanes],
                          np.asarray(res.decisions_x)[:, ok_lanes])
    syn_bits = SYNDROME_FAIL_X | SYNDROME_FAIL_Z
    assert np.array_equal(ec0 & ~syn_bits, ec & ~syn_bits)


@pytest.mark.parametrize("algorithm", ["sum-product", "layered-min-sum"])
def test_run_monte_carlo_osd_improves_on_base(small_graphs, algorithm):
    graphs = small_graphs
    cfg = BPConfig(max_iters=20, kernel="xla", algorithm=algorithm)
    base, _ = run_monte_carlo(graphs, 4, 512, 0.02, cfg, seed=7,
                              batch_size=128)
    osd, _ = run_monte_carlo_osd(graphs, 4, 512, 0.02, cfg, seed=7,
                                 batch_size=128, lam=4)
    # same error draws (identical per-chunk keys)
    assert osd[C_TESTED] == base[C_TESTED]
    # every BP failure repaired into a syndrome-valid correction
    assert osd[C_SYN_X] == 0 and osd[C_SYN_Z] == 0
    assert osd[C_CORRECTED] + osd[C_LOGICAL] == osd[C_TESTED]
    assert osd[C_CORRECTED] >= base[C_CORRECTED]
    # convergence-fail counters keep their orthogonal reference meaning
    assert osd[C_CONV_X] == base[C_CONV_X]
    assert osd[C_CONV_Z] == base[C_CONV_Z]


def test_run_monte_carlo_osd_mesh_bitmatch(small_graphs):
    """VERDICT r2 #9: OSD composes with a device mesh.  The chunk key is
    partition-independent (one key per chunk; each shard_map shard slices
    its columns of the full-batch draw, and relay gammas slice the
    full-batch uniform), so mesh and single-device counters are
    BIT-IDENTICAL."""
    from qec_ldpc_tpu.parallel import make_mesh

    cfg = BPConfig(max_iters=15, algorithm="min-sum")
    kw = dict(batch_size=64, lam=1, relay_retries=1)
    base, base_it = run_monte_carlo_osd(small_graphs, 4, 128, 0.02, cfg,
                                        seed=7, **kw)
    mesh = make_mesh(num_data=8)
    sharded, sh_it = run_monte_carlo_osd(small_graphs, 4, 128, 0.02, cfg,
                                         seed=7, mesh=mesh, **kw)
    np.testing.assert_array_equal(base, sharded)
    assert base_it == sh_it


def test_run_monte_carlo_osd_resume(small_graphs):
    """Chunk-exact resume: totals from (run chunk 0; resume at chunk 1) must
    equal the uninterrupted run."""
    cfg = BPConfig(max_iters=15, algorithm="min-sum")
    kw = dict(batch_size=64, lam=0)
    full, _ = run_monte_carlo_osd(small_graphs, 4, 192, 0.02, cfg, seed=3,
                                  **kw)
    per_chunk = []
    run_monte_carlo_osd(small_graphs, 4, 192, 0.02, cfg, seed=3,
                        progress=lambda c, n, cnt, it: per_chunk.append(cnt),
                        **kw)
    resumed, _ = run_monte_carlo_osd(small_graphs, 4, 192, 0.02, cfg, seed=3,
                                     start_chunk=1,
                                     init_counters=per_chunk[0], **kw)
    np.testing.assert_array_equal(full, resumed)


def test_run_monte_carlo_osd_mesh_pallas(small_graphs):
    """Advisor r3 (medium): the quality mode's device chunk is a shard_map,
    so the fused Pallas kernels compose with a data mesh (GSPMD could not
    auto-partition a pallas_call).  Interpret-mode kernels on the CPU mesh;
    counters must satisfy the OSD invariants."""
    from qec_ldpc_tpu.parallel import make_mesh

    cfg = BPConfig(max_iters=10, algorithm="min-sum", kernel="pallas",
                   kernel_tile_batch=8)
    osd, _ = run_monte_carlo_osd(small_graphs, 4, 64, 0.02, cfg, seed=5,
                                 batch_size=64, lam=0,
                                 mesh=make_mesh(num_data=8))
    assert osd[C_TESTED] == 64
    assert osd[C_SYN_X] == 0 and osd[C_SYN_Z] == 0
    assert osd[C_CORRECTED] + osd[C_LOGICAL] == osd[C_TESTED]


def test_gather_failed_lanes_prefix_only(small_graphs):
    """The fast quality mode must ship ONLY failed lanes to the host: the
    device chunk's nfail + compacted bundle agree with a full classification
    of the same chunk (counters_ok + failed-lane classification == the
    classify-everything counters)."""
    from qec_ldpc_tpu.parallel.montecarlo import (
        _gather_failed_lanes,
        _repair_and_classify_np,
        make_osd_chunk,
    )
    from qec_ldpc_tpu.sampling.classify import make_rank_basis_test

    graphs = small_graphs
    cfg = BPConfig(max_iters=10, algorithm="min-sum", kernel="xla",
                   return_soft=True)
    lt = make_rank_basis_test(graphs.code)
    chunk = make_osd_chunk(graphs, 5, cfg, 128)
    counters_ok, iters, nfail, bundle = chunk(
        lt, jax.random.PRNGKey(3), jnp.float32(0.02), None)
    k = int(np.asarray(nfail)[0])
    assert k > 0, "fixture produced no failures; raise the weight"
    failed = _gather_failed_lanes(nfail, bundle)
    assert failed[-1].shape == (k,)          # exactly the failed lanes
    assert ((failed[-1] & (SYNDROME_FAIL_X | SYNDROME_FAIL_Z)) != 0).all()
    # counters_ok + classify(failed, no repair) == classify everything
    cnt_failed = _repair_and_classify_np(None, lt, failed)
    from qec_ldpc_tpu.parallel.montecarlo import _sample_and_decode
    from qec_ldpc_tpu.sampling.classify import classify_batch

    xe_i, ze_i, sx, sz, res = _sample_and_decode(
        graphs, jax.random.PRNGKey(3), 5, jnp.float32(0.02), cfg, 128,
        "weight")
    full = classify_batch(lt, xe_i, ze_i,
                          res.decisions_x.astype(jnp.int32),
                          res.decisions_z.astype(jnp.int32), res.error_code)
    np.testing.assert_array_equal(
        np.asarray(counters_ok, dtype=np.int64) + cnt_failed,
        np.asarray(full, dtype=np.int64))


def test_run_monte_carlo_osd_graph_mesh_bitmatch(small_graphs):
    """OSD with GRAPH-sharded decode (VERDICT r2 #9 completed): the
    (data x graph) mesh chunk samples from the same single key and the
    exact min-sum engine's decisions AND soft outputs bit-match the
    single-device path, so OSD counters are BIT-IDENTICAL."""
    from qec_ldpc_tpu.parallel import make_mesh

    cfg = BPConfig(max_iters=15, algorithm="min-sum")
    kw = dict(batch_size=64, lam=1)
    base, base_it = run_monte_carlo_osd(small_graphs, 4, 128, 0.02, cfg,
                                        seed=7, **kw)
    mesh = make_mesh(num_data=4, num_graph=2)
    sharded, sh_it = run_monte_carlo_osd(small_graphs, 4, 128, 0.02, cfg,
                                         seed=7, mesh=mesh, **kw)
    np.testing.assert_array_equal(base, sharded)
    assert base_it == sh_it


def test_run_monte_carlo_osd_graph_mesh_with_relay(small_graphs):
    """Relay + OSD both graph-sharded: deterministic, fully repaired
    syndromes (OSD guarantees), tested count intact."""
    from qec_ldpc_tpu.parallel import make_mesh

    cfg = BPConfig(max_iters=15, algorithm="min-sum")
    mesh = make_mesh(num_data=4, num_graph=2)
    kw = dict(batch_size=64, lam=0, relay_retries=2, mesh=mesh)
    a, _ = run_monte_carlo_osd(small_graphs, 4, 128, 0.02, cfg, seed=3, **kw)
    b, _ = run_monte_carlo_osd(small_graphs, 4, 128, 0.02, cfg, seed=3, **kw)
    np.testing.assert_array_equal(a, b)
    assert a[0] == 128
    assert a[4] == 0 and a[5] == 0  # OSD leaves no syndrome failures


# ---- device OSD-0 (decoder/osd_device.py, r5) ----

def test_device_osd0_bitequal_host():
    """The batched device GF(2) elimination matches the host solvers bit for
    bit: same greedy pivot set (order-determined), unique OSD-0 solution —
    corrections AND solved flags, decodable and undecodable syndromes."""
    rng = np.random.default_rng(7)
    for params in ((3, 3, 6, 7, 2, 3), (4, 5, 10, 61, 9, 49)):
        code = q.construct_code(*params)
        for h in (code.pcm_x, code.pcm_z):
            m, n = h.shape
            B = 21
            e_true = (rng.random((n, B)) < 0.08).astype(np.int32)
            syn = (np.asarray(h, int) @ e_true) % 2
            # a few pure-random (mostly undecodable) syndromes too
            syn[:, -4:] = rng.integers(0, 2, (m, 4))
            rel = rng.standard_normal((n, B)).astype(np.float32)
            eh, okh = OSDecoder(h, lam=0, device="host").decode(syn, rel)
            ed, okd = OSDecoder(h, lam=0, device="device").decode(syn, rel)
            assert np.array_equal(eh, ed)
            assert np.array_equal(okh, okd)
            sat = (np.asarray(h, int) @ ed.astype(int)) % 2 == syn
            assert np.all(sat[:, okd])


def test_device_osd0_slice_padding():
    """Slicing/padding to power-of-two buckets is invisible in the results
    (padded lanes carry zero syndromes and are dropped)."""
    from qec_ldpc_tpu.decoder import osd_device

    code = q.construct_code(3, 3, 6, 7, 2, 3)
    h = code.pcm_x
    rng = np.random.default_rng(3)
    n = h.shape[1]
    B = 19  # not a power of two; also exercises the < _SLICE bucket
    e_true = (rng.random((n, B)) < 0.1).astype(np.int32)
    syn = (np.asarray(h, int) @ e_true) % 2
    rel = rng.standard_normal((n, B)).astype(np.float32)
    dec = OSDecoder(h, lam=0, device="device")
    e1, ok1 = dec.decode(syn, rel)
    # force tiny slices: every bucket boundary exercised
    saved = osd_device._SLICE, osd_device._SLICE_SMALL
    try:
        osd_device._SLICE = 8
        osd_device._SLICE_SMALL = 4
        dec2 = OSDecoder(h, lam=0, device="device")
        e2, ok2 = dec2.decode(syn, rel)
    finally:
        osd_device._SLICE, osd_device._SLICE_SMALL = saved
    assert np.array_equal(e1, e2) and np.array_equal(ok1, ok2)


def test_quality_mode_device_osd_matches_host(small_graphs):
    """run_monte_carlo_osd counters are identical whichever backend solves
    OSD-0 (the postprocessor's device='auto' resolves to host on the CPU
    test backend, so compare forced-device vs forced-host explicitly)."""
    from qec_ldpc_tpu.decoder.osd import CSSPostprocessor as CP

    graphs = small_graphs
    cfg = BPConfig(max_iters=30, algorithm="min-sum", return_soft=True)
    res_counters = {}
    for device in ("host", "device"):
        import unittest.mock as mock

        with mock.patch("qec_ldpc_tpu.decoder.osd.CSSPostprocessor",
                        lambda graphs, lam=0: CP(graphs, lam=lam,
                                                 device=device)):
            counters, _ = run_monte_carlo_osd(
                graphs, 4, 512, 0.02, cfg, seed=9, batch_size=256, lam=0)
        res_counters[device] = counters
    assert np.array_equal(res_counters["host"], res_counters["device"])
    assert res_counters["host"][4] == 0 and res_counters["host"][5] == 0
