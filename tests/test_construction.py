"""Construction + loader tests against the shipped reference code files."""

import numpy as np
import pytest

from qec_ldpc_tpu.codes import (
    construct_code,
    expand_circulant,
    exponents_from_pcm,
    gf2_annihilator,
    gf2_rref,
    load_code_file,
    save_code_file,
)


def test_small_code_construction_matches_file(small_code):
    built = construct_code(3, 3, 6, 7, 2, 3)
    assert np.array_equal(built.hc, small_code.hc)
    assert np.array_equal(built.hd, small_code.hd)
    assert np.array_equal(built.pcm_x, small_code.pcm_x % 2)
    assert np.array_equal(built.pcm_z, small_code.pcm_z % 2)


def test_code610_construction_matches_file(code610):
    built = construct_code(4, 5, 10, 61, 9, 49)
    assert np.array_equal(built.pcm_x, code610.pcm_x % 2)
    assert np.array_equal(built.pcm_z, code610.pcm_z % 2)


def test_css_orthogonality(small_code, code610):
    # CSS condition: Hx @ Hz^T = 0 mod 2 for both shipped codes
    for code in (small_code, code610):
        prod = code.pcm_x.astype(np.int64) @ code.pcm_z.T.astype(np.int64)
        assert (prod % 2).sum() == 0


def test_regular_degrees(small_code):
    # rows have weight L, columns have weight J (X) / K (Z)
    assert (small_code.pcm_x.sum(axis=1) == small_code.L).all()
    assert (small_code.pcm_x.sum(axis=0) == small_code.J).all()
    assert (small_code.pcm_z.sum(axis=0) == small_code.K).all()


def test_pretty_print_matches_reference_format(code610):
    # exact operator<< format (Quantum_LDPC_Code.h:145-150) used in file names
    assert str(code610) == "[J=4,K=5,L=10,P=61,s=9,t=49][[n=610,k=61]]"


def test_exponent_roundtrip(small_code):
    pcm = expand_circulant(small_code.hc, small_code.P)
    rec = exponents_from_pcm(pcm, small_code.J, small_code.L, small_code.P)
    assert np.array_equal(rec, small_code.hc)


def test_syndrome_linearity(small_code, rng):
    e1 = rng.integers(0, 2, small_code.n)
    e2 = rng.integers(0, 2, small_code.n)
    s12 = small_code.syndrome_x((e1 + e2) % 2)
    s1 = small_code.syndrome_x(e1)
    s2 = small_code.syndrome_x(e2)
    assert np.array_equal(s12, (s1 + s2) % 2)


def test_gf2_rref_properties(rng):
    m = rng.integers(0, 2, (20, 30))
    r, pivots = gf2_rref(m)
    assert len(pivots) == r.shape[0]
    # pivot columns form identity
    assert np.array_equal(r[:, pivots], np.eye(len(pivots), dtype=r.dtype))


def test_annihilator_kernel_is_rowspace(small_code, rng):
    a = gf2_annihilator(small_code.pcm_x % 2)
    # idempotent
    assert np.array_equal(a.astype(np.int64) @ a % 2, a % 2)
    # kills exactly the rowspace: random rowspace combos -> 0
    for _ in range(10):
        coeff = rng.integers(0, 2, small_code.pcm_x.shape[0])
        v = coeff @ small_code.pcm_x % 2
        assert (a.astype(np.int64) @ v % 2).sum() == 0


def test_built_i_minus_p_classifies_like_file(small_code, rng):
    """The shipped iMinusP and the GF(2)-constructed one must induce identical
    logical/harmless classification (same kernel), though not bit-equal."""
    from qec_ldpc_tpu.codes import build_i_minus_p

    built = build_i_minus_p(small_code.pcm_x % 2, small_code.pcm_z % 2)
    file_m = small_code.i_minus_p.astype(np.int64) % 2
    n2 = 2 * small_code.n
    # directed test on random vectors plus rowspace vectors
    for _ in range(50):
        e = rng.integers(0, 2, n2)
        assert ((file_m @ e) % 2).any() == ((built.astype(np.int64) @ e) % 2).any()
    # structural: kernels contain each other's row spaces
    # ker(built) = rowspace(diag(Hx,Hz)); file matrix must kill those too
    ex = rng.integers(0, 2, small_code.pcm_x.shape[0]) @ small_code.pcm_x % 2
    ez = rng.integers(0, 2, small_code.pcm_z.shape[0]) @ small_code.pcm_z % 2
    stab = np.concatenate([ex, ez])
    assert ((file_m @ stab) % 2).sum() == 0


def test_save_load_roundtrip(tmp_path):
    code = construct_code(3, 3, 6, 7, 2, 3)
    path = tmp_path / "roundtrip.txt"
    save_code_file(code, str(path))
    loaded = load_code_file(str(path))
    assert np.array_equal(loaded.pcm_x % 2, code.pcm_x)
    assert np.array_equal(loaded.pcm_z % 2, code.pcm_z)
    assert np.array_equal(loaded.i_minus_p % 2, code.i_minus_p % 2)
    assert (loaded.J, loaded.K, loaded.L, loaded.P) == (3, 3, 6, 7)


def test_construct_rejects_noninvertible_sigma():
    with pytest.raises(ValueError):
        construct_code(3, 3, 6, 9, 3, 2)  # gcd(3, 9) != 1


def test_find_code_params_recovers_reference_family():
    """The search recognizes both reference codes' (sigma, tau) as valid and
    the order-L/2 characterization holds."""
    from qec_ldpc_tpu.codes import (
        build_exponent_tables, check_css_orthogonal, find_code_params,
        multiplicative_order,
    )

    assert multiplicative_order(2, 7) == 3      # L/2 for the [[42,0]] code
    assert multiplicative_order(9, 61) == 5     # L/2 for the [[610,61]] code
    hc, hd = build_exponent_tables(4, 5, 10, 61, 9, 49)
    assert check_css_orthogonal(hc, hd, 61)
    found = find_code_params(3, 3, 6, 7, count=50)
    assert (2, 3) in found                      # the shipped small code


def test_find_code_params_builds_valid_larger_code():
    """Search params for a larger lift (P=131), construct, verify CSS
    orthogonality densely, and decode a weight-1 error end-to-end."""
    import jax
    import jax.numpy as jnp

    from qec_ldpc_tpu.codes import construct_code, find_code_params
    from qec_ldpc_tpu.decoder import BPConfig, CodeGraphs, decode_batch
    from qec_ldpc_tpu.sampling import sample_weight_w_errors

    (sigma, tau), = find_code_params(4, 5, 10, 131, count=1)
    code = construct_code(4, 5, 10, 131, sigma, tau)
    assert ((code.pcm_x.astype(int) @ code.pcm_z.astype(int).T) % 2 == 0).all()
    graphs = CodeGraphs.build(code)
    xe, ze = sample_weight_w_errors(jax.random.PRNGKey(4), code.n, 1, 8)
    sx = graphs.x.syndrome(xe.astype(jnp.int32))
    sz = graphs.z.syndrome(ze.astype(jnp.int32))
    res = decode_batch(graphs, sx, sz, 0.01, BPConfig(max_iters=30))
    assert (np.asarray(res.error_code) == 0).all()
    assert np.array_equal(np.asarray(res.decisions_x), np.asarray(xe))
    assert np.array_equal(np.asarray(res.decisions_z), np.asarray(ze))


def test_check_css_orthogonal_matches_dense_product(rng):
    """The exponent-level multiset check agrees with the dense mod-2 product
    on random tables (both orthogonal and non-orthogonal cases)."""
    from qec_ldpc_tpu.codes import check_css_orthogonal
    from qec_ldpc_tpu.codes.construction import expand_circulant

    P = 11
    hits = 0
    for _ in range(30):
        hc = rng.integers(0, P, size=(2, 4))
        hd = rng.integers(0, P, size=(3, 4))
        want = ((expand_circulant(hc, P).astype(int)
                 @ expand_circulant(hd, P).astype(int).T) % 2 == 0).all()
        got = check_css_orthogonal(hc, hd, P)
        assert got == bool(want)
        hits += bool(want)
    # sanity: the random sample should contain non-orthogonal cases
    assert hits < 30


def test_physical_logical_convention(small_code):
    """i_minus_p_physical classifies genuine same-type stabilizers as
    harmless; the reference convention (file-shipped iMinusP) counts them as
    logical errors — the documented overcount (codes/css.py)."""
    import numpy as np

    n = small_code.n
    # an X-type stabilizer (row of pcm_z) as a residual x-error: zero
    # x-syndrome, physically harmless
    row = small_code.pcm_z[0]
    doubled = np.concatenate([row, np.zeros(n, dtype=row.dtype)])
    assert not (small_code.syndrome_x(row) % 2).any()
    imp_phy = small_code.i_minus_p_physical.astype(np.int64)
    imp_ref = small_code.i_minus_p.astype(np.int64)
    assert not (imp_phy @ doubled % 2).any()      # physical: harmless
    assert (imp_ref @ doubled % 2).any()          # reference: "logical"
    # both conventions are annihilators of their respective rowspaces
    rowx = small_code.pcm_x[0]
    dx = np.concatenate([rowx, np.zeros(n, dtype=rowx.dtype)])
    assert not (imp_ref @ dx % 2).any()
