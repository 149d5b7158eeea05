"""[[42,0]] golden-corpus parity gate (r4).

Pins ``benchmarks/data/golden_sweep42_r4.jsonl``: every corpus file of the
reference's SECOND shipped code, decoded at its labeled prior (this corpus
matches at p as labeled — r3 provenance finding), compared on four outcome
fractions per point.  The [[42,0]] code is the degenerate k=0 instance
where BP mostly fails, so this sweep pins the FAILURE-regime counters
(syndrome-fail, conv-fail, reference-convention "logical") that the
[[610,61]] sweep's success regime cannot reach.

Gate design: normal-approximation z-scores overstate for rare events (the
corpus's W=9 corrected count has an expected value of ~4 in our sample —
observing 0 is exact-Poisson p ~ 0.014, yet z = -6.5), so the max-|z| gate
applies only where the expected count supports the approximation; the
distributional gates (median, tail fraction) cover everything.
"""

import json
import os

import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), os.pardir,
                        "benchmarks", "data", "golden_sweep42_r4.jsonl")

FIELDS = (("z_corrected", "ref_corrected_fraction"),
          ("z_logical", "ref_logical_fraction"),
          ("z_syn_x", "ref_syn_x_fraction"),
          ("z_conv_x", "ref_conv_x_fraction"))


@pytest.fixture(scope="module")
def artifact():
    with open(ARTIFACT) as f:
        recs = [json.loads(line) for line in f]
    return recs[0], recs[1:]


def test_full_corpus_coverage(artifact):
    meta, points = artifact
    # 59 files, one of which is empty in the reference tree
    assert meta["points"] == len(points) >= 58
    assert meta["decoder"] == "sum-product"
    assert all(p["p"] == 0.02 for p in points)  # labeled prior everywhere
    assert {p["max_iters"] for p in points} == {100, 1000, 5000, 10000,
                                                100000}
    assert all(p["ours_tested"] >= 10_000 for p in points)


def test_parity_distribution(artifact):
    """232 z-scores across 58 points x 4 counters: median well inside one
    sigma, tail fraction consistent with noise."""
    _, points = artifact
    zs = [abs(p[f]) for p in points for f, _ in FIELDS]
    zs_sorted = sorted(zs)
    median = zs_sorted[len(zs) // 2]
    assert median <= 1.0, f"median |z| = {median}"
    frac_gt3 = sum(z > 3 for z in zs) / len(zs)
    assert frac_gt3 <= 0.05, f"{frac_gt3:.1%} of tests beyond 3 sigma"


def test_no_large_deviation_where_approximation_holds(artifact):
    """Where the expected event count in OUR sample is >= 25 (normal
    approximation valid), no counter may deviate past 4 sigma."""
    _, points = artifact
    for p in points:
        for zf, rf in FIELDS:
            expected = p[rf] * p["ours_tested"]
            if expected >= 25:
                assert abs(p[zf]) <= 4.0, (p["weight"], p["max_iters"], zf,
                                           p[zf])


def test_failure_regime_is_exercised(artifact):
    """The point of this corpus: deep-failure statistics.  At W=10/MAX=100
    the reference corrected only 5 of 100k — our fractions must reproduce
    the same collapse (corrected < 1%, conv-fail ~ 50%)."""
    _, points = artifact
    w10 = next(p for p in points
               if p["weight"] == 10 and p["max_iters"] == 100)
    assert w10["ours_corrected_fraction"] < 0.01
    assert 0.4 < w10["ours_conv_x_fraction"] < 0.65
