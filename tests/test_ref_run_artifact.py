"""Pin the literal-experiment artifact (VERDICT r3 #7).

``benchmarks/data/ref_run_r4/`` holds the result of running the reference's
UNMODIFIED ``init.txt`` through the framework CLI on the real chip.  This
test keeps the committed artifact honest: same record format as the
reference's own results file, outcome fractions within Monte-Carlo noise of
its recorded run, and a wall-clock duration that beats the reference's
112.73 s by an order of magnitude.
"""

import glob
import os

import pytest

ART_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                       "benchmarks", "data", "ref_run_r4")
REF_FILE = ("/root/reference/QEC_LDPC/results/"
            "[J=4,K=5,L=10,P=61,s=9,t=49][[n=610,k=61]]"
            "_W_15_MAX_100_p_0.01.txt")


@pytest.fixture(scope="module")
def records():
    from qec_ldpc_tpu.harness import parse_reference_text

    ours_files = glob.glob(os.path.join(glob.escape(ART_DIR), "*W_15*.txt"))
    assert len(ours_files) == 1
    ours = parse_reference_text(open(ours_files[0]).read())
    ref = parse_reference_text(open(REF_FILE).read())
    assert len(ours) == 1 and len(ref) == 1
    return ours[0], ref[0]


def test_same_record_fields(records):
    ours, ref = records
    assert set(ours) == set(ref), "format drift vs the reference serializer"


def test_outcome_fraction_parity(records):
    ours, ref = records
    n_o, n_r = int(ours["Errors Tested"]), int(ref["Errors Tested"])
    assert n_o >= n_r  # COUNT rounded up to whole chunks
    for field, tol_sigmas in (("Corrected", 4), ("Syndrome Errors X", 5),
                              ("Syndrome Errors Z", 5)):
        fo = int(ours[field]) / n_o
        fr = int(ref[field]) / n_r
        sigma = (fr * (1 - fr) / n_r + fo * (1 - fo) / n_o) ** 0.5 or 1e-9
        assert abs(fo - fr) < tol_sigmas * sigma + 1e-6, (field, fo, fr)
    # rare counters: same regime (the deep two-sample version of this
    # comparison is golden_deep_r4.jsonl)
    assert int(ours["Logical Errors"]) <= 10
    assert int(ours["Convergence Fail X"]) == 0
    assert int(ours["Convergence Fail Z"]) == 0


def test_duration_beats_reference(records):
    ours, ref = records
    assert int(ref["Duration(micro-s)"]) == 112_731_735
    # >= 10x wall-clock on the literal experiment, startup included
    # (measured 6.24 s; slack for tunnel variance on regeneration)
    assert int(ours["Duration(micro-s)"]) < 11_273_173
