"""Independent correctness cross-checks (tpu_align/verify/independent.py).

The oracle (and, transitively, the kernels and goldens byte-compared
against it) is validated against two implementations that share no code or
recurrence structure with this repo: scipy's Bellman-Ford over the
alignment DAG and exhaustive path enumeration for tiny pairs.  This fills
the role of the reference's external web-scraper validation
(web-scraper.py:190-258).
"""

import pytest

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.oracle.api import align_pair
from tpu_align.verify.independent import (
    HAVE_SCIPY,
    enumerate_score,
    graph_score,
)
from tests.conftest import random_dna

ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]

PARAM_SETS = [
    AlignmentParams(),  # reference defaults 3/-1/-2, open -4 ext -1
    AlignmentParams(match=5, mismatch=-2, gap=-3, gap_open=-6, gap_extend=-2,
                    band=3),
    AlignmentParams(match=2, mismatch=-3, gap=-1, gap_open=-5, gap_extend=-1,
                    band=2),
]


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy unavailable")
@pytest.mark.parametrize("algo", ALGOS)
def test_oracle_matches_scipy_graph_random(rng, algo):
    for params in PARAM_SETS:
        for _ in range(12):
            ref = random_dna(rng, 1, 24)
            qry = random_dna(rng, 1, 24)
            want = graph_score(algo, params, ref, qry)
            got = align_pair(algo, params, ref, qry, engine="scalar").score
            assert got == want, (algo, params, ref, qry)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy unavailable")
@pytest.mark.parametrize("algo", ALGOS)
def test_oracle_matches_scipy_graph_tie_rich(rng, algo):
    """2-letter alphabets maximize co-optimal paths and clamp activity."""
    for params in PARAM_SETS:
        for _ in range(12):
            ref = random_dna(rng, 2, 18, alphabet="AC")
            qry = random_dna(rng, 2, 18, alphabet="AC")
            want = graph_score(algo, params, ref, qry)
            got = align_pair(algo, params, ref, qry, engine="scalar").score
            assert got == want, (algo, params, ref, qry)


@pytest.mark.parametrize("algo",
                         [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW])
def test_oracle_matches_exhaustive_enumeration(rng, algo):
    """Tiny pairs against brute-force enumeration of ALL alignments --
    the specification itself, no DP anywhere."""
    for params in PARAM_SETS:
        for _ in range(10):
            ref = random_dna(rng, 1, 6)
            qry = random_dna(rng, 1, 6)
            want = enumerate_score(algo, params, ref, qry)
            got = align_pair(algo, params, ref, qry, engine="scalar").score
            assert got == want, (algo, params, ref, qry)


@pytest.mark.parametrize("algo",
                         [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW])
def test_enumeration_agrees_with_graph(rng, algo):
    """The two independent checkers also agree with each other."""
    if not HAVE_SCIPY:
        pytest.skip("scipy unavailable")
    params = AlignmentParams()
    for _ in range(8):
        ref = random_dna(rng, 1, 6, alphabet="AC")
        qry = random_dna(rng, 1, 6, alphabet="AC")
        assert enumerate_score(algo, params, ref, qry) == graph_score(
            algo, params, ref, qry
        ), (algo, ref, qry)
