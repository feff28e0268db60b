import numpy as np

from ngmlr_tpu.ops.ungapped import score_pair_numpy, score_batch


def _rand_seq(rng, n, alphabet=b"ACGT"):
    return bytes(rng.choice(list(alphabet), size=n))


def test_simple_scores():
    assert score_pair_numpy(b"ACGTACGT", b"ACGT") == 4.0
    assert score_pair_numpy(b"AAAA", b"TTTT") == 0.0
    # mismatch in the middle: best segment is one side (4) or through (-1+... )
    assert score_pair_numpy(b"ACGTTTGCA", b"ACGTATGCA") == 7.0  # 4 + (-1) + 4


def test_n_and_x_score_zero():
    # N and x contribute 0 — can bridge but not extend score
    assert score_pair_numpy(b"ACNNGT", b"ACNNGT") == 4.0
    assert score_pair_numpy(b"ACxxGT", b"ACGGGT") == 4.0  # x bridges at 0 cost


def test_batch_matches_numpy():
    rng = np.random.default_rng(3)
    refs, qrys = [], []
    for _ in range(32):
        refs.append(_rand_seq(rng, int(rng.integers(20, 306)), b"ACGTN"))
        qrys.append(_rand_seq(rng, int(rng.integers(10, 266)), b"ACGTN"))
    got = score_batch(refs, qrys)
    want = np.asarray([score_pair_numpy(r, q) for r, q in zip(refs, qrys)])
    np.testing.assert_array_equal(got, want)


def test_batch_embedded_match():
    rng = np.random.default_rng(4)
    q = _rand_seq(rng, 100)
    r = _rand_seq(rng, 80) + q + _rand_seq(rng, 80)
    assert score_batch([r], [q])[0] == 100.0
