"""Native C++ ngram kernel: exact agreement with the numpy fallback
across randomized sequences, plus batch-API consistency (reference
behavior: vllm/v1/spec_decode/ngram_proposer.py numba kernels)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.spec_decode.ngram_proposer import \
    NgramProposer


@pytest.fixture(scope="module")
def native_proposer():
    p = NgramProposer(4, prompt_lookup_min=1, prompt_lookup_max=3)
    if p._lib is None:
        pytest.skip("no C++ toolchain — native ngram unavailable")
    return p


def test_native_matches_numpy_randomized(native_proposer):
    p = native_proposer
    rng = np.random.default_rng(0)
    checked_some = False
    for trial in range(300):
        length = int(rng.integers(1, 60))
        vocab = int(rng.integers(2, 6))  # small vocab → many repeats
        seq = rng.integers(0, vocab, length).astype(np.int32)
        got = p.propose(seq)
        ref = p._propose_numpy(seq)
        if ref is None:
            assert got is None, (seq, got)
        else:
            assert got is not None, (seq, ref)
            np.testing.assert_array_equal(got, ref)
            checked_some = True
    assert checked_some


def test_native_matches_numpy_min_n(native_proposer):
    rng = np.random.default_rng(1)
    for min_n, max_n in [(2, 2), (2, 5), (3, 8)]:
        p = NgramProposer(6, prompt_lookup_min=min_n,
                          prompt_lookup_max=max_n)
        for _ in range(100):
            seq = rng.integers(0, 4, int(rng.integers(1, 40))).astype(
                np.int32)
            got, ref = p.propose(seq), p._propose_numpy(seq)
            if ref is None:
                assert got is None
            else:
                np.testing.assert_array_equal(got, ref)


def test_batch_matches_single(native_proposer):
    p = native_proposer
    rng = np.random.default_rng(2)
    rows, max_len = 16, 48
    token_ids = rng.integers(0, 4, (rows, max_len)).astype(np.int32)
    num_tokens = rng.integers(1, max_len, rows).astype(np.int32)
    sel = [0, 3, 7, 11, 15]
    batch = p.propose_batch(token_ids, num_tokens, sel)
    for r in sel:
        single = p.propose(token_ids[r, :int(num_tokens[r])])
        if single is None:
            assert r not in batch
        else:
            assert batch[r] == single.tolist()


def test_draft_follows_match(native_proposer):
    p = native_proposer
    # trailing [5, 6] last occurred at the start → draft continues 7 8 9 1
    seq = np.asarray([5, 6, 7, 8, 9, 1, 2, 5, 6], np.int32)
    np.testing.assert_array_equal(p.propose(seq), [7, 8, 9, 1])
