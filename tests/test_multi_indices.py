"""Graded-lex multi-index machinery."""
import math

import numpy as np

from mfs_tpu.multi_dims.multi_indices import (
    find_indices,
    generate_graded_lexico_multi_indices,
    graded_lexico_indexof_multi_index,
    gram_and_hankel_indices_graded_lexico,
    sizeof_multi_indices,
)


def test_sizeof():
    assert sizeof_multi_indices(2, 3) == math.comb(5, 2)
    assert sizeof_multi_indices(3, 2, 2) == math.comb(4, 2)
    assert sizeof_multi_indices(2, 1, 3) == 0
    assert sizeof_multi_indices(1, 5) == 6


def test_generation_order_property():
    """Graded-lex: grades ascend; within a grade, lexicographic ascending."""
    for d in (1, 2, 3):
        mis = generate_graded_lexico_multi_indices(d, 4)
        assert mis.shape == (sizeof_multi_indices(d, 4), d)
        sums = mis.sum(axis=1)
        assert np.all(np.diff(sums) >= 0)
        for i in range(len(mis) - 1):
            if sums[i] == sums[i + 1]:
                assert tuple(mis[i]) < tuple(mis[i + 1])


def test_rank_is_inverse_of_generation():
    for d in (1, 2, 3, 4):
        mis = generate_graded_lexico_multi_indices(d, 5)
        for expected, mi in enumerate(mis):
            assert graded_lexico_indexof_multi_index(mi) == expected
    # lower_sum offset
    mis = generate_graded_lexico_multi_indices(2, 4, lower_sum=2)
    for expected, mi in enumerate(mis):
        assert graded_lexico_indexof_multi_index(mi, lower_sum=2) == expected


def test_find_indices_vectorised():
    mis = generate_graded_lexico_multi_indices(3, 3)
    ranks = find_indices(mis)
    np.testing.assert_array_equal(ranks, np.arange(len(mis)))
    ranks2d = find_indices(mis.reshape(-1, 2, 3)[:4])
    assert ranks2d.shape == (4, 2)


def test_gram_and_hankel_indices():
    N, d = 3, 2
    inds = gram_and_hankel_indices_graded_lexico(N, d)
    s = math.comb(N - 1 + d, N - 1)
    assert inds.shape == (d + 1, s, s)
    mis = generate_graded_lexico_multi_indices(d, 2 * N - 1)
    basis = generate_graded_lexico_multi_indices(d, N - 1)
    # G entry (a, b) indexes the moment of k_a + k_b; H_i adds e_i.
    for a in range(s):
        for b in range(s):
            np.testing.assert_array_equal(mis[inds[0, a, b]], basis[a] + basis[b])
            for i in range(d):
                bump = basis[a] + basis[b]
                bump[i] += 1
                np.testing.assert_array_equal(mis[inds[1 + i, a, b]], bump)


def test_d1_reduces_to_hankel():
    """At d=1 the Gram/Hankel index matrices are the 1D Hankel pair."""
    from mfs_tpu.one_dim.quadrature import _hankel_indices_np

    N = 4
    inds = gram_and_hankel_indices_graded_lexico(N, 1)
    g, h = _hankel_indices_np(N)
    np.testing.assert_array_equal(inds[0], g)
    np.testing.assert_array_equal(inds[1], h)
