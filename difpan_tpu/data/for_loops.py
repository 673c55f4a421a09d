"""Loop adapters unifying the 4 batch tuple shapes
(`/root/reference/dataset/for_loops.py:4-18`): enumerate batches with or
without gt / wavelets. Work with any iterable of batch tuples (e.g.
`batch_iterator` or `device_prefetch` output)."""

from __future__ import annotations


def non_wavelet_ref_loop(batches):
    for i, (pan, lms, gt) in enumerate(batches):
        yield i, pan, lms, gt


def wavelet_ref_loop(batches):
    """Note: drops gt, matching the reference (`for_loops.py:8-10`)."""
    for i, (pan, lms, gt, wavelets) in enumerate(batches):
        yield i, pan, lms, wavelets


def non_wavelet_unref_loop(batches):
    for i, (pan, lms) in enumerate(batches):
        yield i, pan, lms


def wavelet_unref_loop(batches):
    for i, (pan, lms, wavelets) in enumerate(batches):
        yield i, pan, lms, wavelets
