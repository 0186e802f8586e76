"""Padding / chunk attention masks.

TPU-native re-expression of the reference mask utilities
(reference: cosy_repo/cosyvoice/utils/mask.py:127,161,239).  All masks are
built from static shapes with boolean algebra so XLA folds them into the
attention kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e10


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where padded.  lengths: (B,) int32 -> (B, max_len) bool."""
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return pos >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where valid (non-pad)."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_chunk_mask(size: int, chunk_size: int, num_left_chunks: int = -1) -> np.ndarray:
    """(size, size) bool: position i may attend j.

    With chunking, position i sees everything up to the end of its own chunk
    (including limited future inside the chunk) and `num_left_chunks` chunks
    of history (-1 = unlimited).  Reference: utils/mask.py:127.
    """
    idx = np.arange(size)
    chunk_idx = idx // chunk_size
    # last visible absolute index for each query position
    max_visible = (chunk_idx + 1) * chunk_size  # exclusive
    mask = idx[None, :] < max_visible[:, None]
    if num_left_chunks >= 0:
        min_visible = np.maximum((chunk_idx - num_left_chunks) * chunk_size, 0)
        mask &= idx[None, :] >= min_visible[:, None]
    return mask


def chunk_attention_mask(
    lengths: jnp.ndarray,
    max_len: int,
    chunk_size: int,
    num_left_chunks: int = -1,
) -> jnp.ndarray:
    """(B, T, T) bool attention mask combining chunk causality and padding.

    chunk_size == 0 means full (non-streaming) attention, matching
    add_optional_chunk_mask(..., static_chunk_size=0) semantics
    (reference: utils/mask.py:161-238).
    """
    valid = make_non_pad_mask(lengths, max_len)  # (B, T)
    if chunk_size > 0:
        chunk = jnp.asarray(subsequent_chunk_mask(max_len, chunk_size, num_left_chunks))
        return valid[:, None, :] & chunk[None, :, :]
    return jnp.broadcast_to(valid[:, None, :], (valid.shape[0], max_len, max_len))


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask -> additive attention bias (0 where visible, -1e10 where not).

    Matches reference numerics (utils/common.py:157 uses -1e10, not finfo.min).
    """
    return (1.0 - mask.astype(dtype)) * NEG_INF
