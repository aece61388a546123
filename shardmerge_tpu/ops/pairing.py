"""Host-side greedy pair scheduling for the delta-reduction loop.

The pairing decisions are data-dependent control flow over tiny (n <= ~16)
matrices, so they stay on the host (numpy) and feed the jitted kernels —
per SURVEY.md §7 step 3.

- ``correlated_pairs``      — parity with reference functions.py:316-365
  (greedy min/max |corr| over the upper triangle, leftover yielded as
  (i, -1, diag)).
- ``cosine_correlation``    — parity with functions.py:304-314 (legacy path:
  mean cosine similarity along dim 0, NaN -> 0). Jitted, batched over the
  whole stack at once instead of n^2 device round-trips.
- ``norm_product_matrix``   — parity with fast_fourier.py:178-186: the fast
  path's pseudo-correlation is the outer product of delta norms, upper
  triangle only.
"""

from __future__ import annotations

from typing import Generator, List, Literal, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["correlated_pairs", "cosine_correlation", "norm_product_matrix"]


def norm_product_matrix(norms: List[float]) -> np.ndarray:
    """Upper-triangular matrix of pairwise norm products.

    REF-QUIRK fast_fourier.py:178-186: this is NOT a correlation; the fast
    path pairs by the product of scalar delta norms, and only fills the upper
    triangle (the diagonal stays 0, which is what leftover entries report).
    """
    n = len(norms)
    matrix = np.zeros((n, n), dtype=np.float32)
    v = np.asarray(norms, dtype=np.float32)
    for i in range(n):
        for j in range(i + 1, n):
            matrix[i, j] = v[i] * v[j]
    return matrix


@jax.jit
def _cosine_matrix(stack: jnp.ndarray) -> jnp.ndarray:
    """Mean cosine similarity along axis 0 between every pair of stacked
    tensors; computed for all pairs in one shot."""
    flat = stack.reshape(stack.shape[0], stack.shape[1], -1)  # (n, d0, rest)
    eps = jnp.float32(1e-8)
    norms = jnp.maximum(jnp.linalg.norm(flat, axis=1), eps)  # (n, rest)
    dots = jnp.einsum("idr,jdr->ijr", flat, flat)  # (n, n, rest)
    cos = dots / (norms[:, None, :] * norms[None, :, :])
    cos = jnp.where(jnp.isnan(cos), 0.0, cos)
    return jnp.mean(cos, axis=-1)


def cosine_correlation(stack) -> np.ndarray:
    """n x n matrix of mean cosine similarity (dim=0, NaN->0) between the
    stacked tensors. Parity: functions.py:304-314 (torch cosine_similarity
    with eps=1e-8, nan_to_num(0), mean)."""
    stack = jnp.asarray(stack)
    if stack.ndim == 2:  # stack of 1-D tensors: dim-0 cosine is a scalar
        stack = stack[:, :, None]
    matrix = np.array(_cosine_matrix(stack))  # owned copy (jax buffers are read-only)
    np.fill_diagonal(matrix, 0.0)  # reference never fills the diagonal
    return matrix


def correlated_pairs(
    correlation_matrix: np.ndarray,
    way: Literal["least", "most"] = "least",
) -> Generator[Tuple[int, int, float], None, None]:
    """Greedy pairing by extreme |correlation|. Parity: functions.py:316-365.

    Yields (x, y, coefficient) pairs; once an index is used its row/column
    are masked out. Odd leftovers are yielded as (i, -1, diag value).
    """
    matrix = np.asarray(correlation_matrix, dtype=np.float64)
    n = matrix.shape[0]
    available = np.triu(np.ones((n, n), dtype=bool), k=1)
    items = list(range(n))

    while available.any():
        valid = np.where(available, matrix, np.inf)
        finite = valid[valid != np.inf]
        if finite.size == 0:
            break
        if way == "least":
            match_val = np.min(np.abs(finite))
        elif way == "most":
            match_val = np.max(np.abs(finite))
        else:
            raise ValueError("Invalid way. Choose 'least' or 'most'.")

        match_idx = np.argwhere(np.abs(valid) == match_val)
        if match_idx.size == 0:
            break
        x, y = int(match_idx[0][0]), int(match_idx[0][1])
        yield (x, y, float(matrix[x, y]))

        available[x, :] = False
        available[:, x] = False
        available[y, :] = False
        available[:, y] = False
        items.remove(x)
        items.remove(y)

    for i in items:
        yield (i, -1, float(matrix[i, i]))
