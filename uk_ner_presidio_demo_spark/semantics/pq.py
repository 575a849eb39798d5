"""Product quantization (PQ) for compressed ANN — the memory-scale path
(public technique: Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).  A 64-dim float32 vector (256 B) becomes
PQ_M uint8 codes (8 B): at 100 TB of embeddings the code table fits in a
fraction of cluster RAM and ADC scoring touches no raw vectors.

Frozen contract shared by the Spark kernels (operators/similarity.py) and
the single-process oracle in tests — all numpy float64, deterministic:
  - codebooks: per-subspace Lloyd iterations with the SAME int64-quantized
    mean trick as the IVF trainer (docsim.kmeans_*), trained on the
    deterministic vec_id-ascending head sample (sample-based codebook
    training is the standard PQ practice — the sample is bounded, so
    collecting it is scale-safe by construction).
  - assignment: argmin squared-L2 per subspace, ties -> lowest centroid.
  - scoring: asymmetric distance computation (ADC) — approx cosine between
    the raw query and the RECONSTRUCTED vector (concatenated centroids),
    einsum-based like docsim.cosine_matrix so accumulation order is
    shape-independent across both sides.
"""

from __future__ import annotations

import numpy as np

from .docsim import KMEANS_QUANT

PQ_M = 8            # subspaces over EMB_DIM=64 -> 8 dims each
PQ_K = 16           # centroids per subspace (4-bit codes, stored uint8)
PQ_ITERS = 3
PQ_TRAIN_SAMPLE = 256   # vec_id-ascending head sample for training


def _sub(mat: np.ndarray, m: int) -> np.ndarray:
    d = mat.shape[1] // PQ_M
    return mat[:, m * d:(m + 1) * d]


def _assign_l2(cent: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    """argmin ||v - c||^2, ties -> lowest centroid index (argmin-first)."""
    d2 = (
        (vecs * vecs).sum(axis=1)[:, None]
        - 2.0 * np.einsum("nd,kd->nk", vecs, cent)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1)


def pq_train(sample: np.ndarray) -> np.ndarray:
    """(PQ_M, PQ_K, subdim) codebooks from the float64 sample (rows MUST
    be vec_id-ascending — init is the first PQ_K rows per subspace)."""
    sample = np.asarray(sample, dtype=np.float64)
    if sample.ndim != 2 or sample.shape[0] < PQ_K:
        raise ValueError(
            f"PQ training needs >= PQ_K={PQ_K} sample vectors "
            f"(got shape {sample.shape}); a smaller corpus should use "
            "the exact brute-force path instead of silently shrinking "
            "the codebooks"
        )
    books = []
    for m in range(PQ_M):
        sv = _sub(sample, m)
        cent = sv[:PQ_K].copy()
        q = np.rint(sv * KMEANS_QUANT).astype(np.int64)
        for _ in range(PQ_ITERS):
            cells = _assign_l2(cent, sv)
            new = cent.copy()
            for k in range(PQ_K):
                msk = cells == k
                if msk.any():
                    new[k] = q[msk].sum(axis=0).astype(np.float64) / float(
                        int(msk.sum()) * KMEANS_QUANT
                    )
            cent = new
        books.append(cent)
    return np.stack(books)


def pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, PQ_M) uint8 codes."""
    mat = np.asarray(mat, dtype=np.float64)
    codes = np.empty((mat.shape[0], PQ_M), dtype=np.uint8)
    for m in range(PQ_M):
        codes[:, m] = _assign_l2(books[m], _sub(mat, m)).astype(np.uint8)
    return codes


def pq_reconstruct(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Decode to the concatenated-centroid approximation (n, dim)."""
    return np.concatenate(
        [books[m][codes[:, m]] for m in range(PQ_M)], axis=1
    )


def pq_adc_cosine(qmat: np.ndarray, codes: np.ndarray,
                  books: np.ndarray) -> np.ndarray:
    """(n_codes, n_queries) approx cosine: raw queries vs reconstructed
    vectors, einsum accumulation (shape-independent, both sides call
    this)."""
    recon = pq_reconstruct(codes, books)
    qmat = np.asarray(qmat, dtype=np.float64)
    num = np.einsum("cd,qd->cq", recon, qmat)
    cn = np.sqrt(np.einsum("cd,cd->c", recon, recon))
    qn = np.sqrt(np.einsum("qd,qd->q", qmat, qmat))
    cn[cn == 0.0] = 1.0
    qn[qn == 0.0] = 1.0
    return num / cn[:, None] / qn[None, :]
