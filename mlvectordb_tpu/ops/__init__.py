"""Compute kernels: distance matmuls + streaming exact top-k.

Two interchangeable backends produce bit-identical results:
  * ``topk.exact_knn`` — pure-XLA `lax.scan` over database tiles (runs anywhere, incl. the
    8-device CPU simulation used in tests);
  * ``pallas_knn.exact_knn_pallas`` — fused Pallas kernel for TPU: distance matmul on the
    MXU with the running top-k accumulator carried in VMEM across database tiles, so the
    [batch, N] distance matrix never materializes in HBM.

This pair replaces the reference's only native component, hnswlib's C++ HNSW graph
(reference: src/mlvectordb/implementations/index.py:1,36-37; SURVEY.md §2.1) — exact
brute-force on the MXU beats approximate graph walks on TPU, and recall@k is 1.0 by
construction.
"""

from .distances import pairwise_distances, query_norms
from .topk import exact_knn, merge_topk

__all__ = ["pairwise_distances", "query_norms", "exact_knn", "merge_topk"]
