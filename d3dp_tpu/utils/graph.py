"""Skeleton graph adjacency helpers (GCN-style normalised adjacency).

Capability parity with the reference's common/graph_utils.py — which is
LATENT code: never imported by any entry point (SURVEY.md component #19).
Provided for users who build graph-convolutional variants on top of the
skeleton metadata.
"""

import numpy as np


def adj_mx_from_edges(num_joints, edges, sparse=False):
    """Symmetric normalised adjacency with self-loops from an edge list."""
    A = np.zeros((num_joints, num_joints), dtype=np.float32)
    for i, j in edges:
        A[i, j] = 1.0
        A[j, i] = 1.0
    A = A + np.eye(num_joints, dtype=np.float32)
    d = A.sum(axis=1)
    d_inv_sqrt = np.power(d, -0.5, where=d > 0)
    D = np.diag(d_inv_sqrt)
    return D @ A @ D


def adj_mx_from_skeleton(skeleton):
    """Normalised adjacency from a Skeleton's parent array."""
    parents = skeleton.parents()
    edges = [(j, p) for j, p in enumerate(parents) if p >= 0]
    return adj_mx_from_edges(len(parents), edges)
