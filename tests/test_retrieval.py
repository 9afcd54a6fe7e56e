import numpy as np
import pytest

from g4splat_tpu.pipeline.retrieval import (
    gem_pool,
    retrieval_pairs,
    similarity_matrix,
    whiten,
)


def clustered_features(V=30, C=32, n_clusters=3, seed=0):
    """Images in n_clusters groups; same-group images share feature stats."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, C) * 3
    feats, labels = [], []
    for v in range(V):
        c = v % n_clusters
        feats.append(np.abs(centers[c] + rng.randn(50, C) * 0.3))
        labels.append(c)
    return feats, np.array(labels)


class TestRetrieval:
    def test_exhaustive_below_threshold(self):
        feats = [np.abs(np.random.randn(10, 8)) for _ in range(5)]
        pairs = retrieval_pairs(feats, exhaustive_threshold=20)
        assert len(pairs) == 10  # C(5,2)

    def test_whiten_unit_norm(self):
        d = np.random.RandomState(0).rand(20, 16)
        w, _ = whiten(d)
        np.testing.assert_allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-5)

    def test_topk_prefers_same_cluster(self):
        feats, labels = clustered_features()
        pairs = retrieval_pairs(feats, k=4, na=0, exhaustive_threshold=1)
        same = sum(labels[i] == labels[j] for i, j in pairs)
        assert same / len(pairs) > 0.6

    def test_graph_connected(self):
        feats, _ = clustered_features(V=40)
        pairs = retrieval_pairs(feats, k=3, na=1, exhaustive_threshold=1)
        # union-find connectivity check
        parent = list(range(40))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, j in pairs:
            parent[find(i)] = find(j)
        assert len({find(v) for v in range(40)}) == 1

    def test_pair_count_scales_linearly(self):
        feats, _ = clustered_features(V=60)
        pairs = retrieval_pairs(feats, k=5, na=2, exhaustive_threshold=1)
        assert len(pairs) < 60 * 5 + 2 * 60  # ≪ C(60,2)=1770
        assert len(pairs) < 500


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
