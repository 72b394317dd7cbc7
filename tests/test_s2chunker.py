"""S2 chunker: spectral clustering of layout regions."""

import numpy as np

from rag_docvqa_tpu.ops.s2chunker import (
    S2Config,
    cluster_regions,
    kmeans,
    region_affinity,
    silhouette_score,
    spectral_embedding,
    split_oversized_clusters,
)


def test_affinity_spatial_and_semantic():
    boxes = np.asarray([[0, 0, 0.1, 0.1], [0.0, 0.05, 0.1, 0.15], [0.9, 0.9, 1.0, 1.0]])
    aff = region_affinity(boxes)
    assert aff[0, 1] > aff[0, 2]  # near regions more affine
    emb = np.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    aff2 = region_affinity(boxes, emb)
    assert aff2[0, 1] > aff2[0, 2]


def test_cluster_regions_separates_groups():
    rng = np.random.RandomState(0)
    left = rng.rand(6, 2) * 0.1
    right = rng.rand(6, 2) * 0.1 + 0.9
    boxes = np.concatenate(
        [np.concatenate([c, c + 0.05], axis=1) for c in (left, right)]
    )
    labels = cluster_regions(boxes, cfg=S2Config(max_clusters=4, use_semantics=False))
    assert len(set(labels[:6])) == 1
    assert len(set(labels[6:])) == 1
    assert labels[0] != labels[6]


def test_cluster_regions_tiny_inputs():
    assert cluster_regions([]).shape == (0,)
    assert cluster_regions([[0, 0, 1, 1]]).tolist() == [0]
    assert cluster_regions([[0, 0, 1, 1], [0, 0, 1, 1]]).tolist() == [0, 0]


def test_kmeans_and_silhouette():
    x = np.concatenate([np.zeros((5, 2)), np.ones((5, 2))])
    labels = kmeans(x, 2, seed=0)
    assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1
    assert silhouette_score(x, labels) > 0.9
    assert silhouette_score(x, np.zeros(10, np.int32)) == -1.0


def test_spectral_embedding_shape():
    aff = np.eye(6) * 0 + 0.5
    emb = spectral_embedding(aff, 2)
    assert emb.shape == (6, 2)
    assert np.isfinite(emb).all()


def test_split_oversized_clusters():
    labels = np.zeros(5, np.int32)
    tokens = [40, 40, 40, 40, 40]
    out = split_oversized_clusters(labels, tokens, max_tokens=100)
    # 200 tokens in one cluster -> split into chunks of <=100
    assert len(set(out.tolist())) == 3
    # no splitting when disabled
    assert (split_oversized_clusters(labels, tokens, 0) == labels).all()
