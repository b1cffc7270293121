import numpy as np

from contrastyou_tpu.data import synthesize_acdc_like
from contrastyou_tpu.hooks.savers import (DistributionTracker, FeatureMapSaver,
                                          MatrixSaver)
from contrastyou_tpu.postprocess import (cluster_alignment, generate_superpixels,
                                         hungarian_match, slic, tsne_embed)


def test_slic_superpixels():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64)).astype(np.float32)
    img[:32] += 1.0
    labels = slic(img, n_segments=16, n_iter=4)
    assert labels.shape == (64, 64)
    assert 4 <= len(np.unique(labels)) <= 40


def test_generate_superpixels_layout(tmp_path):
    synthesize_acdc_like(tmp_path, num_train_scans=1, num_val_scans=1,
                         slices_per_scan=2, size=32)
    n = generate_superpixels(tmp_path / "ACDC_contrast", mode="train",
                             n_segments=8)
    assert n == 2
    assert (tmp_path / "ACDC_contrast" / "train" / "superpixel").is_dir()


def test_hungarian_match_permutation():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, (32, 32))
    perm = np.array([2, 3, 0, 1])
    cluster = perm[ref]
    mapping = hungarian_match(cluster, ref, 4)
    # mapping must invert the permutation
    for src, dst in mapping.items():
        assert perm[dst] == src
    aligned = cluster_alignment(cluster, ref, 4)
    np.testing.assert_array_equal(aligned, ref)


def test_tsne_embed_shape():
    rng = np.random.default_rng(0)
    feats = rng.random((40, 16)).astype(np.float32)
    emb = tsne_embed(feats, perplexity=5)
    assert emb.shape == (40, 2)


def test_savers_roundtrip(tmp_path):
    saver = FeatureMapSaver(str(tmp_path), "vis")
    img = np.random.rand(2, 16, 16, 1)
    fmap = np.random.rand(2, 16, 16, 8)
    saver.save_map(image=img, feature_map1=fmap, feature_map2=fmap,
                   cur_epoch=0)
    zip_path = saver.zip()
    assert zip_path.endswith(".zip")

    tracker = DistributionTracker(str(tmp_path), "dist")
    dist = np.random.rand(2, 8, 8, 5)
    tracker.save_map(dist1=dist, dist2=dist, cur_epoch=0)
    tracker.zip()

    mx = MatrixSaver(str(tmp_path), "matrix")
    mx.save_matrix(matrix=np.eye(4), cur_epoch=0, cur_batch_num=0,
                   save_name="joint")
    assert list((tmp_path / "matrix").glob("*.npz"))
