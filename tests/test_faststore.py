"""Native feature-store tests (data-loader runtime, SURVEY.md §2 L2)."""

import numpy as np
import pytest

from captionkit.data.faststore import FeatureStore, native_available


@pytest.fixture()
def npy_file(tmp_path):
    arr = np.random.default_rng(0).standard_normal(
        (64, 4, 16)
    ).astype(np.float32)
    p = str(tmp_path / "feats.npy")
    np.save(p, arr)
    return p, arr


def test_gather_matches_numpy(npy_file):
    p, arr = npy_file
    fs = FeatureStore(p)
    idx = np.asarray([0, 63, 5, 5, 17])
    np.testing.assert_array_equal(fs.gather(idx), arr[idx])
    np.testing.assert_array_equal(fs[3], arr[3])
    np.testing.assert_array_equal(np.asarray(fs), arr)
    assert len(fs) == 64
    fs.close()


def test_out_of_range_is_loud(npy_file):
    p, _ = npy_file
    fs = FeatureStore(p)
    with pytest.raises(IndexError):
        fs.gather([64])
    fs.close()


@pytest.mark.skipif(not native_available(),
                    reason="libfeatstore.so not built")
def test_native_backend_engaged(npy_file):
    p, arr = npy_file
    fs = FeatureStore(p)
    assert fs.is_native
    np.testing.assert_array_equal(
        fs.gather(np.arange(64)[::-1].copy()), arr[::-1]
    )
    fs.close()


def test_dataset_batches_through_store(tmp_path):
    """End to end: prepare writes .npy -> loader wraps it in FeatureStore ->
    batches gather per batch."""
    from tests.test_prepare import _karpathy_fixture
    from captionkit.data.prepare import (
        load_prepared_split,
        prepare_from_karpathy,
    )

    kpath, epaths, feats = _karpathy_fixture(tmp_path)
    prepare_from_karpathy(
        karpathy_json=kpath, output_dir=str(tmp_path / "prep"),
        existing_captions=epaths, features=feats,
        min_word_freq=1, max_len=12, captions_per_image=2,
    )
    ds = load_prepared_split(str(tmp_path / "prep"), "train")
    if native_available():
        assert getattr(ds.features, "is_native", False)
    b = next(ds.batches(4))
    assert b.features.shape == (4, 4, 8)
    # Row alignment: batch features equal the store rows for those images.
    np.testing.assert_array_equal(
        b.features[0], np.asarray(ds.features)[b.image_id[0]]
    )


def test_hdf5_dataset_per_batch_gather(tmp_path):
    """h5py-backed features must be gathered per batch through sorted
    fancy indexing (never np.asarray of the whole dataset)."""
    h5py = pytest.importorskip("h5py")
    from captionkit.data.sources import CaptionDataset, load_hdf5_features

    arr = np.random.default_rng(0).standard_normal(
        (10, 3, 8)
    ).astype(np.float32)
    p = str(tmp_path / "f.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("features", data=arr)
    feats = load_hdf5_features(p)
    ds = CaptionDataset(
        features=feats,
        existing=np.tile(np.asarray([[2, 5, 3]], np.int32), (10, 1)),
        existing_len=np.full((10,), 3, np.int32),
        target=None, target_len=None,
        image_index=np.arange(10, dtype=np.int32)[::-1].copy(),  # reversed
        vocab=__import__("captionkit.data.vocab", fromlist=["Vocab"]).Vocab(
            {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3, "a": 4, "b": 5}
        ),
    )
    b = next(ds.batches(4))
    # Row 0 maps to image 9 (reversed index) — duplicates + unsorted rows
    # must come back in request order.
    np.testing.assert_array_equal(b.features[0], arr[9])
    np.testing.assert_array_equal(b.features[3], arr[6])
