"""Data layer tests: schemas, normalization, split, bucketed batching."""

import numpy as np
import pytest

from gan_ffn_tpu.data import (
    BucketedLoader,
    IEMOCAPDataset,
    MELDDataset,
    get_iemocap_loaders,
    get_meld_loaders,
    head_tail_split,
)
from gan_ffn_tpu.data.datasets import minmax_normalize
from gan_ffn_tpu.data.loaders import collate
from gan_ffn_tpu.data.synthetic import (
    write_synthetic_avec,
    write_synthetic_dailydialogue,
)


def test_minmax_normalize_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(7, 5)).astype(np.float32)
    y = minmax_normalize(x)
    expected = (x - x.min()) / (x.max() - x.min())
    np.testing.assert_allclose(y, expected, rtol=1e-6)
    assert y.min() == 0.0 and y.max() == pytest.approx(1.0, abs=1e-6)


def test_minmax_constant_guarded_vs_strict():
    x = np.full((3, 4), 7.0, dtype=np.float32)
    assert np.all(minmax_normalize(x) == 0.0)  # epsilon-guarded
    with np.errstate(invalid="ignore"):
        assert np.all(np.isnan(minmax_normalize(x, strict_parity=True)))  # reference NaN


def test_iemocap_dataset_schema(iemocap_pickle):
    ds = IEMOCAPDataset(iemocap_pickle, train=True)
    assert len(ds) == 24
    d = ds[0]
    L = d.length
    assert d.text.shape == (L, 100)
    assert d.audio.shape == (L, 100)
    assert d.visual.shape == (L, 512)
    assert d.qmask.shape == (L, 2)
    # qmask one-hot
    np.testing.assert_array_equal(d.qmask.sum(-1), np.ones(L))
    assert d.label.dtype == np.int32
    assert d.label.min() >= 0 and d.label.max() < 6
    # normalization applied: all modalities in [0, 1]
    for arr in (d.text, d.audio, d.visual):
        assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_meld_dataset_schema(meld_pickle):
    ds = MELDDataset(meld_pickle, classify="emotion", train=True)
    d = ds[0]
    L = d.length
    assert d.text.shape == (L, 600)
    assert d.audio.shape == (L, 300)
    assert d.visual is None
    assert d.qmask.shape == (L, 9)
    ds_sent = MELDDataset(meld_pickle, classify="sentiment", train=True)
    assert ds_sent[0].label.max() < 3


def test_head_tail_split_matches_reference():
    # reference get_train_valid_sampler: valid = first int(0.1*n) indices
    train, valid = head_tail_split(24, 0.1)
    assert list(valid) == [0, 1]
    assert list(train) == list(range(2, 24))


def test_collate_shapes_and_masks(iemocap_pickle):
    ds = IEMOCAPDataset(iemocap_pickle, train=True)
    dialogues = [ds[i] for i in range(3)]
    batch = collate(dialogues, bucket_len=48, batch_size=4)
    assert batch.text.shape == (48, 4, 100)
    assert batch.visual.shape == (48, 4, 512)
    assert batch.audio.shape == (48, 4, 100)
    assert batch.qmask.shape == (48, 4, 2)
    assert batch.umask.shape == (4, 48)
    assert batch.label.shape == (4, 48)
    assert batch.n_real == 3
    # padded dialogue column fully masked
    assert batch.umask[3].sum() == 0
    for j, d in enumerate(dialogues):
        assert batch.umask[j].sum() == d.length
        np.testing.assert_array_equal(batch.text[: d.length, j], d.text)
        # tail padding is zero
        assert np.all(batch.text[d.length :, j] == 0)


def test_bucketed_loader_static_shapes(iemocap_pickle):
    ds = IEMOCAPDataset(iemocap_pickle, train=True)
    loader = BucketedLoader(ds, batch_size=8, buckets=(16, 32, 48), seed=0)
    shapes = set()
    n_dialogues = 0
    for batch in loader:
        shapes.add((batch.seq_len, batch.batch_size))
        n_dialogues += batch.n_real
        assert batch.seq_len in (16, 32, 48)
        assert batch.batch_size == 8
    assert n_dialogues == len(ds)


def test_loader_epoch_shuffling_is_deterministic(iemocap_pickle):
    ds = IEMOCAPDataset(iemocap_pickle, train=True)
    l1 = BucketedLoader(ds, batch_size=8, seed=7)
    l2 = BucketedLoader(ds, batch_size=8, seed=7)
    v1 = [b.vids for b in l1]
    v2 = [b.vids for b in l2]
    assert v1 == v2
    # different epoch -> different order
    v3 = [b.vids for b in l1]
    assert v1 != v3


def test_get_iemocap_loaders(iemocap_pickle):
    train, valid, test = get_iemocap_loaders(iemocap_pickle, batch_size=8, valid=0.1)
    assert sum(b.n_real for b in train) == 22
    assert sum(b.n_real for b in valid) == 2
    assert sum(b.n_real for b in test) == 8


def test_get_meld_loaders(meld_pickle):
    train, valid, test = get_meld_loaders(meld_pickle, batch_size=8, valid=0.0)
    assert sum(b.n_real for b in train) == 16
    assert sum(b.n_real for b in valid) == 0
    assert sum(b.n_real for b in test) == 6


def test_avec_and_dailydialogue_fixtures(tmp_path):
    from gan_ffn_tpu.data import AVECDataset, DailyDialogueDataset

    avec = write_synthetic_avec(str(tmp_path / "avec.pkl"), n_train=6, n_test=2)
    ds = AVECDataset(avec, train=True)
    d = ds[0]
    assert d.label.dtype == np.float32  # regression labels

    dd = write_synthetic_dailydialogue(str(tmp_path / "dd.pkl"), n_train=6, n_test=2, n_valid=2)
    ds2 = DailyDialogueDataset(dd, split="valid")
    assert len(ds2) == 2
    item = ds2[0]
    assert item.tokens.ndim == 2
    assert item.qmask.shape == (item.length, 2)


def test_avec_and_dailydialogue_loaders(tmp_path):
    from gan_ffn_tpu.data import (
        get_avec_loaders,
        get_dailydialogue_loaders,
    )

    avec = write_synthetic_avec(str(tmp_path / "avec2.pkl"), n_train=10, n_test=4)
    tr, va, te = get_avec_loaders(avec, batch_size=4, valid=0.1)
    b = next(iter(tr))
    assert b.label.dtype == np.float32
    assert b.text.shape[2] == 100

    dd = write_synthetic_dailydialogue(
        str(tmp_path / "dd2.pkl"), n_train=10, n_test=4, n_valid=4
    )
    tr, te, va = get_dailydialogue_loaders(dd, batch_size=4, max_tokens=30)
    b = next(iter(tr))
    assert b.tokens.shape[1] == 4 and b.tokens.shape[2] == 30
    assert sum(x.n_real for x in te) == 4


def _dirty_iemocap_variant(src: str, dst: str, variant: str) -> None:
    """Rewrite a clean fixture pickle the way OLD pandas/numpy wrote the real
    IEMOCAP_features.pkl: float64 feature matrices, object-dtype arrays of
    per-utterance rows, plain nested lists, numpy-scalar speaker tags, int64
    label arrays. Values are bit-identical; only containers/dtypes change."""
    import pickle

    with open(src, "rb") as f:
        (ids, spk, lab, text, audio, vis, sent, train, test) = pickle.load(f)

    def feats(store):
        if variant == "float64":
            return {k: np.asarray(v, dtype=np.float64) for k, v in store.items()}
        if variant == "object":
            return {
                k: np.array([np.asarray(row, dtype=np.float64) for row in v],
                            dtype=object)
                for k, v in store.items()
            }
        if variant == "lists":
            return {k: np.asarray(v, dtype=np.float64).tolist() for k, v in store.items()}
        raise AssertionError(variant)

    spk = {k: np.array(v) for k, v in spk.items()}  # np.str_ 'M'/'F' tags
    lab = {k: np.asarray(v, dtype=np.int64) for k, v in lab.items()}
    payload = (ids, spk, lab, feats(text), feats(audio), feats(vis), sent,
               list(map(str, train)), list(map(str, test)))
    with open(dst, "wb") as f:
        pickle.dump(payload, f)


@pytest.mark.parametrize("variant", ["float64", "object", "lists"])
def test_iemocap_dataset_tolerates_legacy_pickle_dtypes(
    iemocap_pickle, tmp_path, variant
):
    """The real feature pickles were written by old pandas/numpy (the
    reference loads them through pd.DataFrame iteration, dataloader.py:55-58):
    object-dtype arrays, float64 features, numpy-str speakers, int64 labels.
    Every variant must produce outputs identical to the clean-dtype path,
    through the dataset AND the collate."""
    dirty = str(tmp_path / f"dirty_{variant}.pkl")
    _dirty_iemocap_variant(iemocap_pickle, dirty, variant)

    clean_ds = IEMOCAPDataset(iemocap_pickle, train=True)
    dirty_ds = IEMOCAPDataset(dirty, train=True)
    assert len(clean_ds) == len(dirty_ds)
    for i in range(len(clean_ds)):
        a, b = clean_ds[i], dirty_ds[i]
        assert str(a.vid) == str(b.vid)
        for field in ("text", "audio", "visual", "qmask", "label"):
            ga, gb = getattr(a, field), getattr(b, field)
            assert gb.dtype == ga.dtype, field
            np.testing.assert_array_equal(ga, gb, err_msg=f"{variant}:{field}")

    items = [dirty_ds[i] for i in range(4)]
    batch = collate(items, bucket_len=max(d.length for d in items), batch_size=4)
    assert batch.text.dtype == np.float32
    assert np.isfinite(batch.text).all()


def test_meld_dataset_tolerates_legacy_pickle_dtypes(meld_pickle, tmp_path):
    """MELD variant of the legacy-dtype robustness: str dialogue ids, float64
    features as nested lists, speaker one-hots as list-of-lists, int64
    labels."""
    import pickle

    with open(meld_pickle, "rb") as f:
        (ids, spk, emo, text, audio, sent, train, test, senti) = pickle.load(f)
    payload = (
        {str(k): v for k, v in ids.items()},
        {str(k): np.asarray(v, dtype=np.float64).tolist() for k, v in spk.items()},
        {str(k): np.asarray(v, dtype=np.int64) for k, v in emo.items()},
        {str(k): np.asarray(v, dtype=np.float64).tolist() for k, v in text.items()},
        {str(k): np.asarray(v, dtype=np.float64) for k, v in audio.items()},
        {str(k): v for k, v in sent.items()},
        [str(v) for v in train],
        [str(v) for v in test],
        {str(k): list(map(int, v)) for k, v in senti.items()},
    )
    dirty = str(tmp_path / "dirty_meld.pkl")
    with open(dirty, "wb") as f:
        pickle.dump(payload, f)

    for classify in ("emotion", "sentiment"):
        clean_ds = MELDDataset(meld_pickle, classify=classify, train=True)
        dirty_ds = MELDDataset(dirty, classify=classify, train=True)
        assert len(clean_ds) == len(dirty_ds)
        for i in range(len(clean_ds)):
            a, b = clean_ds[i], dirty_ds[i]
            for field in ("text", "audio", "qmask", "label"):
                ga, gb = getattr(a, field), getattr(b, field)
                assert gb.dtype == ga.dtype, field
                np.testing.assert_array_equal(ga, gb, err_msg=field)


def test_confusable_pairs_fixture_requires_fusion(tmp_path):
    """The discriminating-sweep fixture (confusable_pairs): per-modality
    nearest-class-mean accuracy must sit well below the fused
    (all-modalities) accuracy, because rotated class-mean pairs are collapsed
    within each modality (data/synthetic.py::_collapse_confusable_pairs)."""
    import pickle

    from gan_ffn_tpu.data.synthetic import write_synthetic_iemocap

    path = str(tmp_path / "fusion_fix.pkl")
    priors = [0.75 ** i for i in range(6)]
    write_synthetic_iemocap(
        path, n_train=60, n_test=10, min_len=6, max_len=24, seed=3407,
        confusable_pairs=2, class_priors=priors,
    )
    ids, spk, lab, txt, aud, vis, sent, tr, te = pickle.load(open(path, "rb"))
    mods = {"text": txt, "audio": aud, "visual": vis}
    X = {m: np.concatenate([mods[m][v] for v in tr]) for m in mods}
    y = np.concatenate([np.asarray(lab[v]) for v in tr])

    def nearest_mean_acc(Z):
        mus = np.stack([Z[y == c].mean(0) for c in range(6)])
        pred = np.argmin(((Z[:, None, :] - mus[None]) ** 2).sum(-1), axis=1)
        return float((pred == y).mean())

    fused = nearest_mean_acc(np.concatenate([X[m] for m in sorted(X)], axis=1))
    assert fused > 0.97  # all pairs resolvable through fusion
    for m in X:
        # each modality has 2 of its 3 class pairs mean-collapsed
        assert nearest_mean_acc(X[m]) < fused - 0.08, m
    # nonuniform priors: most-frequent class must dominate the rarest
    counts = np.bincount(y, minlength=6)
    assert counts[0] > 2.5 * counts[5]
