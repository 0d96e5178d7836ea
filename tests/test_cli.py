"""CLI integration smoke tests (tiny configs, CPU).

Each entry point runs end-to-end in a temp cwd and leaves the reference's
artifact layout behind.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def run_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    yield tmp_path
    # The CLI mains call configure_tpu_runtime(), which flips the process-wide
    # default PRNG impl to rbg; keys created by other test modules at import
    # time are threefry-shaped and flax rejects them afterwards. Restore.
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")


TINY = [
    "--synthetic", "--num-layers", "1", "--batch-size", "4",
    "--synthetic-train", "10", "--synthetic-test", "4",
]


@pytest.mark.slow
def test_train_iemocap_cli_and_predict(run_dir):
    from gan_ffn_tpu.cli.train_iemocap import main

    res = main(["--epochs", "1", "--GAN-epochs", "1",
                "--continue-train-GAN-step", "0", *TINY])
    assert np.isfinite(res["best_loss"])
    assert os.path.exists(res["report_path"])
    assert os.path.exists("output/GAN_loss.csv")
    assert os.path.exists("GAN_save/acoustic_gen.msgpack")
    assert os.path.exists("GAN_save/classifier_best.msgpack")

    import jax

    import gan_ffn_tpu.utils.runtime as rt

    orig = rt.wait_for_device
    rt.wait_for_device = lambda *a, **k: jax.devices("cpu")
    try:
        from gan_ffn_tpu.cli.predict import main as pmain

        pres = pmain(["--num-layers", "1", "--output", "preds.json"])
        assert pres["n_dialogues"] == 4
        assert len(json.load(open("preds.json"))) == 4
    finally:
        rt.wait_for_device = orig


@pytest.mark.slow
def test_sweep_cli(run_dir):
    from gan_ffn_tpu.cli.sweep import main

    res = main(["--gan-epochs", "1", "2", "1", "--epochs", "1", *TINY])
    assert set(res) == {1, 2}
    files = os.listdir("output/history")
    assert len(files) == 2
    assert all(f.startswith("test_out_GAN-epochs=") for f in files)


@pytest.mark.slow
def test_train_meld_cli(run_dir):
    from gan_ffn_tpu.cli.train_meld import main

    res = main(["--epochs", "2", "--synthetic", "--batch-size", "8"])
    assert np.isfinite(res["best_loss"])
    assert res["f1"] >= 0
    # best epoch's attention weights surfaced (reference's eval-epoch alphas,
    # train_MELD.py:90-93): one (L, B, L) array per test batch
    attn = res["attentions"]
    assert attn is not None and len(attn["alpha"]) >= 1
    a0 = attn["alpha"][0]
    assert a0.ndim == 3 and a0.shape[0] == a0.shape[2]  # (L, B, L)
    assert len(attn["vids"][0]) >= 1


@pytest.mark.parametrize("cadence", ["epoch", "batch"])
@pytest.mark.slow
def test_tb_grad_histogram_cadence(run_dir, cadence):
    """--tb-grad-histograms {epoch,batch}: per-epoch sampling writes one
    histogram set per epoch; 'batch' matches the reference's per-batch
    logging (train_MELD.py:83-85) — more histogram events per tag."""
    pytest.importorskip("torch.utils.tensorboard")
    from tensorboard.backend.event_processing import event_accumulator

    from gan_ffn_tpu.cli.train_meld import main

    epochs, batch_size = 2, 4  # 16 train dialogues / 4 => 4 batches/epoch
    res = main(["--epochs", str(epochs), "--synthetic", "--batch-size",
                str(batch_size), "--synthetic-train", "16", "--synthetic-test", "4",
                "--tensorboard", "--tb-grad-histograms", cadence])
    assert np.isfinite(res["best_loss"])
    acc = event_accumulator.EventAccumulator(
        "./tensorboard", size_guidance={event_accumulator.HISTOGRAMS: 0}
    )
    acc.Reload()
    tags = acc.Tags()["histograms"]
    assert any("lstm" in t for t in tags)
    n_events = len(acc.Histograms(tags[0]))
    if cadence == "epoch":
        assert n_events == epochs
    else:
        assert n_events == epochs * 4  # every batch, like the reference
    assert "test: accuracy/loss" in acc.Tags()["scalars"]


def test_resolve_epoch_fused_auto(tmp_path):
    """The sweep's AUTO --epoch-fused policy (cli/common.py): fuse exactly
    when every dialogue's length maps to one bucket (then the scanned epoch
    is numerically identical to the per-batch loop); keep the per-batch
    reference cadence when lengths span buckets."""
    from gan_ffn_tpu.cli.common import resolve_epoch_fused_auto
    from gan_ffn_tpu.data import get_iemocap_loaders, write_synthetic_iemocap

    single = str(tmp_path / "single.pkl")
    write_synthetic_iemocap(single, n_train=12, n_test=4, min_len=10,
                            max_len=28, seed=5)  # all in the 32 bucket
    loader, _, _ = get_iemocap_loaders(single, batch_size=4, valid=0.1, seed=5)
    assert resolve_epoch_fused_auto(loader) is True

    multi = str(tmp_path / "multi.pkl")
    write_synthetic_iemocap(multi, n_train=12, n_test=4, min_len=10,
                            max_len=60, seed=5)  # straddles the 32 boundary
    loader, _, _ = get_iemocap_loaders(multi, batch_size=4, valid=0.1, seed=5)
    assert resolve_epoch_fused_auto(loader) is False
