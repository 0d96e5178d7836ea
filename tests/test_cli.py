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


def test_sweep_cli(run_dir):
    from gan_ffn_tpu.cli.sweep import main

    res = main(["--gan-epochs", "1", "2", "1", "--epochs", "1", *TINY])
    assert set(res) == {1, 2}
    files = os.listdir("output/history")
    assert len(files) == 2
    assert all(f.startswith("test_out_GAN-epochs=") for f in files)


def test_train_meld_cli(run_dir):
    from gan_ffn_tpu.cli.train_meld import main

    res = main(["--epochs", "2", "--synthetic", "--batch-size", "8"])
    assert np.isfinite(res["best_loss"])
    assert res["f1"] >= 0
