"""Checkpoint round-trips, loss-CSV format, and report-file layout."""

import os

import jax
import numpy as np
import pytest

from gan_ffn_tpu.evaluation.reports import format_test_report, write_test_report
from gan_ffn_tpu.train.gan import GANConfig, init_gan_state
from gan_ffn_tpu.utils.artifacts import (
    LOSS_COLUMNS,
    append_loss_row,
    load_gan_loss_csv,
    save_gan_loss_csv,
)
from gan_ffn_tpu.utils.checkpoint import load_gan_state, save_gan_state


@pytest.mark.slow
def test_gan_checkpoint_roundtrip(tmp_path):
    cfg = GANConfig(num_layers=1)
    state = init_gan_state(cfg, jax.random.PRNGKey(0))
    save_gan_state(str(tmp_path / "GAN_save"), state)

    template = init_gan_state(cfg, jax.random.PRNGKey(99))  # different init
    restored = load_gan_state(str(tmp_path / "GAN_save"), template)
    for name in state["params"]:
        for a, b in zip(
            jax.tree.leaves(state["params"][name]),
            jax.tree.leaves(restored["params"][name]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(
        jax.tree.leaves(state["opt"]["text_gen"]),
        jax.tree.leaves(restored["opt"]["text_gen"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # reference-style resume resets optimizer state
    reset = load_gan_state(str(tmp_path / "GAN_save"), template, reset_opt=True)
    assert reset["opt"] is not restored["opt"]


def test_loss_csv_roundtrip_and_schema(tmp_path):
    history = []
    for e in range(3):
        append_loss_row(
            history, e, {k: 0.1 * e + i for i, k in enumerate(LOSS_COLUMNS[1:])}
        )
    path = str(tmp_path / "GAN_loss.csv")
    save_gan_loss_csv(history, path)
    header = open(path).readline().strip()
    # exact reference column order (train_IEMOCAP.py:308-317)
    assert header == "epoch,acoustic_G_loss,visual_G_loss,text_G_loss,visual_D_loss,text_D_loss,acoustic_D_loss"
    back = load_gan_loss_csv(path)
    assert back == [
        {k: pytest.approx(v) if k != "epoch" else v for k, v in row.items()}
        for row in history
    ]


def test_report_file_name_and_content(tmp_path):
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 6, 200)
    preds = rng.integers(0, 6, 200)
    masks = np.ones(200, dtype=np.float32)
    path = write_test_report(str(tmp_path), 120, 1.025, labels, preds, masks)
    assert os.path.basename(path).startswith("test_out_GAN-epochs=120_F1-score=")
    text = open(path).read()
    assert text.startswith("Loss 1.025 F1-score ")
    assert "weighted avg" in text
    assert text.rstrip().endswith("]]")  # confusion matrix str

    # formatted report round-trips through sklearn's formatting (already
    # byte-checked in test_metrics) and embeds loss + f1
    assert format_test_report(1.025, labels, preds, masks) == text


def test_tensorboard_gradient_histograms(tmp_path):
    """TBWriter emits per-parameter histograms readable from the event file
    (capability match for the reference's per-batch grad histograms,
    train_IEMOCAP.py:166-168, at per-epoch granularity)."""
    pytest.importorskip("torch.utils.tensorboard")
    from tensorboard.backend.event_processing import event_accumulator

    from gan_ffn_tpu.utils.tensorboard import TBWriter

    logdir = str(tmp_path / "tb")
    writer = TBWriter(logdir, enabled=True)
    assert writer.enabled
    tree = {
        "fc": {"kernel": np.random.default_rng(0).normal(size=(4, 3)), "bias": np.zeros(3)},
        "encoder": {"layers_0": {"scale": np.ones(5)}},
    }
    writer.add_param_histograms(tree, step=0)
    writer.add_param_histograms(tree, step=1)
    writer.add_scalar("test: accuracy/loss", 1.5, 0)
    writer.close()

    acc = event_accumulator.EventAccumulator(
        logdir, size_guidance={event_accumulator.HISTOGRAMS: 0}  # 0 = keep all
    )
    acc.Reload()
    tags = set(acc.Tags()["histograms"])
    assert tags == {"fc.kernel", "fc.bias", "encoder.layers_0.scale"}
    assert len(acc.Histograms("fc.kernel")) == 2
    assert "test: accuracy/loss" in acc.Tags()["scalars"]


def test_wait_for_device_watchdog_reports_hang(monkeypatch, capsys):
    """A blocking jax.devices() (the 2026-08-19 wedged-tunnel mode) must leave
    periodic stderr diagnostics instead of hanging silently; the result still
    comes through once the backend responds."""
    import time

    from gan_ffn_tpu.utils import runtime

    sentinel = ["dev0"]

    def slow_devices():
        time.sleep(0.35)
        return sentinel

    monkeypatch.setattr(runtime.jax, "devices", slow_devices)
    out = runtime.wait_for_device(attempts=1, delay_s=0.0, hang_warn_s=0.1)
    assert out is sentinel
    err = capsys.readouterr().err
    assert "device init still pending" in err
    # the blocked-in-call diagnostic, not the raising-retry one
    assert "blocking in backend init" in err


def test_wait_for_device_watchdog_distinguishes_raising_retries(
    monkeypatch, capsys
):
    """When jax.devices() RAISES repeatedly (the transient registration mode),
    the watchdog must report that retries are firing — not claim the call is
    wedged in backend init."""
    from gan_ffn_tpu.utils import runtime

    def raising_devices():
        raise RuntimeError("backend not registered yet")

    monkeypatch.setattr(runtime.jax, "devices", raising_devices)
    with pytest.raises(RuntimeError, match="not registered"):
        runtime.wait_for_device(attempts=3, delay_s=0.15, hang_warn_s=0.1)
    err = capsys.readouterr().err
    assert "retrying after the backoff sleep" in err
    assert "blocking in backend init" not in err


def test_wait_for_device_rejects_non_positive_attempts():
    from gan_ffn_tpu.utils import runtime

    with pytest.raises(ValueError, match="attempts"):
        runtime.wait_for_device(attempts=0)


def test_wait_for_device_no_watchdog_noise_when_fast(monkeypatch, capsys):
    from gan_ffn_tpu.utils import runtime

    sentinel = ["dev0"]
    monkeypatch.setattr(runtime.jax, "devices", lambda: sentinel)
    assert runtime.wait_for_device(hang_warn_s=5.0) is sentinel
    assert "device init still pending" not in capsys.readouterr().err
